"""Adversarial embeddings sweep (round-12 gate).

Every embeddings-only query runs through BOTH engines on a hostile
corpus — zero vectors (empty docs produce them in real pipelines),
exact duplicates, antipodal vectors, duplicate k-means SEEDS (vec_id<8
includes identical pairs, so round-0 clusters empty), axis vectors at
10x / 1e-6 magnitude — injected via a temp parquet sf-dir (the real
contract path).  This sweep exposed: 12 ANSI divide-by-zero cosine
crashes on zero-norm vectors (DuckDB x/0 is NULL; all cosine sites now
nullif the norm product), the emb_norm_outliers n-cubed int64 overflow
(common-denominator deviations; retrofitted to the mean-shift
discipline), the JL distortion zero-distance division, and the k-means
cid RENUMBERING drift (update_centroids compacted empty clusters out of
the list while the oracle keeps original labels — centroids are now
tagged (cid, vector) end-to-end).

Magnitudes beyond ~10x unit norm are OUT of the documented fixed-point
embedding domain and excluded.  Usage: python
adversarial_check_embeddings.py [query ...]; exits non-zero on any
mismatch or error.
"""
import sys, re, random, os
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import pyarrow as pa, pyarrow.parquet as pq
import numpy as np
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("adversarial_emb")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from dicomdb_spark.registry._core import ORACLES, QUERIES

rng = np.random.RandomState(7)
D = 64
vecs, labels = [], []
vecs.append(np.zeros(D)); labels.append(0)              # zero vector
vecs.append(np.zeros(D)); labels.append(1)              # second zero vector
v = np.ones(D); vecs.append(v); labels.append(2)        # constant ones
vecs.append(v.copy()); labels.append(2)                 # exact duplicate
vecs.append(-v); labels.append(3)                       # antipodal
e0 = np.zeros(D); e0[0] = 1.0; vecs.append(e0); labels.append(4)   # axis
# magnitudes stay within the unit-ish embedding domain the fixed-point
# oracles document; 10x is hostile-but-in-domain
vecs.append(e0 * 10.0); labels.append(4)
vecs.append(e0 * 1e-6); labels.append(4)                # tiny magnitude
for i in range(40):                                     # normal cloud
    vecs.append(rng.randn(D)); labels.append(int(i % 7))
for i in range(10):                                     # tight duplicate cluster
    vecs.append(v + rng.randn(D) * 1e-9); labels.append(8)
embs = [[float(np.float32(t)) for t in x] for x in vecs]
# NULL-bearing rows (r13 probe): a NULL embedding list and a NULL
# label — broken upstream featurization produces both in real feeds
embs.append(None); labels.append(9)
embs.append([float(np.float32(t)) for t in rng.randn(D)]); labels.append(None)
tmp = "/tmp/adversarial_emb_sfdir"
import shutil; shutil.rmtree(tmp, ignore_errors=True)
os.makedirs(tmp, exist_ok=True)
# build arrow arrays directly: pandas->arrow chokes converting a None
# list cell inside an object column of ndarrays
tbl = pa.table({
    "vec_id": pa.array(range(len(embs)), pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
pq.write_table(tbl, os.path.join(tmp, "embeddings.parquet"), version="2.6")
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp}/embeddings.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)

others = ["region","nation","customer","supplier","part","orders","lineitem","events","documents"]
names = sys.argv[1:] or [n for n, sql in ORACLES.items()
    if "embeddings" in sql.lower()
    and not any(re.search(rf"\b{t}\b", sql.lower()) for t in others)]
ok = 0; mismatched = []; errored = []
for n in names:
    try:
        sdf = QUERIES[n](spark, tmp)
        s = norm([tuple(r) for r in sdf.collect()], sdf.columns)
        res = con.execute(ORACLES[n])
        d = norm(res.fetchall(), [c[0] for c in res.description])
        if s == d:
            ok += 1; print(f"{n}: MATCH ({len(s)})", flush=True)
        else:
            mismatched.append(n)
            print(f"{n}: MISMATCH spark={len(s)} duck={len(d)}", flush=True)
            shown = 0
            for a, b in zip(s, d):
                if a != b and shown < 2:
                    print("   S:", a[:6], "\n   D:", b[:6], flush=True); shown += 1
    except Exception as e:
        errored.append(n)
        print(f"{n}: ERROR {type(e).__name__} {str(e)[:140]}", flush=True)
    spark.catalog.clearCache()
print(f"SUMMARY ok={ok} mismatch={mismatched} error={errored} total={len(names)}")
sys.exit(1 if (mismatched or errored) else 0)
