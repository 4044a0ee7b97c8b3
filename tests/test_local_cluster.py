"""Multi-JVM execution proof: representative queries on a REAL
``local-cluster`` (separate executor JVMs + separate Python workers),
value-checked against their DuckDB oracles.

``local[N]`` shares one JVM, so driver-side state can leak into tasks
undetected (closures that only work because the driver's memory is
visible, path assumptions, unregistered UDF modules).  local-cluster
is the smallest deployment where none of that holds — executors
deserialize everything — making it the honest stand-in for the
1000-executor target.  Query picks cover the engine's execution
surfaces: broadcast-join chain (j1), map+shuffle agg (dedup_exact),
window sort (w2), applyInPandas grouped-map (u3 — exercises the
ship-by-value UDF pickling in operators/stacks), and the
explode→agg→band-join dedup pipeline (minhash).

Runs in a SUBPROCESS because one Python process cannot host two
SparkContexts and the suite's session fixture owns ``local[*]``.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local-cluster[2,2,1536]")
         .appName("mjvm_check")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dicomdb_spark.registry import QUERIES, ORACLES
import duckdb
con = duckdb.connect()
SF = "/root/testdata/sf0.001"
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)

names = ["j1_exam_series_revenue", "dedup_exact", "w2_keep_latest",
         "u3_stack_assembly", "dedup_minhash_lsh"]
for name in names:
    sdf = QUERIES[name](spark, SF)
    s = norm([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(ORACLES[name])
    d = norm(res.fetchall(), [c[0] for c in res.description])
    print(name, "OK" if s == d and len(s) > 0 else "FAIL", flush=True)
spark.stop()
print("DONE", flush=True)
"""


def test_queries_match_oracles_on_multi_jvm_cluster():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    out = proc.stdout
    if "DONE" not in out and (
        "Could not find or load" in proc.stderr
        or "java.lang" in proc.stderr and "OK" not in out
    ):
        pytest.skip(f"local-cluster unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FAIL" not in out, out
    assert out.count("OK") == 5, out
