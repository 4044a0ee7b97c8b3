"""Adversarial TPC-H-table sweep (round-12 gate).

Real sf0.001 tables AUGMENTED with degenerate rows — childless
customer/order/part/supplier, zero prices, zero-quantity lineitems,
discount 0.1 / tax 0.08 extremes on the same order, all-equal dates,
empty-string dims, a nation with no customers — written to a temp
parquet sf-dir (the real contract path for both engines).  Exposed and
now guards: tpch_q2_shape and a_price_elasticity_ols divided
l_extendedprice by a zero l_quantity (ANSI crash vs DuckDB NULL), plus
the elasticity slope/Σy denominators.  Usage: python
adversarial_check_tpch.py [query ...]; exits non-zero on any mismatch
or error."""
import sys, re, os, shutil
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("adversarial_tpch")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from dicomdb_spark.registry._core import ORACLES, QUERIES

SRC = "/root/testdata/sf0.001"
tmp = "/tmp/adversarial_tpch_sfdir"
shutil.rmtree(tmp, ignore_errors=True)
os.makedirs(tmp)

build = duckdb.connect()
def write(table, extra_sql=""):
    q = f"SELECT * FROM '{SRC}/{table}.parquet'"
    if extra_sql:
        q += f" UNION ALL {extra_sql}"
    build.execute(f"COPY ({q}) TO '{tmp}/{table}.parquet' (FORMAT PARQUET)")

write("region", "SELECT CAST(99 AS INTEGER), ''")  # empty-name region, no nations
write("nation",
      "SELECT CAST(98 AS INTEGER), 'GHOSTLAND', CAST(0 AS INTEGER)")  # no customers/suppliers
write("customer", """
  SELECT CAST(999901 AS BIGINT), 'childless customer', CAST(98 AS INTEGER),
         CAST(0.0 AS DOUBLE), 'BUILDING'
  UNION ALL
  SELECT CAST(999902 AS BIGINT), '', CAST(0 AS INTEGER),
         CAST(-999.99 AS DOUBLE), 'AUTOMOBILE'""")
write("supplier",
      "SELECT CAST(999903 AS BIGINT), 'childless supplier', CAST(98 AS INTEGER), CAST(0.0 AS DOUBLE)")
write("part",
      "SELECT CAST(999904 AS BIGINT), 'childless part', 'Brand#99', 'ECONOMY ANODIZED GHOST', CAST(0 AS INTEGER), CAST(0.0 AS DOUBLE)")
write("orders", """
  SELECT CAST(9999905 AS BIGINT), CAST(999902 AS BIGINT), 'F',
         CAST(0.0 AS DOUBLE), TIMESTAMP '1992-01-01 00:00:00', '1-URGENT'
  UNION ALL
  SELECT CAST(9999906 AS BIGINT), CAST(999902 AS BIGINT), 'O',
         CAST(0.01 AS DOUBLE), TIMESTAMP '1992-01-01 00:00:00', '5-LOW'""")
# order 9999905 childless (no lineitems); 9999906 gets degenerate lineitems
write("lineitem", """
  SELECT CAST(9999906 AS BIGINT), CAST(999904 AS BIGINT), CAST(999903 AS BIGINT),
         CAST(1 AS INTEGER), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 'R', 'F',
         TIMESTAMP '1992-01-01 00:00:00'
  UNION ALL
  SELECT CAST(9999906 AS BIGINT), CAST(999904 AS BIGINT), CAST(999903 AS BIGINT),
         CAST(2 AS INTEGER), CAST(50.0 AS DOUBLE), CAST(104949.5 AS DOUBLE),
         CAST(0.1 AS DOUBLE), CAST(0.08 AS DOUBLE), 'N', 'O',
         TIMESTAMP '1992-01-01 00:00:00'""")

con = duckdb.connect()
tp = ["region","nation","customer","supplier","part","orders","lineitem"]
for t in tp:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)

ex = ["events","documents","embeddings"]
names = sys.argv[1:] or [n for n, sql in ORACLES.items()
    if any(re.search(rf"\b{t}\b", sql.lower()) for t in tp)
    and not any(re.search(rf"\b{t}\b", sql.lower()) for t in ex)]
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
                    print("   S:", a[:8], "\n   D:", b[:8], flush=True); shown += 1
    except Exception as e:
        errored.append(n)
        print(f"{n}: ERROR {type(e).__name__} {str(e)[:140]}", flush=True)
    spark.catalog.clearCache()
print(f"SUMMARY ok={ok} mismatch={mismatched} error={errored} total={len(names)}")
sys.exit(1 if (mismatched or errored) else 0)
