"""Adversarial events-table sweep (round-12 gate).

Every events-only query runs through BOTH engines on a degenerate
corpus — lone/constant/burst series, exact-timestamp ties, negative and
extreme values, DST-boundary wall times — injected via a TEMP PARQUET
sf-dir so the engine's real load_table/io.prepare path runs (NTZ
timestamps, UTC session): identical bytes for both engines, the true
driver contract.  (Injecting with createDataFrame instead silently
shifts naive timestamps through the session timezone and produces mass
false mismatches — keep the parquet path.)

This sweep exposed and now guards: a missing event-type filter in
cdc_last_writer_state, the f5_ta_parse negative-residue round trip, the
a_wilson_ci DECIMAL z*z 1-ULP drift, 16 ANSI divide-by-zero crashes on
degenerate groups (DuckDB x/0 is NULL), two DuckDB sqrt(negative)
radicand errors (w_cpk, a_weekend_effect / a_spc_control_chart) and the
w_holt negative left-shift.  Round 13 retrofitted the last four
int64-headroom kernels (a_skew_kurtosis, a_jarque_bera,
w_interarrival_stats, a_interarrival_mixture_mom) to mean-shifted
floor-scaled co-moments and added the constant-eval-window series
(ADVICE r12) that drives w_cpk's sig_eval to exactly 0 — the sweep is
now expected to pass CLEAN with no carve-outs.

Usage: python adversarial_check_events.py [query ...]; exits non-zero
on ANY mismatch or error.
"""
import sys, re, random, os, datetime as dt
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import pyarrow as pa, pyarrow.parquet as pq
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("adversarial_events2")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from dicomdb_spark.registry._core import ORACLES, QUERIES

rng = random.Random(99)
rows = []
eid = 0
def add(ts, user, etype, value, props='{"k": 1}'):
    global eid
    rows.append((eid, ts, user, etype, value, props)); eid += 1

add(dt.datetime(2024, 2, 1, 12, 0, 0), 1, "lonely", 5.0)
for i in range(10):
    add(dt.datetime(2024, 1, 1 + i, 9, 30, 0), 2, "constant", 7.25)
base = dt.datetime(2024, 3, 5, 0, 0, 0)
for i in range(12):
    add(base + dt.timedelta(seconds=i // 3), 3, "burst", float(i))
# extreme but inside the engine's documented cents-int64 domain
for i in range(8):
    add(dt.datetime(2024, 4, 1 + i, 23, 59, 59), 4, "extreme",
        [-100.5, 0.0, 99999.99, -0.01, 3.0, 1/3, -50000.0, 2.5][i])
for h in (0, 1, 2, 3, 4):
    add(dt.datetime(2024, 3, 10, h, 30, 0), 5, "dst", float(h))
    add(dt.datetime(2024, 11, 3, h, 30, 0), 5, "dst", float(h) + 10)
add(dt.datetime(2024, 5, 1, 0, 0, 0), 6, "midnight", 1.0)
# constant EVAL-window series (ADVICE r12): varying calibration rows
# before 2024-01-16 plus an all-constant tail after it — drives
# w_cpk_process_capability's sig_eval to exactly 0.0 (greatest-0 clamp)
# so the cp/cpk denominators hit /0 (Spark nullif → NULL; DuckDB NULL)
for i, v in enumerate([10.0, 20.0, 30.0]):
    add(dt.datetime(2024, 1, 5 + i, 8, 0, 0), 10, "cpk_const_eval", v)
for i in range(5):
    add(dt.datetime(2024, 1, 20 + i, 8, 0, 0), 10, "cpk_const_eval", 42.42)
for i in range(20):
    add(dt.datetime(2024, 6, 1 + i % 5, 10 + i % 3, 0, 0), 7 + i % 2,
        "tie_a" if i % 2 else "tie_b", 50.0)
for i in range(40):
    add(dt.datetime(2024, 7, 1, 0, 0, 0) + dt.timedelta(minutes=rng.randint(0, 60*24*30)),
        rng.randint(1, 9), "normal", round(rng.uniform(-50, 500), 2),
        '{"k": %d}' % rng.randint(0, 99))
# NULL-bearing series (round-13 probe): the natural generator emits
# ZERO nulls anywhere, but a real 100 TB feed will — aggregates skip
# them in both engines, yet window ORDER BYs diverge by default
# (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST), so every sort on
# a nullable expression must pin its null position or never see one.
for i in range(6):
    add(dt.datetime(2024, 8, 1 + i, 12, 0, 0), 11, "nullmix",
        None if i % 2 else float(10 * i), None if i == 4 else '{"k": %d}' % i)

pdf = pd.DataFrame(rows, columns=["event_id","ts","user_id","event_type","value","props"])
pdf["ts"] = pd.to_datetime(pdf["ts"])  # datetime64[ns], naive

tmp = "/tmp/adversarial_sfdir"
os.makedirs(tmp, exist_ok=True)
tbl = pa.Table.from_pandas(pdf, preserve_index=False)
pq.write_table(tbl, os.path.join(tmp, "events.parquet"),
               coerce_timestamps=None, version="2.6")  # keep NANOS

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)

tables = ["region","nation","customer","supplier","part","orders","lineitem","documents","embeddings"]
names = sys.argv[1:] or [n for n, sql in ORACLES.items()
    if "events" in sql.lower()
    and not any(re.search(rf"\b{t}\b", sql.lower()) for t in tables)]
ok = 0
mismatched, errored = [], []
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
unexpected = mismatched + errored
print(f"SUMMARY ok={ok} mismatch={len(mismatched)} error={len(errored)} "
      f"total={len(names)} unexpected={unexpected}")
sys.exit(1 if unexpected else 0)
