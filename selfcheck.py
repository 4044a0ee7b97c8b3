#!/usr/bin/env python
"""Full local replay of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at sf0.01
under a deliberately hostile session (non-UTC timezone), canonicalizes
both sides the way the driver does — a pandas ``sort_values`` over ALL
output columns, which also crashes on unhashable (array) cells, the
round-1 failure mode — and writes ``SELFCHECK_r{N}.json``.

Usage: python selfcheck.py [round_tag] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df):
    """Driver-shaped canonicalization: sorted columns, sorted rows,
    repr-stringified values (floats kept at full repr precision)."""
    import pandas as pd  # noqa: F401

    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(repr)
    out = out.sort_values(by=cols).reset_index(drop=True)
    return out


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # 440+ queries share ONE JVM: localCheckpoint blocks from the
        # iterative queries linger until the driver GC lets the
        # ContextCleaner reap them, so the default 1g heap OOMs around
        # query ~400 (r9 run).  A bigger heap + the per-query gc below
        # keeps the full-registry replay comfortably bounded.  Heap is
        # env-tunable for smaller hosts (round-9 ADVICE).
        .config(
            "spark.driver.memory",
            os.environ.get("SELFCHECK_DRIVER_MEM", "12g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb
    import pandas as pd

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    detail: dict[str, dict] = {}
    n_fail = 0
    for name, fn in qs.items():
        entry: dict = {}
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = pd.DataFrame(
                [tuple(r) for r in sdf.collect()], columns=sdf.columns
            )
            s = canon(spark_pd)
            if name in oracles:
                res = con.execute(oracles[name])
                d = canon(
                    pd.DataFrame(
                        res.fetchall(), columns=[c[0] for c in res.description]
                    )
                )
                match = bool(s.equals(d))
                entry = {"check": "oracle", "rows": int(len(s)), "match": match}
                if not match:
                    n_fail += 1
            else:
                entry = {"check": "rows_only", "rows": int(len(s)), "match": None}
        except Exception as exc:  # must keep going; record the failure
            entry = {"check": "error", "rows": -1, "match": False,
                     "err": f"{type(exc).__name__}: {exc}"[:400]}
            n_fail += 1
        detail[name] = entry
        status = {True: "MATCH", False: "FAIL", None: "rows-only"}[entry.get("match")]
        print(f"{name}: {status} ({entry['rows']})", flush=True)
        # 440 queries in one session: drop each query's tracked pair
        # caches so storage memory never accumulates across the run,
        # clear any per-query persists, and nudge the Python GC so the
        # JVM ContextCleaner can reap dead localCheckpoint RDD blocks
        from dicomdb_spark.llm.dedup import release_pair_caches

        release_pair_caches()
        spark.catalog.clearCache()
        import gc

        gc.collect()

    oracle_checked = sum(1 for v in detail.values() if v["check"] == "oracle")
    out = {
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "queries": len(qs),
        "oracle_checked": oracle_checked,
        "all_match": n_fail == 0,
        "detail": detail,
    }
    path = f"SELFCHECK_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n{path}: {len(qs)} queries, {oracle_checked} oracle-checked, "
          f"{'ALL MATCH' if n_fail == 0 else f'{n_fail} FAILURES'}")


if __name__ == "__main__":
    main()
