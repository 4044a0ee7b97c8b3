#!/usr/bin/env python
"""Targeted oracle check: python check_subset.py name1 name2 ...

Same hostile-session + canonicalization recipe as selfcheck.py, but
only for the named queries — the fast feedback loop while iterating.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfcheck import TABLES, canon  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_subset")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
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
    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            s = canon(
                pd.DataFrame([tuple(r) for r in sdf.collect()], columns=sdf.columns)
            )
            if name in oracles:
                res = con.execute(oracles[name])
                d = canon(
                    pd.DataFrame(
                        res.fetchall(), columns=[c[0] for c in res.description]
                    )
                )
                if s.equals(d):
                    print(f"{name}: MATCH ({len(s)})")
                else:
                    n_fail += 1
                    print(f"{name}: FAIL spark={len(s)} oracle={len(d)}")
                    merged = s.merge(d, how="outer", indicator=True)
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(6).to_string())
            else:
                print(f"{name}: rows-only ({len(s)})")
        except Exception as exc:
            n_fail += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:500])
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
