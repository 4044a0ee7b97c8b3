#!/usr/bin/env python
"""Time individual registry queries with the noop sink (guide §1.4).

Usage: python tools_timeq.py name [name ...] [--reps N] [--sf DIR]

Prints per-query min/all-rep times.  Same methodology as bench.py
(min-of-N noop writes, pair-cache release + clearCache between
queries) so numbers are directly comparable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dicomdb_spark.registry import QUERIES  # noqa: E402
from dicomdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark(app_name="dicomdb_spark_timeq")
    from dicomdb_spark.llm.dedup import release_pair_caches

    for name in args.names:
        df = QUERIES[name](spark, args.sf)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        release_pair_caches()
        spark.catalog.clearCache()
        all_s = " ".join(f"{t:.3f}" for t in times)
        print(f"{name:34s} min={min(times):.3f}  [{all_s}]")


if __name__ == "__main__":
    main()
