#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured with the noop sink (full plan runs distributed,
no driver-side collect cost).  Queries chosen to span the engine's
plan shapes: scan+agg, multi-join, window, band self-join, LSH dedup,
vector top-k, per-row text scoring.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dicomdb_spark.registry import QUERIES  # noqa: E402
from dicomdb_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_dup_customer_day",
    "a2_dup_representative",
    "a3_group_counts",
    "j1_exam_series_revenue",
    "j3_time_proximity",
    "j4_pairwise_doubles",
    "w1_order_duration",
    "w2_keep_latest",
    "a9_completeness_audit",
    "s7_merge_classify",
    "t2_content_hash",
    "text_stats",
    "ann_bruteforce_topk",
    "r1_dup_resolution",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
    "tpch_q1_shape",
    "tpch_q3_shape",
]


def run_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    """min-of-N execution time: the first run pays per-query codegen
    (a fixed cost irrelevant at real scale), min strips that plus GC
    noise so round-over-round numbers are comparable."""
    df = QUERIES[name](spark, sf_dir)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="dicomdb_spark_bench")

    # one warm-up pass of the first query amortizes JVM/codegen startup
    run_query(spark, HEADLINE[0], sf_dir)

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        dt = run_query(spark, name, sf_dir)
        per_query[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
