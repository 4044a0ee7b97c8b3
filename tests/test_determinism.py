"""Partition-independence: the engine's central determinism claim.

Every query must produce IDENTICAL values regardless of
``spark.sql.shuffle.partitions`` — that is what makes results
hash-comparable across engines and cluster sizes.  This meta-test
runs representative queries (covering sums, windows, dedup hashing,
vector math) under 2 and 27 shuffle partitions and compares exact
values.
"""

from __future__ import annotations

import pytest

from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.01"

REPRESENTATIVE = [
    "a3_group_counts",        # floor-int sums
    "j1_exam_series_revenue", # joins + sums
    "w2_keep_latest",         # window ranking
    "dedup_minhash_lsh",      # hash signatures + band join
    "ann_bruteforce_topk",    # vector kernels + top-k
    "scd2_history",           # multi-step union/join algorithm
    "graph_pagerank",         # iterative joins, floor-int rank mass
    "ann_pq_topk",            # joint k-means training + ADC sums
    "corpus_dsir_sample",     # broadcast ratio table, int score sums
    "w_anomaly_zscore",       # rolling int moments -> IEEE chain
    "sketch_bloom_join",      # salted-md5 bit sets + flag aggregate
    "sketch_hist_quantiles",  # bin counts + interpolation chain
    "text_bm25_topk",         # int-scaled per-term score sums
    "a_string_agg",           # sorted-collect (collect_list order varies!)
    "u3_stack_assembly",      # grouped-map pandas audits
    # round-5 operators
    "corpus_bpe_train",       # iterative argmax + rewrite loop
    "sketch_hll_merge",       # register max-merge rollup
    "sketch_kmv_set_ops",     # distributed top-k theta sketches
    "corpus_dedup_pipeline",  # minhash -> components -> anti-join
    "w_ema_halflife",         # lag-window int numerators
    "a_mad_outliers",         # order-statistic medians
    "ann_ivf_pq_topk",        # coarse cells + PQ training + ADC
    "a_benford_audit",        # fixed-order chi-square expression tree
    # round-7 operators
    "w_cusum_drift",          # stacked windows over exact-int walks
    "w_max_drawdown",         # running-max-of-running-sum windows
    "a_corr_matrix",          # exact co-moments -> one IEEE chain
    "graph_bfs_hops",         # iterative frontier min-aggregate
    "er_transitive_merge",    # string min-label + sorted collect
    "emb_top_pc_power",       # relational power iteration
    "corpus_span_corruption", # md5 spans + sweep-line merge
    "emb_random_projection_jl",  # integer JL projection + pair audit
    "w_weighted_median",      # cumulative-weight selection
]


def run_with_partitions(spark, name: str, n: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        df = QUERIES[name](spark, SF)
        return sorted(tuple(repr(v) for v in row) for row in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_partition_independent(spark, name):
    a = run_with_partitions(spark, name, 2)
    b = run_with_partitions(spark, name, 27)
    assert a == b, f"{name}: results differ across partition counts"
