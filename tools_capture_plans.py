#!/usr/bin/env python
"""Capture .explain('formatted') for benched queries into plans/<tag>/.

Usage: python tools_capture_plans.py <tag> [suffix] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to 'before')
for every named query (default: the full bench set — HEADLINE plus the
extended list), plus a one-line-per-query audit summary on stdout:
Exchange count, Python-boundary nodes, join strategies, scan pushdown.

Plan capture is driver-side only (no job runs except the tiny
plan-build collects some operators do), so it is cheap; still, never
run it while a bench is measuring — the JVM counts as a stray java
process for the idle guard.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402
from dicomdb_spark.registry import QUERIES  # noqa: E402
from dicomdb_spark.session import get_spark  # noqa: E402

# keep in sync with bench.py's extended tuple (import would run main)
EXTENDED = [
    "j11_asof_join", "j12_range_join", "dedup_simhash_near",
    "dedup_ngram_containment", "dedup_semantic_kmeans",
    "ann_ivf_trained_topk", "s3_header_parse", "tpch_q5_shape",
    "tpch_q18_shape", "dedup_dup_spans", "text_bpe_tokens",
    "ann_rerank_topk", "corpus_clean", "corpus_pack", "tpch_q21_shape",
    "dedup_edit_distance", "text_pii_redact", "text_c4_clean",
    "corpus_chunk", "w_funnel_conversion", "ann_pq_topk",
    "corpus_dsir_sample", "text_bigram_lm_score", "dedup_url_domain",
    "tpch_q8_shape", "tpch_q13_shape", "tpch_q17_shape",
    "tpch_q19_shape", "graph_pagerank", "w_anomaly_zscore",
    "sketch_kmv_distinct", "sketch_count_min", "sketch_bloom_join",
    "sketch_hist_quantiles", "text_bm25_topk", "corpus_bpe_train",
    "corpus_dedup_pipeline", "sketch_hll_rolling", "sketch_kmv_set_ops",
    "text_gopher_rules", "w_attribution_linear", "ann_mips_topk",
    "a_mad_outliers", "j14_interval_overlap", "text_ccnet_buckets",
    "corpus_shuffle_batches", "ann_ivf_pq_topk", "a_benford_audit",
    "a_key_skew_profile", "layout_compaction_bins",
    "ann_lsh_multiprobe_topk", "sketch_cms_merge", "dedup_band_tuning",
    "sketch_join_size", "w_markov_transitions", "graph_triangles",
    "er_phonetic_pairs", "sql_dialect_portable",
    "corpus_semantic_dedup_pipeline", "w_ohlc_bars",
    "w_time_weighted_avg", "w_concurrency_peak", "graph_kcore",
    "graph_cooccurrence", "a_profile_columns", "a_constraint_audit",
    "text_ngram_topk", "text_inverted_index", "corpus_split_hash",
    "emb_dim_stats", "emb_int8_quantize", "a_corr_matrix",
    "w_cusum_drift", "j17_nearest_event", "a_market_basket",
    "text_tfidf_topterms", "graph_bfs_hops", "ann_recall_eval",
    "er_transitive_merge", "emb_top_pc_power", "emb_covariance_topk",
    "corpus_length_batching", "w_window_funnel", "w_interval_union",
    "dedup_prefix_hash", "a_sla_percentiles", "graph_modularity",
    "a_gini_skew", "sketch_cms_error_audit", "corpus_mix_rebalance",
    "text_boilerplate_ngrams", "e1_import_pipeline", "u4_bvec_rotation",
    "dedup_ngram_jaccard", "a_chi_square", "w_bollinger_bands",
    "w_kadane_max_subarray", "text_rake_keywords", "ml_rocchio_classify",
    "corpus_dedup_survivorship", "emb_mahalanobis_diag",
    "multimodal_frame_sample", "a_calendar_gap_fill",
    "a_price_elasticity_ols", "multimodal_decode_real",
    "multimodal_audio_meta", "multimodal_decode_tiff_webp",
    "multimodal_flac_meta", "text_lz76_complexity",
]


def audit(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_bc = len(re.findall(r"BroadcastExchange", plan))
    joins = sorted(set(re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
    py = sorted(set(re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas|FlatMapGroupsInArrow)\b", plan)))
    pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "no"
    return (f"exch={n_ex}(bcast={n_bc}) joins={','.join(joins) or '-'} "
            f"py={','.join(py) or '-'} pushed={pushed}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or (HEADLINE + EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dicomdb_spark_plan_capture")
    for name in names:
        if name not in QUERIES:
            print(f"{name:34s} MISSING")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture tool must never die mid-list
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name:34s} {audit(plan)}")


if __name__ == "__main__":
    main()
