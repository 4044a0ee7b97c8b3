"""Property tests for the round-3 operators (sketches, PageRank, PQ).

Oracle parity is covered by the driver contract; these assert the
mathematical guarantees that parity alone can't see (no false
negatives, over-estimation bounds, mass conservation, rank shape).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    """Every true member must pass the filter: n_pass ≥ n_true and
    n_false_pos == n_pass − n_true in every segment."""
    rows = QUERIES["sketch_bloom_join"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_pass >= r.n_true, r
        assert r.n_false_pos == r.n_pass - r.n_true, r
        assert r.n_pass <= r.n_probe, r


def test_count_min_never_underestimates(spark):
    rows = QUERIES["sketch_count_min"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_c >= r.true_c, r


def test_kmv_estimate_is_close(spark):
    """KMV with k=256 has ~1/sqrt(k) ≈ 6% relative error; assert a
    loose 25% band whenever the estimator branch fires."""
    for r in QUERIES["sketch_kmv_distinct"](spark, SF).collect():
        if r.n_exact >= 256:
            assert abs(r.n_est - r.n_exact) / r.n_exact < 0.25, r
        else:
            assert r.n_est == float(r.n_exact), r


def test_pagerank_mass_and_shape(spark):
    """Ranks are positive; total mass stays ≈ 1 (the floored division
    leaks at most a few units per node per round); top list is
    strictly ordered by (pr desc, node)."""
    rows = QUERIES["graph_pagerank"](spark, SF).collect()
    assert len(rows) == 20
    assert all(r.pr > 0 for r in rows)
    order = [(-r.pr, r.node) for r in rows]
    assert order == sorted(order)
    # full-rank mass check on the underlying operator
    from dicomdb_spark.io import load_table
    from dicomdb_spark.operators import graph

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = e0.select(
        F.col("c").alias("src"), (F.col("s") + 1000000).alias("dst")
    ).unionAll(
        e0.select((F.col("s") + 1000000).alias("src"), F.col("c").alias("dst"))
    )
    r = graph.pagerank(edges, iters=3)
    total = r.agg(F.sum("r")).collect()[0][0]
    n_nodes = r.count()
    n_edges = edges.count()
    # mass 1.0 scaled to 1e12; each round can floor away ≤ n_edges
    # (contribution floors) + n_nodes (base-term floor) units
    assert abs(total - 10**12) <= 3 * (n_edges + 2 * n_nodes)


def test_pq_rank_shape_and_positivity(spark):
    rows = QUERIES["ann_pq_topk"](spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.adc_dist >= 0, r
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        rs = sorted(rs, key=lambda r: r.rank)
        assert rs[0].adc_dist <= rs[1].adc_dist <= rs[2].adc_dist


def test_weighted_sample_determinism_and_bias(spark):
    """weighted_sample: (a) partition-count invariant, (b) exact md5
    arithmetic (matches a pure-Python replay), (c) weight-biased —
    heavier docs are overrepresented vs a uniform id sample."""
    import hashlib

    from dicomdb_spark.io import load_table
    from dicomdb_spark.llm.corpus import weighted_sample

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    got = [
        (r.doc_id, r.priority)
        for r in weighted_sample(docs, "doc_id", "w", 25).collect()
    ]
    # pure-Python replay
    rows = [(r.doc_id, r.w) for r in docs.collect()]
    replay = sorted(
        (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / float(w),
            i,
        )
        for i, w in rows
    )[:25]
    assert [(i, p) for p, i in replay] == got
    # partition invariance
    got2 = [
        (r.doc_id, r.priority)
        for r in weighted_sample(
            docs.repartition(13), "doc_id", "w", 25
        ).collect()
    ]
    assert got2 == got
    # bias: mean weight of the sample exceeds the corpus mean
    mean_all = sum(w for _, w in rows) / len(rows)
    sample_ids = {i for i, _ in got}
    mean_sample = sum(w for i, w in rows if i in sample_ids) / len(sample_ids)
    assert mean_sample > mean_all


def test_domain_cap_invariants(spark):
    """Every domain keeps at most `cap` documents, the kept set is
    exactly the quality-top-cap (unique-id tiebreak), and every input
    row appears exactly once in the output."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.llm.corpus import domain_cap

    docs = load_table(spark, SF, "documents")
    u = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    out = domain_cap(u, "url", "doc_id", "n_chars", cap=2).collect()
    assert len(out) == docs.count()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    quality = {r.doc_id: r.n_chars for r in u.select("doc_id", "n_chars").collect()}
    for dom, rows in by_dom.items():
        kept = [r for r in rows if r.kept]
        assert len(kept) <= 2
        # kept = the top-2 by (quality desc, id asc)
        order = sorted(rows, key=lambda r: (-quality[r.doc_id], r.doc_id))
        assert {r.doc_id for r in kept} == {r.doc_id for r in order[:2]}


def test_dsir_scores_positive_and_target_biased(spark):
    """DSIR: every score is positive, and the mean score of target-
    language (en) documents exceeds the mean of the rest — the whole
    point of importance resampling."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.llm.corpus import dsir_weights

    docs = load_table(spark, SF, "documents")
    out = dsir_weights(docs, F.col("lang") == "en").collect()
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    assert all(r.dsir_score > 0 for r in out)
    en = [r.dsir_score for r in out if langs[r.doc_id] == "en"]
    rest = [r.dsir_score for r in out if langs[r.doc_id] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
