"""df-capped inverted-index semantics (llm/dedup._df_capped_pair_scores).

The round-5 scale fix: hot shingles (document frequency > max_df) never
enter the candidate self-join, so bucket cost is bounded by
|shingles|·max_df².  Contract checks:

* a pair whose EVERY shared shingle is hot is dropped;
* a pair sharing ≥1 cold shingle survives with its EXACT score — the
  cap gates candidate generation only, the array verify recomputes the
  full intersection including hot shingles.
"""

from __future__ import annotations

import pytest

from dicomdb_spark.llm import dedup as ldedup


def _mk_docs(spark):
    # "common common common" → every doc shares the hot shingle 'c c c'
    # (df = 6 > max_df 3); docs 1/2 and 3/4 additionally share distinct
    # rare shingles; docs 5/6 share ONLY the hot shingle.
    rows = [
        (1, "c c c rare1 rare1b rare1c"),
        (2, "c c c rare1 rare1b rare1c"),
        (3, "c c c rare2 rare2b rare2c"),
        (4, "c c c rare2 rare2b rare2c"),
        (5, "c c c onlyhot5 x5 y5"),
        (6, "c c c onlyhot6 x6 y6"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_only_pairs_dropped_cold_pairs_exact(spark):
    df = _mk_docs(spark)
    out = ldedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.1, max_df=3
    ).collect()
    pairs = {(r.id1, r.id2): r.jaccard for r in out}
    # identical docs 1/2 and 3/4 share cold shingles → kept, jaccard 1.0
    assert pairs[(1, 2)] == 1.0
    assert pairs[(3, 4)] == 1.0
    # 5/6 share ONLY the hot 'c c c' shingle → dropped by contract even
    # though their true jaccard (1/7) clears the 0.1 threshold
    assert (5, 6) not in pairs
    # cross pairs (e.g. 1/3) share only the hot shingle too
    assert (1, 3) not in pairs


def test_surviving_scores_count_hot_shingles(spark):
    """The verify step must count HOT shared shingles in the exact
    score — only candidate generation is capped."""
    df = _mk_docs(spark)
    out = ldedup.ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_df=3
    ).collect()
    pairs = {(r.id1, r.id2): r.containment for r in out}
    # docs 1 and 2: 4 distinct shingles each ('c c c', 'c c rare1',
    # 'c rare1 rare1b', 'rare1 rare1b rare1c'), all shared — the hot
    # 'c c c' is included in inter even though it never joined
    assert pairs[(1, 2)] == 1.0


def test_uncapped_path_unchanged(spark):
    """max_df=None keeps the exhaustive inverted index: the hot-only
    pair IS reported there."""
    df = _mk_docs(spark)
    out = ldedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.1, max_df=None
    ).collect()
    pairs = {(r.id1, r.id2) for r in out}
    assert (5, 6) in pairs


def test_capped_pair_generation_has_no_self_join(spark):
    """The df-capped candidate stage enumerates each posting bucket's
    pairs in-plan (collect_list + transform/slice over <= max_df
    structs) instead of sort-merge self-joining the posting list: the
    plan must carry no SortMergeJoin and exactly one exchange keyed on
    the hashed shingle.  A reappearing self-join means the bucket
    expansion regressed to the two-scan join shape."""
    from dicomdb_spark.registry import QUERIES

    for name in ("dedup_ngram_jaccard", "dedup_ngram_containment"):
        df = QUERIES[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, name
        assert "collect_list" in plan, name
