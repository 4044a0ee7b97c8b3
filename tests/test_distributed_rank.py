"""Equivalence tests for the round-7 distributed global-order helpers
(operators/windows.py): bucketed_running must reproduce the naive
single-partition window bit-for-bit, and ntile_from_rank must match
Spark's own ntile on uniquely-tiebroken orders."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from dicomdb_spark.operators import windows as ow


def _data(spark, n=997, seed_mod=13):
    # deterministic skewed integers with heavy ties
    return spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * F.col("id")) % seed_mod).cast("long").alias("v"),
    )


def test_bucketed_row_number_matches_naive(spark):
    df = _data(spark)
    naive = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "k")).cast("long")
    )
    fast = ow.bucketed_running(
        ow.monotone_range_bucket(df, "v", n_buckets=7),
        order_cols=["v", "k"],
        rn_col="rn",
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


def test_bucketed_rank_with_ties_matches_naive(spark):
    df = _data(spark)
    naive = df.select(
        "k", F.rank().over(Window.orderBy("v")).cast("long").alias("rk")
    )
    fast = ow.bucketed_running(
        ow.monotone_range_bucket(df, "v", n_buckets=5),
        order_cols=["v"],
        rank_col="rk",
    ).select("k", "rk")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


def test_bucketed_cumsum_matches_naive(spark):
    df = _data(spark)
    wrun = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.select("k", F.sum("v").over(wrun).cast("long").alias("cum_v"))
    fast = ow.bucketed_running(
        ow.monotone_range_bucket(df, "v", n_buckets=5),
        order_cols=["v", "k"],
        sum_cols=["v"],
    ).select("k", F.col("cum_v").cast("long").alias("cum_v"))
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


def test_bucketed_descending_order(spark):
    df = _data(spark, n=503)
    naive = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("v").desc(), "k")).cast("long"),
    )
    fast = ow.bucketed_running(
        ow.monotone_range_bucket(df, "v", n_buckets=6, ascending=False),
        order_cols=[F.col("v").desc(), "k"],
        rn_col="rn",
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


def test_bucketed_constant_column_degenerates_safely(spark):
    df = spark.range(50).select(F.col("id").alias("k"), F.lit(7).alias("v"))
    fast = ow.bucketed_running(
        ow.monotone_range_bucket(df, "v"), order_cols=["v", "k"], rn_col="rn"
    )
    got = sorted(r["rn"] for r in fast.collect())
    assert got == list(range(1, 51))


@pytest.mark.parametrize("k", [3, 4, 10])
@pytest.mark.parametrize("n", [9, 10, 11, 50, 2])
def test_ntile_from_rank_matches_spark_ntile(spark, k, n):
    df = spark.range(n).select(F.col("id").alias("k_"))
    w = Window.orderBy("k_")
    naive = df.select(
        "k_", F.ntile(k).over(w).cast("long").alias("tile")
    )
    nrow = df.agg(F.count("*").alias("__n"))
    fast = (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(nrow))
        .select(
            "k_",
            ow.ntile_from_rank(F.col("rn"), F.col("__n"), k).cast("long").alias(
                "tile"
            ),
        )
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


# ---------------------------------------------------------------------------
# quantile_range_bucket (round 8): the distribution-adaptive bucketer
# behind dedup_sorted_neighbor_lcp's boundary-exchange adjacency.
# ---------------------------------------------------------------------------


def _skewed_texts(spark, n=2000):
    """Zipfian leading letter: 60% of texts start with 'T', the rest
    spread over 8 other letters — the shape that made the first-char
    bucket (and would make an affine min/max bucket) a one-task sort."""
    heads = ["T"] * 12 + ["A", "I", "S", "W", "b", "m", "o", "z"]
    rows = [
        (i, heads[(i * i) % len(heads)] + f"{(i * 2654435761) % 10**9:09d}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _prefix_int(col="text"):
    return F.conv(
        F.rpad(F.hex(F.substring(F.encode(F.col(col), "UTF-8"), 1, 7)), 14, "0"),
        16,
        10,
    ).cast("long")


def test_quantile_bucket_is_monotone_in_text_order(spark):
    """Bucket ids must be non-decreasing along the (text, doc_id) sort —
    the contract that makes per-bucket lead() + boundary exchange equal
    a global adjacency."""
    df = _skewed_texts(spark).withColumn("__pfx", _prefix_int())
    b = ow.quantile_range_bucket(df, "__pfx", n_buckets=16)
    rows = b.orderBy("text", "doc_id").select("text", "__bkt").collect()
    bkts = [r["__bkt"] for r in rows]
    assert bkts == sorted(bkts)
    # equal 7-byte prefixes share a bucket (tie contract)
    by_pfx = {}
    for r in b.select("__pfx", "__bkt").collect():
        by_pfx.setdefault(r["__pfx"], set()).add(r["__bkt"])
    assert all(len(v) == 1 for v in by_pfx.values())


def test_quantile_bucket_balances_zipfian_prefixes(spark):
    """On the 60%-'T' fixture the quantile cuts must spread the hot
    letter across many buckets: max bucket ≤ 3× the ideal n/n_buckets.
    The affine min/max map provably cannot do this (the 'T' band is
    ~1/40 of the value range, so ~60% of rows land in ≤ 2 of its
    buckets) — asserted too, as the regression contrast."""
    n, k = 2000, 16
    df = _skewed_texts(spark, n).withColumn("__pfx", _prefix_int())
    q = ow.quantile_range_bucket(df, "__pfx", n_buckets=k)
    qc = [r["c"] for r in q.groupBy("__bkt").agg(F.count("*").alias("c")).collect()]
    assert max(qc) <= 3 * (n / k), f"quantile buckets skewed: {sorted(qc)}"
    a = ow.monotone_range_bucket(df, "__pfx", n_buckets=k)
    ac = [r["c"] for r in a.groupBy("__bkt").agg(F.count("*").alias("c")).collect()]
    assert max(ac) > 3 * (n / k), "affine map unexpectedly balanced — contrast obsolete"


def test_lcp_adjacency_matches_global_sort_on_skewed_fixture(spark):
    """End-to-end: the bucketed lead() + boundary exchange inside
    dedup_sorted_neighbor_lcp must produce exactly the global-sort
    adjacency pairs on the skewed fixture (dup-heavy: every 7th text
    is repeated verbatim so real LCP pairs exist)."""
    base = _skewed_texts(spark, 600)
    dups = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    df = base.unionByName(dups)
    pfx = _prefix_int()
    b = ow.quantile_range_bucket(
        df.withColumn("__pfx", pfx), "__pfx", n_buckets=16
    ).drop("__pfx")
    w = Window.partitionBy("__bkt").orderBy("text", "doc_id")
    firsts = b.groupBy("__bkt").agg(F.min(F.struct("text", "doc_id")).alias("__f"))
    nxt = firsts.select(
        "__bkt", F.lead("__f").over(Window.orderBy("__bkt")).alias("__nf")
    )
    got = (
        b.select(
            "__bkt", "doc_id", "text",
            F.lead("doc_id").over(w).alias("__nid0"),
        )
        .join(F.broadcast(nxt), "__bkt")
        .select(
            "doc_id",
            F.coalesce(F.col("__nid0"), F.col("__nf.doc_id")).alias("nid"),
        )
        .filter(F.col("nid").isNotNull())
    )
    naive = df.select(
        "doc_id",
        F.lead("doc_id").over(Window.orderBy("text", "doc_id")).alias("nid"),
    ).filter(F.col("nid").isNotNull())
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
