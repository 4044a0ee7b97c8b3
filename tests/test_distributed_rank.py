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
