"""Skew utilities: salted results must equal their unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.operators import skew

SF = "/root/testdata/sf0.01"


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, r.q_min, r.q_max)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.min("l_quantity").alias("q_min"),
            F.max("l_quantity").alias("q_max"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, r.q_min, r.q_max)
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            [
                ("count", "l_quantity", "n"),
                ("min", "l_quantity", "q_min"),
                ("max", "l_quantity", "q_max"),
            ],
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_replicated_salted_join_equals_plain(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = sorted(
        (r.l_orderkey, r.l_quantity, r.o_orderstatus)
        for r in li.join(orders, "l_orderkey").collect()
    )
    salted = sorted(
        (r.l_orderkey, r.l_quantity, r.o_orderstatus)
        for r in skew.replicated_salted_join(li, orders, ["l_orderkey"], salts=4).collect()
    )
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    hot = spark.range(10000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    salted = skew.with_salt(hot, 8)
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 8
