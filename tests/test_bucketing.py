"""Bucketing: the zero-shuffle co-located join path.

At 100 TB, repeatedly joining fact tables on the same key should not
re-shuffle per query — bucketed tables pre-partition the data on disk
so a sort-merge join consumes bucket locality directly.  This test
writes orders/lineitem bucketed by the join key and asserts the join
plan has NO shuffle exchange, and that results equal the plain join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.plans import introspection as pi

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_b")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_b")
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderstatus"
        )
        assert pi.count_shuffles(joined) == 0, pi.simple_plan(joined)

        plain = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_quantity", "o_orderstatus")
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
