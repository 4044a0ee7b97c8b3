"""SCD2 history maintenance + sorted-layout data skipping."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.operators.scd import scd2_apply
from dicomdb_spark.sources import layout


def test_scd2_lifecycle(spark):
    hist_schema = "k long, name string, v double, valid_from timestamp_ntz, valid_to timestamp_ntz"
    history = spark.createDataFrame([], hist_schema)

    snap1 = spark.createDataFrame(
        [Row(k=1, name="a", v=1.0), Row(k=2, name="b", v=2.0)]
    )
    h1 = scd2_apply(history, snap1, ["k"], ["name", "v"], "2024-01-01 00:00:00", ["v"])
    rows1 = {(r.k, r.valid_to is None) for r in h1.collect()}
    assert rows1 == {(1, True), (2, True)}

    # snapshot 2: k=1 changed, k=2 unchanged, k=3 new
    snap2 = spark.createDataFrame(
        [Row(k=1, name="a2", v=1.0), Row(k=2, name="b", v=2.0), Row(k=3, name="c", v=3.0)]
    )
    h2 = scd2_apply(h1, snap2, ["k"], ["name", "v"], "2024-02-01 00:00:00", ["v"])
    open_rows = {r.k: r.name for r in h2.filter(F.col("valid_to").isNull()).collect()}
    closed = {r.k: str(r.valid_to) for r in h2.filter(F.col("valid_to").isNotNull()).collect()}
    assert open_rows == {1: "a2", 2: "b", 3: "c"}
    assert closed == {1: "2024-02-01 00:00:00"}

    # idempotence: reapplying the same snapshot changes nothing
    h3 = scd2_apply(h2, snap2, ["k"], ["name", "v"], "2024-03-01 00:00:00", ["v"])
    assert sorted(map(tuple, h3.collect())) == sorted(map(tuple, h2.collect()))


def test_sorted_layout_enables_skipping(spark, tmp_path):
    out = str(tmp_path / "sorted")
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    layout.write_sorted(li, out, ["l_orderkey"], n_files=8)
    ranges = layout.file_column_ranges(out, "l_orderkey")
    assert len(ranges) >= 4
    assert layout.ranges_are_disjoint(ranges), ranges
    # and the data survives the round trip
    assert spark.read.parquet(out).count() == li.count()
