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


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """Footer-statistics PROOF of the z-order win: for a 2-D box
    predicate, a zval-sorted layout must let MORE files be skipped
    than a lexicographic (custkey, day) sort, whose second dimension's
    per-file ranges span everything."""
    from dicomdb_spark.registry import QUERIES
    from dicomdb_spark.sources.layout import file_column_ranges, write_sorted

    zdf = QUERIES["layout_zorder_key"](spark, "/root/testdata/sf0.01")
    n_files = 16

    z_out = str(tmp_path / "zorder")
    write_sorted(zdf, z_out, ["zval"], n_files=n_files)
    lex_out = str(tmp_path / "lex")
    write_sorted(zdf, lex_out, ["cust_bucket", "day_bucket"], n_files=n_files)

    def candidate_files(path, c_box, d_box):
        crs = file_column_ranges(path, "cust_bucket")
        drs = file_column_ranges(path, "day_bucket")
        hit = 0
        for (cmn, cmx), (dmn, dmx) in zip(crs, drs):
            if cmx >= c_box[0] and cmn <= c_box[1] and dmx >= d_box[0] and dmn <= d_box[1]:
                hit += 1
        return hit, len(crs)

    # A box selective ONLY on the second lex dimension (all cust, 1/8
    # of day): the lex layout cannot prune at all — every file's
    # day_bucket range spans ~everything — while the z-curve confines
    # the day constraint to ≤ 8 aligned fragments of total measure
    # 1/8.  (A box also selective on dim-1 would let lex prune too,
    # and the margin would sit inside range-sampler noise.)
    box_c = (0, 65535)
    box_d = (8192, 16383)
    z_hit, z_total = candidate_files(z_out, box_c, box_d)
    lex_hit, lex_total = candidate_files(lex_out, box_c, box_d)
    assert z_total >= 8 and lex_total >= 8
    # lex: no pruning on a dim-2-only predicate; z-order: real pruning
    assert z_hit < lex_hit, (z_hit, z_total, lex_hit, lex_total)
    assert z_hit < z_total, (z_hit, z_total)
