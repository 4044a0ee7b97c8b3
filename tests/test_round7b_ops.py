"""Round-7 continuation batch A: Aroon, fixed-bucket quantile sketch,
uniform-sample audit, two-feature OLS, HLL intersection, k-truss
peeling, PAA/SAX, hyperexponential mixture fit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dicomdb_spark.registry import QUERIES
from tests.conftest import patched_load_table

SF = "/root/testdata/sf0.001"


# -- Aroon -------------------------------------------------------------------


def test_aroon_bounds_and_fresh_high(spark):
    """AroonUp/Down live in [0, 100]; a bar that IS the 14-bar high has
    bars_since_hi == 0 and aroon_up == 100."""
    rows = QUERIES["w_aroon"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bars_since_hi <= 13 and 0 <= r.bars_since_lo <= 13
        assert 0.0 <= r.aroon_up <= 100.0 and 0.0 <= r.aroon_dn <= 100.0
        if r.bars_since_hi == 0:
            assert r.aroon_up == 100.0
        assert math.isclose(r.aroon_osc, r.aroon_up - r.aroon_dn)


def test_aroon_crafted_monotone_series(spark):
    """A strictly increasing series: every full window's high is the
    current bar (aroon_up = 100) and its low is the oldest bar
    (bars_since_lo = 13, aroon_dn = 0)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=i), 1, "up", float(i + 1), "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    import dicomdb_spark.registry as R  # noqa: F401

    bars = df.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("long").alias("vol"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("p"),
        F.max(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("hi"),
        F.min(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("lo"),
    )
    # replay the registered builder's window logic on the crafted bars
    import unittest.mock as mock

    from tests.conftest import patched_registry_attr

    with patched_registry_attr("_bars", lambda s, d: bars):
        out = QUERIES["w_aroon"](spark, "ignored").collect()
    assert len(out) == 7  # 20 bars -> windows 14..20
    for r in out:
        assert r.aroon_up == 100.0 and r.bars_since_hi == 0
        assert r.aroon_dn == 0.0 and r.bars_since_lo == 13


# -- fixed-bucket quantile sketch -------------------------------------------


def test_tdigest_quantiles_bracket_exact(spark):
    """Each centroid estimate must land within one bucket width of the
    exact quantile (the sketch's resolution guarantee)."""
    out = QUERIES["sketch_tdigest_quantiles"](spark, SF).collect()
    assert out
    ev = spark.read.parquet(f"{SF}/events.parquet")
    import numpy as np

    vals = {
        t: np.sort([r.value for r in ev.filter(F.col("event_type") == t).collect()])
        for t in {r.event_type for r in out}
    }
    for r in out:
        v = vals[r.event_type]
        width = (v[-1] - v[0]) / 128 + 1e-4
        exact = v[min(len(v) - 1, max(0, r.thr - 1))]
        assert abs(r.est_value - exact) <= 2 * width, (r, exact, width)


# -- uniform sample audit ----------------------------------------------------


def test_uniform_sample_audit_shares(spark):
    out = QUERIES["o8_uniform_sample_audit"](spark, SF).collect()
    assert sum(r.n_sample for r in out) == 500
    for r in out:
        # md5 priorities are uniform: every stratum within 6 sigma
        assert abs(r.pearson_resid) < 6.0, r


# -- two-feature OLS ---------------------------------------------------------


def test_ols_recovers_planted_coefficients(spark):
    """y = 3 + 2*x1 + 5*x2 exactly (x1 = order count, varied; spend
    split into exact cents) -> closed form returns the planted betas
    and R^2 == 1."""
    import datetime as dt
    import unittest.mock as mock

    import dicomdb_spark.registry as R

    # x1 in {1,2,4,5} all divide 100000, so per-order prices are exact
    # cents and the floor-scaled spend reconstructs y exactly
    rows = [
        (i, [1, 2, 4, 5][i % 4], x2)
        for i, x2 in enumerate(b for _ in range(6) for b in range(2, 8))
    ]
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, float(x2), "SEG") for i, _x1, x2 in rows],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, "
        "c_mktsegment STRING",
    )
    orecs = []
    for i, x1, x2 in rows:
        total_k = 3 + 2 * x1 + 5 * x2
        per_order = total_k * 1000.0 / x1
        for j in range(x1):
            orecs.append(
                (i * 100 + j, i, "O", per_order, dt.datetime(2024, 1, 1), "1-URGENT")
            )
    orders = spark.createDataFrame(
        orecs,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    tables = {"customer": cust, "orders": orders}
    with patched_load_table(lambda s, d, name: tables[name]):
        row = QUERIES["a_ols_two_feature"](spark, "ignored").collect()[0]
    assert math.isclose(row.beta0, 3.0, abs_tol=1e-6)
    assert math.isclose(row.beta1, 2.0, abs_tol=1e-6)
    assert math.isclose(row.beta2, 5.0, abs_tol=1e-6)
    assert math.isclose(row.r_squared, 1.0, abs_tol=1e-9)


# -- HLL intersection --------------------------------------------------------


def test_hll_intersection_identical_sets(spark):
    """Two identical item sets: union est == per-set est, so the I-E
    intersection equals the per-set estimate (exactly, same registers)."""
    from dicomdb_spark.functions import sketches

    df = spark.createDataFrame(
        [(g, f"item{i}") for g in ("a", "b") for i in range(300)],
        "source STRING, sh STRING",
    )
    regs = sketches.hll_registers(df, "source", "sh", p=8)
    est = {
        r.source: r.n_est
        for r in sketches.hll_estimate_from_registers(regs, "source", p=8).collect()
    }
    assert est["a"] == est["b"]
    out = QUERIES["sketch_hll_intersection"](spark, SF).collect()
    for r in out:
        # union of the pair can never be estimated below either side
        assert r.n_est_union >= max(r.n_est_a, r.n_est_b) - 1e-9


# -- k-truss peel ------------------------------------------------------------


def test_ktruss_peel_monotone_and_bounded(spark):
    out = {r.round: r.n_edges for r in QUERIES["graph_ktruss_peel"](spark, SF).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0] >= out[1] >= out[2] >= out[3] >= 0


def test_ktruss_crafted_triangle_survives(spark):
    """Triangle + pendant edge: the pendant edge peels in round 1, the
    triangle is a fixed point."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 9)], "id1 INT, id2 INT"
    )
    cur = edges
    for _ in range(2):
        e1 = cur.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        e2 = cur.select(F.col("id1").alias("b"), F.col("id2").alias("c"))
        e3 = cur.select(F.col("id1").alias("a"), F.col("id2").alias("c"))
        tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
        sup = (
            tri.select(F.col("a").alias("id1"), F.col("b").alias("id2"))
            .unionAll(tri.select(F.col("b").alias("id1"), F.col("c").alias("id2")))
            .unionAll(tri.select(F.col("a").alias("id1"), F.col("c").alias("id2")))
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("sup"))
        )
        cur = (
            cur.join(sup, ["id1", "id2"])
            .filter(F.col("sup") >= 1)
            .select("id1", "id2")
        )
    got = {(r.id1, r.id2) for r in cur.collect()}
    assert got == {(1, 2), (2, 3), (1, 3)}


# -- PAA / SAX ---------------------------------------------------------------


def test_paa_sax_symbols_and_zscores(spark):
    out = QUERIES["w_paa_sax"](spark, SF).collect()
    assert out
    for r in out:
        assert r.sax_symbol in ("a", "b", "c", "d")
        if r.z < -0.6745:
            assert r.sax_symbol == "a"
        elif r.z >= 0.6745:
            assert r.sax_symbol == "d"
    # z-scores of 4-bar means center near 0 per series
    by_type: dict[str, list[float]] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r.z)
    for zs in by_type.values():
        assert abs(sum(zs) / len(zs)) < 1.5


# -- hyperexponential mixture -----------------------------------------------


def test_interarrival_mixture_consistency(spark):
    """When the MoM fit exists: tau1 >= tau2, both positive for a
    positive gap sample, and p in [0,1] reconstructs m1."""
    out = QUERIES["a_interarrival_mixture_mom"](spark, SF).collect()
    assert out
    for r in out:
        if r.tau1_s is None:
            continue
        assert r.tau1_s >= r.tau2_s
        p = r.p_slow
        m1 = p * r.tau1_s + (1 - p) * r.tau2_s
        assert math.isclose(m1, r.mean_gap_s, rel_tol=1e-9)


# -- batch B: statistics kernels ----------------------------------------------


def test_anova_decomposition(spark):
    row = QUERIES["a_anova_oneway"](spark, SF).collect()[0]
    assert row.f_stat >= 0.0 and row.ss_between >= -1e-6 and row.ss_within > 0


def test_cramers_v_range(spark):
    row = QUERIES["a_cramers_v"](spark, SF).collect()[0]
    assert 0.0 <= row.cramers_v <= 1.0
    assert row.chi2 >= 0.0


def test_theil_sen_crafted_linear(spark):
    """Perfectly linear daily revenue -> every pairwise slope equals the
    planted slope, so the median does too."""
    import datetime as dt
    import unittest.mock as mock

    import dicomdb_spark.registry as R

    rows = [
        (i, 1, "O", 100.0 + 7.0 * i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), "P")
        for i in range(10)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    with patched_load_table(lambda s, d, name: orders):
        out = QUERIES["a_theil_sen_daily"](spark, "ignored").collect()
    assert len(out) == 1
    assert math.isclose(out[0].ts_slope_per_day, 7.0, abs_tol=1e-9)
    assert out[0].n_pairs == 45


def test_capture_recapture_sane(spark):
    for r in QUERIES["a_capture_recapture"](spark, SF).collect():
        assert r.n_both <= min(r.n1, r.n2)
        # Chapman estimate can never fall below the larger capture
        assert r.chapman_est >= max(r.n1, r.n2) - 1.0


def test_spc_chart_flags_and_coverage(spark):
    rows = QUERIES["a_spc_control_chart"](spark, SF).collect()
    assert rows
    for r in rows:
        if abs(r.z) > 3.0:
            assert r.rule1 == 1
        if r.rule1 == 1:
            assert abs(r.z) > 3.0


def test_mcnemar_cells_partition_pairs(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    row = QUERIES["a_mcnemar_test"](spark, SF).collect()[0]
    assert row.a + row.b + row.c + row.d == n_users * (n_days - 1)
    assert row.mcnemar_chi2 >= 0.0


def test_hodges_lehmann_bounds(spark):
    for r in QUERIES["a_hodges_lehmann"](spark, SF).collect():
        assert r.n_walsh > 0 and r.hl_location > 0
