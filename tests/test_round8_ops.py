"""Round-8 batch N: isotonic minimax fit, Page–Hinkley drift,
Cochran Q / Friedman / Kruskal–Wallis k-sample tests, 2-D skipping
simulation, harmonic centrality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    rows = sorted(
        QUERIES["a_isotonic_pava"](spark, SF).collect(), key=lambda r: r.day
    )
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert b.fitted >= a.fitted - 1e-9  # isotonic
    # PAVA preserves the total (each pooled block is replaced by its
    # own mean), so sums agree up to float roundoff
    assert math.isclose(
        sum(r.fitted for r in rows), sum(r.x for r in rows), rel_tol=1e-9
    )
    # the fit is a projection: between min and max of the data
    xs = [r.x for r in rows]
    for r in rows:
        assert min(xs) - 1e-9 <= r.fitted <= max(xs) + 1e-9
    # EXECUTABLE cost envelope (same discipline as ops_incident_mttr /
    # a_survival_hazard in test_round7c_ops): the minimax identity is a
    # D^3 plan over the day grain — one row per day out, and D must
    # stay at calendar scale (<= ~400, i.e. about a year) or the
    # tri-grid silently cubes on a grain change.
    n_days = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert len(rows) <= n_days
    assert n_days <= 400, (
        "a_isotonic_pava's D^3 minimax grid is only bounded at calendar "
        "grains; use the O(D) sequential PAVA fallback beyond ~1 year"
    )


def test_isotonic_fit_on_monotone_input_is_identity(spark):
    """If the series is already non-decreasing, PAVA returns it."""
    rows = sorted(
        QUERIES["a_isotonic_pava"](spark, SF).collect(), key=lambda r: r.day
    )
    monotone = all(b.x >= a.x for a, b in zip(rows, rows[1:]))
    if monotone:  # fixture-dependent; identity only claimed then
        for r in rows:
            assert math.isclose(r.fitted, r.x, rel_tol=1e-12)
    else:  # fitted differs from x somewhere (pooling happened)
        assert any(abs(r.fitted - r.x) > 1e-12 for r in rows)


def test_page_hinkley_gap_nonnegative_and_flag_consistent(spark):
    rows = QUERIES["w_page_hinkley_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.ph_gap >= -1e-12  # PH_T - running min is >= 0
        if r.drift_flag == 1:
            assert r.ph_gap > 500.0 - 1e-9
        else:
            assert r.ph_gap <= 500.0 + 1e-9
    # day count bounded by the calendar (same contract as the other
    # day-grain detectors)
    n_days = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert len(rows) <= n_days


def test_cochran_q_nonnegative_and_nondegenerate(spark):
    rows = QUERIES["a_cochran_q"](spark, SF).collect()
    # FIXTURE-SHAPE assertion, separate from the invariants below: the
    # query legitimately returns 0 rows when the thresholded incidence
    # saturates or collapses (denominator k*N - sum(R_i^2) = 0) — a
    # fixture regeneration could flip this without any code change.
    assert len(rows) == 1, (
        "fixture-dependent: the sf0.001 events fixture currently yields "
        "a non-degenerate incidence; regenerated data may saturate"
    )
    for r in rows:  # query invariants, valid whenever a row exists
        assert r.q_stat >= 0.0  # k*sum(C^2) >= N^2 by Cauchy-Schwarz
        assert r.k >= 2 and r.n_users >= 1
        assert r.n_marks <= r.k * r.n_users


def test_friedman_chi2_nonnegative(spark):
    r = QUERIES["a_friedman_test"](spark, SF).collect()[0]
    assert r.chi2_f >= -1e-9
    assert r.k >= 2 and r.n_blocks >= 1
    # upper bound: maximal when every block ranks identically ->
    # chi2 = n*(k-1) * ... <= 3n(k+1) slack; loose sanity ceiling
    assert r.chi2_f <= 3.0 * r.n_blocks * (r.k + 1)


def test_kruskal_wallis_bounds(spark):
    r = QUERIES["a_kruskal_wallis"](spark, SF).collect()[0]
    # the x100 floor-scaling can shave at most k*0.01 from the
    # numerator; H itself is >= 0
    assert r.h_stat >= -1e-6
    assert r.h_stat <= r.n - 1  # H <= N-1 always
    n_obs = (
        load_table(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .count()
        .count()
    )
    assert r.n == n_obs


def test_skipping_2d_hilbert_beats_1d_sort_on_box_predicate(spark):
    rows = {r.layout: r for r in QUERIES["layout_skipping_sim_2d"](spark, SF).collect()}
    assert set(rows) == {"a_natural", "b_dim_sorted", "c_hilbert"}
    matched = {r.rows_matched for r in rows.values()}
    assert len(matched) == 1  # layout never changes the answer
    for r in rows.values():
        assert r.files_hit <= r.n_files
        assert r.rows_scanned >= r.rows_matched
    # the 2-D box is where Hilbert earns its keep: tighter than the
    # 1-D sort, which is tighter than arrival order
    assert (
        rows["c_hilbert"].rows_scanned
        <= rows["b_dim_sorted"].rows_scanned
        <= rows["a_natural"].rows_scanned
    )


def test_harmonic_centrality_shape(spark):
    rows = QUERIES["graph_harmonic_centrality"](spark, SF).collect()
    assert 1 <= len(rows) <= 5
    for r in rows:
        assert r.harmonic_x12 <= 12 * r.n_reached  # each term <= 12
        assert r.harmonic_x12 >= 3 * r.n_reached  # each term >= 12/4
        assert math.isclose(r.harmonic, r.harmonic_x12 / 12.0, rel_tol=0)
