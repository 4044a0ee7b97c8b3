"""Round-9 batch A: DGIM closed-form sliding-window sketch, 4-truss
fixpoint, integer-scaled Holt linear forecast, weighted TextRank."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _dgim_simulate(bits, n_window):
    """Step-by-step DGIM maintenance (Datar et al. 2002): newest-first
    bucket list of (size, right_ts); merge the two OLDEST of a size
    when a third appears.  Returns (exact, estimate) for the last
    ``n_window`` positions."""
    buckets = []  # newest first
    for t, b in enumerate(bits, 1):
        if not b:
            continue
        buckets.insert(0, (1, t))
        sz = 1
        while sum(1 for s, _ in buckets if s == sz) > 2:
            idxs = [i for i, (s, _) in enumerate(buckets) if s == sz]
            i1, i2 = idxs[-2], idxs[-1]
            buckets[i1] = (2 * sz, buckets[i1][1])  # keep NEWER right ts
            del buckets[i2]
            sz *= 2
    cutoff = len(bits) - n_window
    kept = [(s, ts) for s, ts in buckets if ts > cutoff]
    exact = sum(1 for t, b in enumerate(bits, 1) if b and t > cutoff)
    if not kept:
        return exact, 0.0
    est = sum(s for s, _ in kept) - kept[-1][0] / 2.0
    return exact, est


def test_dgim_closed_form_equals_stepwise_simulation(spark):
    """The query's closed-form bucket configuration must reproduce the
    sequential DGIM maintenance EXACTLY — estimate and exact count —
    for every event_type stream in the fixture."""
    out = {
        r.event_type: r
        for r in QUERIES["sketch_dgim_window_count"](spark, SF).collect()
    }
    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    streams: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r.event_type, r.ts, r.event_id)):
        streams.setdefault(r.event_type, []).append(r.value > 250.0)
    for et, bits in streams.items():
        if not any(bits):
            assert et not in out
            continue
        exact, est = _dgim_simulate(bits, 256)
        assert out[et].n_exact == exact, et
        assert math.isclose(out[et].dgim_est, est, rel_tol=0, abs_tol=0), et
        assert out[et].m_ones == sum(bits), et
        # DGIM guarantee: error < half the oldest kept bucket <= 50 %
        if exact:
            assert abs(est - exact) / exact <= 0.5, et


def test_ktruss_fixpoint_converges_and_flags_consistent(spark):
    rows = sorted(
        QUERIES["graph_ktruss_fixpoint"](spark, SF).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(7))
    counts = [r.n_edges for r in rows]
    # peeling only removes edges
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # the fixture must actually REACH the fixpoint inside the budget,
    # otherwise the curve is a truncation, not a fixpoint trace
    assert counts[5] == counts[6], "4-truss did not converge in 6 rounds"
    for r in rows:
        assert r.at_fixpoint == (1 if r.n_edges == counts[6] else 0)


def test_holt_forecast_matches_float_recurrence(spark):
    rows = QUERIES["w_holt_linear_forecast"](spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    ev = load_table(spark, SF, "events").collect()
    days: dict[str, dict] = {}
    for r in ev:
        d = days.setdefault(r.event_type, {})
        day = r.ts.date()
        d[day] = d.get(day, 0) + int(math.floor(r.value * 100))
    for et, got in by_type.items():
        series = [y for _, y in sorted(days[et].items())][-12:]
        lv, tr = float(series[0]), 0.0
        for y in series[1:]:
            prev = lv
            lv = 0.5 * y + 0.5 * (lv + tr)
            tr = 0.5 * (lv - prev) + 0.5 * tr
        got = sorted(got, key=lambda r: r.horizon_days)
        assert [g.horizon_days for g in got] == [1, 2, 3]
        for g in got:
            assert math.isclose(g.level, lv / 100.0, rel_tol=1e-9), et
            assert math.isclose(g.trend, tr / 100.0, rel_tol=1e-9), et
            assert math.isclose(
                g.forecast,
                (lv + g.horizon_days * tr) / 100.0,
                rel_tol=1e-9,
            ), et


def test_textrank_weighted_shape_and_order(spark):
    rows = sorted(
        QUERIES["text_textrank_weighted"](spark, SF).collect(),
        key=lambda r: r.pos,
    )
    assert [r.pos for r in rows] == list(range(1, 21))
    assert all(a.score >= b.score for a, b in zip(rows, rows[1:]))
    assert all(r.keyword == r.keyword.lower() for r in rows)
    # weighting must actually change SCORES vs the unweighted twin
    # (identical scores would mean the weights were silently dropped)
    unw = {
        r.keyword: r.score
        for r in QUERIES["text_textrank_keywords"](spark, SF).collect()
    }
    both = [r for r in rows if r.keyword in unw]
    assert both and any(
        not math.isclose(r.score, unw[r.keyword], rel_tol=1e-9) for r in both
    )
