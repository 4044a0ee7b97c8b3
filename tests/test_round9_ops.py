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


# --- batch B: classical stats ------------------------------------------------


def _arm_totals(spark):
    """Collected (arm, per-user total) pairs matching the md5 split."""
    import hashlib

    ev = load_table(spark, SF, "events").collect()
    tot: dict[int, int] = {}
    for r in ev:
        tot[r.user_id] = tot.get(r.user_id, 0) + int(math.floor(r.value))
    out = []
    for uid, x in tot.items():
        arm = int(hashlib.md5(f"arm:{uid}".encode()).hexdigest()[:2], 16) % 2
        out.append((arm, x))
    return out


def test_cliff_delta_matches_bruteforce(spark):
    r = QUERIES["a_cliff_delta"](spark, SF).collect()[0]
    pairs = _arm_totals(spark)
    xa = sorted(x for a, x in pairs if a == 0)
    xb = sorted(x for a, x in pairs if a == 1)
    gt = sum(1 for x in xa for y in xb if x > y)
    lt = sum(1 for x in xa for y in xb if x < y)
    ties = sum(1 for x in xa for y in xb if x == y)
    assert (r.n_a, r.n_b) == (len(xa), len(xb))
    assert (r.n_gt, r.n_lt, r.n_ties) == (gt, lt, ties)
    assert math.isclose(
        r.cliff_delta, (gt - lt) / (len(xa) * len(xb)), rel_tol=1e-12
    )
    assert -1.0 <= r.cliff_delta <= 1.0


def test_mood_median_matches_bruteforce(spark):
    r = QUERIES["a_mood_median"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    cents = sorted(int(math.floor(e.value * 100)) for e in ev)
    n = len(cents)
    med = cents[(n + 1) // 2 - 1]  # lower median
    assert math.isclose(r.grand_median, med / 100.0, rel_tol=1e-12)
    groups: dict[str, list] = {}
    for e in ev:
        groups.setdefault(e.event_type, []).append(
            int(math.floor(e.value * 100))
        )
    a_tot = sum(1 for e in ev if math.floor(e.value * 100) > med)
    chi2 = 0.0
    for vals in groups.values():
        ng, ag = len(vals), sum(1 for c in vals if c > med)
        ea, eb = ng * a_tot / n, ng * (n - a_tot) / n
        chi2 += (ag - ea) ** 2 / ea + ((ng - ag) - eb) ** 2 / eb
    assert r.n == n and r.k == len(groups) and r.n_above == a_tot
    assert math.isclose(r.chi2, chi2, rel_tol=1e-6)
    assert r.chi2 >= 0.0


def test_brown_forsythe_matches_bruteforce(spark):
    r = QUERIES["a_brown_forsythe"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    groups: dict[str, list] = {}
    for e in ev:
        groups.setdefault(e.event_type, []).append(
            int(math.floor(e.value * 100))
        )
    zs, ssb_parts, st_all, n = [], [], 0, 0
    for vals in groups.values():
        vs = sorted(vals)
        m = vs[(len(vs) + 1) // 2 - 1]
        z = [abs(c - m) for c in vals]
        zs.append(z)
        n += len(z)
    zbar = sum(sum(z) for z in zs) / n
    ssb = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs)
    ssw = sum(sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs)
    k = len(zs)
    f = (n - k) * ssb / ((k - 1) * ssw)
    assert r.n == n and r.k == k
    assert math.isclose(r.ssb, ssb / 1e4, rel_tol=1e-6)
    assert math.isclose(r.ssw, ssw / 1e4, rel_tol=1e-6)
    assert math.isclose(r.f_stat, f, rel_tol=1e-6)
    assert r.f_stat >= 0.0


def test_ansari_bradley_matches_bruteforce(spark):
    r = QUERIES["a_ansari_bradley"](spark, SF).collect()[0]
    pairs = _arm_totals(spark)
    allx = sorted(x for _, x in pairs)
    n = len(allx)
    # midrank score per value: average of min(r, N+1-r) over the tie block
    first = {}
    cnt = {}
    for i, x in enumerate(allx, 1):
        first.setdefault(x, i)
        cnt[x] = cnt.get(x, 0) + 1
    def score(x):
        p, t = first[x] - 1, cnt[x]
        return sum(min(rr, n + 1 - rr) for rr in range(p + 1, p + t + 1)) / t
    ab = sum(score(x) for a, x in pairs if a == 0)
    exp = sum(1 for a, _ in pairs if a == 0) * sum(
        min(rr, n + 1 - rr) for rr in range(1, n + 1)
    ) / n
    assert math.isclose(r.ab_stat, ab, abs_tol=1e-3)
    assert math.isclose(r.ab_expected, exp, rel_tol=1e-12)


def test_jonckheere_matches_bruteforce(spark):
    import numpy as np

    r = QUERIES["a_jonckheere_terpstra"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    groups: dict[str, list] = {}
    for e in ev:
        groups.setdefault(e.event_type, []).append(int(math.floor(e.value)))
    keys = sorted(groups)
    jt2 = 0
    for i, g in enumerate(keys):
        a = np.sort(np.array(groups[g]))
        for h in keys[i + 1 :]:
            b = np.array(groups[h])
            lt = int(np.searchsorted(a, b, side="left").sum())
            le = int(np.searchsorted(a, b, side="right").sum())
            jt2 += 2 * lt + (le - lt)
    n = sum(len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    assert r.n == n and r.k == len(keys)
    assert math.isclose(r.jt_stat, jt2 / 2.0, rel_tol=1e-12)
    assert math.isclose(r.jt_expected, (n * n - sn2) / 4.0, rel_tol=1e-12)


def test_bh_step_up_is_a_true_step_up(spark):
    rows = sorted(
        QUERIES["a_bh_step_up"](spark, SF).collect(), key=lambda r: r.rk
    )
    m = len(rows)
    assert {r.rk for r in rows} == set(range(1, m + 1))
    for r in rows:
        assert 0.0 < r.p_cheb <= 1.0
        assert math.isclose(r.bh_threshold, 0.1 * r.rk / m, rel_tol=1e-12)
    kmax = max((r.rk for r in rows if r.p_cheb <= r.bh_threshold), default=0)
    for r in rows:
        assert r.rejected == (1 if r.rk <= kmax else 0)
    # monotone p along ranks (sorted ascending)
    assert all(a.p_cheb <= b.p_cheb for a, b in zip(rows, rows[1:]))


# --- batch C: DTW, graph coefficients, VR, fences, burndown -------------------


def _daily_cents(spark):
    ev = load_table(spark, SF, "events").collect()
    days: dict[str, dict] = {}
    for r in ev:
        d = days.setdefault(r.event_type, {})
        day = r.ts.date()
        d[day] = d.get(day, 0) + int(math.floor(r.value * 100))
    return days


def test_dtw_matches_bruteforce_dp(spark):
    r = QUERIES["w_dtw_distance"](spark, SF).collect()[0]
    days = _daily_cents(spark)
    lo, hi = min(days), max(days)
    a = [y for _, y in sorted(days[lo].items())]
    b = [y for _, y in sorted(days[hi].items())]
    n, m = len(a), len(b)
    INF = float("inf")
    dp = [[INF] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1][j - 1], dp[i - 1][j], dp[i][j - 1]
            )
    assert (r.n_a_days, r.n_b_days) == (n, m)
    assert math.isclose(r.dtw, dp[n][m] / 100.0, rel_tol=1e-12)
    assert math.isclose(r.dtw_per_step, dp[n][m] / 100.0 / (n + m), rel_tol=1e-12)


def test_local_clustering_and_transitivity_consistent(spark):
    rows = QUERIES["graph_local_clustering"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.dg >= 2
        assert 0.0 <= r.lcc <= 1.0 + 1e-12
        assert math.isclose(
            r.lcc, 2 * r.n_tri / (r.dg * (r.dg - 1)), rel_tol=1e-12
        )
    t = QUERIES["graph_transitivity_ratio"](spark, SF).collect()[0]
    # transitivity = 3*triangles/wedges, and wedge count ties to degrees
    assert 0.0 <= t.transitivity <= 1.0 + 1e-12
    wedges = sum(r.dg * (r.dg - 1) // 2 for r in rows)  # deg<2 adds 0
    assert t.n_wedges == wedges
    # each triangle credits 3 nodes once in the per-node table
    assert sum(r.n_tri for r in rows) == 3 * t.n_tri


def test_variance_ratio_matches_bruteforce(spark):
    r = QUERIES["w_variance_ratio"](spark, SF).collect()[0]
    days: dict = {}
    ev = load_table(spark, SF, "events").collect()
    for e in ev:
        day = e.ts.date()
        days[day] = days.get(day, 0) + int(math.floor(e.value * 100))
    ys = [y for _, y in sorted(days.items())]
    dy = [b - a for a, b in zip(ys, ys[1:])]
    blocks = [
        sum(dy[i : i + 5]) for i in range(0, len(dy) - len(dy) % 5, 5)
    ]
    var1 = sum(x * x for x in dy) / len(dy) - (sum(dy) / len(dy)) ** 2
    var5 = sum(x * x for x in blocks) / len(blocks) - (
        sum(blocks) / len(blocks)
    ) ** 2
    assert r.n_diffs == len(dy) and r.n_blocks == len(blocks)
    # The round-10 ADVICE rewrite floor-scales each dy^2 / s5^2 term
    # to int64 (1e4 quantum) before summing, so the unquantized float
    # replay here agrees only up to the quantization envelope
    # n*1e4 / Sigma(dy^2); the BITWISE check against the quantized
    # definition lives in tests/test_round10_ops.py.
    q_rel = (len(dy) * 1e4) / sum(float(x) * float(x) for x in dy)
    assert math.isclose(r.vr_5, var5 / (5 * var1), rel_tol=4 * q_rel)


def test_tukey_fences_matches_bruteforce(spark):
    r = QUERIES["a_tukey_fences"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    cs = sorted(int(math.floor(e.value * 100)) for e in ev)
    n = len(cs)
    q1 = cs[(n + 3) // 4 - 1]
    q3 = cs[(3 * n + 3) // 4 - 1]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert r.n == n
    assert math.isclose(r.q1, q1 / 100.0, rel_tol=1e-12)
    assert math.isclose(r.q3, q3 / 100.0, rel_tol=1e-12)
    assert r.n_low_outliers == sum(1 for c in cs if c < lo)
    assert r.n_high_outliers == sum(1 for c in cs if c > hi)


def test_error_budget_burndown_cumulative(spark):
    rows = sorted(
        QUERIES["ops_error_budget_burndown"](spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert rows
    cum = 0
    budget = rows[0].budget
    for r in rows:
        cum += r.n_err
        assert r.cum_err == cum
        assert r.budget == budget  # one fixed budget for the window
        assert r.budget_remaining == budget - cum
        assert r.exhausted == (1 if cum > budget else 0)
    # bounded by the calendar
    assert len(rows) <= 31


# --- batch D: signed rank, PACF, MCC, vocab growth, R/S, projection ----------


def test_wilcoxon_signed_rank_matches_bruteforce(spark):
    r = QUERIES["a_wilcoxon_signed_rank"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    halves: dict[int, list] = {}
    for e in ev:
        h = halves.setdefault(e.user_id, [0, 0])
        h[0 if e.ts.day <= 15 else 1] += int(math.floor(e.value))
    ds = [b - a for a, b in halves.values() if b != a]
    n = len(ds)
    ranked = sorted(ds, key=abs)
    # midranks over |d|
    from collections import Counter

    cnt = Counter(abs(d) for d in ds)
    first = {}
    pos = 1
    for ad in sorted(cnt):
        first[ad] = pos
        pos += cnt[ad]
    w_plus = sum(
        first[abs(d)] + (cnt[abs(d)] - 1) / 2.0 for d in ds if d > 0
    )
    assert r.n == n
    assert math.isclose(r.w_plus, w_plus, rel_tol=1e-12)
    assert math.isclose(r.w_expected, n * (n + 1) / 4.0, rel_tol=1e-12)


def test_pacf_lag2_consistent_with_acf(spark):
    pac = {
        r.event_type: r for r in QUERIES["w_pacf_lag2"](spark, SF).collect()
    }
    acf = {
        (r.event_type, r.lag): r.acf
        for r in QUERIES["w_autocorrelation"](spark, SF).collect()
    }
    assert pac
    for et, r in pac.items():
        r1, r2 = acf[(et, 1)], acf[(et, 2)]
        assert math.isclose(r.phi11, r1, rel_tol=1e-12), et
        assert math.isclose(r.r2, r2, rel_tol=1e-12), et
        assert math.isclose(
            r.phi22, (r2 - r1 * r1) / (1.0 - r1 * r1), rel_tol=1e-12
        ), et
        assert -1.0 - 1e-9 <= r.phi22 <= 1.0 + 1e-9, et


def test_matthews_corr_consistent_with_confusion(spark):
    m = QUERIES["ml_matthews_corr"](spark, SF).collect()[0]
    c = QUERIES["ml_confusion_metrics"](spark, SF).collect()[0]
    assert (m.tp, m.fp, m.fn, m.tn) == (c.tp, c.fp, c.fn, c.tn)
    denom = math.sqrt(
        (m.tp + m.fp) * (m.tp + m.fn) * (m.tn + m.fp) * (m.tn + m.fn)
    )
    assert math.isclose(m.mcc, (m.tp * m.tn - m.fp * m.fn) / denom, rel_tol=1e-12)
    assert -1.0 <= m.mcc <= 1.0


def test_vocab_growth_monotone_and_exact_at_ends(spark):
    rows = sorted(
        QUERIES["corpus_vocab_growth"](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs >= a.n_docs
        assert b.n_tokens >= a.n_tokens
        assert b.vocab >= a.vocab  # vocabulary never shrinks
    docs = load_table(spark, SF, "documents").collect()
    vocab_full = set()
    n_tok = 0
    for d in docs:
        toks = [t.lower() for t in d.text.split()]
        vocab_full.update(toks)
        n_tok += len(toks)
    assert rows[-1].n_docs == len(docs)
    assert rows[-1].n_tokens == n_tok
    assert rows[-1].vocab == len(vocab_full)
    assert math.isclose(
        rows[-1].type_token_ratio, len(vocab_full) / n_tok, rel_tol=1e-12
    )


def test_rescaled_range_matches_bruteforce(spark):
    rows = {
        r.window_size: r
        for r in QUERIES["w_rescaled_range"](spark, SF).collect()
    }
    days: dict = {}
    ev = load_table(spark, SF, "events").collect()
    for e in ev:
        day = e.ts.date()
        days[day] = days.get(day, 0) + int(math.floor(e.value * 100))
    ys = [y for _, y in sorted(days.items())]
    for w in (4, 8, 16):
        vals = []
        for b0 in range(0, len(ys) - len(ys) % w, w):
            blk = ys[b0 : b0 + w]
            mu = sum(blk) / w
            cum, cds = 0.0, []
            for y in blk:
                cum += y - mu
                cds.append(cum)
            var = sum((y - mu) ** 2 for y in blk) / w
            if var > 0:
                # classic R/S: range of mean-centered cumulatives / pop std;
                # the query's (max-min of w*cumdev)/sqrt(w*S2-Sb^2) equals it
                vals.append((max(cds) - min(cds)) / math.sqrt(var))
        exp = sum(vals) / len(vals)
        got = rows[w]
        assert got.n_blocks == len(vals)
        assert math.isclose(got.rs_mean, exp, abs_tol=1e-4), w


def test_bipartite_projection_matches_bruteforce(spark):
    rows = QUERIES["graph_bipartite_projection"](spark, SF).collect()
    ev = load_table(spark, SF, "events").collect()
    ut = {(e.user_id, e.event_type) for e in ev}
    types: dict[str, set] = {}
    for u, t in ut:
        types.setdefault(t, set()).add(u)
    keys = sorted(types)
    exp = {}
    for i, t1 in enumerate(keys):
        for t2 in keys[i + 1 :]:
            c = len(types[t1] & types[t2])
            if c:
                exp[(t1, t2)] = c
    got = {(r.t1, r.t2): r for r in rows}
    assert set(got) == set(exp)
    for k, r in got.items():
        assert r.n_common == exp[k]
        assert r.n_t1 == len(types[k[0]]) and r.n_t2 == len(types[k[1]])
        assert math.isclose(
            r.overlap_coef, exp[k] / min(r.n_t1, r.n_t2), rel_tol=1e-12
        )


# --- wave 2: Theil U2, gamma/Somers, Yule K, crossings, kappa, CvM -----------


def test_theil_u2_matches_bruteforce(spark):
    r = QUERIES["w_theil_u2"](spark, SF).collect()[0]
    days: dict = {}
    for e in load_table(spark, SF, "events").collect():
        day = e.ts.date()
        days[day] = days.get(day, 0) + int(math.floor(e.value * 100))
    ys = [y for _, y in sorted(days.items())]
    sse_s = sum((ys[t] - ys[t - 7]) ** 2 for t in range(7, len(ys)))
    sse_n = sum((ys[t] - ys[t - 1]) ** 2 for t in range(7, len(ys)))
    assert r.n_scored_days == len(ys) - 7
    assert math.isclose(r.u2, math.sqrt(sse_s) / math.sqrt(sse_n), rel_tol=1e-12)
    assert r.u2 > 0


def test_gamma_somers_matches_bruteforce(spark):
    r = QUERIES["a_gamma_somers"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    cs = sorted(int(math.floor(e.value * 100)) for e in ev)
    n = len(cs)
    c1, c2 = cs[(n + 2) // 3 - 1], cs[(2 * n + 2) // 3 - 1]
    obs = []
    for e in ev:
        dow = e.ts.isoweekday() % 7 + 1  # Spark dayofweek: 1=Sunday
        c = int(math.floor(e.value * 100))
        yv = 0 if c <= c1 else (1 if c <= c2 else 2)
        obs.append((dow, yv))
    from collections import Counter

    cells = Counter(obs)
    conc = disc = tiey = 0
    for (x1, y1), n1 in cells.items():
        for (x2, y2), n2 in cells.items():
            if x2 > x1:
                if y2 > y1:
                    conc += n1 * n2
                elif y2 < y1:
                    disc += n1 * n2
                else:
                    tiey += n1 * n2
    assert (r.n_concordant, r.n_discordant, r.n_tied_y) == (conc, disc, tiey)
    assert math.isclose(r.gk_gamma, (conc - disc) / (conc + disc), rel_tol=1e-12)
    assert math.isclose(
        r.somers_dyx, (conc - disc) / (conc + disc + tiey), rel_tol=1e-12
    )


def test_yule_k_matches_bruteforce(spark):
    r = QUERIES["text_yule_k"](spark, SF).collect()[0]
    from collections import Counter

    docs = load_table(spark, SF, "documents").collect()
    tf = Counter(t.lower() for d in docs for t in d.text.split())
    n = sum(tf.values())
    v = len(tf)
    s2 = sum(m * m for m in tf.values())
    assert (r.n_tokens, r.n_types) == (n, v)
    assert math.isclose(r.yule_k, 1e4 * (s2 - n) / (n * n), rel_tol=1e-12)
    assert math.isclose(r.guiraud_r, v / math.sqrt(n), rel_tol=1e-12)


def test_mean_crossings_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["w_mean_crossings"](spark, SF).collect()
    }
    days = _daily_cents(spark)
    for et, dd in days.items():
        ys = [y for _, y in sorted(dd.items())]
        n, s = len(ys), sum(ys)
        devs = [n * y - s for y in ys]
        crossings = sum(
            1 for a, b in zip(devs, devs[1:]) if a * b < 0
        )
        assert rows[et].n_days == n, et
        assert rows[et].n_crossings == crossings, et
        assert math.isclose(
            rows[et].crossing_rate, crossings / (n - 1), rel_tol=1e-12
        ), et


def test_cohens_kappa_matches_bruteforce(spark):
    r = QUERIES["ml_cohens_kappa"](spark, SF).collect()[0]
    emb = load_table(spark, SF, "embeddings").collect()
    sc = [
        sum(int(math.floor(float(v) * float(v) * 1000000)) for v in e.embedding)
        for e in emb
    ]
    tot, n = sum(sc), len(sc)
    ra = [1 if s * n > tot else 0 for s in sc]
    rb = [1 if float(e.embedding[0]) > 0.0 else 0 for e in emb]
    agree = sum(1 for a, b in zip(ra, rb) if a == b)
    a1, b1 = sum(ra), sum(rb)
    pe2 = a1 * b1 + (n - a1) * (n - b1)
    assert (r.n, r.agree, r.n_pos_a, r.n_pos_b) == (n, agree, a1, b1)
    assert math.isclose(r.kappa, (n * agree - pe2) / (n * n - pe2), rel_tol=1e-12)
    assert -1.0 <= r.kappa <= 1.0


def test_cramer_von_mises_matches_bruteforce(spark):
    r = QUERIES["a_cramer_von_mises"](spark, SF).collect()[0]
    pairs = _arm_totals(spark)
    xa = sorted(x for a, x in pairs if a == 0)
    xb = sorted(x for a, x in pairs if a == 1)
    na, nb = len(xa), len(xb)
    pooled = sorted(xa + xb)
    import bisect

    t_sum = 0.0
    for x in pooled:
        fa = bisect.bisect_right(xa, x) / na
        fb = bisect.bisect_right(xb, x) / nb
        t_sum += (fa - fb) ** 2
    exp = na * nb / (na + nb) ** 2 * t_sum
    assert (r.n_a, r.n_b) == (na, nb)
    assert math.isclose(r.cvm_t, exp, rel_tol=1e-9)
    assert r.cvm_t >= 0.0


# --- wave 3: b-bit minhash, banded DTW, Apdex ---------------------------------


def test_bbit_minhash_estimator_properties(spark):
    rows = QUERIES["dedup_bbit_minhash_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bit_agree <= 16
        assert math.isclose(
            r.est_jaccard_1bit, 2 * (r.n_bit_agree / 16) - 1, rel_tol=1e-12
        )
        assert 0.0 <= r.exact_jaccard <= 1.0
        # slot agreement implies bit agreement: bits from equal slots
        # always match, so n_bit_agree >= 16*est_jaccard_full
        assert r.n_bit_agree >= round(r.est_jaccard_full * 16)
    # exact duplicates (planted) must estimate 1.0 under BOTH schemes
    exact_pairs = [r for r in rows if r.exact_jaccard == 1.0]
    assert exact_pairs
    for r in exact_pairs:
        assert r.n_bit_agree == 16 and r.est_jaccard_1bit == 1.0


def test_banded_dtw_dominates_full_dtw(spark):
    full = QUERIES["w_dtw_distance"](spark, SF).collect()[0]
    band = QUERIES["w_dtw_banded"](spark, SF).collect()[0]
    assert (band.n_a_days, band.n_b_days) == (full.n_a_days, full.n_b_days)
    assert band.band_width == 8
    # constraining the warping path can only increase the distance
    assert band.dtw_banded >= full.dtw - 1e-9
    # with |n-m| <= band width the banded path is feasible -> finite
    assert band.dtw_banded < (1 << 50) / 100.0


def test_apdex_matches_bruteforce(spark):
    rows = {
        r.event_type: r for r in QUERIES["ops_apdex_score"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").collect()
    agg: dict[str, list] = {}
    for e in ev:
        a = agg.setdefault(e.event_type, [0, 0, 0])
        a[0] += 1
        if e.value <= 100.0:
            a[1] += 1
        elif e.value <= 400.0:
            a[2] += 1
    for et, (n, sat, tol) in agg.items():
        r = rows[et]
        assert (r.n, r.n_satisfied, r.n_tolerating) == (n, sat, tol)
        assert r.n_frustrated == n - sat - tol
        assert math.isclose(r.apdex, (sat + tol / 2) / n, rel_tol=1e-12)
        assert 0.0 <= r.apdex <= 1.0


# -- streaming twin ------------------------------------------------------------


def test_error_budget_stream_matches_batch_day_layer(spark, tmp_path):
    """The streaming per-day (n_ev, n_err) layer must equal the batch
    burndown's day columns exactly once all input is processed, and
    the batch budget math over the streamed sink must reproduce
    ops_error_budget_burndown row-for-row."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.streaming import incremental as stream

    ev = load_table(spark, SF, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    src_dir = str(tmp_path / "events_stream")
    src.write.mode("overwrite").parquet(src_dir)
    stream_df = stream.stream_inventory(
        spark, src_dir, src.schema, fmt="parquet"
    )
    agg = stream.error_budget_stream(
        stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("err_budget")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.day: (r.n_ev, r.n_err)
            for r in spark.sql("select * from err_budget").collect()
        }
    finally:
        q.stop()
    batch_rows = QUERIES["ops_error_budget_burndown"](spark, SF).collect()
    batch = {r.day: (r.cum_ev, r.n_err) for r in batch_rows}
    # per-day error counts agree
    assert {d: e for d, (_, e) in batch.items()} == {
        d: e for d, (_, e) in got.items()
    }
    # the batch burndown recomputed over the streamed sink is identical
    n_total = sum(n for n, _ in got.values())
    budget = int(math.floor(n_total * 0.002))
    cum = 0
    for r in sorted(batch_rows, key=lambda r: r.day):
        cum += got[r.day][1]
        assert r.cum_err == cum
        assert r.budget == budget
        assert r.exhausted == (1 if cum > budget else 0)


# --- wave 4: Mann-Kendall, Durbin-Watson, up/down runs, median polish ---------


def _day_series(spark):
    days: dict = {}
    for e in load_table(spark, SF, "events").collect():
        day = e.ts.date()
        days[day] = days.get(day, 0) + int(math.floor(e.value * 100))
    return [y for _, y in sorted(days.items())]


def test_mann_kendall_matches_bruteforce(spark):
    r = QUERIES["a_mann_kendall"](spark, SF).collect()[0]
    ys = _day_series(spark)
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else (-1 if ys[j] < ys[i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(ys)
    tie_adj = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    assert r.n == n and r.s_stat == s
    assert math.isclose(r.var_s, var_s, rel_tol=1e-12)
    assert math.isclose(r.z_mk, (s - cc) / math.sqrt(var_s), rel_tol=1e-12)
    assert math.isclose(r.kendall_tau_a, s / (n * (n - 1) / 2), rel_tol=1e-12)


def test_durbin_watson_matches_bruteforce(spark):
    r = QUERIES["a_durbin_watson"](spark, SF).collect()[0]
    ys = _day_series(spark)
    n = len(ys)
    xs = list(range(1, n + 1))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [y - (a + b * x) for x, y in zip(xs, ys)]
    dw = sum((e2 - e1) ** 2 for e1, e2 in zip(e, e[1:])) / sum(
        x * x for x in e
    )
    assert r.n_days == n
    # the query floor-scales both sums at x100 — tolerance covers it
    assert math.isclose(r.dw, dw, rel_tol=1e-6)
    assert 0.0 <= r.dw <= 4.0


def test_runs_up_down_matches_bruteforce(spark):
    r = QUERIES["w_runs_up_down"](spark, SF).collect()[0]
    ys = _day_series(spark)
    mv = [
        (1 if b > a else -1)
        for a, b in zip(ys, ys[1:])
        if b != a
    ]
    m = len(mv)
    runs = 1 + sum(1 for a, b in zip(mv, mv[1:]) if a != b)
    assert (r.n_moves, r.n_up, r.n_down) == (
        m,
        sum(1 for x in mv if x == 1),
        sum(1 for x in mv if x == -1),
    )
    assert r.n_runs == runs
    assert math.isclose(r.runs_expected, (2 * m + 1) / 3, rel_tol=1e-12)
    assert math.isclose(
        r.z_runs,
        (runs - (2 * m + 1) / 3) / math.sqrt((16 * m - 13) / 90),
        rel_tol=1e-12,
    )


def test_median_polish_matches_bruteforce(spark):
    rows = QUERIES["a_median_polish"](spark, SF).collect()
    ev = load_table(spark, SF, "events").collect()
    cells: dict = {}
    for e in ev:
        dow = e.ts.isoweekday() % 7 + 1
        key = (e.event_type, dow)
        cells[key] = cells.get(key, 0) + int(math.floor(e.value * 100))

    def lower_median(vals):
        vs = sorted(vals)
        return vs[(len(vs) + 1) // 2 - 1]

    rts = sorted({r for r, _ in cells})
    cls = sorted({c for _, c in cells})
    re = {r: lower_median([cells[(r, c)] for c in cls if (r, c) in cells]) for r in rts}
    s1 = {k: v - re[k[0]] for k, v in cells.items()}
    ce = {c: lower_median([s1[(r, c)] for r in rts if (r, c) in s1]) for c in cls}
    got = {(r.event_type, r.dow): r for r in rows}
    assert set(got) == set(cells)
    for k, r in got.items():
        assert math.isclose(r.row_effect, re[k[0]] / 100, rel_tol=1e-12), k
        assert math.isclose(r.col_effect, ce[k[1]] / 100, rel_tol=1e-12), k
        assert math.isclose(
            r.residual, (s1[k] - ce[k[1]]) / 100, rel_tol=1e-12
        ), k
    # decomposition identity: value = row + col + residual (per cell)
    for k, r in got.items():
        assert math.isclose(
            r.row_effect + r.col_effect + r.residual,
            cells[k] / 100,
            rel_tol=1e-9,
        ), k


# --- wave 5: sampling, robust stats, Ichimoku, container dispatch ------------


def test_systematic_sample_bounds_and_means(spark):
    r = QUERIES["o9_systematic_sample"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    tot: dict[int, int] = {}
    for e in ev:
        tot[e.user_id] = tot.get(e.user_id, 0) + int(math.floor(e.value))
    uids = sorted(tot)
    sample = [tot[u] for i, u in enumerate(uids, 1) if i % 10 == 3]
    assert r.n_pop == len(uids)
    assert r.n_sample == len(sample)
    assert r.expected_lo <= r.n_sample <= r.expected_hi
    assert math.isclose(r.pop_mean, sum(tot.values()) / len(uids), rel_tol=1e-12)
    assert math.isclose(r.sample_mean, sum(sample) / len(sample), rel_tol=1e-12)


def test_trimmed_mean_matches_bruteforce(spark):
    r = QUERIES["a_trimmed_mean"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    cs = sorted(int(math.floor(e.value * 100)) for e in ev)
    n = len(cs)
    k = n // 10
    mid = cs[k : n - k]
    assert (r.n, r.k, r.n_kept) == (n, k, n - 2 * k)
    assert math.isclose(r.trimmed_mean, sum(mid) / len(mid) / 100, rel_tol=1e-12)
    assert math.isclose(r.raw_mean, sum(cs) / n / 100, rel_tol=1e-12)


def test_bowley_skew_matches_bruteforce(spark):
    r = QUERIES["a_bowley_skew"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    cs = sorted(int(math.floor(e.value * 100)) for e in ev)
    n = len(cs)
    q1, q2, q3 = (
        cs[(n + 3) // 4 - 1],
        cs[(n + 1) // 2 - 1],
        cs[(3 * n + 3) // 4 - 1],
    )
    assert math.isclose(r.q1, q1 / 100, rel_tol=1e-12)
    assert math.isclose(r.median, q2 / 100, rel_tol=1e-12)
    assert math.isclose(r.q3, q3 / 100, rel_tol=1e-12)
    assert math.isclose(
        r.bowley_skew, (q1 + q3 - 2 * q2) / (q3 - q1), rel_tol=1e-12
    )
    assert -1.0 <= r.bowley_skew <= 1.0


def test_ichimoku_lines_match_bruteforce(spark):
    rows = QUERIES["w_ichimoku_lines"](spark, SF).collect()
    assert rows
    # recompute for one event_type end-to-end
    et = rows[0].event_type
    got = {r.day: r for r in rows if r.event_type == et}
    bars: dict = {}
    for e in load_table(spark, SF, "events").collect():
        if e.event_type != et:
            continue
        day = e.ts.date()
        bars[day] = bars.get(day, 0) + int(math.floor(e.value * 100))
    days = sorted(bars)
    ps = [bars[d] for d in days]
    for i, d in enumerate(days):
        if i < 14:
            assert d not in got
            continue
        w5 = ps[i - 4 : i + 1]
        w15 = ps[i - 14 : i + 1]
        tenkan = (max(w5) + min(w5)) / 2 / 100
        kijun = (max(w15) + min(w15)) / 2 / 100
        assert math.isclose(got[d].tenkan, tenkan, rel_tol=1e-12), d
        assert math.isclose(got[d].kijun, kijun, rel_tol=1e-12), d
        assert got[d].bullish == (1 if tenkan > kijun else 0), d


def test_container_stats_consistent(spark):
    rows = QUERIES["multimodal_container_stats"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_payloads > 0
        assert r.min_bytes <= r.max_bytes
        assert r.min_bytes * r.n_payloads <= r.total_bytes
        assert r.total_bytes <= r.max_bytes * r.n_payloads
        assert math.isclose(
            r.mean_bytes, r.total_bytes / r.n_payloads, rel_tol=1e-12
        )
        assert r.container in {"digit_or_symbol", "upper", "lower", "high_byte"}


# --- wave 6: Kaplan-Meier, l-diversity ----------------------------------------


def test_kaplan_meier_matches_bruteforce(spark):
    rows = sorted(
        QUERIES["w_kaplan_meier"](spark, SF).collect(), key=lambda r: r.t_days
    )
    assert rows
    ev = load_table(spark, SF, "events").collect()
    users: dict = {}
    for e in ev:
        u = users.setdefault(e.user_id, {"d0": None, "dl": None, "dp": None})
        day = e.ts.date()
        u["d0"] = day if u["d0"] is None else min(u["d0"], day)
        u["dl"] = day if u["dl"] is None else max(u["dl"], day)
        if e.event_type == "purchase":
            u["dp"] = day if u["dp"] is None else min(u["dp"], day)
    durs = []
    for u in users.values():
        if u["dp"] is not None:
            durs.append(((u["dp"] - u["d0"]).days, 1))  # event
        else:
            durs.append(((u["dl"] - u["d0"]).days, 0))  # censored
    s = 1.0
    exp = []
    for t in sorted({t for t, e in durs if e == 1}):
        n_risk = sum(1 for d, _ in durs if d >= t)
        d = sum(1 for dd, e in durs if dd == t and e == 1)
        s *= 1 - d / n_risk
        exp.append((t, n_risk, d, s))
    got = [(r.t_days, r.n_risk, r.n_events, r.s_km) for r in rows]
    assert len(got) == len(exp)
    for (gt, gn, gd, gs), (et, en, ed, es) in zip(got, exp):
        assert (gt, gn, gd) == (et, en, ed)
        assert math.isclose(gs, es, rel_tol=1e-12)
    # survival curve is non-increasing and within (0, 1]
    assert all(a.s_km >= b.s_km for a, b in zip(rows, rows[1:]))
    # S reaches exactly 0 when the last at-risk user converts
    assert all(0.0 <= r.s_km <= 1.0 for r in rows)


def test_l_diversity_buckets_consistent(spark):
    rows = QUERIES["a_l_diversity"](spark, SF).collect()
    assert rows
    cust = load_table(spark, SF, "customer").collect()
    groups: dict = {}
    for c in cust:
        key = (c.c_nationkey, c.c_mktsegment, int(math.floor(c.c_acctbal / 1000)))
        groups.setdefault(key, set()).add(c.c_custkey % 7)
    from collections import Counter

    sizes: dict = {}
    for c in cust:
        key = (c.c_nationkey, c.c_mktsegment, int(math.floor(c.c_acctbal / 1000)))
        sizes[key] = sizes.get(key, 0) + 1
    buckets = Counter()
    recs = Counter()
    for key, sens in groups.items():
        l = len(sens)
        b = "l=1" if l == 1 else ("l=2" if l < 3 else ("l=3-4" if l < 5 else "l>=5"))
        buckets[b] += 1
        recs[b] += sizes[key]
    got = {r.l_bucket: (r.n_groups, r.n_records) for r in rows}
    assert got == {b: (buckets[b], recs[b]) for b in buckets}
    n = len(cust)
    for r in rows:
        assert math.isclose(r.pct_records, r.n_records * 100 / n, rel_tol=1e-12)


# --- wave 7: sentence dedup, negbin overdispersion ----------------------------


def test_sentence_dedup_matches_bruteforce(spark):
    import re
    from collections import Counter

    r = QUERIES["text_sentence_dedup"](spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").collect()
    per_doc: dict[int, list] = {}
    for d in docs:
        sents = [
            s.strip() for s in re.split(r"[.!?]", d.text) if len(s.strip()) >= 20
        ]
        if sents:
            per_doc[d.doc_id] = sents
    ndocs_per_sent = Counter()
    for did, sents in per_doc.items():
        for s in set(sents):
            ndocs_per_sent[s] += 1
    n_sent = sum(len(s) for s in per_doc.values())
    n_dup = sum(
        1 for sents in per_doc.values() for s in sents if ndocs_per_sent[s] > 1
    )
    n_major = sum(
        1
        for sents in per_doc.values()
        if 2 * sum(1 for s in sents if ndocs_per_sent[s] > 1) > len(sents)
    )
    assert r.n_docs == len(per_doc)
    assert r.n_sentences == n_sent
    assert r.n_cross_doc_dup == n_dup
    assert r.n_docs_majority_dup == n_major
    assert math.isclose(r.dup_sentence_rate, n_dup / n_sent, rel_tol=1e-12)


def test_negbin_overdispersion_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["a_negbin_overdispersion"](spark, SF).collect()
    }
    days = {}
    for e in load_table(spark, SF, "events").collect():
        key = (e.event_type, e.ts.date())
        days[key] = days.get(key, 0) + 1
    per_type: dict[str, list] = {}
    for (et, _), n in days.items():
        per_type.setdefault(et, []).append(n)
    for et, ns in per_type.items():
        r = rows[et]
        nd = len(ns)
        mean = sum(ns) / nd
        var = sum(x * x for x in ns) / nd - mean * mean
        assert r.n_days == nd
        assert math.isclose(r.mean_daily, mean, rel_tol=1e-9), et
        assert math.isclose(r.var_daily, var, rel_tol=1e-9), et
        assert math.isclose(r.dispersion_index, var / mean, rel_tol=1e-9), et
        if var > mean:
            assert math.isclose(
                r.negbin_r, mean * mean / (var - mean), rel_tol=1e-9
            ), et
        else:
            assert r.negbin_r is None, et


# --- wave 8: log-rank, Nelson-Aalen, Cochran-Armitage -------------------------


def _survival_durs(spark, with_arm=False):
    import hashlib

    users: dict = {}
    for e in load_table(spark, SF, "events").collect():
        u = users.setdefault(e.user_id, {"d0": None, "dl": None, "dp": None})
        day = e.ts.date()
        u["d0"] = day if u["d0"] is None else min(u["d0"], day)
        u["dl"] = day if u["dl"] is None else max(u["dl"], day)
        if e.event_type == "purchase":
            u["dp"] = day if u["dp"] is None else min(u["dp"], day)
    out = []
    for uid, u in users.items():
        dur = ((u["dp"] or u["dl"]) - u["d0"]).days
        event = 1 if u["dp"] is not None else 0
        arm = int(hashlib.md5(f"arm:{uid}".encode()).hexdigest()[:2], 16) % 2
        out.append((arm, dur, event) if with_arm else (dur, event))
    return out


def test_log_rank_matches_bruteforce(spark):
    r = QUERIES["a_log_rank_test"](spark, SF).collect()[0]
    durs = _survival_durs(spark, with_arm=True)
    times = sorted({d for _, d, e in durs if e})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for a, d, _ in durs if a == 0 and d >= t)
        n = sum(1 for _, d, _ in durs if d >= t)
        d1 = sum(1 for a, d, e in durs if a == 0 and d == t and e)
        dt = sum(1 for _, d, e in durs if d == t and e)
        o1 += d1
        e1 += dt * n1 / n
        if n > 1:
            v += dt * (n1 / n) * ((n - n1) / n) * ((n - dt) / (n - 1))
    assert r.n_event_times == len(times)
    assert r.observed_a == o1
    assert math.isclose(r.expected_a, e1, abs_tol=1e-6)
    assert math.isclose(r.z_logrank, (o1 - e1) / math.sqrt(v), rel_tol=1e-6)


def test_nelson_aalen_matches_km_family(spark):
    na = sorted(
        QUERIES["w_nelson_aalen"](spark, SF).collect(), key=lambda r: r.t_days
    )
    km = sorted(
        QUERIES["w_kaplan_meier"](spark, SF).collect(), key=lambda r: r.t_days
    )
    # same event times, at-risk counts, and event counts as KM
    assert [(r.t_days, r.n_risk, r.n_events) for r in na] == [
        (r.t_days, r.n_risk, r.n_events) for r in km
    ]
    # H is nondecreasing, and exp(-H) >= S always (standard inequality)
    assert all(a.cum_hazard <= b.cum_hazard for a, b in zip(na, na[1:]))
    h = 0.0
    for r in na:
        h += r.n_events / r.n_risk
        assert math.isclose(r.cum_hazard, h, abs_tol=1e-6)
    for rn, rk_ in zip(na, km):
        assert math.exp(-rn.cum_hazard) >= rk_.s_km - 1e-9


def test_cochran_armitage_matches_bruteforce(spark):
    r = QUERIES["a_cochran_armitage"](spark, SF).collect()[0]
    cells: dict[int, list] = {}
    for e in load_table(spark, SF, "events").collect():
        s = e.ts.isoweekday() % 7 + 1
        c = cells.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += 1 if e.event_type == "purchase" else 0
    n = sum(c[0] for c in cells.values())
    d = sum(c[1] for c in cells.values())
    sd = sum(s * c[1] for s, c in cells.items())
    sn = sum(s * c[0] for s, c in cells.items())
    ssn = sum(s * s * c[0] for s, c in cells.items())
    p = d / n
    z = (sd - d * sn / n) / math.sqrt(p * (1 - p) * (ssn - sn * sn / n))
    assert (r.n_groups, r.n, r.n_conversions) == (len(cells), n, d)
    assert math.isclose(r.z_trend, z, rel_tol=1e-9)


# --- wave 9: ANN metric agreement, Fleiss kappa -------------------------------


def test_ann_metric_agreement_matches_bruteforce(spark):
    import numpy as np

    rows = {
        r.query_id: r
        for r in QUERIES["ann_metric_agreement"](spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").collect()
    vecs = {e.vec_id: np.asarray(e.embedding, dtype=np.float64) for e in emb}
    SCALE = 1e12
    for qid in [i for i in vecs if i < 10]:
        qv = vecs[qid]
        cos_scores, euc_scores = [], []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            dot = np.floor(qv * cv * SCALE).astype(np.int64).sum() / SCALE
            nq = math.sqrt(
                np.floor(qv * qv * SCALE).astype(np.int64).sum() / SCALE
            )
            nc = math.sqrt(
                np.floor(cv * cv * SCALE).astype(np.int64).sum() / SCALE
            )
            cos_scores.append((-dot / (nq * nc), cid))
            d2 = int(
                np.floor((qv - cv) * (qv - cv) * SCALE).astype(np.int64).sum()
            )
            euc_scores.append((d2, cid))
        top_c = {c for _, c in sorted(cos_scores)[:5]}
        top_e = {c for _, c in sorted(euc_scores)[:5]}
        r = rows[qid]
        assert r.n_overlap == len(top_c & top_e), qid
        assert math.isclose(r.agreement_at_5, r.n_overlap / 5.0, rel_tol=1e-12)
    assert len(rows) == 10


def test_fleiss_kappa_matches_bruteforce(spark):
    r = QUERIES["a_fleiss_kappa"](spark, SF).collect()[0]
    emb = load_table(spark, SF, "embeddings").collect()
    sc = [
        sum(int(math.floor(float(v) * float(v) * 1000000)) for v in e.embedding)
        for e in emb
    ]
    tot, n = sum(sc), len(sc)
    n1s = []
    for e, s in zip(emb, sc):
        r1 = 1 if s * n > tot else 0
        r2 = 1 if float(e.embedding[0]) > 0 else 0
        r3 = 1 if float(e.embedding[1]) > 0 else 0
        n1s.append(r1 + r2 + r3)
    pbar = sum(k * k + (3 - k) * (3 - k) - 3 for k in n1s) / (6 * n)
    p1 = sum(n1s) / (3 * n)
    pe = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (pbar - pe) / (1 - pe)
    assert r.n_subjects == n and r.n_positive_ratings == sum(n1s)
    assert math.isclose(r.p_bar, pbar, rel_tol=1e-12)
    assert math.isclose(r.p_e, pe, rel_tol=1e-12)
    assert math.isclose(r.fleiss_kappa, kappa, rel_tol=1e-12)
    assert -1.0 <= r.fleiss_kappa <= 1.0


# --- wave 10: weighted kappa, madogram ----------------------------------------


def test_weighted_kappa_matches_bruteforce(spark):
    r = QUERIES["a_weighted_kappa"](spark, SF).collect()[0]
    emb = load_table(spark, SF, "embeddings").collect()
    rows = []
    for e in emb:
        s = sum(
            int(math.floor(float(v) * float(v) * 1000000)) for v in e.embedding
        )
        c1 = int(math.floor(float(e.embedding[0]) * 1000000))
        rows.append((e.vec_id, s, c1))
    n = len(rows)
    by_s = sorted(rows, key=lambda t: (t[1], t[0]))
    by_c = sorted(rows, key=lambda t: (t[2], t[0]))
    ra = {t[0]: 3 * i // n for i, t in enumerate(by_s)}
    rb = {t[0]: 3 * i // n for i, t in enumerate(by_c)}
    from collections import Counter

    o = Counter((ra[v], rb[v]) for v, _, _ in rows)
    wo = sum((i - j) ** 2 * c for (i, j), c in o.items())
    r_i = Counter()
    c_j = Counter()
    for (i, j), c in o.items():
        r_i[i] += c
        c_j[j] += c
    we = sum(
        (i - j) ** 2 * r_i[i] * c_j[j] for i in r_i for j in c_j
    )
    assert r.n_subjects == n
    assert r.weighted_disagreement == wo
    assert math.isclose(r.weighted_kappa, 1 - n * wo / we, rel_tol=1e-12)
    assert r.weighted_kappa <= 1.0


def test_madogram_matches_bruteforce(spark):
    rows = {
        r.lag_days: r for r in QUERIES["w_madogram"](spark, SF).collect()
    }
    ys = _day_series(spark)
    for h in (1, 2, 3, 7):
        pairs = [abs(ys[t] - ys[t - h]) for t in range(h, len(ys))]
        r = rows[h]
        assert r.n_pairs == len(pairs)
        assert math.isclose(
            r.madogram, sum(pairs) / len(pairs) / 100, rel_tol=1e-12
        ), h


# --- wave 11: sign test, Dixon Q ----------------------------------------------


def test_sign_test_matches_bruteforce(spark):
    r = QUERIES["a_sign_test"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    halves: dict[int, list] = {}
    for e in ev:
        h = halves.setdefault(e.user_id, [0, 0])
        h[0 if e.ts.day <= 15 else 1] += int(math.floor(e.value))
    ds = [b - a for a, b in halves.values() if b != a]
    n, sp = len(ds), sum(1 for d in ds if d > 0)
    cc = 0.5 if sp > n / 2 else (-0.5 if sp < n / 2 else 0.0)
    assert (r.n, r.s_plus) == (n, sp)
    assert math.isclose(r.s_expected, n / 2, rel_tol=1e-12)
    assert math.isclose(
        r.z_sign, (sp - n / 2 - cc) / (math.sqrt(n) / 2), rel_tol=1e-12
    )
    # consistency with Wilcoxon: same n after zero-drop
    w = QUERIES["a_wilcoxon_signed_rank"](spark, SF).collect()[0]
    assert w.n == r.n


def test_dixon_q_matches_bruteforce(spark):
    r = QUERIES["a_dixon_q"](spark, SF).collect()[0]
    ys = sorted(_day_series(spark))
    n = len(ys)
    assert r.n_days == n
    assert math.isclose(r.y_min, ys[0] / 100, rel_tol=1e-12)
    assert math.isclose(r.y_max, ys[-1] / 100, rel_tol=1e-12)
    rng = ys[-1] - ys[0]
    assert math.isclose(r.q_low, (ys[1] - ys[0]) / rng, rel_tol=1e-12)
    assert math.isclose(r.q_high, (ys[-1] - ys[-2]) / rng, rel_tol=1e-12)
    assert 0.0 <= r.q_low <= 1.0 and 0.0 <= r.q_high <= 1.0
