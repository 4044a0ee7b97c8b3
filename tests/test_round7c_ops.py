"""Round-7 continuation batches C/D/E: TA windows, text/corpus signals,
graph LCC, embedding clip, range-partition planning, SLO burn, ridge,
seasonal decomposition."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dicomdb_spark.registry import QUERIES
from tests.conftest import patched_load_table

SF = "/root/testdata/sf0.001"


def test_williams_r_range(spark):
    rows = QUERIES["w_williams_r"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -100.0 <= r.williams_r <= 0.0
        assert r.ll <= r.cl <= r.hh


def test_mfi_range(spark):
    rows = QUERIES["w_mfi_money_flow"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mfi <= 100.0
        assert r.pos_mf >= 0 and r.neg_mf >= 0


def test_stochastic_d_smooths_k(spark):
    rows = QUERIES["w_stochastic_d"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_k <= 100.0 and 0.0 <= r.pct_d <= 100.0


def test_pivot_level_ordering(spark):
    # cl = floor(p/vol) always lies in [lo, hi], so pc ∈ [pl, ph] and
    # the full ladder s2 ≤ s1 ≤ pivot ≤ r1 ≤ r2 holds UNCONDITIONALLY
    # (s1 ≤ P ⟺ P ≤ ph; r1 ≥ P ⟺ P ≥ pl — both forced by pc's range).
    for r in QUERIES["w_pivot_points"](spark, SF).collect():
        assert r.s2 <= r.s1 + 1e-9
        assert r.s1 <= r.pivot + 1e-9
        assert r.pivot <= r.r1 + 1e-9
        assert r.r1 <= r.r2 + 1e-9
        assert r.s2 <= r.pivot <= r.r2


def test_overnight_gap_flag_consistency(spark):
    rows = QUERIES["w_overnight_gap"](spark, SF).collect()
    assert rows
    for r in rows:
        assert (abs(r.pct_gap) > 0.02) == (r.gap_flag == 1)


def test_cci_crafted_spike(spark):
    rows = QUERIES["w_cci"](spark, SF).collect()
    assert rows
    for r in rows:
        assert math.isfinite(r.cci)


def test_seasonal_naive_mape_nonneg(spark):
    rows = QUERIES["w_seasonal_naive_mape"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mape >= 0.0 and r.n_days > 0


def test_readability_crafted_syllables(spark):
    """'the cat sat. on a mat!' -> 6 words, 2 sentences, 6 vowel groups."""
    import unittest.mock as mock

    import dicomdb_spark.registry as R  # noqa: F401

    docs = spark.createDataFrame(
        [(1, "the cat sat. on a mat!", "en", "s", 22)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    with patched_load_table(lambda s, d, name: docs):
        row = QUERIES["text_readability_fk"](spark, "ignored").collect()[0]
    assert row.n_words == 6 and row.n_sentences == 2 and row.n_syllables == 6
    expect = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert math.isclose(row.flesch_ease, expect, abs_tol=1e-9)


def test_numeric_density_crafted(spark):
    import unittest.mock as mock

    import dicomdb_spark.registry as R

    docs = spark.createDataFrame(
        [(1, "a1b 22 c333 x", "en", "s", 13)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    with patched_load_table(lambda s, d, name: docs):
        row = QUERIES["text_numeric_density"](spark, "ignored").collect()[0]
    assert row.digit_chars == 6 and row.digit_groups == 3
    assert row.n_tokens == 4 and row.numeric_tokens == 3


def test_ngram_novelty_rates(spark):
    rows = QUERIES["text_ngram_novelty"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty_rate <= 1.0
        assert r.n_novel <= r.n_bigrams


def test_language_balance_weights(spark):
    rows = QUERIES["corpus_language_balance_t2"](spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    smallest = min(rows, key=lambda r: r.n_docs)
    largest = max(rows, key=lambda r: r.n_docs)
    # sqrt smoothing up-samples the tail, down-samples the head
    assert smallest.oversample_factor > 1.0 > largest.oversample_factor


def test_chunk_overlap_invariants(spark):
    rows = QUERIES["corpus_chunk_overlap_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_chunk_len >= 1
        assert r.overlap_tokens == r.sum_chunk_tokens - r.n_tokens
        if r.n_tokens <= 100:
            assert r.n_chunks == 1 and r.overlap_tokens == 0


def test_burstiness_topk(spark):
    rows = QUERIES["text_term_burstiness"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.total >= r.n_docs_with
        assert math.isfinite(r.vmr)


def test_lcc_range(spark):
    rows = QUERIES["graph_lcc"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.lcc <= 1.0 + 1e-9


def test_quantile_clip_bounds(spark):
    rows = QUERIES["emb_quantile_clip"](spark, SF).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.clip_lo < r.clip_hi
        # Chebyshev: at most 25% outside 2 sigma
        assert (r.n_below + r.n_above) <= 0.25 * r.n + 1


def test_range_partition_plan_monotone(spark):
    rows = sorted(
        QUERIES["layout_range_partition_plan"](spark, SF).collect(),
        key=lambda r: r.part,
    )
    assert len(rows) == 31
    for i, r in enumerate(rows):
        assert r.rows_below >= r.target_rows
        if i:
            assert r.boundary_bucket >= rows[i - 1].boundary_bucket
            assert r.boundary_value >= rows[i - 1].boundary_value


def test_slo_burn_flags(spark):
    rows = QUERIES["ops_slo_burn_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.burn_1d >= 0.0 and r.burn_7d >= 0.0
        assert (r.burn_1d > 1.0) == (r.fast_burn == 1)
        assert (r.burn_7d > 1.0) == (r.slow_burn == 1)
    # executable boundedness (lint allowlist says "bounded calendar
    # day grain"): the global-window input is exactly one row per
    # observed day, so a fixture change can't silently unbound it
    from dicomdb_spark.io import load_table

    n_days = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert len(rows) <= n_days


def test_ridge_lambda_zero_is_ols(spark):
    ols = QUERIES["a_ols_two_feature"](spark, SF).collect()[0]
    ridge = {r.lam: r for r in QUERIES["ml_ridge_closed_form"](spark, SF).collect()}
    r0 = ridge[0.0]
    assert math.isclose(r0.beta1, ols.beta1, rel_tol=1e-12)
    assert math.isclose(r0.beta2, ols.beta2, rel_tol=1e-12)
    # heavy regularization shrinks coefficient magnitude
    rbig = ridge[1000000000.0]
    assert abs(rbig.beta1) <= abs(r0.beta1) + 1e-9 or abs(rbig.beta2) <= abs(
        r0.beta2
    ) + 1e-9


def test_seasonal_decompose_identity(spark):
    rows = QUERIES["w_seasonal_decompose"](spark, SF).collect()
    assert rows
    for r in rows:
        assert math.isclose(
            r.actual, r.trend + r.seasonal + r.residual, rel_tol=1e-9, abs_tol=1e-9
        )


# -- batch F ------------------------------------------------------------------


def test_rfm_quintiles_balanced(spark):
    rows = QUERIES["a_rfm_segmentation"](spark, SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_quint", "f_quint", "m_quint"):
        counts = {}
        for r in rows:
            q = getattr(r, col)
            assert 1 <= q <= 5
            counts[q] = counts.get(q, 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1, (col, counts)
    for r in rows:
        assert r.rfm_code == 100 * r.r_quint + 10 * r.f_quint + r.m_quint


def test_power_analysis_monotone_in_p(spark):
    rows = QUERIES["a_power_analysis"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.p1 < 1.0 and r.n_per_arm > 0


def test_underwater_duration_bounds(spark):
    rows = QUERIES["w_underwater_duration"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.max_underwater_days <= r.total_underwater_days
        assert r.n_episodes >= 1


def test_volume_profile_single_poc(spark):
    rows = QUERIES["w_volume_profile"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.price_lo < r.price_hi
    for t, rs in by_type.items():
        assert sum(r.is_poc for r in rs) == 1, t
        poc = next(r for r in rs if r.is_poc)
        assert poc.volume == max(r.volume for r in rs)


def test_tdigest_merge_law_exact(spark):
    for r in QUERIES["sketch_tdigest_merge"](spark, SF).collect():
        assert r.n_equal == r.n_buckets and r.max_count_diff == 0


def test_source_cosine_range(spark):
    rows = QUERIES["text_source_cosine"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.cosine <= 1.0 + 1e-9


def test_capacity_forecast_linear(spark):
    rows = QUERIES["ops_capacity_forecast"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert len(rs) == 7
        rs.sort(key=lambda r: r.horizon_days)
        # forecasts lie exactly on the fitted line
        step = rs[1].forecast_events - rs[0].forecast_events
        assert math.isclose(step, rs[0].slope, rel_tol=1e-9, abs_tol=1e-9)


# -- batch G ------------------------------------------------------------------


def test_textrank_top20(spark):
    rows = QUERIES["text_textrank_keywords"](spark, SF).collect()
    assert len(rows) == 20
    scores = [r.score for r in sorted(rows, key=lambda r: r.pos)]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score > 0 for r in rows)


def test_cohort_ltv_monotone(spark):
    rows = QUERIES["a_cohort_ltv_curve"](spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_mix, []).append(r)
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        ltvs = [r.ltv_per_customer for r in rs]
        assert all(b >= a for a, b in zip(ltvs, ltvs[1:])), c


def test_minhash_jaccard_estimator_error(spark):
    rows = QUERIES["dedup_minhash_jaccard_est"](spark, SF).collect()
    assert rows
    import statistics

    resid = [r.est_jaccard - r.exact_jaccard for r in rows]
    # unbiased estimator: mean residual well inside 1/sqrt(16)
    assert abs(statistics.mean(resid)) < 0.25
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0


def test_lorenz_curve_shape(spark):
    rows = sorted(
        QUERIES["a_lorenz_curve_points"](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    assert math.isclose(rows[-1].cum_pop_share, 1.0, abs_tol=1e-12)
    assert math.isclose(rows[-1].cum_spend_share, 1.0, abs_tol=1e-12)
    for r in rows:
        # Lorenz curve lies under the diagonal when sorted ascending
        assert r.cum_spend_share <= r.cum_pop_share + 1e-9


def test_weekend_effect_fields(spark):
    rows = QUERIES["a_weekend_effect"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_wknd + r.n_wkdy > 0
        assert math.isclose(
            r.weekend_lift, r.mean_wknd / r.mean_wkdy, rel_tol=1e-12
        )


# -- streaming twin -----------------------------------------------------------


def test_slo_burn_stream_matches_batch_1d(spark, tmp_path):
    """The streaming (watermarked tumbling-day) burn rate must agree
    with the batch ops_slo_burn_rate 1-day columns exactly once all
    input is processed."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.streaming import incremental as stream

    ev = load_table(spark, SF, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    src_dir = str(tmp_path / "events_stream")
    src.write.mode("overwrite").parquet(src_dir)
    stream_df = stream.stream_inventory(
        spark, src_dir, src.schema, fmt="parquet"
    )
    agg = stream.slo_burn_stream(
        stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slo_burn")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.day: (r.n_total, r.n_err, r.burn_1d)
            for r in spark.sql("select * from slo_burn").collect()
        }
    finally:
        q.stop()
    batch = {
        r.day: (r.n_total, r.n_err, r.burn_1d)
        for r in QUERIES["ops_slo_burn_rate"](spark, SF).collect()
    }
    assert got == batch


# -- batch H ------------------------------------------------------------------


def test_er_threshold_sweep_monotone(spark):
    rows = sorted(
        QUERIES["er_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert len(rows) == 6
    for a, b in zip(rows, rows[1:]):
        # raising the threshold can only shrink both tp and fp
        assert b.tp <= a.tp and b.fp <= a.fp
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
    # exact duplicates (jaccard 1.0) survive every threshold
    assert rows[-1].tp > 0


def test_growth_accounting_identities(spark):
    rows = sorted(
        QUERIES["a_growth_accounting"](spark, SF).collect(), key=lambda r: r.day
    )
    assert rows
    prev_dau = None
    for r in rows:
        assert r.dau == r.new_users + r.retained + r.resurrected
        if prev_dau is not None:
            assert prev_dau == r.retained + r.churned
        prev_dau = r.dau


# -- batch I ------------------------------------------------------------------


def test_payload_near_dup_finds_planted(spark):
    rows = QUERIES["multimodal_payload_near_dup"](spark, SF).collect()
    exact = {(r.id1, r.id2) for r in rows if r.match_type == "exact"}
    prefix = {(r.id1, r.id2) for r in rows if r.match_type == "prefix"}
    # every planted exact copy pairs with its base in the exact class
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    recs = docs.select(
        "doc_id", F.octet_length("text").alias("n_bytes")
    ).collect()
    for r in recs:
        if r.doc_id % 5 == 0:
            assert (r.doc_id, r.doc_id + 1000000) in exact
        # near copies share the 256-byte prefix only when the base
        # payload is at least that long (shorter payloads hash their
        # full — differing-length — prefixes; documented limitation)
        if r.doc_id % 9 == 0 and r.n_bytes >= 256:
            assert (r.doc_id, r.doc_id + 2000000) in prefix or (
                r.doc_id,
                r.doc_id + 2000000,
            ) in exact
    assert exact.isdisjoint(prefix)


def test_event_study_offsets(spark):
    rows = QUERIES["w_event_study"](spark, SF).collect()
    offs = {r.rel_day for r in rows}
    assert offs <= set(range(-3, 4))
    for r in rows:
        assert r.n_obs > 0 and r.mean_rev > 0


def test_did_fields_consistent(spark):
    r = QUERIES["a_did_estimator"](spark, SF).collect()[0]
    assert math.isclose(r.did, r.delta_treated - r.delta_control, rel_tol=1e-12)
    assert r.se_did > 0
    assert math.isclose(r.z_did, r.did / r.se_did, rel_tol=1e-12)


def test_kfold_balance(spark):
    rows = QUERIES["ml_kfold_assignment"](spark, SF).collect()
    assert {r.fold for r in rows} == {0, 1, 2, 3, 4}
    sizes = [r.n for r in rows]
    # md5 folds are near-uniform: no fold more than 2x another at n=150
    assert max(sizes) <= 2 * min(sizes)


def test_simpson_audit_moments_rollup(spark):
    rows = QUERIES["a_simpson_paradox_audit"](spark, SF).collect()
    assert rows
    overall = {r.overall_slope for r in rows}
    assert len(overall) == 1  # same pooled slope on every row
    for r in rows:
        assert r.sign_flips in (0, 1)
        assert ((r.seg_slope > 0) != (r.overall_slope > 0)) == (r.sign_flips == 1)


# -- batch J ------------------------------------------------------------------


def test_cpk_relationship(spark):
    rows = QUERIES["w_cpk_process_capability"](spark, SF).collect()
    assert rows
    for r in rows:
        # Cpk <= Cp always (centering can only lose capability)
        assert r.cpk <= r.cp + 1e-9
        assert r.n_out >= 0


def test_mm1_stability_fields(spark):
    rows = QUERIES["a_queueing_mm1_metrics"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.rho > 0
        if r.rho < 1.0:
            assert r.lq is not None and r.lq >= 0
            assert math.isclose(r.wq_s, r.lq / r.lambda_per_s, rel_tol=1e-9)
        else:
            assert r.lq is None and r.wq_s is None


def test_lsh_s_curve_monotone(spark):
    rows = sorted(
        QUERIES["dedup_lsh_s_curve"](spark, SF).collect(), key=lambda r: r.j_bin
    )
    assert rows
    for r in rows:
        assert 0.0 <= r.observed_rate <= 1.0
        assert 0.0 <= r.theory_rate <= 1.0
    # theory curve is monotone increasing in similarity
    th = [r.theory_rate for r in rows]
    assert th == sorted(th)
    # the top similarity bin must be (near-)fully recalled
    assert rows[-1].observed_rate > 0.9


def test_two_hop_reach_bounds(spark):
    rows = QUERIES["graph_two_hop_reach"](spark, SF).collect()
    assert rows
    for r in rows:
        # reach includes the direct neighbors' neighbors; it can never
        # exceed sum-of-neighbor-degrees but must cover >= 1 node when
        # degree >= 1 (the neighbor's back-edge partner or a triangle)
        assert r.reach_2hop >= 0
        assert r.degree >= 1


def test_scd_compaction_bounds(spark):
    rows = QUERIES["scd_history_compaction"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_compacted <= r.n_versions
        assert r.n_redundant == r.n_versions - r.n_compacted
        assert 0.0 < r.compaction_ratio <= 1.0


# -- batch K ------------------------------------------------------------------


def test_seasonality_strength_range(spark):
    rows = QUERIES["w_seasonality_strength"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.seasonal_strength <= 1.0


def test_price_indices_bracket_fisher(spark):
    r = QUERIES["a_price_index_laspeyres"](spark, SF).collect()[0]
    lo, hi = sorted((r.laspeyres, r.paasche))
    assert lo - 1e-12 <= r.fisher <= hi + 1e-12
    assert r.n_parts > 0


def test_abc_pareto_structure(spark):
    rows = {r.abc: r for r in QUERIES["a_abc_classification"](spark, SF).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r.revenue_share for r in rows.values())
    assert math.isclose(total_share, 1.0, abs_tol=1e-9)
    if "C" in rows:
        # A parts are fewer but out-earn C parts
        assert rows["A"].rev_c > rows["C"].rev_c


# -- batch L ------------------------------------------------------------------


def test_segment_migration_rows_normalize(spark):
    rows = QUERIES["a_segment_migration_matrix"](spark, SF).collect()
    assert rows
    by_from = {}
    for r in rows:
        assert 1 <= r.from_quint <= 5 and 1 <= r.to_quint <= 5
        by_from.setdefault(r.from_quint, []).append(r.p)
    for fq, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 1e-9, fq


def test_wilson_interval_brackets_phat(spark):
    rows = QUERIES["a_wilson_ci"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.phat <= r.wilson_hi <= 1.0


def test_rich_club_range(spark):
    r = QUERIES["graph_rich_club"](spark, SF).collect()[0]
    assert r.n_rich <= 20
    assert 0.0 <= r.rich_club_coeff <= 1.0 + 1e-9


# -- batch M ------------------------------------------------------------------


def test_m4_downsample_structure(spark):
    rows = QUERIES["w_m4_downsample"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.min_v <= r.first_v <= r.max_v
        assert r.min_v <= r.last_v <= r.max_v
    for t, rs in by_type.items():
        assert len(rs) <= 16


def test_incident_mttr_fields(spark):
    r = QUERIES["ops_incident_mttr"](spark, SF).collect()[0]
    assert r.n_incidents >= 1
    assert r.worst_incident_days <= r.total_incident_days
    assert math.isclose(
        r.mttr_days, r.total_incident_days / r.n_incidents, rel_tol=1e-12
    )
    # executable boundedness (lint allowlist: "bounded calendar day
    # grain"): every incident day is a distinct observed day, so the
    # global-window input can never exceed the calendar
    from dicomdb_spark.io import load_table

    n_days = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert r.total_incident_days <= n_days
    assert r.n_incidents <= n_days


def test_concentration_ordering(spark):
    r = QUERIES["a_concentration_cr4"](spark, SF).collect()[0]
    assert 0.0 < r.cr4 <= r.cr8 <= 1.0


def test_hampel_outliers_subset_of_extremes(spark):
    rows = QUERIES["w_hampel_filter"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        if r.is_outlier:
            assert abs(r.x - r.rolling_median) > 4.4478 * r.mad - 1e-9
