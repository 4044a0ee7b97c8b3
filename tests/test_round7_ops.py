"""Round-7 operators: BFS hop distances, held-out link prediction,
market-basket rules, CUSUM drift, max drawdown, nearest-event join,
decile lift, TF-IDF top terms, k-anonymity risk."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


# -- BFS hops --------------------------------------------------------------


def test_bfs_crafted_path(spark):
    """Path 0-1-2-3-4 with source {0}: hops are the path distances,
    capped at 4 rounds."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    pairs = spark.createDataFrame(edges, "id1 INT, id2 INT")
    e = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).unionAll(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    dist = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") == 0)
        .withColumn("hop", F.lit(0))
    )
    for _ in range(4):
        msg = dist.join(e, dist.node == e.src).select(
            F.col("dst").alias("node"), (F.col("hop") + 1).alias("hop")
        )
        dist = dist.unionAll(msg).groupBy("node").agg(F.min("hop").alias("hop"))
    got = {r.node: r.hop for r in dist.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hops_sources_zero_neighbors_bounded(spark):
    out = QUERIES["graph_bfs_hops"](spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    by_hop = {}
    for r in rows:
        assert 0 <= r.hop <= 4
        by_hop.setdefault(r.hop, []).append(r.doc_id)
    for d in by_hop.get(0, []):
        assert d % 7 == 0  # sources are exactly the %7 vertices reached at 0


# -- link prediction -------------------------------------------------------


def test_link_predict_recovers_held_out(spark):
    """Dup groups are cliques, so RA scoring over the 2/3-observed
    graph should surface at least one held-out true edge in its
    top-20."""
    rows = QUERIES["graph_link_predict_ra"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.id1 < r.id2
        assert r.common_neighbors >= 1
        assert r.ra_score_scaled >= 1
        assert r.held_out_edge in (0, 1)
    scores = [r.ra_score_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert any(r.held_out_edge == 1 for r in rows)


# -- market basket ---------------------------------------------------------


def test_market_basket_identities(spark):
    rows = QUERIES["a_market_basket"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.pair_n >= 20
        assert r.pair_n <= min(r.n_a, r.n_b)
        assert abs(r.conf_ab - r.pair_n / r.n_a) < 1e-12
        assert abs(r.conf_ba - r.pair_n / r.n_b) < 1e-12
        assert r.lift > 0


# -- CUSUM / drawdown ------------------------------------------------------


def test_cusum_closed_form_matches_recursion(spark):
    """S_i = max(0, S_{i-1} + d_i) ≡ C_i − min(0, min_{j≤i} C_j):
    check the identity on a crafted series with sign changes."""
    ds = [3, -5, 2, 2, -1, 4, -10, 6]
    s, expect = 0, []
    for d in ds:
        s = max(0, s + d)
        expect.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(ds)], "i INT, di INT"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.withColumn("ci", F.sum("di").over(w))
    out = c.withColumn(
        "si", F.col("ci") - F.least(F.min("ci").over(w), F.lit(0))
    ).orderBy("i")
    assert [r.si for r in out.collect()] == expect


def test_cusum_drift_per_type(spark):
    rows = QUERIES["w_cusum_drift"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) == n_types
    for r in rows:
        assert r.max_cusum >= 0


def test_max_drawdown_crafted(spark):
    """Walk 0,+5,−3,−4,+2 → equity 5,2,-2,0; peak 5; max dd = 7."""
    ds = [5, -3, -4, 2]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(ds)], "i INT, di INT")
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.withColumn("ci", F.sum("di").over(w))
    dd = c.withColumn("dd", F.max("ci").over(w) - F.col("ci"))
    assert dd.agg(F.max("dd")).collect()[0][0] == 7


def test_max_drawdown_query_nonneg(spark):
    rows = QUERIES["w_max_drawdown"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    vals = [r.max_drawdown for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= 0 for v in vals)


# -- nearest event ---------------------------------------------------------


def test_nearest_event_picks_closer_side(spark):
    out = QUERIES["j17_nearest_event"](spark, SF)
    ev = load_table(spark, SF, "events")
    # verify a sample row against a brute-force scan of that user
    row = out.orderBy("purchase_id").limit(1).collect()[0]
    p = ev.filter(F.col("event_id") == row.purchase_id).collect()[0]
    errs = ev.filter(
        (F.col("user_id") == row.user_id) & (F.col("event_type") == "error")
    ).collect()
    assert errs, "picked user has no errors yet query emitted a row?"
    best = min(
        errs,
        key=lambda r: (abs((r.ts - p.ts).total_seconds()), r.ts, r.event_id),
    )
    got_gap = row.gap_s
    best_gap = abs(int((best.ts - p.ts).total_seconds()))
    assert got_gap <= best_gap + 1  # epoch-floor rounding slack


def test_nearest_event_no_purchase_without_error_user(spark):
    out = QUERIES["j17_nearest_event"](spark, SF)
    ev = load_table(spark, SF, "events")
    users_with_err = {
        r.user_id for r in ev.filter(F.col("event_type") == "error").select("user_id").distinct().collect()
    }
    for r in out.select("user_id").distinct().collect():
        assert r.user_id in users_with_err


# -- decile lift -----------------------------------------------------------


def test_decile_lift_invariants(spark):
    rows = sorted(QUERIES["a_decile_lift"](spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r.n for r in rows) == n_cust
    cum = 0
    for r in rows:
        cum += r.conv_n
        assert r.cum_conv == cum
        assert 0 <= r.conv_n <= r.n
    assert abs(rows[-1].gain_pct - 100.0) < 1e-9
    # Σ n_i · lift_i = N  (lift is conversion-share reweighted)
    tot_conv = cum
    s = sum(r.n * r.lift for r in rows)
    assert abs(s - n_cust) < 1e-6 * n_cust or tot_conv == 0


# -- tf-idf ----------------------------------------------------------------


def test_tfidf_rank_and_bounds(spark):
    out = QUERIES["text_tfidf_topterms"](spark, SF)
    rows = out.collect()
    n_docs = load_table(spark, SF, "documents").count()
    per_doc = {}
    for r in rows:
        assert 1 <= r.rnk <= 3
        assert 1 <= r.df <= n_docs
        assert r.tf >= 1
        assert abs(r.tfidf - r.tf * n_docs / r.df) < 1e-9
        per_doc.setdefault(r.doc_id, []).append((r.rnk, r.tfidf))
    for doc, rs in per_doc.items():
        rs.sort()
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True)


# -- k-anonymity -----------------------------------------------------------


def test_kanonymity_partitions_customers(spark):
    rows = QUERIES["a_kanonymity_risk"](spark, SF).collect()
    n = load_table(spark, SF, "customer").count()
    assert sum(r.n_records for r in rows) == n
    assert abs(sum(r.pct_records for r in rows) - 100.0) < 1e-9
    for r in rows:
        assert r.k_bucket in {"k=1", "k=2-4", "k=5-9", "k>=10"}
        assert r.n_groups <= r.n_records


# -- wave 2: corr matrix, LSH eval, boilerplate, seasonality, hyp rank -----


def test_corr_matrix_bounds_and_pairs(spark):
    rows = QUERIES["a_corr_matrix"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9
        assert r.n_days >= 2


def test_corr_matrix_perfect_on_crafted(spark):
    """x and 2x+1 correlate exactly 1 via the co-moment formula."""
    df = spark.createDataFrame(
        [(1, 10, 21), (2, 20, 41), (3, 30, 61)], "d INT, xa LONG, xb LONG"
    )
    m = df.agg(
        F.count("*").alias("n"),
        F.sum("xa").alias("sx"), F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
    ).collect()[0]
    num = m.n * m.sxy - m.sx * m.sy
    den = ((m.n * m.sxx - m.sx**2) ** 0.5) * ((m.n * m.syy - m.sy**2) ** 0.5)
    assert abs(num / den - 1.0) < 1e-12


def test_lsh_recall_eval_exact_class_perfect(spark):
    """Identical copies share every shingle, so every exact dup pair
    must be found: recall('exact') == 1.0; candidates ≥ truth hits."""
    rows = {r.dup_class: r for r in QUERIES["dedup_lsh_recall_eval"](spark, SF).collect()}
    assert set(rows) == {"exact", "near"}
    assert rows["exact"].recall == 1.0
    for r in rows.values():
        assert 0 <= r.n_found <= r.n_truth
        assert r.n_candidates >= r.n_found


def test_boilerplate_rates_bounded(spark):
    rows = QUERIES["text_boilerplate_ngrams"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs
    assert any(r.n_boiler > 0 for r in rows)  # sources share template grams
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_grams
        assert 0 <= r.boiler_bp <= 10000.0


def test_seasonal_index_mean_one(spark):
    """Σ (n_days · index) over dows = tot_days for each type — the
    weighted mean of a seasonal index is 1 by construction."""
    rows = QUERIES["w_seasonal_dow_index"](spark, SF).collect()
    by_type = {}
    for r in rows:
        assert 1 <= r.dow <= 7
        assert r.seasonal_index > 0
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        tot_days = sum(r.n_days for r in rs)
        s = sum(r.n_days * r.seasonal_index for r in rs)
        assert abs(s - tot_days) < 1e-6 * tot_days


def test_hypothetical_rank_against_sort(spark):
    rows = {r.hyp_bal: r for r in QUERIES["o6_hypothetical_rank"](spark, SF).collect()}
    cust = load_table(spark, SF, "customer")
    n = cust.count()
    for bal, r in rows.items():
        below = cust.filter(F.col("c_acctbal") < bal).count()
        assert r.hyp_rank == below + 1
        assert abs(r.hyp_percentile - below / n) < 1e-12


# -- wave 3: ANN recall eval, ER merge, ratio-to-report, funnel TTC --------


def test_ann_recall_eval_bounds(spark):
    rows = QUERIES["ann_recall_eval"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_truth == 5
        assert 0 <= r.n_overlap <= min(r.n_truth, r.n_approx)
        assert abs(r.recall_at_5 - r.n_overlap / r.n_truth) < 1e-12
        assert r.n_approx <= 5


def test_er_merge_components_consistent(spark):
    pairs = QUERIES["er_phonetic_pairs"](spark, SF).collect()
    ents = QUERIES["er_transitive_merge"](spark, SF).collect()
    toks = {t for p in pairs for t in (p.tok1, p.tok2)}
    covered = set()
    for e in ents:
        vs = e.variants.split(",")
        assert e.n_variants == len(vs) >= 2
        assert e.canonical == min(vs)
        assert vs == sorted(vs)
        covered.update(vs)
    assert covered == toks  # every paired token lands in exactly one entity
    assert sum(e.n_variants for e in ents) == len(toks)


def test_ratio_to_report_sums_to_one(spark):
    rows = QUERIES["w_ratio_to_report"](spark, SF).collect()
    assert abs(sum(r.share_total for r in rows) - 1.0) < 1e-9
    by_status = {}
    for r in rows:
        by_status.setdefault(r.o_orderstatus, 0.0)
        by_status[r.o_orderstatus] += r.share_in_status
    for s, tot in by_status.items():
        assert abs(tot - 1.0) < 1e-9


def test_funnel_ttc_order_stats(spark):
    row = QUERIES["w_funnel_ttc"](spark, SF).collect()[0]
    assert row.n_converted > 0
    assert 0 <= row.median_ttc_s <= row.p90_ttc_s


# -- wave 4: power iteration, covariance, batching, streaming CUSUM --------


def test_power_iteration_is_dominant_direction(spark):
    """The returned direction must be a fixed point under one more
    X^T X multiply (up to normalization): cosine(v3, v4) ≈ 1 — and
    ∞-norm 1 by construction."""
    import numpy as np

    out = QUERIES["emb_top_pc_power"](spark, SF).collect()
    assert len(out) == 64
    v = np.zeros(64)
    for r in out:
        v[r.dim - 1] = r.loading
    assert abs(np.abs(v).max() - 1.0) < 1e-12
    emb = load_table(spark, SF, "embeddings").collect()
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    w = X.T @ (X @ v)
    cos = abs(w @ v) / (np.linalg.norm(w) * np.linalg.norm(v))
    assert cos > 0.98


def test_covariance_topk_matches_numpy(spark):
    import numpy as np

    rows = QUERIES["emb_covariance_topk"](spark, SF).collect()
    assert len(rows) == 20
    emb = load_table(spark, SF, "embeddings").collect()
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    C = np.cov(X.T, bias=True)
    for r in rows[:5]:
        assert abs(r.cov - C[r.dim_i - 1, r.dim_j - 1]) < 1e-3
    mags = [abs(r.cov) for r in rows]
    assert mags == sorted(mags, reverse=True)


def test_length_batching_sorted_wastes_less(spark):
    rows = {r.strategy: r for r in QUERIES["corpus_length_batching"](spark, SF).collect()}
    assert set(rows) == {"hash_order", "length_sorted"}
    for r in rows.values():
        assert r.real_tokens <= r.padded_tokens
        assert 0 <= r.waste_bp <= 10000
    assert rows["length_sorted"].waste_bp <= rows["hash_order"].waste_bp
    assert rows["length_sorted"].real_tokens == rows["hash_order"].real_tokens


def test_stateful_cusum_matches_batch_recursion(spark, tmp_path):
    """Streaming CUSUM (8-byte state) must equal the batch closed form
    C - min(0, running-min C) event-for-event across micro-batches."""
    from pyspark.sql import Window

    from dicomdb_spark.streaming.stateful import stateful_cusum

    SFDIR = "/root/testdata/sf0.001"
    ev = load_table(spark, SFDIR, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    REF = 2500000  # floor(250.0 * 10000)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = ev.withColumn(
        "di", F.floor(F.col("value") * 10000).cast("long") - F.lit(REF)
    ).withColumn("ci", F.sum("di").over(w))
    batch = {
        r.event_id: r.si
        for r in d.select(
            "event_id",
            (F.col("ci") - F.least(F.min("ci").over(w), F.lit(0))).alias("si"),
        ).collect()
    }
    src = tmp_path / "cusum_src"
    src.mkdir()
    rows = ev.orderBy("ts", "event_id").collect()
    cut = len(rows) // 2
    for i, chunk in enumerate((rows[:cut], rows[cut:])):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    stream_df = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = stateful_cusum(stream_df, "event_type", "ts", "event_id", "value")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_out")
        .option("checkpointLocation", str(tmp_path / "cusum_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.event_id: r.cusum
            for r in spark.sql("select * from cusum_out").collect()
        }
    finally:
        q.stop()
    assert len(got) == len(batch) > 0
    mism = {k: (got[k], batch[k]) for k in batch if got[k] != batch[k]}
    assert not mism, list(mism.items())[:5]


# -- wave 5: window funnel, interval union, prefix dedup, SLA pctiles ------


def test_window_funnel_strict_order_crafted(spark):
    """view BEFORE the click must not count; view after click within
    the window reaches level 2; purchase before the view does not
    reach level 3."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),      # before click: ignored
        (1, "2024-01-01 01:00:00", 2, "click"),
        (1, "2024-01-01 02:00:00", 3, "purchase"),  # before view: no level 3
        (1, "2024-01-01 03:00:00", 4, "view"),      # level 2
        (2, "2024-01-01 00:00:00", 5, "click"),
        (2, "2024-01-01 00:10:00", 6, "view"),
        (2, "2024-01-01 00:20:00", 7, "purchase"),  # full chain: level 3
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts STRING, event_id INT, event_type STRING"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id", "event_type")
    c = df.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.min("ts").alias("t1"))
    v = (
        df.filter(F.col("event_type") == "view").join(c, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        df.filter(F.col("event_type") == "purchase").join(c, "user_id").join(v, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    lv = {
        r.user_id: r.level
        for r in c.join(v.select("user_id", F.lit(1).alias("__v")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("__p")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("__p").isNotNull(), 3).when(F.col("__v").isNotNull(), 2).otherwise(1).alias("level"),
        )
        .collect()
    }
    assert lv == {1: 2, 2: 3}


def test_window_funnel_counts_partition_clickers(spark):
    rows = QUERIES["w_window_funnel"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_clickers = (
        ev.filter(F.col("event_type") == "click").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_clickers
    assert all(r.level in (1, 2, 3) for r in rows)


def test_interval_union_bounds(spark):
    rows = QUERIES["w_interval_union"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    per_user = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    span = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("s")
    ).collect()[0].s
    for r in rows:
        # union length ≤ min(n·300, total span + 300), ≥ 300 (one interval)
        assert 300 <= r.covered_s <= min(per_user[r.user_id] * 300, span + 300)


def test_interval_union_crafted_merge(spark):
    """Two overlapping intervals [0,300) and [100,400) cover 400 s;
    a distant third [1000,1300) adds 300 → 700 total."""
    rows = [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:01:40", 2),
            (1, "2024-01-01 00:16:40", 3)]
    df = spark.createDataFrame(rows, "user_id INT, ts STRING, event_id INT").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), F.col("event_id").alias("tid")
    )
    from pyspark.sql import Window as W
    starts = df.select("user_id", F.col("ts").alias("t"), F.lit(1).alias("delta"), "tid")
    ends = df.select("user_id", (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("t"),
                     F.lit(-1).alias("delta"), "tid")
    b = starts.unionAll(ends)
    ws = W.partitionBy("user_id").orderBy("t", "delta", "tid")
    w = ws.rowsBetween(W.unboundedPreceding, W.currentRow)
    r = b.withColumn("conc", F.sum("delta").over(w)).withColumn("next_t", F.lead("t").over(ws))
    seg = F.when((F.col("conc") > 0) & F.col("next_t").isNotNull(),
                 F.unix_timestamp("next_t") - F.unix_timestamp("t")).otherwise(F.lit(0))
    got = r.groupBy("user_id").agg(F.sum(seg).alias("cov")).collect()[0].cov
    assert got == 700


def test_prefix_hash_groups_are_real_prefix_dups(spark):
    rows = QUERIES["dedup_prefix_hash"](spark, SF).collect()
    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}
    assert len(rows) > 0
    # verify one group end-to-end: all members share the 16-token prefix
    import hashlib
    target = rows[0].prefix_md5
    members = [
        d for d, t in docs.items()
        if len(t.split()) >= 16
        and hashlib.md5(" ".join(w.lower() for w in t.split()[:16]).encode()).hexdigest() == target
    ]
    assert len(members) == rows[0].n_docs
    assert min(members) == rows[0].keeper_id


def test_sla_percentiles_ordered(spark):
    rows = QUERIES["a_sla_percentiles"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50_lead_s <= r.p90_lead_s
        assert r.n_lines > 0


# -- wave 6: modularity, Gini skew, CMS audit, mix rebalance ---------------


def test_modularity_bounds_and_crafted(spark):
    """Two disjoint triangles are a perfect 2-community partition:
    Q = Σ(4mL_c − D_c²)/4m² with m=6, L_c=3, D_c=6 → 2·(72−36)/144 =
    0.5; the query's value over the dup graph must sit in [-0.5, 1]."""
    m, terms = 6, [(3, 6), (3, 6)]
    q = sum(4 * m * lc - dc * dc for lc, dc in terms) / (4 * m * m)
    assert abs(q - 0.5) < 1e-12
    row = QUERIES["graph_modularity"](spark, SF).collect()[0]
    assert row.n_communities >= 1
    assert row.m_edges >= 1
    assert -0.5 - 1e-9 <= row.modularity <= 1.0 + 1e-9


def test_gini_matches_reference_formula(spark):
    row = QUERIES["a_gini_skew"](spark, SF).collect()[0]
    o = load_table(spark, SF, "orders")
    counts = sorted(
        r.n for r in o.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    )
    n, tot = len(counts), sum(counts)
    gini = (2 * sum(i * x for i, x in enumerate(counts, 1)) - (n + 1) * tot) / (n * tot)
    assert row.n_keys == n and row.total_rows == tot
    assert abs(row.gini - gini) < 1e-12
    assert 0 <= row.gini < 1


def test_cms_audit_guarantees(spark):
    row = QUERIES["sketch_cms_error_audit"](spark, SF).collect()[0]
    assert row.n_underest == 0          # one-sided guarantee holds
    assert 0 <= row.max_over <= row.eps_n_bound
    assert 0 < row.n_exact <= row.n_items


def test_mix_rebalance_rates_and_selection(spark):
    rows = {r.lang: r for r in QUERIES["corpus_mix_rebalance"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    per = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(per.values())
    assert set(rows) <= {"en", "es", "fr", "de", "zh"}
    for lang, r in rows.items():
        assert r.n_docs == per[lang]
        assert r.target_count == (total * r.target_bp) // 10000
        assert 0 <= r.rate_bp <= 10000
        assert 0 <= r.n_selected <= r.n_docs
        if r.rate_bp == 10000:
            assert r.n_selected == r.n_docs  # keep-all stratum


# -- wave 7: autocorrelation, diversity, cross-source matrix, span masks ---


def test_autocorrelation_bounds_and_lags(spark):
    rows = QUERIES["w_autocorrelation"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.lag in (1, 2, 3, 7)
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
        assert r.n >= 2
    # every type present at every lag the data supports
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, set()).add(r.lag)
    for lags in by_type.values():
        assert 1 in lags


def test_simpson_diversity_identities(spark):
    rows = QUERIES["text_simpson_diversity"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").count()
    assert len(rows) == docs
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_tokens
        assert 0 <= r.simpson_div < 1
        # all-identical doc → 0; all-distinct doc → 1 - 1/n
        if r.n_distinct == r.n_tokens:
            assert abs(r.simpson_div - (1 - 1 / r.n_tokens)) < 1e-12


def test_cross_source_matrix_sorted_and_counted(spark):
    rows = QUERIES["dedup_cross_source_matrix"](spark, SF).collect()
    assert len(rows) > 0
    total_pairs = QUERIES["dedup_minhash_lsh"](spark, SF).count()
    assert sum(r.n_pairs for r in rows) <= total_pairs
    for r in rows:
        assert r.src_a <= r.src_b
        assert r.n_pairs >= 2
    # injected dup pairs keep their source → diagonal must dominate
    diag = sum(r.n_pairs for r in rows if r.src_a == r.src_b)
    off = sum(r.n_pairs for r in rows if r.src_a != r.src_b)
    assert diag > off


def test_span_corruption_mask_invariants(spark):
    rows = QUERIES["corpus_span_corruption"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").count()
    assert len(rows) == docs
    masked_any = 0
    for r in rows:
        assert 0 <= r.masked_tokens <= r.n_tokens
        assert r.n_spans <= r.masked_tokens  # spans are ≥1 token
        assert abs(r.mask_ratio_bp - r.masked_tokens * 10000 / r.n_tokens) < 1e-9
        masked_any += r.masked_tokens > 0
    assert masked_any > docs // 2  # ~10% start rate ⇒ most docs masked
    # determinism across re-runs (no RNG anywhere)
    again = {r.doc_id: r.masked_tokens for r in QUERIES["corpus_span_corruption"](spark, SF).collect()}
    assert all(again[r.doc_id] == r.masked_tokens for r in rows)


# -- wave 8: JL projection, weighted median, vocab coverage, bitemporal ----


def test_jl_distortion_concentrates(spark):
    """JL with k=16: E[distortion] = 1; all 28 probe-pair ratios must
    land in a generous concentration band and average near 1."""
    rows = QUERIES["emb_random_projection_jl"](spark, SF).collect()
    assert len(rows) == 28
    for r in rows:
        assert r.ia < r.ib < 8
        assert r.dorig2 > 0 and r.dproj2 > 0
        assert 0.2 < r.distortion < 5.0
    mean = sum(r.distortion for r in rows) / len(rows)
    assert 0.6 < mean < 1.6


def test_weighted_median_crafted_and_bounds(spark):
    """Values 1(w1), 2(w1), 3(w10): half of 12 is 6 → weighted median
    = 3, not the unweighted 2."""
    vals = [(1, 1), (2, 1), (3, 10)]
    tot = sum(w for _, w in vals)
    cum, wm = 0, None
    for v, w in sorted(vals):
        cum += w
        if 2 * cum >= tot:
            wm = v
            break
    assert wm == 3
    rows = QUERIES["w_weighted_median"](spark, SF).collect()
    assert len(rows) == 5
    li = load_table(spark, SF, "lineitem")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    for r in rows:
        assert lo - 0.01 <= r.wmedian_price <= hi + 0.01
        assert r.total_weight > 0


def test_vocab_coverage_bounds(spark):
    rows = QUERIES["text_vocab_coverage"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.n_in_vocab <= r.n_tokens
        assert abs(r.coverage_bp - r.n_in_vocab * 10000 / r.n_tokens) < 1e-9
    # the synthetic vocab is tiny, so top-100 should cover nearly all
    mean_cov = sum(r.coverage_bp for r in rows) / len(rows)
    assert mean_cov > 9000


def test_bitemporal_respects_both_axes(spark):
    rows = QUERIES["scd_bitemporal_asof"](spark, SF).collect()
    assert len(rows) > 0
    import datetime

    V = datetime.datetime(1996, 6, 1)
    T = datetime.datetime(1996, 6, 15)
    for r in rows[:50]:
        assert r.valid_from <= V
        assert r.recorded_at <= T
        assert r.recorded_at == r.valid_from + datetime.timedelta(days=r.version_line)


# -- wave 9: CUPED, hopping windows, blocking recall, dataset card ---------


def test_cuped_reduces_variance(spark):
    rows = QUERIES["a_abtest_cuped"](spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_users > 0
        assert r.var_raw >= 0 and r.var_cuped >= 0
        # CUPED with the pooled optimal theta cannot inflate variance
        # beyond float wiggle when x,y correlate; allow tiny slack
        assert r.var_cuped <= r.var_raw * 1.05 + 1e-9


def test_cuped_closed_form_matches_residual(spark):
    """var(y−θx) computed per-row equals the rearranged moment form."""
    import numpy as np

    rng = [(i, (i * 7) % 13, (i * 5) % 11) for i in range(50)]
    x = np.array([a for _, a, _ in rng], dtype=float)
    y = np.array([b for _, _, b in rng], dtype=float)
    n = len(x)
    theta = (n * (x * y).sum() - x.sum() * y.sum()) / (n * (x * x).sum() - x.sum() ** 2)
    direct = np.var(y - theta * x)
    nvary = n * (y * y).sum() - y.sum() ** 2
    ncov = n * (x * y).sum() - x.sum() * y.sum()
    nvarx = n * (x * x).sum() - x.sum() ** 2
    closed = (nvary - 2 * theta * ncov + theta * theta * nvarx) / n / n
    assert abs(direct - closed) < 1e-9


def test_hopping_windows_double_count(spark):
    rows = QUERIES["w_hopping_windows"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n = ev.count()
    # every event lands in exactly 2 hopping windows
    assert sum(r.n_events for r in rows) == 2 * n
    starts = {r.window_start for r in rows}
    for s in starts:
        assert s.hour % 3 == 0 and s.minute == 0 and s.second == 0


def test_blocking_recall_perfect(spark):
    row = QUERIES["er_blocking_recall"](spark, SF).collect()[0]
    assert row.n_truth > 0
    assert row.n_found == row.n_truth  # phonetic key collapses e→a
    assert row.recall == 1.0
    assert row.n_candidates >= row.n_found


def test_dataset_card_consistency(spark):
    row = QUERIES["corpus_dataset_card"](spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents")
    assert row.n_docs == docs.count()
    assert row.n_sources == docs.select("source").distinct().count()
    assert row.n_langs == docs.select("lang").distinct().count()
    assert abs(row.mean_tokens - row.total_tokens / row.n_docs) < 1e-9
    assert 0 <= row.pct_en_bp <= 10000
    assert 0 <= row.exact_dup_bp <= 10000
    assert 1 <= row.p50_tokens <= row.total_tokens


# -- wave 10: Mann-Whitney U, assortativity --------------------------------


def test_mannwhitney_crafted(spark):
    """Arms [1,2] vs [3,4]: ranks 1,2 vs 3,4; W_a=3, U_a=0 —
    replicate the W2 integer encoding used by the query."""
    vals = [(0, 1), (0, 2), (1, 3), (1, 4)]
    ranked = sorted(vals, key=lambda t: t[1])
    w2a = sum(2 * (i + 1) + 0 for i, (arm, _) in enumerate(ranked) if arm == 0)
    na = 2
    u2 = w2a - na * (na + 1)
    assert u2 / 2.0 == 0.0
    row = QUERIES["a_mannwhitney_u"](spark, SF).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.u_stat <= row.n_a * row.n_b
    assert abs(row.z) < 10


def test_assortativity_in_range(spark):
    row = QUERIES["graph_assortativity"](spark, SF).collect()[0]
    assert row.n_directed_edges >= 2
    assert -1.0 - 1e-9 <= row.assortativity <= 1.0 + 1e-9


# -- wave 11: KS test, permutation test ------------------------------------


def test_ks_crafted_disjoint_supports(spark):
    """Fully separated samples ([1,2] vs [10,20]) give D = 1 via the
    integer cum formulation."""
    vals = [(0, 1), (0, 2), (1, 10), (1, 20)]
    na = nb = 2
    ca = cb = 0
    best = 0
    for arm, _ in sorted(vals, key=lambda t: t[1]):
        if arm == 0:
            ca += 1
        else:
            cb += 1
        best = max(best, abs(ca * nb - cb * na))
    assert best / (na * nb) == 1.0
    row = QUERIES["a_ks_test"](spark, SF).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.d_stat <= 1
    assert row.ks_scaled >= 0


def test_permutation_test_pvalue_range(spark):
    row = QUERIES["a_permutation_test"](spark, SF).collect()[0]
    assert row.n_perms <= 200
    assert 0 <= row.n_extreme <= row.n_perms
    assert 0 < row.p_value <= 1
    # arms are themselves hash-assigned (a true null), so the observed
    # diff should NOT be extreme: p comfortably above the 1/201 floor
    assert row.p_value > 1 / 201


def test_permutation_test_deterministic(spark):
    a = QUERIES["a_permutation_test"](spark, SF).collect()[0]
    b = QUERIES["a_permutation_test"](spark, SF).collect()[0]
    assert a.p_value == b.p_value and a.n_extreme == b.n_extreme


# -- wave 12: survival hazard, decision stump, kNN classify ----------------


def test_survival_hazard_risk_set_monotone(spark):
    rows = sorted(QUERIES["a_survival_hazard"](spark, SF).collect(), key=lambda r: r.day)
    assert len(rows) > 0
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert rows[0].n_at_risk <= n_users
    # risk set only shrinks as duration grows; accounting closes
    for a, b in zip(rows, rows[1:]):
        assert b.n_at_risk <= a.n_at_risk - a.n_events - a.n_censored
    for r in rows:
        assert 0 <= r.n_events + r.n_censored <= r.n_at_risk
        assert abs(r.hazard_bp - r.n_events * 10000 / r.n_at_risk) < 1e-9
    assert sum(r.n_events for r in rows) > 0  # non-vacuous events
    # executable boundedness (lint allowlist: "reverse cumsum over the
    # day grain"): one output row per distinct duration day, so the
    # global-window input is calendar-bounded by construction
    n_days = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert len(rows) <= n_days


def test_decision_stump_beats_majority(spark):
    row = QUERIES["ml_decision_stump"](spark, SF).collect()[0]
    assert row.feature in ("n_tokens", "n_distinct")
    assert 0 <= row.gini <= 0.5 + 1e-9
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    majority_bp = max(n_en, n - n_en) * 10000 / n
    assert row.train_acc_bp >= majority_bp - 1e-9  # a stump can't lose to majority


def test_knn_classify_votes_consistent(spark):
    rows = QUERIES["ml_knn_classify"](spark, SF).collect()
    assert len(rows) == 10
    langs = {"en", "fr", "de", "es", "zh"}
    for r in rows:
        assert r.pred_lang in langs and r.true_lang in langs
        assert 1 <= r.n_votes <= 5
        assert r.correct == (1 if r.pred_lang == r.true_lang else 0)


# -- wave 13: personalized PageRank, split leakage, SRM check --------------


def test_ppr_concentrates_on_seed_neighborhood(spark):
    rows = QUERIES["graph_ppr_seeds"](spark, SF).collect()
    assert len(rows) == 20
    ps = [r.ppr for r in rows]
    assert ps == sorted(ps, reverse=True)
    assert all(p >= 0 for p in ps)
    # seeds are customers (node < 1e6); suppliers they buy from rank too
    assert any(r.node < 1000000 for r in rows)
    assert any(r.node >= 1000000 for r in rows)


def test_ppr_mass_at_seeds_only_round0(spark):
    """With damping<1 and teleport only to seeds, a node with NO path
    from any seed keeps rank 0 — check on a crafted 2-component
    graph."""
    from dicomdb_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(1,)], "node LONG")
    r = {row.node: row.r for row in personalized_pagerank(edges, seeds, iters=3).collect()}
    assert r[1] > 0 and r[2] > 0
    assert r[3] == 0 and r[4] == 0


def test_split_leakage_partitions_pairs(spark):
    rows = QUERIES["corpus_split_leakage"](spark, SF).collect()
    total_pairs = QUERIES["dedup_minhash_lsh"](spark, SF).count()
    assert sum(r.n_pairs for r in rows) == total_pairs
    assert abs(sum(r.share_bp for r in rows) - 10000.0) < 1e-6
    for r in rows:
        assert r.split_a <= r.split_b
        assert r.is_leakage == (0 if r.split_a == r.split_b else 1)
    # hash splits ignore duplicate structure → leakage MUST exist here
    assert any(r.is_leakage == 1 for r in rows)


def test_srm_check_healthy_assignment(spark):
    row = QUERIES["a_ab_srm_check"](spark, SF).collect()[0]
    n = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert row.n_a + row.n_b == n
    assert row.chi2 >= 0
    assert row.srm_flag in (0, 1)
    # md5 assignment is unbiased: chi2 should not trip at this n
    assert row.srm_flag == 0


# -- wave 14: rolling median, winsorized mean, longest streak --------------


def test_rolling_median_within_frame_bounds(spark):
    rows = QUERIES["w_rolling_median"](spark, SF).collect()
    assert len(rows) > 0
    ev = load_table(spark, SF, "events")
    mm = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type").agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()
    }
    for r in rows:
        assert 1 <= r.n_frame <= 21
        lo, hi = mm[r.event_type]
        assert lo - 1e-4 <= r.rolling_median <= hi + 1e-4


def test_winsorized_mean_between_bounds(spark):
    rows = QUERIES["a_winsorized_mean"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.lo_bound <= r.winsor_mean <= r.hi_bound
        assert r.n > 0


def test_winsorized_vs_raw_mean_robust(spark):
    """Winsorizing pulls the mean toward the median band — it must
    differ from the raw mean whenever the tails are asymmetric, and
    stay within the raw min/max regardless."""
    rows = {r.event_type: r for r in QUERIES["a_winsorized_mean"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    raw = {
        r.event_type: r.m
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    for t, r in rows.items():
        assert abs(r.winsor_mean - raw[t]) < (r.hi_bound - r.lo_bound)


def test_streak_longest_identities(spark):
    rows = QUERIES["w_streak_longest"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    days = {
        r.user_id: r.n
        for r in ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(rows) == len(days)
    for r in rows:
        assert r.active_days == days[r.user_id]
        assert 1 <= r.longest_streak <= r.active_days
        assert r.n_streaks >= 1
        # streaks × min-length + slack ≥ total days
        assert r.longest_streak * r.n_streaks >= r.active_days / r.n_streaks


# -- wave 15: temperature mix, edge jaccard, calendarization, pareto -------


def test_temperature_mix_flattens_shares(spark):
    rows = QUERIES["corpus_temperature_mix"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    total = docs.count()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert sum(r.n_docs for r in rows) == total
    # sqrt weighting compresses: small sources gain share, big lose
    for r in rows:
        raw = r.n_docs / total
        if raw > 1 / len(rows):
            assert r.share <= raw + 1e-9
        assert 0 <= r.expected_count <= total


def test_edge_jaccard_bounds(spark):
    rows = QUERIES["graph_edge_jaccard"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    js = [r.edge_jaccard for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert r.id1 < r.id2
        assert 0 <= r.edge_jaccard <= 1 + 1e-9
        assert r.common_neighbors >= 0


def test_calendarized_conserves_cents(spark):
    rows = QUERIES["a_revenue_calendarized"](spark, SF).collect()
    o = load_table(spark, SF, "orders")
    total_cents = o.select(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0].c
    recognized = round(sum(r.recognized_revenue for r in rows) * 100)
    assert recognized == total_cents  # the accounting invariant
    for r in rows:
        assert r.n_orders >= 1


def test_pareto_8020_thresholds(spark):
    row = QUERIES["a_pareto_8020"](spark, SF).collect()[0]
    assert 1 <= row.top_k <= row.n_customers
    assert row.revenue_share_bp >= 8000.0 - 1e-6
    assert 0 < row.share_of_customers_bp <= 10000.0


# -- wave 16: stickiness, best-match join, skew/kurtosis -------------------


def test_stickiness_bounds(spark):
    row = QUERIES["a_cohort_stickiness"](spark, SF).collect()[0]
    assert 1 <= row.min_dau <= row.max_dau <= row.mau
    assert row.dau_sum <= row.n_days * row.mau
    assert 0 < row.stickiness_bp <= 10000.0
    assert abs(row.stickiness_bp - row.dau_sum * 10000 / (row.n_days * row.mau)) < 1e-9


def test_best_match_unique_and_closest(spark):
    rows = QUERIES["j21_best_match_join"](spark, SF).collect()
    pairs = QUERIES["er_phonetic_pairs"](spark, SF).collect()
    probes = {r.probe for r in rows}
    # every token touched by a pair appears exactly once as a probe
    toks = {t for p in pairs for t in (p.tok1, p.tok2)}
    assert probes == toks
    assert len(rows) == len(probes)
    # the reported dist is the minimum among that probe's candidates
    byprobe = {}
    for p in pairs:
        byprobe.setdefault(p.tok1, []).append(p.dist)
        byprobe.setdefault(p.tok2, []).append(p.dist)
    for r in rows:
        assert r.dist == min(byprobe[r.probe])


def test_skew_kurtosis_vs_numpy(spark):
    """Two-level check of the r13 mean-shifted floor-scaled retrofit:
    (a) EXACT (1e-9) against a Python replay of the engine arithmetic
    (canonical-residue floor-mean, exact Σd/Σd², floor(d³/1e2) /
    floor(d⁴/1e4) sums, shifted-sum central-moment identities), and
    (b) coarse (1e-2) against plain numpy central moments — proving
    the floor-scale quantization stays an honest approximation of the
    true statistic at the natural value domain."""
    import math

    import numpy as np

    rows = QUERIES["a_skew_kurtosis"](spark, SF).collect()
    ev = load_table(spark, SF, "events").collect()
    byt = {}
    for e in ev:
        byt.setdefault(e.event_type, []).append(float(math.floor(e.value)))
    for r in rows:
        x = np.array(byt[r.event_type])
        n = len(x)
        s1 = int(x.sum())
        cc = (s1 - ((s1 % n + n) % n)) // n
        d = [int(v) - cc for v in x]
        rs = sum(d)
        s2 = sum(t * t for t in d)
        s3s = sum(math.floor(float(t) * float(t) * float(t) / 100.0) for t in d)
        s4s = sum(
            math.floor(float(t) * float(t) * float(t) * float(t) / 10000.0)
            for t in d
        )
        nd, rb = float(n), rs / n
        s2d, s3d, s4d = float(s2), s3s * 100.0, s4s * 10000.0
        m2 = max(s2d / nd - rb * rb, 0.0)
        m3 = s3d / nd - 3.0 * rb * (s2d / nd) + 2.0 * rb * rb * rb
        m4 = (
            s4d / nd - 4.0 * rb * (s3d / nd) + 6.0 * rb * rb * (s2d / nd)
            - 3.0 * rb * rb * rb * rb
        )
        assert abs(r.mean - s1 / n) < 1e-9
        if m2 == 0.0:
            assert r.skewness is None and r.kurtosis_excess is None
            continue
        assert abs(r.skewness - m3 / (m2 * math.sqrt(m2))) < 1e-9
        assert abs(r.kurtosis_excess - (m4 / (m2 * m2) - 3.0)) < 1e-9
        # honesty bound vs the true (unquantized) statistic
        m1 = x.mean()
        c = x - m1
        skew = (c**3).mean() / (c**2).mean() ** 1.5
        kurt = (c**4).mean() / (c**2).mean() ** 2 - 3
        assert abs(r.skewness - skew) < 1e-2
        assert abs(r.kurtosis_excess - kurt) < 1e-2
