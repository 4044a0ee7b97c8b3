"""Round-5 operators: gaps-and-islands, CDC compaction, HLL merge law,
MIPS + the norm-augmentation reduction, Gopher rules, incremental MV."""

from __future__ import annotations

from pyspark.sql import functions as F

from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _vals(df):
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


# -- gaps-and-islands ------------------------------------------------------


def test_gap_islands_semantics(spark):
    """Hand-built day sets → known islands (incl. duplicate days,
    singletons, and a 2-user interleave)."""
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-02"),
        (1, "2024-01-05"),
        (2, "2024-01-02"), (2, "2024-01-03"), (2, "2024-01-04"),
    ]
    df = spark.createDataFrame(rows, "user_id INT, day STRING").select(
        "user_id", F.to_date("day").alias("day")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    out = (
        df.withColumn("anchor", F.date_sub(F.col("day"), F.row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("s"),
            F.max("day").alias("e"),
            F.count("*").alias("n"),
        )
        .drop("anchor")
    )
    got = {(r.user_id, str(r.s), str(r.e), r.n) for r in out.collect()}
    assert got == {
        (1, "2024-01-01", "2024-01-02", 2),
        (1, "2024-01-05", "2024-01-05", 1),
        (2, "2024-01-02", "2024-01-04", 3),
    }


def test_gap_islands_cover_all_purchase_days(spark):
    """Islands partition the distinct purchase-day set: sum of island
    lengths == number of distinct (user, day) purchase pairs."""
    from dicomdb_spark.io import load_table

    islands = QUERIES["w_gap_islands"](spark, SF)
    n_in_islands = islands.agg(F.sum("island_days")).collect()[0][0]
    n_days = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert n_in_islands == n_days > 0


# -- CDC last-writer-wins --------------------------------------------------


def test_cdc_tombstone_removes_key(spark):
    """A key whose final op is the tombstone disappears; a later
    re-create survives; same-timestamp writers resolve by event_id."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, "signup", 1.0),
        (1, "2024-01-02 00:00:00", 11, "error", 0.0),   # deleted
        (2, "2024-01-01 00:00:00", 20, "signup", 1.0),
        (2, "2024-01-02 00:00:00", 21, "error", 0.0),
        (2, "2024-01-03 00:00:00", 22, "click", 2.0),   # re-created
        (3, "2024-01-01 00:00:00", 31, "view", 3.0),    # ts tie:
        (3, "2024-01-01 00:00:00", 30, "error", 0.0),   # id 31 wins
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts STRING, event_id INT, event_type STRING, value DOUBLE"
    ).select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
        "event_type",
        "value",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    state = (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
    )
    got = {(r.user_id, r.event_type) for r in state.collect()}
    assert got == {(2, "click"), (3, "view")}


# -- HLL merge law ---------------------------------------------------------


def test_hll_merge_equals_direct(spark):
    """estimate(merge(per-part registers)) == estimate(direct) for an
    arbitrary 3-way split — the mergeability law the sketch_hll_merge
    oracle checks end-to-end at region level."""
    from dicomdb_spark.functions import sketches
    from dicomdb_spark.io import load_table

    cust = load_table(spark, SF, "customer").select(
        F.col("c_custkey").cast("string").alias("ck"),
        (F.col("c_custkey") % 3).alias("part"),
        F.lit(1).alias("g"),
    )
    per_part = sketches.hll_registers(cust, "part", "ck", p=6)
    merged = (
        per_part.withColumn("g", F.lit(1))
        .groupBy("g", "b")
        .agg(F.max("r").alias("r"))
    )
    est_merged = sketches.hll_estimate_from_registers(merged, "g", p=6).collect()
    direct = sketches.hll_distinct(cust, "g", "ck", p=6).collect()
    assert est_merged[0]["n_est"] == direct[0]["n_est"]
    assert est_merged[0]["zero_regs"] == direct[0]["zero_regs"]


# -- MIPS ------------------------------------------------------------------


def test_mips_augmentation_rank_equivalence(spark):
    """Cosine top-k over norm-augmented vectors == MIPS top-k on the
    raw vectors (Bachrach et al. 2014 reduction), neighbor-for-
    neighbor in rank order."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.llm import similarity as lsim

    emb = load_table(spark, SF, "embeddings").limit(60)
    queries = emb.filter(F.col("vec_id") < 5)
    mips = QUERIES  # noqa: F841 (registry import keeps parity context)
    direct = {
        (r.query_id, r.rank): r.neighbor_id
        for r in lsim.mips_topk(emb, queries, k=4).collect()
    }
    c_aug, q_aug = lsim.mips_augment(emb, queries)
    via_cosine = {
        (r.query_id, r.rank): r.neighbor_id
        for r in lsim.brute_force_topk(
            c_aug, q_aug, id_col="vec_id", vec_col="aug", k=4
        ).collect()
    }
    assert direct == via_cosine


# -- Gopher rules ----------------------------------------------------------


def test_gopher_rules_on_crafted_docs(spark):
    from dicomdb_spark.functions import text as T

    good = " ".join(["the quick brown foxes jumped over seven lazy dogs and"] * 6)
    short = "too short"
    symbols = " ".join(["####"] * 60)
    rows = [(1, good), (2, short), (3, symbols)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in df.select("doc_id", *T.gopher_signals("text")).collect()}
    assert out[1].gopher_pass is True
    assert out[2].gopher_pass is False          # word-count floor
    assert out[3].gopher_pass is False          # symbol ratio + no letters
    assert out[1].n_words == 60
    assert out[3].alpha_ratio == 0.0


# -- incremental MV --------------------------------------------------------


def test_incremental_mv_split_invariance(spark):
    """The merged MV is identical no matter how the fact table is
    split into partials — 1-way (direct) vs the query's 2-way vs a
    5-way hash split."""
    from dicomdb_spark.io import load_table

    orders = load_table(spark, SF, "orders")

    def partial(df):
        return df.groupBy("o_custkey").agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev_i"),
            F.count("*").alias("n_orders"),
        )

    direct = partial(orders)
    five = None
    for i in range(5):
        p = partial(orders.filter(F.col("o_orderkey") % 5 == i))
        five = p if five is None else five.unionByName(p)
    five = five.groupBy("o_custkey").agg(
        F.sum("rev_i").alias("rev_i"), F.sum("n_orders").alias("n_orders")
    )
    assert _vals(direct) == _vals(five)


# -- BPE training ----------------------------------------------------------


def test_bpe_train_learns_known_merge(spark):
    """'ab' is the most frequent adjacent pair → first learned merge;
    the second round counts over REWRITTEN streams."""
    from dicomdb_spark.llm import corpus as C

    rows = [(1, "abab abab"), (2, "abc abd"), (3, "xy")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r.step: (r.pair, r.merged) for r in C.bpe_train(df, "text", iters=2).collect()}
    assert got[1] == ("a b", "ab")
    # after merging 'a b'→'ab': streams are 'ab ab', 'ab c', 'ab d', 'x y'
    # pair counts: 'ab ab'×2 (two words of corpus? doc1 has two tokens 'abab')
    assert got[2] == ("ab ab", "abab")


def test_bpe_greedy_left_application(spark):
    """Greedy left-to-right: 'a a a' → ['aa','a']; the ABAB run merges
    BOTH pairs (the case a single-space encoding silently skips)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(" a  a  a ",), (" a  b  a  b ",)], "stream STRING"
    )
    out = sorted(
        r["s"]
        for r in df.select(
            F.replace(F.col("stream"), F.lit(" a  a "), F.lit(" aa ")).alias("s0")
        ).select(
            F.replace(F.col("s0"), F.lit(" a  b "), F.lit(" ab ")).alias("s")
        ).collect()
    )
    assert out == [" aa  a ", " ab  ab "]


# -- theta set ops ---------------------------------------------------------


def test_theta_setops_exact_when_unsaturated(spark):
    """With fewer than k distinct hashes per side, θ = 2^32 and both
    estimates are exactly the true counts."""
    from dicomdb_spark.functions import sketches

    a = spark.createDataFrame([(f"x{i}",) for i in range(40)], "it STRING")
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 60)], "it STRING")
    r = sketches.kmv_theta_set_ops(a, b, "it", k=256).collect()[0]
    assert r.n_union_exact == 60 and r.n_union_est == 60.0
    assert r.n_inter_exact == 20 and r.n_inter_est == 20.0


def test_theta_setops_estimates_in_bounds(spark):
    """Saturated sketches: estimates land within ~5 standard errors
    (1/sqrt(k)) of truth on the shingle corpus."""
    from dicomdb_spark.registry import QUERIES

    r = QUERIES["sketch_kmv_set_ops"](spark, SF).collect()[0]
    for est, exact in ((r.n_union_est, r.n_union_exact),
                      (r.n_inter_est, r.n_inter_exact)):
        if exact > 0:
            assert abs(est - exact) / exact < 5 / (256 ** 0.5) + 0.05


# -- EMA -------------------------------------------------------------------


def test_ema_halflife_crafted(spark):
    """First event: ema == value.  Constant series: ema == constant.
    Step series: exact 8:4:2:1 weighting."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (1, 2, "2024-01-01 00:01:00", 10.0),
        (2, 3, "2024-01-01 00:00:00", 0.0),
        (2, 4, "2024-01-01 00:01:00", 0.0),
        (2, 5, "2024-01-01 00:02:00", 0.0),
        (2, 6, "2024-01-01 00:03:00", 15.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, event_id INT, ts STRING, value DOUBLE"
    ).select("user_id", "event_id",
             F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    import dicomdb_spark.registry as R

    from tests.conftest import patched_load_table

    with patched_load_table(lambda spark_, sf_, name: df):
        out = {r.event_id: r.ema for r in R.QUERIES["w_ema_halflife"](spark, SF).collect()}
    assert out[1] == 10.0 and out[2] == 10.0
    assert out[5] == 0.0
    assert out[6] == 15.0 * 8 / 15  # 8·15/(8+4+2+1)


# -- dedup pipeline --------------------------------------------------------


def test_pipeline_consistent_with_components(spark):
    """kept = all docs − non-keeper component members, cross-checked
    against the dedup_components query's keeper/member counts."""
    from dicomdb_spark.registry import QUERIES, _docs_with_dupes

    kept = QUERIES["corpus_dedup_pipeline"](spark, SF)
    comps = QUERIES["dedup_components"](spark, SF)
    n_docs = _docs_with_dupes(spark, SF).count()
    dropped = comps.agg(
        F.sum(F.col("n_members") - 1).alias("d")
    ).collect()[0]["d"] or 0
    assert kept.count() == n_docs - dropped


# -- rolling HLL -----------------------------------------------------------


def test_hll_rolling_dominates_daily(spark):
    """A 7-day window's register set dominates each member day's, so
    its estimate is >= every daily estimate in the window; the first
    day's window (no predecessors) equals its daily sketch exactly."""
    from dicomdb_spark.functions import sketches
    from dicomdb_spark.io import load_table

    ev = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("string").alias("u")
    )
    daily = {r["day"]: r["n_est"]
             for r in sketches.hll_distinct(ev, "day", "u", p=8).collect()}
    rolling = {r["day"]: r["n_est"]
               for r in QUERIES["sketch_hll_rolling"](spark, SF).collect()}
    first = min(daily)
    assert rolling[first] == daily[first]
    for d, est in rolling.items():
        assert est >= daily[d] - 1e-9


# -- attribution -----------------------------------------------------------


def test_attribution_window_semantics(spark):
    """Only clicks in (purchase−2h, purchase] attribute; equal split."""
    rows = [
        (1, 1, "2024-01-01 10:00:00", "click", 0.0),
        (1, 2, "2024-01-01 11:30:00", "click", 0.0),
        (1, 3, "2024-01-01 12:00:00", "purchase", 30.0),
        (1, 4, "2024-01-01 09:59:59", "click", 0.0),   # outside 2h
        (2, 5, "2024-01-01 12:00:00", "purchase", 9.0),  # no touches
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, event_id INT, ts STRING, event_type STRING, value DOUBLE"
    ).select("user_id", "event_id",
             F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type", "value")
    import dicomdb_spark.registry as R

    from tests.conftest import patched_load_table

    with patched_load_table(lambda s_, sf_, n_: df):
        out = {r.purchase_id: (r.n_touches, r.credit_per_touch)
               for r in R.QUERIES["w_attribution_linear"](spark, SF).collect()}
    assert out == {3: (2, 15.0)}  # purchase 5 has no touches → absent


# -- rolling range sum -----------------------------------------------------


def test_rolling_range_frame_includes_same_day(spark):
    """RANGE frame: same-day rows include each other; day 8 excludes
    day 1 (distance 7 > 6)."""
    rows = [
        (101, 1, "1992-01-01", 10.0),
        (102, 1, "1992-01-01", 20.0),
        (103, 1, "1992-01-07", 1.0),
        (104, 1, "1992-01-08", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey INT, o_custkey INT, o_orderdate STRING, o_totalprice DOUBLE"
    ).select("o_orderkey", "o_custkey",
             F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
             "o_totalprice")
    import dicomdb_spark.registry as R

    from tests.conftest import patched_load_table

    with patched_load_table(lambda s_, sf_, n_: df):
        out = {r.o_orderkey: r.rolling_rev
               for r in R.QUERIES["w_rolling_range_sum"](spark, SF).collect()}
    assert out[101] == 30.0 and out[102] == 30.0   # same-day mutual
    assert out[103] == 31.0                         # days 1..7
    assert out[104] == 6.0                          # days 2..8: 1+5


# -- shuffle batches -------------------------------------------------------


def test_shuffle_batches_partition_and_positions(spark):
    """Batches partition the corpus; positions are 1..|batch| dense."""
    out = QUERIES["corpus_shuffle_batches"](spark, SF).collect()
    from collections import defaultdict

    by_batch = defaultdict(list)
    for r in out:
        by_batch[r.batch_id].append(r.pos)
    assert sum(len(v) for v in by_batch.values()) == len(out)
    assert len({r.doc_id for r in out}) == len(out)
    for poss in by_batch.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# -- MAD outliers ----------------------------------------------------------


def test_mad_median_low_semantics(spark):
    """Even-sized group → LOWER middle; outlier rule is > 3×MAD."""
    rows = [
        ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 4, 100.0),
    ]
    df = spark.createDataFrame(rows, "event_type STRING, event_id INT, value DOUBLE")
    import dicomdb_spark.registry as R

    from tests.conftest import patched_load_table

    with patched_load_table(lambda s_, sf_, n_: df):
        r = R.QUERIES["a_mad_outliers"](spark, SF).collect()[0]
    assert r.median_low == 2.0          # lower middle of {1,2,3,100}
    # deviations {1,0,1,98} → sorted {0,1,1,98} → median-low = 1
    assert r.mad_low == 1.0
    assert r.n_outliers == 1            # only 98 > 3


# -- interval overlap ------------------------------------------------------


def test_interval_overlap_exactness(spark):
    """Grid join == plain predicate join (pair sets identical), and
    every reported overlap is positive-length or touching."""
    from dicomdb_spark.io import load_table

    out = QUERIES["j14_interval_overlap"](spark, SF)
    rows = out.collect()
    ev = load_table(spark, SF, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("sid"), F.col("ts").alias("ss"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("se"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("eid"),
        F.col("ts").alias("es"), (F.col("ts") + F.expr("INTERVAL 1 HOURS")).alias("ee"))
    plain = s.join(e, (F.col("user_id") == F.col("u2"))
                   & (F.col("ss") <= F.col("ee")) & (F.col("es") <= F.col("se")))
    assert {(r.signup_id, r.error_id) for r in rows} == \
           {(r.sid, r.eid) for r in plain.collect()}
    assert all(r.overlap_s >= 0 for r in rows)


# -- CCNet buckets ---------------------------------------------------------


def test_ccnet_buckets_are_terciles(spark):
    out = QUERIES["text_ccnet_buckets"](spark, SF).collect()
    from collections import Counter

    c = Counter(r.ppl_bucket for r in out)
    assert set(c) == {"head", "middle", "tail"}
    assert max(c.values()) - min(c.values()) <= 1
    head_min = min(r.avg_bigram_freq for r in out if r.ppl_bucket == "head")
    tail_max = max(r.avg_bigram_freq for r in out if r.ppl_bucket == "tail")
    assert head_min >= tail_max


# -- IVF-PQ ----------------------------------------------------------------


def test_ivf_pq_respects_cells(spark):
    """Every IVF-PQ neighbor shares its query's coarse cell, and per
    query at most top-3 dense ranks come back."""
    out = QUERIES["ann_ivf_pq_topk"](spark, SF).collect()
    from dicomdb_spark.io import load_table
    from dicomdb_spark.llm import similarity as lsim
    from pyspark.sql import Window

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid0"), F.col("v").alias("cv"))
    sc = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid0", lsim.dot_exact_vec(F.col("v"), F.col("cv")).alias("dp"))
    w = Window.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("cid0"))
    cell = {r.vec_id: r.cid0 for r in sc.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).collect()}
    assert len(out) > 0
    from collections import defaultdict

    ranks = defaultdict(list)
    for r in out:
        assert cell[r.query_id] == cell[r.neighbor_id]
        ranks[r.query_id].append(r.rank)
    for rs in ranks.values():
        assert sorted(rs) == list(range(1, len(rs) + 1)) and len(rs) <= 3


def test_theta_diff_identities(spark):
    """Exact identities: union = inter + diff(A,B) + diff(B,A); the
    unsaturated case reports the difference exactly too."""
    from dicomdb_spark.functions import sketches

    a = spark.createDataFrame([(f"x{i}",) for i in range(40)], "it STRING")
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 60)], "it STRING")
    r = sketches.kmv_theta_set_ops(a, b, "it", k=256).collect()[0]
    assert r.n_diff_exact == 20 and r.n_diff_est == 20.0
    assert r.n_union_exact == r.n_inter_exact + r.n_diff_exact + 20


# -- Benford / skew / compaction -------------------------------------------


def test_benford_counts_partition(spark):
    """Digit counts partition each group exactly (prices >= 1)."""
    for r in QUERIES["a_benford_audit"](spark, SF).collect():
        assert sum(r[f"o{d}"] for d in range(1, 10)) == r.n
        assert r.chi2 >= 0.0


def test_skew_profile_identities(spark):
    r = QUERIES["a_key_skew_profile"](spark, SF).collect()[0]
    assert r.n_rows >= r.n_keys >= 1
    assert r.max_freq >= 1 and 0 < r.top1_share <= 1
    assert r.mean_freq * r.n_keys == r.n_rows or abs(
        r.mean_freq - r.n_rows / r.n_keys) < 1e-12


def test_compaction_bins_monotone_and_bounded(spark):
    """Within (source, bin): cum_before windows are contiguous; every
    bin except possibly the last starts below the 64 KiB target."""
    rows = QUERIES["layout_compaction_bins"](spark, SF).collect()
    from collections import defaultdict

    per_src = defaultdict(list)
    for r in rows:
        per_src[r.source].append(r)
    for src, rs in per_src.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.cum_before == cum
            assert r.bin_id == cum // 65536
            cum += r.n_chars


# -- streaming LWW twin ----------------------------------------------------


def test_stateful_lww_matches_batch(spark, tmp_path):
    """Streaming CDC compaction converges to the batch
    cdc_last_writer_state result — same winners, same op counts —
    across a 3-way micro-batch split of the log."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.streaming.stateful import stateful_lww

    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    batch = {
        r.user_id: (r.last_ts, r.last_op, r.last_value, r.ops_applied)
        for r in QUERIES["cdc_last_writer_state"](spark, SF).collect()
    }
    tombstoned = (  # keys whose final op is the tombstone: absent above
        ev.count() and True
    )
    src = tmp_path / "lww_src"
    src.mkdir()
    rows = ev.orderBy("ts", "event_id").collect()
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    for i, chunk in enumerate((rows[:cut1], rows[cut1:cut2], rows[cut2:])):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    stream_df = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = stateful_lww(stream_df)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lww_out")
        .option("checkpointLocation", str(tmp_path / "lww_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("select * from lww_out").collect()
    finally:
        q.stop()
    # final state per key = emission with max ops_applied
    final = {}
    for r in emitted:
        if r.user_id not in final or r.ops_applied > final[r.user_id].ops_applied:
            final[r.user_id] = r
    got = {
        u: (r.last_ts, r.last_op, r.last_value, r.ops_applied)
        for u, r in final.items()
        if r.last_op != "error"          # consumer filters tombstones
    }
    assert tombstoned and got == batch


def test_multiprobe_dominates_single_table(spark):
    """Probing the 8 Hamming-1 buckets can only ADD candidates: for
    every query in both result sets, the multiprobe rank-1 cosine is
    >= the single-bucket rank-1 cosine."""
    single = {r.query_id: r.cosine_sim
              for r in QUERIES["ann_lsh_topk"](spark, SF).collect()
              if r.rank == 1 and r.query_id < 10}
    multi = {r.query_id: r.cosine_sim
             for r in QUERIES["ann_lsh_multiprobe_topk"](spark, SF).collect()
             if r.rank == 1}
    assert multi  # queries found neighbors
    for q, cs in single.items():
        if q in multi:
            assert multi[q] >= cs - 1e-12


# -- CMS merge / band tuning ----------------------------------------------


def test_cms_merge_equals_direct_sketch(spark):
    """merge(per-shard counter tables) == the direct global sketch,
    cell for cell — the additive merge law."""
    from dicomdb_spark.functions import sketches
    from dicomdb_spark.io import load_table
    from dicomdb_spark.functions import text as T

    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        (F.col("doc_id") % 4).alias("shard"),
        F.explode(F.transform(T.tokens("text"), lambda t: F.lower(t))).alias("item"),
    )
    direct = sketches.count_min(toks.select("item"), "item", depth=4, width_chars=2)
    cells = F.explode(sketches.cms_cells(F.col("item"), 4, 2)).alias("cell")
    merged = (
        toks.select("shard", cells)
        .select("shard", F.col("cell.d").alias("d"), F.col("cell.col").alias("col"))
        .groupBy("shard", "d", "col").agg(F.count("*").alias("c"))
        .groupBy("d", "col").agg(F.sum("c").alias("c"))
    )
    assert _vals(direct) == _vals(merged)


def test_band_tuning_s_curve(spark):
    """More bands (fewer rows per band) can only ADD candidates —
    the monotone cost side of the LSH recall/cost trade."""
    got = {r.bands: r.n_candidates
           for r in QUERIES["dedup_band_tuning"](spark, SF).collect()}
    assert set(got) == {2, 4, 8}
    assert got[2] <= got[4] <= got[8]


# -- join size / markov / triangles ---------------------------------------


def test_join_size_estimate_upper_bounds_truth(spark):
    r = QUERIES["sketch_join_size"](spark, SF).collect()[0]
    assert r.est_size >= r.true_size > 0
    assert r.over_ratio >= 1.0


def test_markov_rows_are_distributions(spark):
    from collections import defaultdict

    rows = QUERIES["w_markov_transitions"](spark, SF).collect()
    by_prev = defaultdict(float)
    for r in rows:
        assert 0 < r.p <= 1
        by_prev[r.prev_type] += r.p
    for s in by_prev.values():
        assert abs(s - 1.0) < 1e-9


def test_triangles_on_known_graph(spark):
    """Triangle + coefficient ground truth on a hand graph: one
    triangle (1,2,3) plus a pendant 4-3."""
    from dicomdb_spark.llm import dedup as ld  # noqa: F401 (module parity)
    from pyspark.sql import functions as F
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id1 long, id2 long")
    e1 = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    e2 = pairs.select(F.col("id1").alias("b"), F.col("id2").alias("c"))
    e3 = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c").collect()
    assert {(r.a, r.b, r.c) for r in tri} == {(1, 2, 3)}


# -- phonetic ER -----------------------------------------------------------


def test_phonetic_key_classics(spark):
    """Classic Soundex pairs collide; unrelated words do not."""
    from dicomdb_spark.functions import text as T

    df = spark.createDataFrame(
        [("robert",), ("rupert",), ("ashcraft",), ("tymczak",), ("table",)],
        "w STRING",
    )
    keys = {r.w: r.k for r in df.select("w", T.phonetic_key("w").alias("k")).collect()}
    assert keys["robert"] == keys["rupert"] == "R163"
    assert keys["table"] != keys["robert"]
    assert all(len(k) == 4 for k in keys.values())


def test_phonetic_pairs_find_injected_typos(spark):
    """Every emitted pair is distance <= 1 with matching keys; the
    vowel-swap injections guarantee at least one pair at sf0.01."""
    from dicomdb_spark.functions import text as T  # noqa: F401

    rows = QUERIES["er_phonetic_pairs"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.dist <= 1 and r.tok1 < r.tok2


# -- portable SQL / semantic pipeline -------------------------------------


def test_portable_sql_text_is_shared(spark):
    """The oracle string and the spark.sql input are the SAME text."""
    from dicomdb_spark.registry import ORACLES, _PORTABLE_SQL

    assert ORACLES["sql_dialect_portable"] == _PORTABLE_SQL


def test_semantic_pipeline_consistency(spark):
    """kept ids = all vectors − non-keeper members of cosine
    components; injected near-dup copies are removed."""
    from dicomdb_spark.registry import _emb_with_dupes

    kept = {r.vec_id for r in
            QUERIES["corpus_semantic_dedup_pipeline"](spark, SF).collect()}
    allv = {r.vec_id for r in _emb_with_dupes(spark, SF).select("vec_id").collect()}
    assert kept < allv  # something was dropped
    pairs = QUERIES["dedup_embedding_cosine"](spark, SF).collect()
    # every >=0.99 pair has at most one survivor
    for p in pairs:
        assert not (p.id1 in kept and p.id2 in kept)


def test_containment_prefix_filter_is_lossless(spark):
    """The asymmetric containment prefix filter reproduces the plain
    inverted index exactly (the theorem, not just the arithmetic).
    Target = an UNCAPPED engine run (max_df=None), not the registry's
    dedup_ngram_containment — that entry carries the df ≤ 32 cap, and
    equality against it only holds while no qualifying pair shares
    exclusively hot shingles on this fixture (the cap's own contract
    is tests/test_dfcap.py)."""
    from dicomdb_spark.llm import dedup as ldedup
    from dicomdb_spark.registry import _docs_with_dupes
    from dicomdb_spark.session import local_fanout

    uncapped = ldedup.ngram_containment_pairs(
        _docs_with_dupes(spark, SF), "doc_id", "text", n=3,
        threshold=0.9, min_parallelism=local_fanout(spark), max_df=None,
    )
    assert _vals(QUERIES["dedup_prefix_containment"](spark, SF)) == \
           _vals(uncapped)
