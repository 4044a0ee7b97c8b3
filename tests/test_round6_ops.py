"""Round-6 operators: OHLC bars, time-weighted averages, sweep-line
concurrency, k-core, bipartite co-occurrence, profiling/constraint
audits, corpus n-gram stats, inverted index, hash splits, embedding
stats and int8 quantization."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


# -- OHLC bars -------------------------------------------------------------


def test_ohlc_crafted(spark):
    """Known per-day path → known open/close/high/low; same-timestamp
    rows break ties by event_id."""
    rows = [
        (1, "2024-01-01 09:00:00", 10, 5.0),
        (1, "2024-01-01 10:00:00", 11, 9.0),
        (1, "2024-01-01 11:00:00", 12, 1.0),
        (1, "2024-01-01 12:00:00", 13, 7.0),
        (1, "2024-01-01 12:00:00", 14, 3.0),  # same ts, higher id → close
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts STRING, event_id INT, value DOUBLE"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id", "value")
    w_a = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_d = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    d = df.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    out = d.groupBy("user_id").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("o"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("c"),
        F.max("value").alias("h"),
        F.min("value").alias("l"),
    ).collect()[0]
    assert (out.o, out.c, out.h, out.l) == (5.0, 3.0, 9.0, 1.0)


def test_ohlc_bounds_hold(spark):
    bars = QUERIES["w_ohlc_bars"](spark, SF)
    bad = bars.filter(
        (F.col("low_val") > F.col("high_val"))
        | (F.col("open_val") < F.col("low_val"))
        | (F.col("open_val") > F.col("high_val"))
        | (F.col("close_val") < F.col("low_val"))
        | (F.col("close_val") > F.col("high_val"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0 and bars.count() > 0


# -- time-weighted average -------------------------------------------------


def test_twa_crafted(spark):
    """v=1 held 10 s then v=3 held 30 s → twa = (10 + 90)/40 = 2.5;
    the trailing event contributes no segment."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (1, "2024-01-01 00:00:10", 2, 3.0),
        (1, "2024-01-01 00:00:40", 3, 99.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts STRING, event_id INT, value DOUBLE"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = df.select(
        "user_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("vi"),
        F.unix_timestamp("ts").alias("sec"),
        "ts",
        "event_id",
    ).withColumn("next_sec", F.lead(F.unix_timestamp("ts")).over(w))
    seg = d.filter(F.col("next_sec").isNotNull()).withColumn(
        "dt", F.col("next_sec") - F.col("sec")
    )
    row = seg.groupBy("user_id").agg(
        (F.sum(F.col("vi") * F.col("dt")).cast("double") / F.sum("dt") / 1e6).alias("twa"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.n == 2
    assert abs(row.twa - 2.5) < 1e-9


def test_twa_between_min_and_max(spark):
    twa = QUERIES["w_time_weighted_avg"](spark, SF)
    ev = load_table(spark, SF, "events")
    mm = ev.groupBy("user_id").agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bad = (
        twa.join(mm, "user_id")
        .filter((F.col("twa") < F.col("lo") - 1e-6) | (F.col("twa") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0 and twa.count() > 0


# -- sweep-line concurrency ------------------------------------------------


def test_concurrency_crafted_half_open(spark):
    """Three overlapping 300 s sessions peak at 3; two sessions
    exactly 300 s apart do NOT overlap (half-open intervals)."""
    rows = [
        ("a", "2024-01-01 00:00:00", 1),
        ("a", "2024-01-01 00:01:00", 2),
        ("a", "2024-01-01 00:02:00", 3),
        ("b", "2024-01-01 00:00:00", 4),
        ("b", "2024-01-01 00:05:00", 5),  # starts exactly as #4 ends
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts STRING, event_id INT").select(
        "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id"
    )
    starts = df.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id")
    ends = df.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionAll(ends).withColumn("conc", F.sum("delta").over(w))
    peaks = {
        r.event_type: r.peak
        for r in run.groupBy("event_type").agg(F.max("conc").alias("peak")).collect()
    }
    assert peaks == {"a": 3, "b": 1}


def test_concurrency_peak_bounds(spark):
    out = QUERIES["w_concurrency_peak"](spark, SF)
    ev = load_table(spark, SF, "events")
    per_type = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for r in out.collect():
        assert 1 <= r.peak <= per_type[r.event_type]


# -- k-core ----------------------------------------------------------------


def test_kcore_peels_pendant_keeps_triangle(spark):
    """Triangle + pendant vertex: the pendant (degree 1) peels, the
    triangle survives with core degree 2 everywhere."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]  # 4 is pendant
    pairs = spark.createDataFrame(edges, "id1 INT, id2 INT")
    e = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).unionAll(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    for _ in range(3):
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        v = deg.filter(F.col("deg") >= 2).select("src")
        e = (
            e.join(F.broadcast(v), "src")
            .join(F.broadcast(v.withColumnRenamed("src", "dst")), "dst")
            .select("src", "dst")
        )
    got = {(r.src, r.deg) for r in e.groupBy("src").agg(F.count("*").alias("deg")).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_subset_of_graph(spark):
    core = QUERIES["graph_kcore"](spark, SF)
    assert core.filter(F.col("core_degree") < 2).count() == 0


# -- bipartite co-occurrence -----------------------------------------------


def test_cooccurrence_bounded_by_marginals(spark):
    out = QUERIES["graph_cooccurrence"](spark, SF)
    ev = load_table(spark, SF, "events")
    marg = {
        r.event_type: r.n
        for r in ev.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.type_a < r.type_b
        assert 1 <= r.n_users <= min(marg[r.type_a], marg[r.type_b])


# -- profiling / constraint audit ------------------------------------------


def test_profile_columns_consistent(spark):
    prof = {r.col_name: r for r in QUERIES["a_profile_columns"](spark, SF).collect()}
    n = load_table(spark, SF, "orders").count()
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    }
    for r in prof.values():
        assert r.n_rows == n
        assert 0 <= r.n_null <= n
        assert 1 <= r.n_distinct <= n
    assert prof["o_orderkey"].n_distinct == n  # primary key
    assert prof["o_orderkey"].min_num <= prof["o_orderkey"].max_num
    assert prof["o_orderstatus"].min_len <= prof["o_orderstatus"].max_len


def test_constraint_audit_clean_on_synthetic(spark):
    """The generated TPC-H-ish data is referentially consistent, so
    every audit rule reports zero violations (and the report always
    emits all five rules)."""
    out = {r.constraint_name: r.n_violations for r in QUERIES["a_constraint_audit"](spark, SF).collect()}
    assert len(out) == 5
    assert all(v == 0 for v in out.values()), out


def test_constraint_audit_detects_injected_orphan(spark):
    """The anti-join rule actually fires: an order pointing at a
    non-existent customer is counted."""
    o = spark.createDataFrame([(1, 10), (2, 999999)], "o_orderkey INT, o_custkey INT")
    c = spark.createDataFrame([(10,)], "c_custkey INT")
    n = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    assert n == 1


# -- corpus n-gram / inverted index ----------------------------------------


def test_ngram_topk_counts_match_manual(spark):
    from dicomdb_spark.functions import text as T

    out = QUERIES["text_ngram_topk"](spark, SF)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    docs = load_table(spark, SF, "documents")
    manual = (
        docs.select(F.explode(T.shingles("text", 3)).alias("g"))
        .filter(F.col("g") == rows[0].gram)
        .count()
    )
    assert rows[0].n == manual
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_inverted_index_postings_sorted_and_counted(spark):
    rows = QUERIES["text_inverted_index"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 20)
        assert r.df >= 2


# -- hash split ------------------------------------------------------------


def test_split_hash_partitions_and_stable(spark):
    out1 = {r.split: (r.n_docs, r.total_chars) for r in QUERIES["corpus_split_hash"](spark, SF).collect()}
    out2 = {r.split: (r.n_docs, r.total_chars) for r in QUERIES["corpus_split_hash"](spark, SF).collect()}
    assert out1 == out2  # deterministic, no RNG
    docs = load_table(spark, SF, "documents")
    total = docs.count()
    assert sum(v[0] for v in out1.values()) == total
    # 80/10/10 by hash: loose bounds for a small corpus
    assert out1["train"][0] / total > 0.6


# -- embedding stats / quantization ----------------------------------------


def test_emb_dim_stats_shape(spark):
    out = QUERIES["emb_dim_stats"](spark, SF).collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert len(out) == 64
    for r in out:
        assert r.n == n_vecs
        assert r.min_val <= r.mean_val + 1e-6
        assert r.mean_val - 1e-6 <= r.max_val


def test_int8_quantize_error_bounded(spark):
    """Per-element quantization error ≤ scale/2 ⇒ MSE ≤ (maxabs/127)²;
    the max-|x| element saturates, so every dim has ≥ 1 saturated
    code."""
    out = QUERIES["emb_int8_quantize"](spark, SF).collect()
    assert len(out) == 64
    for r in out:
        assert 0 <= r.mse <= (r.maxabs / 127.0) ** 2 + 1e-12
        assert r.n_saturated >= 1


# -- wave 2: forward asof, A/B z-test, session paths, quality funnel -------


def test_asof_forward_crafted(spark):
    """Forward as-of picks the EARLIEST right row at-or-after each
    left timestamp; equal timestamps match (>= semantics)."""
    from dicomdb_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 100), (1, "2024-01-01 00:00:20", 101)],
        "user_id INT, ts STRING, event_id INT",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 7), (1, "2024-01-01 00:00:07", 8),
         (1, "2024-01-01 00:00:30", 9)],
        "user_id INT, ts STRING, rid INT",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "rid")
    out = asof_join(left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
                    value_cols=["rid"], direction="forward")
    got = {r.event_id: r.rid_asof for r in out.collect()}
    assert got == {100: 7, 101: 9}


def test_asof_forward_none_after(spark):
    """A left row after every right row gets NULL."""
    from dicomdb_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 1)], "user_id INT, ts STRING, event_id INT"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5)], "user_id INT, ts STRING, rid INT"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "rid")
    out = asof_join(left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
                    value_cols=["rid"], direction="forward").collect()
    assert out[0].rid_asof is None


def test_ab_test_counts_partition_users(spark):
    row = QUERIES["a_ab_test_zscore"](spark, SF).collect()[0]
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert row.n_a + row.n_b == n_users
    assert 0 <= row.conv_a <= row.n_a and 0 <= row.conv_b <= row.n_b
    assert abs(row.rate_a - row.conv_a / row.n_a) < 1e-12


def test_session_paths_bounded(spark):
    rows = QUERIES["w_session_paths"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 5
        assert set(steps) <= types
        assert r.n_sessions >= 1
    ns = [r.n_sessions for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_quality_funnel_monotone(spark):
    rows = {r.stage: r.n_pass for r in QUERIES["corpus_quality_funnel"](spark, SF).collect()}
    order = ["total", "min_chars_100", "min_tokens_20", "lang_known",
             "first_of_dup_group"]
    assert set(rows) == set(order)
    vals = [rows[s] for s in order]
    assert vals == sorted(vals, reverse=True)  # monotone non-increasing
    n_docs = load_table(spark, SF, "documents").count()
    assert vals[0] == n_docs
    assert vals[-1] > 0
