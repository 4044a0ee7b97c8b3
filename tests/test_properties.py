"""Property-based tests for the scalar library.

The reference had no tests (SURVEY §5); its correctness risks were
exactly the fiddly scalar paths — midnight rollover, TA parsing,
sanitizer idempotence (risk register §7e).  Hypothesis generates the
string corpus; each property evaluates the column expression over the
whole batch in one Spark job (per-example jobs would be prohibitive).
"""

from __future__ import annotations

import itertools
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from dicomdb_spark.functions import scalars


def batch_eval(spark, cases, col_builder):
    df = spark.createDataFrame([Row(s=c) for c in cases], schema="s string")
    return [r.out for r in df.select(col_builder("s").alias("out")).collect()]


def test_ta_parse_grid(spark):
    """Exhaustive grid over the TA grammar (colon/dotted × multiplier)."""
    cases, want = [], []
    for mm in (0, 1, 9, 59):
        for ss in (0, 5, 59):
            for mult in (None, 1, 2, 9):
                suffix = f"*{mult}" if mult else ""
                cases.append(f"TA {mm:02d}:{ss:02d}{suffix}")
                want.append((mm * 60 + ss) * (mult or 1))
                cases.append(f"TA {mm:02d}.{ss:02d}{suffix}")
                want.append((mm + 1) * 60 * (mult or 1))
    assert batch_eval(spark, cases, scalars.ta_seconds) == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs", "Cc")
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_sanitizer_idempotent_and_clean(spark, cases):
    once = batch_eval(spark, cases, scalars.alpha_num_str)
    twice = batch_eval(spark, once, scalars.alpha_num_str)
    assert once == twice  # idempotent
    for out in once:
        assert re.fullmatch(r"[A-Za-z0-9_]*", out), repr(out)
        assert not out.startswith("_") and not out.endswith("_")
        assert "__" not in out


def test_rollover_range(spark):
    """duration_with_rollover stays in [0, 86400) for second-of-day pairs."""
    secs = [0, 1, 3600, 43200, 86399]
    rows = [Row(a=a, b=b) for a, b in itertools.product(secs, secs)]
    df = spark.createDataFrame(rows)
    out = df.select(
        scalars.duration_with_rollover(F.col("a"), F.col("b")).alias("d")
    ).collect()
    assert all(0 <= r.d < 86400 for r in out)


def test_merge_classify_partition_property(spark):
    """merge_classify output keys == incoming keys, exactly once each,
    and the action set is consistent with key membership."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.operators.joins import merge_classify

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    existing = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 5.0
    )
    out = merge_classify(
        existing, cust, ["c_custkey"], ["c_name", "c_acctbal"], ["c_acctbal"]
    ).collect()
    assert len(out) == cust.count()  # one verdict per incoming row
    by_action = {}
    for r in out:
        by_action.setdefault(r.action, set()).add(r.c_custkey)
    assert all(k % 2 == 1 for k in by_action.get("insert", set()))
    assert all(k % 2 == 0 for k in by_action.get("update", set()))
    assert not by_action.get("noop")  # every existing row was modified


def test_keep_latest_is_total(spark):
    """Every duplicate group has exactly one 'keep' and n-1 'remove'."""
    from dicomdb_spark.io import load_table
    from dicomdb_spark.operators.windows import keep_latest

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_id", "ts"
    )
    out = keep_latest(
        ev, ["user_id", "day"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    per_group = (
        out.groupBy("user_id", "day")
        .agg(
            F.sum(F.when(F.col("action") == "keep", 1).otherwise(0)).alias("keeps"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert per_group and all(r.keeps == 1 and r.n >= 2 for r in per_group)


def test_range_join_equals_bruteforce_theta(spark):
    """Bucketized interval_range_join must equal the brute-force theta
    join for every bucket width, including widths that misalign with
    interval spans."""
    import random

    from dicomdb_spark.operators.joins import interval_range_join

    rnd = random.Random(7)
    points = [(rnd.randrange(5), i, rnd.randrange(0, 100000)) for i in range(300)]
    intervals = []
    for j in range(80):
        s = rnd.randrange(0, 100000)
        intervals.append((rnd.randrange(5), 1000 + j, s, s + rnd.randrange(0, 15000)))
    pdf = spark.createDataFrame(points, "k int, pid int, t long").withColumn(
        "t", F.timestamp_seconds(F.col("t")).cast("timestamp_ntz")
    )
    idf = (
        spark.createDataFrame(intervals, "k int, iid int, s long, e long")
        .withColumn("s", F.timestamp_seconds(F.col("s")).cast("timestamp_ntz"))
        .withColumn("e", F.timestamp_seconds(F.col("e")).cast("timestamp_ntz"))
    )
    brute = sorted(
        (r.pid, r.iid)
        for r in pdf.join(
            idf,
            (pdf["k"] == idf["k"]) & (pdf["t"] >= idf["s"]) & (pdf["t"] <= idf["e"]),
        ).collect()
    )
    for width in (60, 3600, 7777):
        got = sorted(
            (r.pid, r.iid)
            for r in interval_range_join(
                pdf, idf.withColumnRenamed("k", "k2").withColumnRenamed("k2", "k"),
                keys=["k"], ts_col="t", start_col="s", end_col="e",
                bucket_width_s=width,
            ).collect()
        )
        assert got == brute, f"width={width}"
    assert len(brute) > 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=40
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    ),
)
def test_asof_join_property_vs_pandas(spark, lefts, rights):
    """Random keyed event streams: asof_join must equal pandas
    merge_asof (backward, exact matches allowed) on every draw,
    including duplicate timestamps on the left."""
    import pandas as pd

    from dicomdb_spark.operators.joins import asof_join

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], columns=["k", "lts", "lid"]
    )
    # right side must be unique per (k, ts) for determinism — dedupe
    # keeping the max value, the documented contract
    rpd = (
        pd.DataFrame(rights, columns=["k", "rts", "rv"])
        .sort_values("rv")
        .drop_duplicates(["k", "rts"], keep="last")
    )
    expected = pd.merge_asof(
        lpd.sort_values(["lts", "lid"]),
        rpd.sort_values("rts").rename(columns={"rts": "lts"}),
        on="lts",
        by="k",
    ).sort_values("lid")
    got = (
        asof_join(
            spark.createDataFrame(lpd, "k int, lts long, lid int"),
            spark.createDataFrame(rpd, "k int, rts long, rv long"),
            keys=["k"],
            left_ts="lts",
            right_ts="rts",
            value_cols=["rv"],
        )
        .orderBy("lid")
        .collect()
    )
    exp = [None if pd.isna(v) else int(v) for v in expected["rv"]]
    assert [r.rv_asof for r in got] == exp


# ---------------------------------------------------------------- BPE
def _bpe_reference(text: str, merges, passes: int = 3) -> int:
    """Straight-Python replay of the separator-replace BPE contract:
    lowercase, collapse whitespace, one char per slot, each merge
    applied `passes` left-to-right non-overlapping scans in rank
    order.  Defines the portable semantics both engines must share."""
    s = re.sub(r"\s+", " ", text.lower().strip())
    s = " " + "".join(ch + " " for ch in s)
    for a, b in merges:
        for _ in range(passes):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="athequinsrd éß中 ", min_size=0, max_size=40),
        min_size=1,
        max_size=20,
    )
)
def test_bpe_token_count_matches_reference(spark, texts):
    from dicomdb_spark.functions import text as T

    got = batch_eval(spark, texts, lambda c: T.bpe_token_count(c))
    want = [_bpe_reference(t, T.DEFAULT_BPE_MERGES) for t in texts]
    assert got == want


# ------------------------------------------------------------ packing
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]), st.integers(1, 30)),
        min_size=1,
        max_size=40,
    ),
    st.integers(4, 64),
)
def test_pack_sequences_invariants(spark, docs, budget):
    """Packing conserves tokens, never emits empty sequences, and
    every sequence except a shard's last starts before the budget
    boundary it fills past (concat-and-chunk has no gaps)."""
    from dicomdb_spark.llm import corpus as lc

    rows = [
        (i, " ".join(["w"] * ntok), shard) for i, (shard, ntok) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = lc.pack_sequences(df, "doc_id", "text", "source", budget=budget).collect()
    total = sum(r.n_tokens for r in out)
    assert total == sum(n for _, n in docs)
    assert all(r.n_docs >= 1 and r.n_tokens >= 1 for r in out)
    per_shard = {}
    for r in out:
        per_shard.setdefault(r.shard, []).append(r)
    for shard, seqs in per_shard.items():
        seqs.sort(key=lambda r: r.seq_id)
        # seq ids are cum_before // budget: strictly increasing, and each
        # non-final sequence must reach into its own budget window
        ids = [r.seq_id for r in seqs]
        assert ids == sorted(set(ids))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=0,
            max_size=400,
        ),
        min_size=1,
        max_size=20,
    ),
    chunk=st.integers(min_value=2, max_value=50),
    overlap=st.integers(min_value=0, max_value=40),
)
def test_chunk_reassembly_property(spark, texts, chunk, overlap):
    """For any text and any chunk/stride, dropping each chunk's first
    `overlap` chars after the first chunk reassembles the original —
    chunking loses nothing and duplicates exactly the overlap."""
    from dicomdb_spark.llm.corpus import chunk_documents

    overlap = min(overlap, chunk - 1)
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_size=chunk, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        cs = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        got = cs[0]["chunk"] + "".join(r["chunk"][overlap:] for r in cs[1:])
        assert got == t, (t, chunk, stride)
        # starts advance by exactly stride and stay in range
        assert [r["chunk_start"] for r in cs] == list(
            range(1, max(len(t), 1) + 1, stride)
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=0,
            max_size=200,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pii_redact_idempotent(spark, texts):
    """Redaction is idempotent (placeholders contain no redactable
    spans) and never leaves an email-shaped span behind."""
    from dicomdb_spark.functions.text import PII_PATTERNS, pii_redact

    seeded = texts + [
        "x a@b.co y", "ip 1.2.3.4!", "tel +12 345-6789", "a@b.co@c.dd",
    ]
    df = spark.createDataFrame([(t,) for t in seeded], ["text"])
    once = df.select(pii_redact("text").alias("r1"))
    twice = once.select(F.col("r1"), pii_redact(F.col("r1")).alias("r2"))
    for r in twice.collect():
        assert r["r1"] == r["r2"]
    n_left = df.select(
        F.sum(
            F.size(
                F.regexp_extract_all(
                    pii_redact("text"), F.lit(PII_PATTERNS["email"]), F.lit(0)
                )
            )
        ).alias("n")
    ).collect()[0]["n"]
    assert n_left == 0


def test_c4_filter_idempotent(spark):
    """Filtering a page down to its kept lines and re-filtering the
    joined result changes nothing (the keep rule is line-local)."""
    from dicomdb_spark.functions.text import c4_clean_lines

    pages = [
        "good line with five sturdy words here.\nshort.\nnope",
        "another good line that clearly survives intact!\nEnable JavaScript now.",
        "",
    ]
    df = spark.createDataFrame([(p,) for p in pages], ["page"])
    once = df.select(F.array_join(c4_clean_lines("page"), "\n").alias("p1"))
    twice = once.select(
        "p1", F.array_join(c4_clean_lines(F.col("p1")), "\n").alias("p2")
    )
    for r in twice.collect():
        assert r["p1"] == r["p2"]


@given(
    st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=25, deadline=None)
def test_sql_hex_int_matches_python_md5(tokens_in, n_chars):
    """The DuckDB strpos-digit hex decoder (functions/sketches.
    sql_hex_int) must agree with Python's int(md5[:n], 16) — the same
    value Spark's conv() produces — for arbitrary unicode tokens.
    This is the shared primitive under KMV, count-min, bloom, and
    DSIR bucketing; a one-digit drift would silently shift every
    bucket in one engine only."""
    import hashlib

    import duckdb

    from dicomdb_spark.functions.sketches import sql_hex_int

    con = duckdb.connect()
    expr = sql_hex_int("md5(t)", n_chars)
    got = dict(
        con.execute(
            f"SELECT t, {expr} FROM (SELECT unnest(?) AS t)", [tokens_in]
        ).fetchall()
    )
    for t in tokens_in:
        expect = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:n_chars], 16)
        assert got[t] == expect, (t, n_chars, got[t], expect)


@given(
    st.lists(
        st.integers(min_value=-100000, max_value=100000),
        min_size=14,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_encoded_window_argmax_matches_naive(spark, vals):
    """w_aroon's integer-encoded windowed argmax — max((hi+OFF)·1e5+rn)
    decoding to the latest-tie bar index — must agree with a naive
    Python argmax (latest index on ties) for ANY int series, including
    negatives (the 1e7 offset keeps the encoding positive)."""
    from pyspark.sql import Window as W

    rows = [(i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rn LONG, hi LONG")
    w = W.orderBy("rn").rowsBetween(-13, W.currentRow)
    out = df.select(
        "rn",
        (
            F.col("rn")
            - F.max((F.col("hi") + 10000000) * 100000 + F.col("rn")).over(w)
            % 100000
        ).alias("since"),
        F.count("*").over(w).alias("nb"),
    ).collect()
    by_rn = {r.rn: r for r in out}
    for t in range(13, len(vals)):
        window = vals[t - 13 : t + 1]
        m = max(window)
        # latest index on ties
        idx_in_window = max(i for i, v in enumerate(window) if v == m)
        expect_since = 13 - idx_in_window
        r = by_rn[t + 1]
        assert r.nb == 14
        assert r.since == expect_since, (t, window)
