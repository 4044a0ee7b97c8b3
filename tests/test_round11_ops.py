"""Round-11 additions: real TIFF/WebP container decode, LZ76 phrase
complexity, Siegel-Tukey dispersion test, generalized ESD — every new
query brute-force re-derived in Python, plus adversarial container
vectors for the new decoder branches."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.llm.multimodal import build_container_v2, stdlib_decoder
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# TIFF / WebP decoder: round trip + adversarial vectors (no Spark)
# ---------------------------------------------------------------------------


def test_tiff_webp_roundtrip_all_variants():
    for doc_id in list(range(8)) + [1023, 1024, 4095, 123456]:
        w = (doc_id % 1024) + 1
        h = ((doc_id * 7) % 1024) + 1
        body = b"x" * (doc_id % 17)
        b = build_container_v2(doc_id, body)
        m = stdlib_decoder(b)
        k = doc_id % 4
        assert m["format"] == ("image/tiff" if k < 2 else "image/webp")
        assert (m["width"], m["height"]) == (w, h), (doc_id, m)
        hdr = {0: 38, 1: 38, 2: 30, 3: 25}[k]
        assert len(b) == hdr + len(body)


def test_tiff_short_value_is_left_justified_big_endian():
    """The MM/SHORT variant is the classic trap: a SHORT value sits in
    the FIRST two bytes of the 4-byte value field in FILE byte order.
    A parser that reads all four bytes (or the last two) gets w<<16."""
    b = build_container_v2(1, b"")  # doc_id 1 -> MM + SHORT
    assert b[:2] == b"MM"
    m = stdlib_decoder(b)
    assert (m["width"], m["height"]) == (2, 8)


def test_webp_vp8_lossy_branch():
    """Hand-built VP8 (lossy) chunk — the flavor build_container_v2
    doesn't emit — start code 9D 01 2A then 14-bit LE dims."""
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    b = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload))
        + b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload
    )
    assert stdlib_decoder(b) == {
        "format": "image/webp", "width": 640, "height": 480,
    }


def test_tiff_webp_adversarial_vectors_degrade_not_throw():
    cases = [
        b"II*\x00",                                # truncated TIFF header
        b"II\x00\x00\x08\x00\x00\x00",             # bad TIFF magic
        b"MM\x00\x2a\x00\x00\x00\x08",             # IFD offset past end
        b"II*\x00" + b"\x00" * 4,                  # zero IFD offset, short
        b"RIFF\x08\x00\x00\x00WEBPVP8 " + b"\x00" * 10,  # bad start code
        b"RIFF\x08\x00\x00\x00WEBPVP8L" + b"\x00" * 10,  # bad 2F signature
        b"RIFF\x08\x00\x00\x00WEBPXXXX" + b"\x00" * 10,  # unknown chunk
    ]
    for b in cases:
        m = stdlib_decoder(b)
        assert m["width"] is None and m["height"] is None, (b[:16], m)


def test_existing_container_formats_unaffected():
    """The new branches must not perturb the proven round-10 paths."""
    from dicomdb_spark.llm.multimodal import build_container

    for doc_id in range(8):
        m = stdlib_decoder(build_container(doc_id, b"payload"))
        assert m["format"] in (
            "image/png", "image/gif", "image/bmp", "image/jpeg",
        )
        assert m["width"] == (doc_id % 1024) + 1


# ---------------------------------------------------------------------------
# FLAC STREAMINFO decode
# ---------------------------------------------------------------------------


def test_flac_roundtrip_and_wav_dispatch_unchanged():
    from dicomdb_spark.llm.multimodal import (
        audio_decoder, build_flac, build_wav, wav_decoder,
    )

    for doc_id in list(range(10)) + [99999, 123456]:
        m = audio_decoder(build_flac(doc_id, b"frames"))
        assert m["format"] == "audio/flac"
        assert m["channels"] == doc_id % 2 + 1
        assert m["sample_rate"] == 8000 * (doc_id % 5 + 1)
        assert m["bits"] == 8 * (doc_id % 3 + 1)
        assert m["n_frames"] == doc_id % 100000
        assert m["duration_ms"] == (doc_id % 100000) * 1000 // m["sample_rate"]
    # the sniffing dispatcher must be byte-identical to wav_decoder on
    # WAV payloads (the round-10 proven path)
    w = build_wav(7, b"xy")
    assert audio_decoder(w) == wav_decoder(w)


def test_flac_adversarial_vectors_degrade_not_throw():
    from dicomdb_spark.llm.multimodal import flac_decoder

    cases = [
        b"fLa",                                             # truncated magic
        b"fLaC",                                            # no blocks
        b"fLaC\x80\x00\x00\x22" + b"\x00" * 10,             # short STREAMINFO
        b"fLaC\x81\x00\x00\x04" + b"\x00" * 4,              # no STREAMINFO
        b"fLaC\x04\x00\x00\x02\x00\x00\x80\x00\x00\x22",    # skip then trunc
    ]
    for b in cases:
        m = flac_decoder(b)
        assert m["sample_rate"] is None, (b[:12], m)


# ---------------------------------------------------------------------------
# LZ76: Python reference (Kaspar-Schuster style exhaustive parsing)
# ---------------------------------------------------------------------------


def _lz76_ref(s: str) -> int:
    cnt, ws = 0, 1  # 1-based phrase start
    for i in range(1, len(s) + 1):
        hist = s[: i - 1]
        w_c = s[ws - 1 : i]
        if w_c in hist:
            continue
        cnt += 1
        ws = i + 1
    return cnt + (1 if ws <= len(s) else 0)


def test_lz76_reference_known_values():
    assert _lz76_ref("a") == 1
    assert _lz76_ref("aaaa") == 2          # a | aaa
    assert _lz76_ref("ab") == 2
    assert _lz76_ref("abcabcabc") == 4     # a | b | c | abcabc
    # strictly alternating never extends past a 2-phrase bootstrap + rest
    assert _lz76_ref("01010101") == 3      # 0 | 1 | 010101


def test_lz76_query_matches_reference(spark):
    rows = QUERIES["text_lz76_complexity"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").collect()
    }
    assert len(rows) == sum(1 for t in docs.values() if len(t) >= 1)
    for r in rows:
        s = docs[r.doc_id][:120]
        assert r.n_chars == len(s)
        assert r.lz76_phrases == _lz76_ref(s), r.doc_id
        assert r.phrase_ratio == r.lz76_phrases / r.n_chars


# ---------------------------------------------------------------------------
# Siegel-Tukey: Python reference with alternating-extreme ranks,
# midrank ties via the same scaled-integer-quotient discipline
# ---------------------------------------------------------------------------


def _st_rank(pos: int, np_: int) -> int:
    h = np_ // 2
    if pos <= h:
        return 2 * pos - pos % 2
    j = np_ + 1 - pos
    return 2 * j - (1 - j % 2)


def test_siegel_tukey_rank_pattern():
    # N=8: positions 1..8 -> ranks 1 4 5 8 7 6 3 2
    assert [_st_rank(p, 8) for p in range(1, 9)] == [1, 4, 5, 8, 7, 6, 3, 2]
    # ranks are a permutation of 1..N for even N
    for n in (2, 4, 6, 10, 20):
        assert sorted(_st_rank(p, n) for p in range(1, n + 1)) == list(
            range(1, n + 1)
        )


def test_siegel_tukey_query_matches_reference(spark):
    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y"),
            F.max(
                F.when(
                    F.dayofweek(F.col("ts").cast("date")).isin(1, 7), 1
                ).otherwise(0)
            ).alias("wk"),
        )
        .collect()
    )
    obs = sorted((r.y, r.day, r.wk) for r in daily)
    n = len(obs)
    m = (n + 1) // 2 if n % 2 == 1 else n + 1  # 1-based drop position
    np_ = n - n % 2
    kept = [(y, wk) for p, (y, d, wk) in enumerate(obs, 1) if p != m]
    ranks = [
        (y, wk, _st_rank(p, np_)) for p, (y, wk) in enumerate(kept, 1)
    ]
    groups: dict[int, list[tuple[int, int]]] = {}
    for y, wk, r in ranks:
        groups.setdefault(y, []).append((wk, r))
    w1s = n1 = n2 = 0
    for mem in groups.values():
        sg = sum(r for _, r in mem)
        cg = len(mem)
        n1g = sum(wk for wk, _ in mem)
        w1s += (n1g * sg * 1000000) // cg
        n1 += n1g
        n2 += cg - n1g
    rows = QUERIES["a_siegel_tukey"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_weekend, r.n_weekday) == (n1, n2)
    assert r.w_weekend == w1s / 1000000.0
    import math

    z = ((w1s - n1 * (np_ + 1) * 500000) / 1000000.0) / math.sqrt(
        n1 * n2 * (np_ + 1) / 12.0
    )
    assert r.z == z


# ---------------------------------------------------------------------------
# Generalized ESD: Python reference, 3 unrolled exact-integer rounds
# ---------------------------------------------------------------------------


def test_generalized_esd_matches_reference(spark):
    import math

    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .collect()
    )
    data = {r.day: r.y for r in daily}
    expect = []
    for k in (1, 2, 3):
        n = len(data)
        s = sum(data.values())
        c = (s - ((s % n + n) % n)) // n
        # floor-scaled squared deviations (dsum-for-products), exactly
        # as both engines compute them
        sd2s = sum(
            int((float(y - c) * float(y - c)) / 10000.0)
            for y in data.values()
        )
        rs = s - n * c
        dmax = max(abs(n * y - s) for y in data.values())
        rm = min(d for d, y in data.items() if abs(n * y - s) == dmax)
        inner = float(n) * (float(sd2s) * 10000.0) - float(rs) * float(rs)
        r_stat = float(dmax) / math.sqrt(float(n) * inner / float(n - 1))
        expect.append((k, rm, n, r_stat))
        del data[rm]
    rows = sorted(
        QUERIES["a_generalized_esd"](spark, SF).collect(),
        key=lambda r: r.iter,
    )
    got = [(r.iter, r.removed_day, r.n_obs, r.r_stat) for r in rows]
    assert got == expect
    # removed days must be distinct and each round shrinks by one
    assert len({r.removed_day for r in rows}) == 3
    assert [r.n_obs for r in rows] == [rows[0].n_obs - i for i in range(3)]


# ---------------------------------------------------------------------------
# P-square streaming quantile: reference fold + self-certifying error
# ---------------------------------------------------------------------------


def test_p2_query_matches_reference_fold(spark):
    from dicomdb_spark.functions.sketches import p2_fold_py

    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.y))
    rows = QUERIES["sketch_p2_quantile"](spark, SF).collect()
    assert len(rows) == sum(1 for v in series.values() if len(v) >= 5)
    for r in rows:
        xs = [float(y) for _, y in sorted(series[r.key])]
        assert r.n_obs == len(xs)
        # bit-exact vs the Python reference fold
        assert r.p2_est == p2_fold_py(xs, 0.5)[2], r.key
        ys = sorted(int(x) for x in xs)
        assert r.exact_cents == ys[int(0.5 * (len(ys) - 1))]
        # sanity: the estimate lands within the observed range
        assert ys[0] <= r.p2_est <= ys[-1]


def test_p2_fold_textbook_property():
    """On already-sorted uniform ramps the P² median tracks the true
    median closely; on 5 observations it IS the middle value."""
    from dicomdb_spark.functions.sketches import p2_fold_py

    assert p2_fold_py([5.0, 1.0, 4.0, 2.0, 3.0], 0.5)[2] == 3.0
    xs = [float(i) for i in range(1, 202)]  # 1..201, median 101
    est = p2_fold_py(xs, 0.5)[2]
    assert abs(est - 101.0) < 2.0


def test_p2_random_series_bit_exact_vs_duckdb():
    """Adversarial parity: 40 seeded random series (uniform, bimodal,
    sorted, constant-with-spikes) through the SAME recursive-CTE
    machinery the oracle uses, compared bit-for-bit against the
    Python kernel — exercises the parabolic/linear fallback and
    extreme-update branches far more often than the fixture data."""
    import random
    import struct as _struct

    import duckdb

    from dicomdb_spark.functions.sketches import p2_fold_py
    from dicomdb_spark.registry.q10 import _p2_adjust_sql

    rng = random.Random(11)
    series = []
    for s in range(10):
        series.append([float(rng.randint(0, 1000)) for _ in range(40)])
        series.append(
            [float(rng.choice((5, 900)) + rng.randint(0, 9)) for _ in range(35)]
        )
        series.append(sorted(float(rng.randint(0, 100)) for _ in range(25)))
        base = [100.0] * 30
        base[rng.randrange(30)] = 1e6
        series.append(base)
    p = 0.5
    dn = [0.0, p / 2, p, (1 + p) / 2, 1.0]
    np0 = [1.0, 1 + 2 * p, 1 + 4 * p, 3 + 2 * p, 5.0]
    a2, a3, a4 = (
        _p2_adjust_sql("u", "u", 2),
        _p2_adjust_sql("a2", "u", 3),
        _p2_adjust_sql("a3", "u", 4),
    )
    con = duckdb.connect()
    for si, xs in enumerate(series):
        vals = ", ".join(f"({i + 1}, {x!r})" for i, x in enumerate(xs))
        q = f"""
        WITH RECURSIVE s AS (
          SELECT rn, CAST(x AS DOUBLE) AS x
          FROM (VALUES {vals}) t(rn, x)),
        seed AS (SELECT CAST(count(*) OVER () AS BIGINT) AS nt FROM s LIMIT 1),
        st AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS nt,
                 CAST(5 AS BIGINT) AS rn,
                 (SELECT list_sort(list(x ORDER BY rn)) FROM s WHERE rn <= 5) AS h,
                 [CAST(1 AS BIGINT),2,3,4,5] AS n,
                 {np0!r}::DOUBLE[] AS np
          UNION ALL
          SELECT u.nt, u.rn, a4.h, a4.n, u.np
          FROM (
            SELECT st.nt, s.rn, s.x,
                   list_transform(st.h, (v, j) ->
                     CASE WHEN j = 1 THEN least(v, s.x)
                          WHEN j = 5 THEN greatest(v, s.x) ELSE v END) AS h0,
                   (CASE WHEN s.x < st.h[2] THEN 1 WHEN s.x < st.h[3] THEN 2
                         WHEN s.x < st.h[4] THEN 3 ELSE 4 END) AS k,
                   st.n AS n_prev, st.np AS np_prev
            FROM st JOIN s ON s.rn = st.rn + 1
          ) q,
          LATERAL (SELECT q.nt, q.rn, q.h0 AS h,
                          list_transform(q.n_prev, (v, j) ->
                            CASE WHEN j > q.k THEN v + 1 ELSE v END) AS n,
                          list_transform(q.np_prev, (v, j) ->
                            v + {dn!r}[j]) AS np) u,
          LATERAL ({a2}) a2, LATERAL ({a3}) a3, LATERAL ({a4}) a4
        )
        SELECT h[3] FROM st WHERE rn = nt
        """
        (est,) = con.execute(q).fetchone()
        ref = p2_fold_py(xs, p)[2]
        assert _struct.pack("<d", est) == _struct.pack("<d", ref), (
            si, repr(est), repr(ref),
        )


# ---------------------------------------------------------------------------
# Plan shapes: the round-11 map-only operators must really be map-only
# ---------------------------------------------------------------------------


def test_decode_and_lz76_plans_have_zero_shuffles(spark):
    """The container-decode round trips and the LZ76 fold are pure
    map pipelines — scan → (containerize) → decode/fold — so their
    physical plans must contain NO Exchange at all.  A shuffle here
    would mean payload bytes crossing the wire, the exact thing the
    multimodal design forbids at 100 TB."""
    from dicomdb_spark.plans import introspection as pi

    for name in (
        "multimodal_decode_real",
        "multimodal_decode_tiff_webp",
        "multimodal_flac_meta",
        "multimodal_resize_audit",
        "text_lz76_complexity",
    ):
        df = QUERIES[name](spark, SF)
        assert pi.count_shuffles(df) == 0, (name, pi.simple_plan(df))


def test_p2_plan_shuffles_only_metadata(spark):
    """sketch_p2_quantile shuffles exactly once — the hash exchange
    that co-locates each key's (day, y) grain rows for the
    applyInPandas fold, AFTER the daily pre-aggregate (plus its
    partial-agg exchange).  Payloads: none; state: O(1) per key."""
    from dicomdb_spark.plans import introspection as pi

    df = QUERIES["sketch_p2_quantile"](spark, SF)
    assert pi.count_shuffles(df) <= 2, pi.simple_plan(df)


# ---------------------------------------------------------------------------
# Resize audit: corpus ASCII precondition + byte-exact reference
# ---------------------------------------------------------------------------


def test_documents_are_pure_ascii(spark):
    """The resize oracle's byte==char identity requires an ASCII
    corpus; assert the precondition the docstring claims."""
    docs = load_table(spark, SF, "documents")
    n_bad = docs.filter(
        F.octet_length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert n_bad == 0


def test_resize_audit_matches_python_slice(spark):
    rows = QUERIES["multimodal_resize_audit"](spark, SF).collect()
    docs = {
        r.doc_id: r.text.encode()
        for r in load_table(spark, SF, "documents").collect()
    }
    assert len(rows) == sum(1 for b in docs.values() if len(b) >= 1)
    for r in rows:
        b = docs[r.doc_id]
        stride = max(len(b) // 64, 1)
        resized = b[::stride][:64]
        assert (r.width, r.height) == (8, 8)
        assert r.n_resized == len(resized)
        assert r.head_byte == resized[0]
        assert r.probe_byte == resized[min(10, len(resized) - 1)]


def test_p2_short_group_empty_frame_dtypes(spark):
    """A key with <5 observations must be DROPPED via the explicitly-
    dtyped empty frame (ADVICE r11 #1): an all-object empty frame's
    Arrow conversion to Long/Double is version-dependent, so this
    drives the short-group branch end-to-end through applyInPandas."""
    import datetime

    from dicomdb_spark.functions.sketches import p2_quantile

    rows = [
        ("short", datetime.date(2024, 1, 1 + i), 10 + i) for i in range(3)
    ] + [
        ("long", datetime.date(2024, 1, 1 + i), 100 + 7 * i)
        for i in range(9)
    ]
    df = spark.createDataFrame(rows, "event_type string, day date, y long")
    out = p2_quantile(df)
    got = {r.key: r for r in out.collect()}
    assert set(got) == {"long"}  # the 3-obs key is dropped, no error
    assert got["long"].n_obs == 9
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string", "bigint", "double", "bigint",
    ]
    # all-short input: the WHOLE result rides the empty-frame path
    short_only = spark.createDataFrame(rows[:3], "event_type string, day date, y long")
    assert p2_quantile(short_only).count() == 0


def test_resize_audit_non_ascii_excluded_identically(spark):
    """The byte==char identity behind the resize-audit oracle is now
    SELF-GUARDING (ADVICE r11 #3): both engines filter
    octet_length == length, so a non-ASCII document is excluded
    identically at any SF instead of silently diverging.  Injects a
    mixed corpus (ASCII + multi-byte UTF-8) through BOTH the Spark
    plan and the oracle SQL and compares exact rows."""
    import duckdb
    import pandas as pd

    from dicomdb_spark.registry._core import ORACLES, QUERIES as Q
    from tests.conftest import patched_load_table

    # short ASCII docs (l < 64, l < 11, l = 1) exercise the stride /
    # cap / probe-clamp arithmetic no natural corpus reaches (every
    # sf0.001+ document is >= 120 chars)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "text": [
                "plain ascii body " * 5,
                "café au lait — multi-byte",  # MUST be excluded
                "x" * 200,
                "emoji \U0001f600 payload",  # MUST be excluded
                "q",  # l=1: n_resized=1, probe clamps to byte 0
                "hello",  # l=5 < 11: probe clamps to n_resized-1
                "abcdefghijklmnop",  # l=16: stride 1, no cap hit
                "z" * 64,  # l=64: exactly the cap boundary
            ],
        }
    )
    docs = spark.createDataFrame(pdf)

    def fake_load(spark_, sf_dir_, name):
        assert name == "documents"
        return docs

    with patched_load_table(fake_load):
        sdf = Q["multimodal_resize_audit"](spark, "unused")
        got = sorted(tuple(r) for r in sdf.collect())
    assert {t[0] for t in got} == {1, 3, 5, 6, 7, 8}  # non-ASCII dropped

    con = duckdb.connect()
    con.register("documents", pdf)
    res = con.execute(ORACLES["multimodal_resize_audit"])
    cols = [c[0] for c in res.description]
    assert cols == list(sdf.columns)
    want = sorted(tuple(r) for r in res.fetchall())
    assert got == want


def test_esd_constant_series_null_rstat_parity(spark):
    """ADVICE r11 #2 guard path: on a CONSTANT daily series the
    variance radicand is 0, so r_stat must be NULL (nullif'd zero
    denominator) — not NaN or a division error — identically in both
    engines, and the min-day tiebreak argmax still removes one day
    per round."""
    import datetime

    import duckdb
    import pandas as pd

    from dicomdb_spark.registry._core import ORACLES, QUERIES as Q
    from tests.conftest import patched_load_table

    ts = [datetime.datetime(2024, 3, 1 + i, 12, 0, 0) for i in range(8)]
    pdf = pd.DataFrame(
        {"event_type": ["a"] * 8, "ts": ts, "value": [7.25] * 8}
    )
    ev = spark.createDataFrame(pdf)

    def fake_load(spark_, sf_dir_, name):
        assert name == "events"
        return ev

    with patched_load_table(fake_load):
        sdf = Q["a_generalized_esd"](spark, "unused")
        got = sorted(tuple(r) for r in sdf.collect())
    assert len(got) == 3
    assert all(r[3] is None for r in got)  # r_stat NULL every round
    # rounds remove the three earliest days (min-day argmax tiebreak)
    assert [r[1] for r in got] == [
        datetime.date(2024, 3, 1),
        datetime.date(2024, 3, 2),
        datetime.date(2024, 3, 3),
    ]

    con = duckdb.connect()
    con.register("events", pdf)
    res = con.execute(ORACLES["a_generalized_esd"])
    assert [c[0] for c in res.description] == list(sdf.columns)
    want = sorted(tuple(r) for r in res.fetchall())
    assert got == want


def test_lz76_adversarial_corpus_three_way_parity(spark):
    """Small-alphabet edge cases the natural corpus lacks (pure
    repetition, alternation, Fibonacci word, the 120/121-char cap
    boundary, random 2-3 letter alphabets): the Spark fold, the DuckDB
    list_reduce oracle, and the Python reference must agree on every
    string — the packed cnt*1000+start state crosses phrase boundaries
    most often exactly on these inputs."""
    import random

    import duckdb
    import pandas as pd

    from dicomdb_spark.registry._core import ORACLES, QUERIES as Q
    from tests.conftest import patched_load_table

    fib = ["a", "ab"]
    while len(fib[-1]) < 130:
        fib.append(fib[-1] + fib[-2])
    rng = random.Random(7)
    texts = [
        "a", "ab", "aaaa", "abab" * 40, "abcabcabc", "01010101",
        "a" * 119, "a" * 120, "a" * 121, "a" * 300,  # cap boundary
        ("ab" * 61)[:121], fib[-1][:120], fib[-1],
    ]
    texts += ["".join(rng.choice("ab") for _ in range(rng.randint(1, 140)))
              for _ in range(15)]
    texts += ["".join(rng.choice("abc") for _ in range(rng.randint(50, 130)))
              for _ in range(15)]
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    docs = spark.createDataFrame(pdf)

    def fake_load(spark_, sf_dir_, name):
        assert name == "documents"
        return docs

    with patched_load_table(fake_load):
        sdf = Q["text_lz76_complexity"](spark, "unused")
        got = {r.doc_id: r for r in sdf.collect()}
    assert len(got) == len(texts)
    for i, t in enumerate(texts, start=1):
        s = t[:120]
        assert got[i].n_chars == len(s)
        assert got[i].lz76_phrases == _lz76_ref(s), (i, repr(t[:40]))

    con = duckdb.connect()
    con.register("documents", pdf)
    res = con.execute(ORACLES["text_lz76_complexity"])
    assert [c[0] for c in res.description] == list(sdf.columns)
    want = {r[0]: r for r in res.fetchall()}
    for i in got:
        assert tuple(got[i]) == tuple(want[i]), i
