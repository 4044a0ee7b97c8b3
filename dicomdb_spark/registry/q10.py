"""registry chunk 10 — round-11 additions.

Scope per the round-10 verdict's breadth freeze: every entry here
cites either the LLM-pipeline brief (real TIFF/WebP/FLAC container
decode, the resize round-trip audit) or a NEXT_STEPS.md parked item
that was explicitly kept (LZ76 complexity, P-square streaming
quantile, Siegel-Tukey, generalized ESD).
"""
from __future__ import annotations

from pyspark.sql import Window  # noqa: F401
from pyspark.sql import functions as F
from dicomdb_spark.operators.lineage import cut_lineage

from dicomdb_spark.io import load_table
from dicomdb_spark.operators import windows as ow
from dicomdb_spark.registry._core import register


# ---------------------------------------------------------------------------
# Round-11: REAL TIFF + WebP container decode (extends the round-10
# PNG/GIF/BMP/JPEG/WAV family; reference behavior: Exam_info.py header
# reads — metadata from bytes, no pixel codec).
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode_tiff_webp",
    """
    SELECT doc_id,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
                  WHEN 0 THEN 38 WHEN 1 THEN 38 WHEN 2 THEN 30 ELSE 25 END
                + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN CAST(doc_id % 4 AS INTEGER) < 2 THEN 'image/tiff'
                ELSE 'image/webp' END AS format,
           CAST(doc_id % 1024 + 1 AS INTEGER) AS width,
           CAST((doc_id * 7) % 1024 + 1 AS INTEGER) AS height
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_decode_tiff_webp(spark, sf_dir):
    """REAL TIFF/WebP container decode round trip (round-11 companion
    to multimodal_decode_real): documents are wrapped in structurally
    valid TIFF (both byte orders — ``II`` with LONG dims, ``MM`` with
    left-justified SHORT dims, exercising both IFD value encodings)
    or WebP (VP8X extended header with u24 minus-one dims, VP8L
    lossless with 14+14-bit LSB-first packed dims) containers
    (llm/multimodal.build_container_v2 — header fields are pure
    functions of doc_id), then llm/multimodal.stdlib_decoder walks the
    actual bytes back: the TIFF IFD entry walk honors the byte-order
    mark and the SHORT-value left-justification rule; the WebP branch
    dispatches on the first RIFF chunk's fourcc.  The oracle states
    the EXPECTED metadata per synthetic container, so one mis-read
    endianness, IFD offset, or bit-unpack breaks the hash.  Map-only:
    payload bytes never shuffle, only typed metadata leaves Python."""
    from dicomdb_spark.llm.multimodal import containerize_v2, decode_image_meta

    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(containerize_v2(docs)).select(
        "doc_id", "n_bytes", "format", "width", "height"
    )


@register(
    "multimodal_flac_meta",
    """
    SELECT doc_id,
           CAST(42 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'audio/flac' AS format,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
           CAST(8000 * (doc_id % 5 + 1) AS INTEGER) AS sample_rate,
           CAST(8 * (doc_id % 3 + 1) AS INTEGER) AS bits,
           CAST(doc_id % 100000 AS BIGINT) AS n_frames,
           CAST((doc_id % 100000) * 1000
                // (8000 * (doc_id % 5 + 1)) AS BIGINT) AS duration_ms
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_flac_meta(spark, sf_dir):
    """REAL FLAC STREAMINFO decode round trip (round-11 companion to
    multimodal_audio_meta's WAV path): documents are wrapped in valid
    ``fLaC`` containers (llm/multimodal.build_flac — every field a
    pure function of doc_id), then llm/multimodal.audio_decoder walks
    the metadata-block list and UNPACKS the big-endian bit fields of
    STREAMINFO — sample rate 20 bits, channels-1 3 bits, bps-1 5
    bits, total samples 36 bits from one u64 — so a single wrong
    shift or off-by-one block offset breaks the hash.  duration_ms =
    frames*1000 // rate is the same exact-integer identity as the WAV
    path.  Map-only; payload bytes never shuffle."""
    from dicomdb_spark.llm.multimodal import (
        containerize_flac,
        decode_audio_meta,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio_meta(containerize_flac(docs))


@register(
    "multimodal_resize_audit",
    """
    WITH d AS (SELECT doc_id, text,
                      CAST(length(text) AS BIGINT) AS l
               FROM documents
               WHERE length(text) >= 1
                 AND octet_length(encode(text)) = length(text)),
    s AS (SELECT doc_id, text, l,
                 greatest(l // 64, CAST(1 AS BIGINT)) AS stride
          FROM d),
    r AS (SELECT doc_id, text, l, stride,
                 least((l + stride - 1) // stride, CAST(64 AS BIGINT))
                   AS n_resized
          FROM s)
    SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           n_resized,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte,
           CAST(ascii(substr(text,
                             CAST(least(10, n_resized - 1) * stride + 1
                                  AS INTEGER), 1)) AS BIGINT) AS probe_byte
    FROM r
    """,
)
def multimodal_resize_audit(spark, sf_dir):
    """Resize round trip (closes the last stub-only multimodal brief
    item as a driver-checked query): documents → binary payloads →
    llm/multimodal.resize_images with the deterministic stride
    down-sampler (every k-th byte, k = max(len/64, 1), capped at
    8×8 = 64 bytes) — the batch shape a PIL/libvips resizer would
    drop into.  The audit re-derives, FROM THE RESIZED BYTES, the
    output length plus two positional probes (byte 0 and byte
    min(10, n-1)), which the oracle restates from the original text
    by the stride arithmetic — an off-by-one in the slice, the cap,
    or the stride floor breaks the hash.  The byte==char identity the
    oracle relies on is SELF-GUARDING: both engines filter
    octet_length == length, so a non-ASCII document at any SF is
    excluded identically rather than silently diverging (Spark reads
    payload bytes, the oracle indexes characters).  Map-only; zero
    shuffles (asserted in tests)."""
    from dicomdb_spark.llm.multimodal import binarize, resize_images

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") >= 1)
        & (F.octet_length("text") == F.length("text"))
    )
    rz = resize_images(binarize(docs), target_w=8, target_h=8)
    txt = F.col("resized_payload").cast("string")
    n_resized = F.octet_length("resized_payload").cast("long")
    probe_pos = F.least(F.lit(10).cast("long"), n_resized - 1) + 1
    return rz.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        n_resized.alias("n_resized"),
        F.ascii(txt.substr(F.lit(1), F.lit(1))).cast("long").alias("head_byte"),
        F.ascii(txt.substr(probe_pos.cast("int"), F.lit(1)))
        .cast("long")
        .alias("probe_byte"),
    )


# ---------------------------------------------------------------------------
# Round-11: LZ76 phrase complexity (NEXT_STEPS parked item "Lempel-
# Ziv-76 complexity (fold with string state)") — a compression-style
# text-quality signal: low phrase count per char = highly repetitive
# boilerplate, the same family of filter as text_repetition /
# text_gopher_rules but grounded in the classic complexity measure.
# ---------------------------------------------------------------------------

_LZ_CAP = 120  # chars of prefix scanned; per-doc cost is O(cap^2), constant
# The fold state is packed as cnt*1000 + start with start <= _LZ_CAP + 2;
# a cap past 997 would silently corrupt the encoding in BOTH engines.
assert _LZ_CAP + 2 < 1000, "LZ76 state packing requires _LZ_CAP + 2 < 1000"


@register(
    "text_lz76_complexity",
    f"""
    WITH d AS (SELECT doc_id, substr(text, 1, {_LZ_CAP}) AS s,
                      CAST(least(length(text), {_LZ_CAP}) AS BIGINT) AS n
               FROM documents WHERE length(text) >= 1),
    f AS (SELECT doc_id, n,
                 list_reduce(
                   [CAST(1 AS BIGINT)] || range(1, {_LZ_CAP} + 1),
                   (acc, i) -> CASE
                     WHEN i > n THEN acc
                     WHEN contains(substr(s, 1, CAST(i AS INTEGER) - 1),
                                   substr(s, CAST(acc % 1000 AS INTEGER),
                                          CAST(i - acc % 1000 + 1 AS INTEGER)))
                       THEN acc
                     ELSE (acc // 1000 + 1) * 1000 + i + 1
                   END) AS acc
          FROM d)
    SELECT doc_id, n AS n_chars,
           CAST(acc // 1000
                + CASE WHEN acc % 1000 <= n THEN 1 ELSE 0 END
                AS BIGINT) AS lz76_phrases,
           CAST(CAST(acc // 1000
                     + CASE WHEN acc % 1000 <= n THEN 1 ELSE 0 END
                     AS BIGINT) AS DOUBLE)
             / CAST(n AS DOUBLE) AS phrase_ratio
    FROM f
    """,
)
def text_lz76_complexity(spark, sf_dir):
    """Lempel-Ziv-76 phrase complexity of each document's first 120
    chars: the number of components in the exhaustive production
    parsing — component s[w..i] extends while it occurs as a substring
    of the strict prefix s[1..i-1], else a new phrase starts at i+1;
    an unterminated trailing phrase counts.  Low phrases-per-char
    means compressible/repetitive text (a classic pretraining quality
    filter, complementing text_repetition's n-gram ratios).

    Exactness: the whole recurrence is one integer fold — the state
    (phrase count, phrase start) is ENCODED as cnt*1000 + start
    (both <= 121), advanced by identical substring-containment steps
    in Spark's F.aggregate and DuckDB's list_reduce (init value
    prepended, since list_reduce seeds from the first element).  The
    fold is a CONSTANT _LZ_CAP steps for every row (i > n passes
    through): DuckDB 1.0.0 list_reduce mis-binds lambda outer-column
    references when list lengths are ragged within a vector, so a
    per-row range(1, n+1) silently corrupts batches containing a
    sub-cap document — caught by the adversarial three-way parity
    test, invisible on corpora where every doc reaches the cap.  No
    floats until the final single-division ratio.

    Scale: map-only per document, O(cap^2) = constant per row, no
    shuffle at all — linear to any corpus size."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 1
    )
    s = F.substring(F.col("text"), 1, _LZ_CAP)
    n = F.least(F.length("text"), F.lit(_LZ_CAP)).cast("long")
    d = docs.select("doc_id", s.alias("s"), n.alias("n"))

    def step(acc, i):
        ws = acc % 1000
        hist = F.col("s").substr(F.lit(1), (i - 1).cast("int"))
        w_c = F.col("s").substr(ws.cast("int"), (i - ws + 1).cast("int"))
        return (
            F.when(i > F.col("n"), acc)
            .when(F.contains(hist, w_c), acc)
            .otherwise((F.floor(acc / 1000) + 1) * 1000 + i + 1)
            .cast("long")
        )

    # UNIFORM fold length (always _LZ_CAP steps, i > n passes through):
    # DuckDB 1.0.0's list_reduce mis-binds outer columns referenced in
    # the lambda when list lengths are RAGGED within a vector (minimal
    # repro in tests/test_round11_ops.py) — a per-row range(1, n+1)
    # silently corrupts any batch containing a sub-cap document.  A
    # constant-length list sidesteps the bug; Spark mirrors the same
    # guard so the folds stay step-identical.
    f = d.withColumn(
        "acc",
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), F.lit(_LZ_CAP).cast("long")),
            F.lit(1).cast("long"),
            step,
        ),
    )
    phrases = (
        F.floor(F.col("acc") / 1000)
        + F.when(F.col("acc") % 1000 <= F.col("n"), 1).otherwise(0)
    ).cast("long")
    return f.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        phrases.alias("lz76_phrases"),
        (phrases.cast("double") / F.col("n").cast("double")).alias(
            "phrase_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Round-11: P-square streaming quantile (NEXT_STEPS parked item
# "P² quantile estimator as a double-state fold" — prototyped first
# as mandated; bit-exact Python-vs-DuckDB on sf0.001 and sf0.01).
# ---------------------------------------------------------------------------


def _p2_adjust_sql(src: str, np_src: str, i: int) -> str:
    """SQL for one interior-marker P² adjustment (1-based marker i):
    reads state h/n from alias ``src`` and desired positions from
    ``np_src``; emits updated h, n.  The expressions mirror
    functions/sketches.p2_fold_py term-for-term, same order."""
    ip, im = i + 1, i - 1
    d = f"({np_src}.np[{i}] - CAST({src}.n[{i}] AS DOUBLE))"
    cond = (
        f"(({d} >= 1.0 AND {src}.n[{ip}] - {src}.n[{i}] > 1) OR "
        f"({d} <= -1.0 AND {src}.n[{im}] - {src}.n[{i}] < -1))"
    )
    ds = f"(CASE WHEN {d} >= 1.0 THEN 1.0 ELSE -1.0 END)"
    dsi = f"(CASE WHEN {d} >= 1.0 THEN 1 ELSE -1 END)"
    hp = (
        f"({src}.h[{i}] + {ds} / CAST({src}.n[{ip}] - {src}.n[{im}] AS DOUBLE) * "
        f"((CAST({src}.n[{i}] - {src}.n[{im}] AS DOUBLE) + {ds})"
        f" * ({src}.h[{ip}] - {src}.h[{i}])"
        f" / CAST({src}.n[{ip}] - {src}.n[{i}] AS DOUBLE) "
        f"+ (CAST({src}.n[{ip}] - {src}.n[{i}] AS DOUBLE) - {ds})"
        f" * ({src}.h[{i}] - {src}.h[{im}])"
        f" / CAST({src}.n[{i}] - {src}.n[{im}] AS DOUBLE)))"
    )
    lin = (
        f"({src}.h[{i}] + {ds} * ({src}.h[{i} + {dsi}] - {src}.h[{i}]) "
        f"/ CAST({src}.n[{i} + {dsi}] - {src}.n[{i}] AS DOUBLE))"
    )
    newh = (
        f"CASE WHEN {cond} THEN "
        f"(CASE WHEN {src}.h[{im}] < {hp} AND {hp} < {src}.h[{ip}]"
        f" THEN {hp} ELSE {lin} END) "
        f"ELSE {src}.h[{i}] END"
    )
    return (
        f"SELECT list_transform({src}.h, (v, j) ->"
        f" CASE WHEN j = {i} THEN ({newh}) ELSE v END) AS h, "
        f"list_transform({src}.n, (v, j) ->"
        f" CASE WHEN j = {i} AND {cond} THEN v + {dsi} ELSE v END) AS n"
    )


def _p2_sql(p: float) -> str:
    """Generated DuckDB twin of the P² fold: a recursive CTE whose
    step applies the cell find, position shifts, and the THREE
    sequential marker adjustments as chained LATERAL stages (text
    stays linear; nesting the stage expression would blow up ~10^3).
    Seed = sorted first five observations, the textbook init."""
    dn = [0.0, p / 2, p, (1 + p) / 2, 1.0]
    np0 = [1.0, 1 + 2 * p, 1 + 4 * p, 3 + 2 * p, 5.0]
    a2 = _p2_adjust_sql("u", "u", 2)
    a3 = _p2_adjust_sql("a2", "u", 3)
    a4 = _p2_adjust_sql("a3", "u", 4)
    return f"""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS x,
             CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS yc
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    s AS (SELECT event_type, x, yc,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS nt
          FROM d),
    seed AS (SELECT event_type, max(nt) AS nt,
                    list_sort(list(x ORDER BY rn)) AS h,
                    [CAST(1 AS BIGINT),2,3,4,5] AS n,
                    {np0!r}::DOUBLE[] AS np
             FROM s WHERE rn <= 5 GROUP BY event_type
             HAVING count(*) = 5 AND max(nt) >= 5),
    st AS (
      SELECT event_type, nt, CAST(5 AS BIGINT) AS rn, h, n, np FROM seed
      UNION ALL
      SELECT u.event_type, u.nt, u.rn, a4.h, a4.n, u.np
      FROM (
        SELECT st.event_type, st.nt, s.rn, s.x,
               list_transform(st.h, (v, j) ->
                 CASE WHEN j = 1 THEN least(v, s.x)
                      WHEN j = 5 THEN greatest(v, s.x) ELSE v END) AS h0,
               (CASE WHEN s.x < st.h[2] THEN 1 WHEN s.x < st.h[3] THEN 2
                     WHEN s.x < st.h[4] THEN 3 ELSE 4 END) AS k,
               st.n AS n_prev, st.np AS np_prev
        FROM st JOIN s ON s.event_type = st.event_type
                      AND s.rn = st.rn + 1
      ) q,
      LATERAL (SELECT q.event_type, q.nt, q.rn, q.h0 AS h,
                      list_transform(q.n_prev, (v, j) ->
                        CASE WHEN j > q.k THEN v + 1 ELSE v END) AS n,
                      list_transform(q.np_prev, (v, j) ->
                        v + {dn!r}[j]) AS np) u,
      LATERAL ({a2}) a2,
      LATERAL ({a3}) a3,
      LATERAL ({a4}) a4
    ),
    med AS (SELECT event_type, min(yc) AS exact_cents
            FROM (SELECT event_type, yc, nt,
                         CAST(row_number() OVER (PARTITION BY event_type
                                                 ORDER BY yc) AS BIGINT)
                           AS vr
                  FROM s) r
            WHERE vr = CAST(floor({p!r} * CAST(nt - 1 AS DOUBLE))
                            AS BIGINT) + 1
            GROUP BY event_type)
    SELECT st.event_type AS key, st.nt AS n_obs, st.h[3] AS p2_est,
           med.exact_cents
    FROM st JOIN med ON med.event_type = st.event_type
    WHERE st.rn = st.nt
    """


@register("sketch_p2_quantile", _p2_sql(0.5))
def sketch_p2_quantile(spark, sf_dir):
    """P² (piecewise-parabolic) streaming median of daily value
    totals per event type — Jain & Chlamtac's five-marker O(1)-state
    single-pass quantile estimator, the classic answer to "quantiles
    without sorting" — with the EXACT lower-median order statistic
    alongside as a self-certifying error reference.

    Exactness: the marker fold is a fixed IEEE-double sequence; the
    Python kernel (functions/sketches.p2_fold_py, run per key via
    applyInPandas) and the generated DuckDB recursive CTE
    (_p2_sql — chained LATERAL stages keep the three SEQUENTIAL
    marker adjustments linear in text) write the same expressions in
    the same order, so estimates match bit-for-bit (prototyped on two
    SFs before registration, per the parked-item mandate).

    Scale: P² state is NOT mergeable — per-key sequential is the
    honest shape; keys parallelize, each sequence is the bounded
    calendar-day grain, state is O(1).  Compare
    sketch_kll_quantiles / sketch_tdigest_quantiles for the
    mergeable-summary alternatives.  NULL values are dropped before
    the daily rollup in both engines: an all-NULL day yields NULL y,
    which crashed the Python fold's int() and has no defined marker
    semantics (r13 null-probe find)."""
    from dicomdb_spark.functions.sketches import p2_quantile

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(
        F.col("event_type"), F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    return p2_quantile(d, p=0.5)


# ---------------------------------------------------------------------------
# Round-11: Siegel-Tukey dispersion test (NEXT_STEPS parked item; the
# tie-group averaging uses the floor-scaled integer-quotient trick).
# ---------------------------------------------------------------------------


@register(
    "a_siegel_tukey",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS y,
                      CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                           THEN 1 ELSE 0 END AS wk
               FROM events WHERE value IS NOT NULL GROUP BY 1),
    p AS (SELECT day, y, wk,
                 CAST(row_number() OVER (ORDER BY y, day) AS BIGINT) AS pos,
                 CAST(count(*) OVER () AS BIGINT) AS nn
          FROM d),
    mm AS (SELECT CASE WHEN max(nn) % 2 = 1 THEN (max(nn) + 1) // 2
                       ELSE max(nn) + 1 END AS m,
                  max(nn) - max(nn) % 2 AS np
           FROM p),
    q AS (SELECT p.y, p.wk,
                 p.pos - CASE WHEN p.pos > mm.m THEN 1 ELSE 0 END AS pos2,
                 mm.np, mm.np // 2 AS h
          FROM p, mm WHERE p.pos <> mm.m),
    r AS (SELECT y, wk,
                 CASE WHEN pos2 <= h
                      THEN 2 * pos2 - pos2 % 2
                      ELSE 2 * (np + 1 - pos2)
                           - (1 - (np + 1 - pos2) % 2) END AS st_rank
          FROM q),
    g AS (SELECT y, CAST(SUM(st_rank) AS BIGINT) AS sg,
                 CAST(count(*) AS BIGINT) AS cg,
                 CAST(SUM(wk) AS BIGINT) AS n1g
          FROM r GROUP BY y),
    w AS (SELECT CAST(SUM((n1g * sg * 1000000) // cg) AS BIGINT) AS w1s,
                 CAST(SUM(n1g) AS BIGINT) AS n1,
                 CAST(SUM(cg - n1g) AS BIGINT) AS n2
          FROM g)
    SELECT w.n1 AS n_weekend, w.n2 AS n_weekday,
           CAST(w.w1s AS DOUBLE) / 1000000.0 AS w_weekend,
           (CAST(w.w1s - w.n1 * (mm.np + 1) * 500000 AS DOUBLE) / 1000000.0)
             / sqrt(CAST(w.n1 * w.n2 * (mm.np + 1) AS DOUBLE) / 12.0) AS z
    FROM w, mm WHERE w.n1 > 0 AND w.n2 > 0
    """,
)
def a_siegel_tukey(spark, sf_dir):
    """Siegel-Tukey rank-dispersion test: do WEEKEND daily totals
    spread wider than weekday totals?  Ranks are assigned from the
    extremes inward, alternating ends — sorted position i from the
    bottom gets 2i-1 (i odd) / 2i (i even); position j from the top
    gets 2j (j odd) / 2j-1 (j even) — so LOW ranks mark extreme
    values and the Mann-Whitney machinery on these ranks tests
    dispersion instead of location.  Odd-count samples drop the
    median observation (deterministic day tiebreak), per the original
    procedure.

    Tie discipline (the parked-item trick): tied values occupy a
    CONTIGUOUS position run, so each member's midrank is S_g/c_g of
    the group's alternating ranks; the group-1 rank-sum contribution
    n1g*S_g/c_g is kept exact as the integer quotient
    (n1g*S_g*10^6) div c_g — no float until the closing z chain,
    which is one fixed-order expression in both engines.

    Scale: the grain is calendar days (<= ~2,400 rows at any SF), so
    the position numbering is bucketed-running over the bounded
    distinct-value sequence (a_mannwhitney_u's plan shape) plus a
    row_number partitioned BY VALUE — no global unpartitioned sort of
    anything unbounded.  NULL values are dropped before the daily
    rollup: an all-NULL day's NULL y sorts NULLS FIRST in Spark and
    NULLS LAST in DuckDB, shifting every alternating rank (r13
    null-probe find)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y"),
        F.max(
            F.when(F.dayofweek(F.col("ts").cast("date")).isin(1, 7), 1)
            .otherwise(0)
        ).alias("wk"),
    )
    # positions without a global sort: exclusive running count of the
    # value grain + within-value row_number (bounded partitions)
    g0 = d.groupBy("y").agg(F.count("*").cast("long").alias("t"))
    cum = ow.bucketed_running(
        ow.monotone_range_bucket(g0, "y"), order_cols=["y"], sum_cols=["t"]
    ).withColumn("p", F.col("cum_t") - F.col("t"))
    j0 = F.row_number().over(Window.partitionBy("y").orderBy("day"))
    pos_df = (
        d.join(cum.select("y", "p"), "y")
        .withColumn("pos", (F.col("p") + j0).cast("long"))
    )
    nn = d.agg(F.count("*").cast("long").alias("nn"))
    mm = nn.select(
        F.when(F.col("nn") % 2 == 1, (F.col("nn") + 1) / 2)
        .otherwise(F.col("nn") + 1)
        .cast("long")
        .alias("m"),
        (F.col("nn") - F.col("nn") % 2).cast("long").alias("np"),
    )
    q = (
        pos_df.crossJoin(F.broadcast(mm))
        .filter(F.col("pos") != F.col("m"))
        .select(
            "y",
            "wk",
            (
                F.col("pos")
                - F.when(F.col("pos") > F.col("m"), 1).otherwise(0)
            ).alias("pos2"),
            "np",
            (F.col("np") / 2).cast("long").alias("h"),
        )
    )
    j = F.col("np") + 1 - F.col("pos2")
    st_rank = F.when(
        F.col("pos2") <= F.col("h"),
        2 * F.col("pos2") - F.col("pos2") % 2,
    ).otherwise(2 * j - (1 - j % 2))
    g = q.select("y", "wk", st_rank.alias("st_rank")).groupBy("y").agg(
        F.sum("st_rank").cast("long").alias("sg"),
        F.count("*").cast("long").alias("cg"),
        F.sum("wk").cast("long").alias("n1g"),
    )
    w = g.agg(
        F.sum(F.expr("(n1g * sg * 1000000) div cg"))
        .cast("long")
        .alias("w1s"),
        F.sum("n1g").cast("long").alias("n1"),
        F.sum(F.col("cg") - F.col("n1g")).cast("long").alias("n2"),
    )
    out = w.crossJoin(F.broadcast(mm))
    return out.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        (F.col("w1s").cast("double") / 1000000.0).alias("w_weekend"),
        (
            (
                F.col("w1s")
                - F.col("n1") * (F.col("np") + 1) * 500000
            ).cast("double")
            / 1000000.0
            / F.sqrt(
                (
                    F.col("n1") * F.col("n2") * (F.col("np") + 1)
                ).cast("double")
                / 12.0
            )
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Round-11: generalized ESD outlier sequence (NEXT_STEPS parked item
# "generalized ESD (iterative Grubbs, bounded rounds)").
# ---------------------------------------------------------------------------

_ESD_SQL_ROUND = """
    s{k} AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
                    CAST(SUM(CAST(floor((CAST(y - cshift{k}.c AS DOUBLE)
                                         * CAST(y - cshift{k}.c AS DOUBLE))
                                        / 10000.0) AS BIGINT)) AS BIGINT)
                      AS sd2s,
                    CAST(SUM(y) AS BIGINT)
                      - CAST(count(*) AS BIGINT) * cshift{k}.c AS rs
             FROM d{j}, cshift{k} GROUP BY cshift{k}.c),
    a{k} AS (SELECT max(abs(s{k}.n * d{j}.y - s{k}.s)) AS dmax
             FROM d{j}, s{k}),
    r{k} AS (SELECT min(d{j}.day) AS rm_day FROM d{j}, s{k}, a{k}
             WHERE abs(s{k}.n * d{j}.y - s{k}.s) = a{k}.dmax)"""


def _esd_sql() -> str:
    parts = [
        """
    WITH d0 AS (SELECT CAST(ts AS DATE) AS day,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                         AS y
                FROM events GROUP BY 1)"""
    ]
    for k in (1, 2, 3):
        j = k - 1
        parts.append(
            f"""
    pre{k} AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS s FROM d{j}),
    cshift{k} AS (SELECT (s - ((s % n + n) % n)) // n AS c FROM pre{k})"""
        )
        parts.append(_ESD_SQL_ROUND.format(k=k, j=j))
        if k < 3:
            parts.append(
                f"""
    d{k} AS (SELECT d{j}.* FROM d{j}, r{k} WHERE d{j}.day <> r{k}.rm_day)"""
            )
    selects = []
    for k in (1, 2, 3):
        selects.append(
            f"""
    SELECT CAST({k} AS BIGINT) AS iter, r{k}.rm_day AS removed_day,
           s{k}.n AS n_obs,
           CAST(a{k}.dmax AS DOUBLE)
             / nullif(sqrt(greatest(CAST(s{k}.n AS DOUBLE)
                    * (CAST(s{k}.n AS DOUBLE)
                       * (CAST(s{k}.sd2s AS DOUBLE) * 10000.0)
                       - CAST(s{k}.rs AS DOUBLE) * CAST(s{k}.rs AS DOUBLE))
                    / CAST(s{k}.n - 1 AS DOUBLE), 0.0)), 0.0) AS r_stat
    FROM s{k}, a{k}, r{k}"""
        )
    return ",".join(parts) + " UNION ALL ".join(selects)


@register("a_generalized_esd", _esd_sql())
def a_generalized_esd(spark, sf_dir):
    """Generalized extreme studentized deviate: three unrolled Grubbs
    rounds over daily value totals — each round reports
    R_k = max|y - mean| / s and removes the argmax (min-day tiebreak)
    before the next.  Unlike a single Grubbs test (a_grubbs_outlier),
    the sequence is masking-proof: a second outlier can no longer hide
    the first.

    Exactness: R_k = Dmax / sqrt(n*(n*Sxx - S^2)/(n-1)) with
    Dmax = max|n*y - S| as exact int64, and the sum of squares over
    MEAN-SHIFTED deviations d = y - c (c = floor(S/n) via the
    canonical nonnegative-residue floor division, identical in both
    engines since Spark div truncates and DuckDB // floors — the
    co-moment is shift-invariant).  Each d^2 is floor-scaled BEFORE
    summing (floor(d*d/1e4), the a_ljung_box dsum-for-products
    discipline) so the accumulator is int64 at ANY SF — n*max(d^2)/1e4
    stays ~10^14 even when raw n*Sxx would overflow; and because IEEE
    multiplication is correctly rounded, the d*d doubles are
    IDENTICAL in both engines even past 2^53, so parity holds at any
    magnitude (the ~1e-4-cent^2 floor granularity is statistically
    invisible in R).  argmax is the two-step max-then-min-day form —
    no float compare, no struct ordering.

    Scale: calendar-day grain (<= ~2,400 rows at any SF); three
    rounds of 1-row broadcast aggregates — the only crossJoins are
    1-row broadcasts, the repo-wide rule."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    outs = []
    cur = d
    for k in (1, 2, 3):
        pre = cur.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
        )
        cshift = pre.select(
            F.expr("(s - ((s % n + n) % n)) div n").cast("long").alias("c")
        )
        withc = cur.crossJoin(F.broadcast(cshift))
        dd = (F.col("y") - F.col("c")).cast("double")
        stats = withc.groupBy("c").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
            F.sum(F.floor((dd * dd) / 10000.0).cast("long"))
            .cast("long")
            .alias("sd2s"),
            (
                F.sum("y").cast("long")
                - F.count("*").cast("long") * F.col("c")
            ).alias("rs"),
        ).drop("c")
        wd = cur.crossJoin(F.broadcast(stats))
        ad = F.abs(F.col("n") * F.col("y") - F.col("s"))
        amax = wd.agg(F.max(ad).alias("dmax"))
        rm = (
            wd.crossJoin(F.broadcast(amax))
            .filter(ad == F.col("dmax"))
            .agg(F.min("day").alias("rm_day"))
        )
        row = (
            stats.crossJoin(F.broadcast(amax))
            .crossJoin(F.broadcast(rm))
            .select(
                F.lit(k).cast("long").alias("iter"),
                F.col("rm_day").alias("removed_day"),
                F.col("n").alias("n_obs"),
                (
                    F.col("dmax").cast("double")
                    # radicand clamped at 0 (floor-scaling discards up
                    # to 1e4 per row, so near-constant survivor sets
                    # can go fractionally negative) and a zero sqrt is
                    # NULLed instead of dividing — identical nullif /
                    # greatest guards in the oracle SQL
                    / F.nullif(
                        F.sqrt(
                            F.greatest(
                                F.col("n").cast("double")
                                * (
                                    F.col("n").cast("double")
                                    * (F.col("sd2s").cast("double") * 10000.0)
                                    - F.col("rs").cast("double")
                                    * F.col("rs").cast("double")
                                )
                                / (F.col("n") - 1).cast("double"),
                                F.lit(0.0),
                            )
                        ),
                        F.lit(0.0),
                    )
                ).alias("r_stat"),
            )
        )
        outs.append(row)
        if k < 3:
            # localCheckpoint truncates lineage: each round's five
            # 1-row aggregates re-embed the survivor set's subtree, so
            # without truncation the plan re-expands ~5^k-fold (the
            # graph_eccentricity / graph_ktruss_peel discipline)
            cur = (
                cur.crossJoin(F.broadcast(rm))
                .filter(F.col("day") != F.col("rm_day"))
                .select("day", "y")
                .transform(cut_lineage)
            )
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    return out
