"""registry chunk 9 — round-10 additions (new queries land here; the
q01..q08 chunks are the frozen mechanical split of the former
registry.py monolith)."""
from __future__ import annotations

from pyspark.sql import Window  # noqa: F401
from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry._core import register
from dicomdb_spark.session import local_fanout  # noqa: F401


# ---------------------------------------------------------------------------
# Round-10: REAL image-container decode (VERDICT r9 ask #2).
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode_real",
    """
    SELECT doc_id,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
                  WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 54 ELSE 15 END
                + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
                WHEN 2 THEN 'image/bmp' ELSE 'image/jpeg' END AS format,
           CAST(doc_id % 1024 + 1 AS INTEGER) AS width,
           CAST((doc_id * 7) % 1024 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_decode_real(spark, sf_dir):
    """REAL container decode round trip (round-10, VERDICT r9 #2 —
    closes the last stubbed COVERAGE cell): documents are wrapped in
    structurally valid PNG / GIF89a / BMP / JPEG-SOF0 containers
    (llm/multimodal.build_container — header fields are pure functions
    of doc_id), then llm/multimodal.stdlib_decoder PARSES the bytes
    back: PNG IHDR big-endian u32 dims, GIF logical-screen-descriptor
    little-endian u16, BMP BITMAPINFOHEADER signed-i32, JPEG marker
    walk to SOFn — the same zero-dependency move as the pure-Python
    DICOM Part-10 reader (sources/dicom.py; reference behavior:
    Exam_info.py header reads).  The oracle states the EXPECTED
    metadata per synthetic container, so a single mis-parsed header
    field (endianness, offset, marker skip) breaks the hash.  Both
    mapInPandas hops are map-only — payload bytes never shuffle; only
    the typed metadata leaves Python."""
    from dicomdb_spark.llm.multimodal import containerize, decode_image_meta

    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(containerize(docs)).select(
        "doc_id", "n_bytes", "format", "width", "height"
    )


# ---------------------------------------------------------------------------
# Round-10: Hoeffding's D (parked-list item sanctioned by VERDICT r9 #6).
# ---------------------------------------------------------------------------


@register(
    "a_hoeffding_d",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS x,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS y
               FROM events GROUP BY 1),
    r AS (SELECT a.day,
                 CAST(2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN b.x = a.x AND b.day <> a.day
                                 THEN 1 ELSE 0 END)
                      + 2 AS BIGINT) AS r2,
                 CAST(2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN b.y = a.y AND b.day <> a.day
                                 THEN 1 ELSE 0 END)
                      + 2 AS BIGINT) AS s2,
                 CAST(4 * SUM(CASE WHEN b.x < a.x AND b.y < a.y
                                   THEN 1 ELSE 0 END)
                      + 2 * SUM(CASE WHEN b.x = a.x AND b.y < a.y
                                     THEN 1 ELSE 0 END)
                      + 2 * SUM(CASE WHEN b.x < a.x AND b.y = a.y
                                     THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN b.x = a.x AND b.y = a.y
                                      AND b.day <> a.day
                                 THEN 1 ELSE 0 END)
                      + 4 AS BIGINT) AS q4
          FROM d a CROSS JOIN d b GROUP BY a.day),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM((q4 - 4) * (q4 - 8)) AS BIGINT) AS d1_16,
                 CAST(SUM((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
                      AS BIGINT) AS d2_16,
                 CAST(SUM((r2 - 4) * (s2 - 4) * (q4 - 4)) AS BIGINT)
                   AS d3_16
          FROM r)
    SELECT n AS n_days, d1_16, d2_16, d3_16,
           30.0 * ((CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)
                     * CAST(d1_16 AS DOUBLE)
                   + CAST(d2_16 AS DOUBLE)
                   - 2.0 * (CAST(n AS DOUBLE) - 2.0)
                     * CAST(d3_16 AS DOUBLE))
           / (16.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
              * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)
              * (CAST(n AS DOUBLE) - 4.0)) AS hoeffding_d
    FROM m WHERE n > 4
    """,
)
def a_hoeffding_d(spark, sf_dir):
    """Hoeffding's D dependence statistic (AMS 1948) between the daily
    event COUNT and the daily cent-scaled value TOTAL — the
    nonparametric test that catches NON-monotone dependence Spearman/
    Kendall miss (D ≈ 30·∫(F₁₂ − F₁F₂)² dF₁₂ ∈ [−0.5, 1]).  The
    exact-tie handling NEXT_STEPS flagged as the risk is solved by
    integer-encoding the quadrant MIDRANKS: with c_lt/c_eq the
    strict-below / tied-elsewhere counts, 2R = 2·c_lt(x) + c_eq(x) + 2
    and 4Q = 4·c_ll + 2·(c_el + c_le) + c_ee + 4 are exact integers,
    so D1 = Σ(Q−1)(Q−2), D2 = Σ(R−1)(R−2)(S−1)(S−2) and
    D3 = Σ(R−2)(S−2)(Q−1) become integer sums d*_16 (a common /16
    carried into the final single float chain — one division on both
    engines).  Counts come from the bounded calendar-day-grain D²
    self-join (n ≤ |days|, calendar-capped at any SF; int64 bound:
    d2_16 terms < (2n)⁴ ⇒ Σ < 1.4e18 even at a 2400-day calendar).
    Degenerate n ≤ 4 (D undefined) returns EMPTY on both engines."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    )
    a, b = d.alias("a"), d.alias("b")

    def n_where(cond):
        return F.sum(cond.cast("long"))

    bx, ax = F.col("b.x"), F.col("a.x")
    by, ay = F.col("b.y"), F.col("a.y")
    ne = F.col("b.day") != F.col("a.day")
    r = (
        a.crossJoin(b)
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            (2 * n_where(bx < ax) + n_where((bx == ax) & ne) + 2)
            .cast("long")
            .alias("r2"),
            (2 * n_where(by < ay) + n_where((by == ay) & ne) + 2)
            .cast("long")
            .alias("s2"),
            (
                4 * n_where((bx < ax) & (by < ay))
                + 2 * n_where((bx == ax) & (by < ay))
                + 2 * n_where((bx < ax) & (by == ay))
                + n_where((bx == ax) & (by == ay) & ne)
                + 4
            )
            .cast("long")
            .alias("q4"),
        )
    )
    q4, r2, s2 = F.col("q4"), F.col("r2"), F.col("s2")
    m = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((q4 - 4) * (q4 - 8)).cast("long").alias("d1_16"),
        F.sum((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
        .cast("long")
        .alias("d2_16"),
        F.sum((r2 - 4) * (s2 - 4) * (q4 - 4)).cast("long").alias("d3_16"),
    )
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    num = 30.0 * (
        (nd - 2.0) * (nd - 3.0) * dd("d1_16")
        + dd("d2_16")
        - 2.0 * (nd - 2.0) * dd("d3_16")
    )
    den = (
        16.0 * nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0) * (nd - 4.0)
    )
    return m.filter(F.col("n") > 4).select(
        F.col("n").alias("n_days"),
        "d1_16", "d2_16", "d3_16",
        (num / den).alias("hoeffding_d"),
    )
