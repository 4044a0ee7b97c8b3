"""Deterministic, engine-portable sketches: KMV cardinality and
count-min frequency.

Spark's built-in approx_count_distinct (HyperLogLog++) is the right
production tool, but its register layout is engine-private — a DuckDB
oracle cannot replay it.  These sketches deliver the same scale story
(constant-size state, one pass, mergeable across partitions) from
pure md5 arithmetic, so every estimate is bit-identical across
engines, partitionings, and re-runs:

* KMV (k minimum values): the k-th smallest of the distinct 32-bit
  md5 prefixes estimates cardinality as (k−1)·2³² / h_k — the
  classic bottom-k estimator (Bar-Yossef et al. 2002; Beyer et al.
  SIGMOD 2007).  State per group = k hashes.
* Count-min: depth×width integer counters addressed by salted md5;
  point estimate = min over rows.  Always ≥ the true count
  (Cormode & Muthukrishnan, J. Algorithms 2005).
* Bloom filter: k salted hash bits per key, no false negatives
  (Bloom, CACM 1970); the join pre-filter usage mirrors Spark's own
  runtime bloom join filters.

Both are plain DataFrame aggregates — the "sketch" is literally a
small grouped table, so merging across partitions IS the shuffle
aggregate, and nothing ever collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _hex_int(col: Column, n_chars: int) -> Column:
    """First ``n_chars`` hex chars of an md5 column → integer."""
    return F.conv(F.substring(col, 1, n_chars), 16, 10).cast("long")


def sql_hex_int(expr: str, n_chars: int) -> str:
    """DuckDB twin of :func:`_hex_int` (no conv(); positional strpos
    digits)."""
    terms = [
        f"(strpos('{HEX}', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (n_chars - 1 - i)}"
        for i in range(n_chars)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV cardinality estimate vs exact count.

    Output: (group, n_exact, n_est).  Groups with fewer than k
    distinct hashes report exactly (the sketch holds them whole) —
    the standard KMV fallback.  Plan: one distinct-hash aggregate,
    one per-group window to find h_k, one tiny join; state is ≤ k
    rows per group at every point.
    """
    h = _hex_int(F.md5(F.col(item_col)), 8)
    d = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("g").agg(F.count("*").alias("n_exact"))
    kth = ranked.filter(F.col("rn") == k).select("g", F.col("h").alias("hk"))
    return (
        stats.join(kth, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            F.when(
                F.col("hk").isNotNull(),
                F.lit(float(k - 1)) * F.lit(4294967296.0) / F.col("hk"),
            )
            .otherwise(F.col("n_exact").cast("double"))
            .alias("n_est"),
        )
    )


def kmv_oracle(item_sql: str, from_sql: str, group_sql: str, k: int = 256) -> str:
    """DuckDB replay of :func:`kmv_distinct`."""
    h = sql_hex_int(f"md5({item_sql})", 8)
    return f"""
    WITH d AS (SELECT DISTINCT {group_sql} AS g, {h} AS h FROM {from_sql}),
    ranked AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
               FROM d),
    stats AS (SELECT g, count(*) AS n_exact FROM ranked GROUP BY 1),
    kth AS (SELECT g, h AS hk FROM ranked WHERE rn = {k})
    SELECT s.g, s.n_exact,
           CASE WHEN kth.hk IS NOT NULL
                THEN {float(k - 1)!r} * 4294967296.0 / kth.hk
                ELSE CAST(s.n_exact AS DOUBLE) END AS n_est
    FROM stats s LEFT JOIN kth ON kth.g = s.g
    """


def _bucket_rho(d: DataFrame, p: int) -> DataFrame:
    """(g, h=md5-hex) → (g, b, rho): register address from the first
    p bits, ρ = 1 + leading-zero count of the next 48 bits — all read
    straight off the hex string (shared by hll_distinct /
    hll_registers so the sketch and its mergeable-state twin can never
    drift)."""
    tail = F.substring(F.col("h"), p // 4 + 1, 12)
    lz = F.length(F.regexp_extract(tail, "^0*", 0))
    first = tail.substr(lz + 1, F.lit(1))
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return d.select(
        "g",
        _hex_int(F.col("h"), p // 4).alias("b"),
        (lz * 4 + extra + 1).alias("rho"),
    )


def hll_registers(
    df: DataFrame,
    group_col: str,
    item_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register state — (group, b, r) rows, ≤ 2^p per
    group — the MERGEABLE half of :func:`hll_distinct`.

    Registers merge by plain ``max(r)`` per (group, b): the estimate
    computed from merged registers is *identical* to running the
    sketch over the union of the inputs (max is associative,
    commutative, idempotent).  That is the property that lets a
    100 TB rollup keep one 2^p-row state per partition / day / shard
    and combine upward without ever re-reading raw data.
    """
    md5c = F.md5(F.col(item_col))
    d = df.select(F.col(group_col).alias("g"), md5c.alias("h")).distinct()
    return (
        _bucket_rho(d, p)
        .groupBy("g", "b")
        .agg(F.max("rho").alias("r"))
        .withColumnRenamed("g", group_col)
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_col: str,
    p: int = 8,
) -> DataFrame:
    """(group, b, r) register rows → (group, zero_regs, n_est) raw-HLL
    estimate, numerically identical to :func:`hll_distinct`'s (same
    exact-integer harmonic sum, same single double division)."""
    m = 1 << p
    q = 50
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * float(m) * float(m) * float(2**q)
    per_g = regs.groupBy(group_col).agg(
        F.count("*").alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({q} - r AS INT))")).alias(
            "s_obs"
        ),
    )
    s = F.col("s_obs") + (F.lit(m) - F.col("nb")) * F.lit(2**q).cast("long")
    return per_g.select(
        group_col,
        (F.lit(m) - F.col("nb")).cast("long").alias("zero_regs"),
        (F.lit(num) / s.cast("double")).alias("n_est"),
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    item_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group deterministic HyperLogLog cardinality estimate
    (Flajolet, Fusy, Gandouet & Meunier, AofA 2007 — public method)
    next to the exact count.

    m = 2^p registers; the bucket is the first p bits of md5 (p/4 hex
    chars) and ρ = 1 + leading-zero count of the next 48 bits —
    computed from the HEX STRING (4·zero-chars + a first-nonzero-digit
    table), so both engines read the identical bits without 64-bit
    casts.  The harmonic-mean denominator Σ 2^(−reg) is kept EXACT by
    scaling to Σ 2^(Q−reg) integer terms (Q=50; ρ ≤ 49 so every term
    and the ≤ m·2^50 sum fit int64), with absent registers counting
    2^Q each; the estimate is then ONE double division of the
    precomputed α·m²·2^Q numerator — bit-identical everywhere, unlike
    Spark's engine-private HLL++ register layout
    (approx_count_distinct), which an oracle cannot replay.

    The raw estimator only (no small/large-range corrections: linear
    counting needs ln(), and libm transcendentals are not
    bit-portable across engines); ``zero_regs`` is emitted so a
    production wrapper can apply corrections downstream.

    Plan: one distinct-(group, hash) aggregate, one (group, bucket)
    max-ρ aggregate, one per-group sum — constant ≤ m rows of state
    per group at every point, mergeable across partitions by
    construction.  Output: (group, n_exact, zero_regs, n_est).
    """
    m = 1 << p
    q = 50
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * float(m) * float(m) * float(2**q)
    md5c = F.md5(F.col(item_col))
    d = df.select(F.col(group_col).alias("g"), md5c.alias("h")).distinct()
    regs = _bucket_rho(d, p).groupBy("g", "b").agg(F.max("rho").alias("r"))
    per_g = regs.groupBy("g").agg(
        F.count("*").alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({q} - r AS INT))")).alias(
            "s_obs"
        ),
    )
    exact = d.groupBy("g").agg(F.count("*").alias("n_exact"))
    s = F.col("s_obs") + (F.lit(m) - F.col("nb")) * F.lit(2**q).cast("long")
    return (
        exact.join(per_g, "g")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            (F.lit(m) - F.col("nb")).cast("long").alias("zero_regs"),
            (F.lit(num) / s.cast("double")).alias("n_est"),
        )
    )


def hll_oracle(item_sql: str, from_sql: str, group_sql: str, p: int = 8) -> str:
    """DuckDB replay of :func:`hll_distinct` — same hex-string bit
    reads, same exact-integer register sum, same single division."""
    m = 1 << p
    q = 50
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * float(m) * float(m) * float(2**q)
    b = sql_hex_int("h", p // 4)
    return f"""
    WITH d AS (SELECT DISTINCT {group_sql} AS g, md5({item_sql}) AS h
               FROM {from_sql}),
    tl AS (SELECT g, h, substr(h, {p // 4 + 1}, 12) AS tail FROM d),
    rho AS (
      SELECT g, {b} AS b,
             4 * length(regexp_extract(tail, '^0*')) +
             CASE substr(tail, length(regexp_extract(tail, '^0*')) + 1, 1)
               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
               ELSE 0 END + 1 AS rho
      FROM tl),
    regs AS (SELECT g, b, max(rho) AS r FROM rho GROUP BY 1, 2),
    per_g AS (
      SELECT g, count(*) AS nb,
             CAST(SUM(CAST(1 AS BIGINT) << ({q} - r)) AS BIGINT) AS s_obs
      FROM regs GROUP BY 1),
    exact AS (SELECT g, count(*) AS n_exact FROM d GROUP BY 1)
    SELECT e.g, e.n_exact,
           CAST({m} - p.nb AS BIGINT) AS zero_regs,
           {num!r} / CAST(p.s_obs + ({m} - p.nb) * (CAST(1 AS BIGINT) << {q})
                          AS DOUBLE) AS n_est
    FROM exact e JOIN per_g p ON p.g = e.g
    """


def cms_cells(item: Column, depth: int = 4, width_chars: int = 2) -> Column:
    """All ``depth`` count-min cell coordinates for an item, carved
    from ONE md5 digest as ``array<struct<d,col>>``: row ``d`` reads
    hex span ``[d·w, (d+1)·w)``.  Distinct output bytes of a single
    digest serve as the independent row hashes (the Kirsch–
    Mitzenmacher "less hashing, same performance" construction — the
    same trick the minhash path uses: 16 minima from 4 digests).
    This matters because the digest is the dominant sketch-build cost:
    one md5 per item instead of ``depth`` salted ones (measured 4×
    on the build stage).  Requires depth·width ≤ 32 hex chars."""
    if depth * width_chars > 32:
        raise ValueError("depth*width_chars must fit one md5 digest")
    dig = F.md5(item.cast("string"))
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                F.conv(
                    F.substring(dig, 1 + d * width_chars, width_chars), 16, 10
                )
                .cast("long")
                .alias("col"),
            )
            for d in range(depth)
        ]
    )


def sql_cms_col(item_sql: str, d_sql: str, width_chars: int = 2) -> str:
    """DuckDB twin of the :func:`cms_cells` column index for sketch
    row ``d_sql`` (a SQL expression): positional strpos digits over
    the d-th hex span of ONE md5 digest."""
    terms = [
        f"(strpos('{HEX}', substr(md5({item_sql}), "
        f"({d_sql}) * {width_chars} + {i + 1}, 1)) - 1)"
        f" * {16 ** (width_chars - 1 - i)}"
        for i in range(width_chars)
    ]
    return "(" + " + ".join(terms) + ")"


def count_min(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width_chars: int = 2,
) -> DataFrame:
    """Count-min sketch table (d, col, c) over an item stream.

    All ``depth`` row-cells come from one digest (:func:`cms_cells`),
    exploded and aggregated in one groupBy — the sketch IS a (tiny)
    DataFrame, mergeable by construction.
    """
    cells = F.explode(cms_cells(F.col(item_col), depth, width_chars)).alias("cell")
    return (
        items.select(cells)
        .select(F.col("cell.d").alias("d"), F.col("cell.col").alias("col"))
        .groupBy("d", "col")
        .agg(F.count("*").alias("c"))
    )


def bloom_bits(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom filter of a key set as a DataFrame of set bit positions
    (≤ m_bits rows) — the distributed form of the runtime join filter
    (Spark's own bloom pushdown does exactly this: build on the small
    side, ship to the probe scan).  Salted md5 gives the k hash
    functions; DISTINCT makes the bit table the union of all
    partitions' bits, so construction is one aggregate."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("salt")
    e = keys.select(F.col(key_col).cast("string").alias("key"), salts)
    pos = (
        _hex_int(F.md5(F.concat(F.col("salt").cast("string"), F.lit("#"), F.col("key"))), 8)
        % m_bits
    )
    return e.select(pos.alias("pos")).distinct()


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Probe rows → bloom_pass flag: a key passes iff ALL k of its bit
    positions are set.  The bit table collapses to ONE sorted-array row
    that broadcasts (≤ m_bits ints); each probe row tests its k salted
    positions with array_contains against that row — a purely map-side
    membership test.  The probe side never shuffles and never explodes
    — the pre-r13 form fanned every probe ×k, semi-joined the bit
    table, re-aggregated per key and joined the flags back on (guide
    §2.4: four operators removed outright).  No false negatives by
    construction.  A NULL key hashes to NULL positions and fails the
    probe, exactly like the old count-of-hits == k path."""
    bitset = bits.agg(F.array_sort(F.collect_set("pos")).alias("__bitset"))

    def pos_of(salt: int):
        return (
            _hex_int(
                F.md5(
                    F.concat(
                        F.lit(str(salt)),
                        F.lit("#"),
                        F.col(key_col).cast("string"),
                    )
                ),
                8,
            )
            % m_bits
        )

    all_set = F.lit(True)
    for i in range(k_hashes):
        all_set = all_set & F.array_contains(F.col("__bitset"), pos_of(i))
    return (
        probes.crossJoin(F.broadcast(bitset))
        .withColumn("bloom_pass", F.coalesce(all_set, F.lit(False)))
        .drop("__bitset")
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width_chars: int = 2,
) -> DataFrame:
    """Point estimates for probe items: min over the sketch rows.
    The sketch broadcasts (depth·width rows); probes never shuffle."""
    cells = F.explode(
        cms_cells(F.col(item_col), depth, width_chars)
    ).alias("cell")
    p = probes.select(F.col(item_col).alias("item"), cells).select(
        "item", F.col("cell.d").alias("d"), F.col("cell.col").alias("col")
    )
    return (
        p.join(F.broadcast(sketch), ["d", "col"])
        .groupBy("item")
        .agg(F.min("c").alias("est_c"))
    )


def kmv_theta_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch set operations (Dasgupta, Lang, Rhodes & Thaler,
    EDBT 2016 — the DataSketches theta framework, public method):
    estimate |A∪B|, |A∩B| and |A∖B| from two k-minimum-value
    sketches, next to the exact counts.  (The difference is sound
    because θ ≤ θ_B: any B-hash below θ is guaranteed present in B's
    sketch, so the anti-join never miscounts a sampled A-hash.)

    θ = min(kth-smallest hash of A, of B; 2^32 when a side holds its
    whole set).  Union estimate = |{h ∈ sketch_A ∪ sketch_B : h < θ}|
    · 2^32 / θ; intersection the same over the sketch intersection —
    set algebra the raw-cardinality sketches (KMV, HLL) cannot do,
    which is why theta sketches exist.  Every step is an integer
    compare on md5-derived uint32s; the only float op is one final
    exact-input division per estimate, so both engines agree
    bit-for-bit.

    Scale shape: each side is one distinct-hash aggregate + a
    distributed top-k (TakeOrdered, never a global sort); everything
    after operates on ≤ k rows and broadcasts.  Exact counts ride
    along for error inspection (drop them at 100 TB).
    """
    two32 = 4294967296
    ha = df_a.select(_hex_int(F.md5(F.col(item_col)), 8).alias("h")).distinct()
    hb = df_b.select(_hex_int(F.md5(F.col(item_col)), 8).alias("h")).distinct()
    # each side's distinct hash set feeds the sketch, the threshold,
    # and three exact-count joins — persist so the upstream explode
    # and distinct run once per side, not four times
    ha = ha.persist()
    hb = hb.persist()
    ska = ha.orderBy("h").limit(k).persist()
    skb = hb.orderBy("h").limit(k).persist()
    ta = ska.agg(
        F.when(F.count("*") == k, F.max("h")).otherwise(F.lit(two32)).alias("tha")
    )
    tb = skb.agg(
        F.when(F.count("*") == k, F.max("h")).otherwise(F.lit(two32)).alias("thb")
    )
    theta = ta.crossJoin(tb).select(F.least("tha", "thb").alias("theta"))
    sk_union = ska.unionAll(skb).distinct()
    cu = (
        sk_union.crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("cu"))
    )
    ci = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("ci"))
    )
    cd = (
        ska.join(skb, "h", "left_anti")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("cd"))
    )
    ue = ha.unionAll(hb).distinct().agg(F.count("*").alias("n_union_exact"))
    ie = ha.join(hb, "h").agg(F.count("*").alias("n_inter_exact"))
    de = ha.join(hb, "h", "left_anti").agg(F.count("*").alias("n_diff_exact"))
    est = F.lit(4294967296.0)
    return (
        ue.crossJoin(ie)
        .crossJoin(de)
        .crossJoin(cu)
        .crossJoin(ci)
        .crossJoin(cd)
        .crossJoin(theta)
        .select(
            "n_union_exact",
            (F.col("cu").cast("double") * est / F.col("theta").cast("double")).alias(
                "n_union_est"
            ),
            "n_inter_exact",
            (F.col("ci").cast("double") * est / F.col("theta").cast("double")).alias(
                "n_inter_est"
            ),
            "n_diff_exact",
            (F.col("cd").cast("double") * est / F.col("theta").cast("double")).alias(
                "n_diff_est"
            ),
        )
    )


def kmv_set_ops_oracle(a_from: str, b_from: str, item_sql: str, k: int = 256) -> str:
    """DuckDB replay of :func:`kmv_theta_set_ops`.  ``a_from`` /
    ``b_from`` are FROM-clause bodies producing the item rows."""
    h = sql_hex_int(f"md5({item_sql})", 8)
    return f"""
    WITH A AS (SELECT DISTINCT {h} AS h FROM {a_from}),
    B AS (SELECT DISTINCT {h} AS h FROM {b_from}),
    ka AS (SELECT h FROM A ORDER BY h LIMIT {k}),
    kb AS (SELECT h FROM B ORDER BY h LIMIT {k}),
    ta AS (SELECT CASE WHEN count(*) = {k} THEN max(h)
                       ELSE 4294967296 END AS tha FROM ka),
    tb AS (SELECT CASE WHEN count(*) = {k} THEN max(h)
                       ELSE 4294967296 END AS thb FROM kb),
    th AS (SELECT least(ta.tha, tb.thb) AS theta FROM ta, tb),
    cu AS (SELECT count(*) AS cu
           FROM (SELECT DISTINCT h FROM (SELECT h FROM ka
                                         UNION ALL SELECT h FROM kb) z) u, th
           WHERE u.h < th.theta),
    ci AS (SELECT count(*) AS ci
           FROM ka JOIN kb USING (h), th WHERE ka.h < th.theta),
    cd AS (SELECT count(*) AS cd
           FROM ka, th
           WHERE ka.h < th.theta
             AND NOT EXISTS (SELECT 1 FROM kb WHERE kb.h = ka.h)),
    ue AS (SELECT count(*) AS n_union_exact
           FROM (SELECT DISTINCT h FROM (SELECT h FROM A
                                         UNION ALL SELECT h FROM B) z) u),
    ie AS (SELECT count(*) AS n_inter_exact FROM A JOIN B USING (h)),
    de AS (SELECT count(*) AS n_diff_exact
           FROM A WHERE NOT EXISTS (SELECT 1 FROM B WHERE B.h = A.h))
    SELECT ue.n_union_exact,
           CAST(cu.cu AS DOUBLE) * 4294967296.0 / CAST(th.theta AS DOUBLE)
             AS n_union_est,
           ie.n_inter_exact,
           CAST(ci.ci AS DOUBLE) * 4294967296.0 / CAST(th.theta AS DOUBLE)
             AS n_inter_est,
           de.n_diff_exact,
           CAST(cd.cd AS DOUBLE) * 4294967296.0 / CAST(th.theta AS DOUBLE)
             AS n_diff_est
    FROM ue, ie, de, cu, ci, cd, th
    """


# ---------------------------------------------------------------------------
# P-square streaming quantile estimator (Jain & Chlamtac, CACM 1985)
# — round 11, NEXT_STEPS parked item ("P² quantile estimator as a
# double-state fold").  Five markers track (min, p/2, p, (1+p)/2,
# max); each observation shifts marker positions and, when a marker
# drifts >=1 from its desired position, moves its height by the
# piecewise-parabolic (fallback: linear) interpolation formula.
# O(1) state per group, single pass — THE streaming-quantile shape.
#
# Exactness contract: the fold is a fixed sequence of IEEE-double
# ops; the Python kernel below and the generated DuckDB recursive-CTE
# oracle (registry/q10._p2_sql) write the SAME expressions in the
# SAME order, so the estimates are bit-identical (validated
# bit-for-bit in the round-11 prototype and tests).  P² state is NOT
# mergeable — the honest 100 TB story is per-KEY sequential over
# bounded sequences (here the calendar-day grain), keys parallel.
# ---------------------------------------------------------------------------


def p2_fold_py(xs: list[float], p: float) -> list[float]:
    """Reference P² fold: returns the 5 marker heights after
    consuming ``xs`` (len >= 5).  The estimate of quantile ``p`` is
    heights[2]."""
    h = sorted(xs[:5])
    n = [1, 2, 3, 4, 5]
    np_ = [1.0, 1 + 2 * p, 1 + 4 * p, 3 + 2 * p, 5.0]
    dn = [0.0, p / 2, p, (1 + p) / 2, 1.0]
    for x in xs[5:]:
        if x < h[0]:
            h[0] = x
            k = 1
        elif x < h[1]:
            k = 1
        elif x < h[2]:
            k = 2
        elif x < h[3]:
            k = 3
        elif x <= h[4]:
            k = 4
        else:
            h[4] = x
            k = 4
        for i in range(k, 5):
            n[i] += 1
        for i in range(5):
            np_[i] += dn[i]
        for i in (1, 2, 3):
            d = np_[i] - n[i]
            if (d >= 1.0 and n[i + 1] - n[i] > 1) or (
                d <= -1.0 and n[i - 1] - n[i] < -1
            ):
                ds = 1.0 if d >= 1.0 else -1.0
                hp = h[i] + ds / (n[i + 1] - n[i - 1]) * (
                    (n[i] - n[i - 1] + ds)
                    * (h[i + 1] - h[i])
                    / (n[i + 1] - n[i])
                    + (n[i + 1] - n[i] - ds)
                    * (h[i] - h[i - 1])
                    / (n[i] - n[i - 1])
                )
                if h[i - 1] < hp < h[i + 1]:
                    h[i] = hp
                else:
                    di = int(ds)
                    h[i] = h[i] + ds * (h[i + di] - h[i]) / (
                        n[i + di] - n[i]
                    )
                n[i] += int(ds)
    return h


def p2_quantile(
    df: DataFrame,
    p: float = 0.5,
    key_col: str = "event_type",
    order_col: str = "day",
    value_col: str = "y",
) -> DataFrame:
    """Per-key P² estimate of quantile ``p`` over the ``order_col``-
    ordered int64 ``value_col`` sequence, with the EXACT type-1 order
    statistic alongside (self-certifying error).  Keys with fewer
    than 5 observations are dropped (the sketch needs its seed).

    applyInPandas per key: the marker fold is inherently sequential,
    so Python-side per group is the honest implementation — state is
    O(1), the group is the bounded calendar grain, and keys fan out
    across executors."""
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("p2_est", T.DoubleType()),
            T.StructField("exact_cents", T.LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        ys = [int(v) for v in pdf[value_col]]
        if len(ys) < 5:
            # explicit dtypes: an untyped empty frame is all-object and
            # its Arrow conversion to Long/Double is version-dependent
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype="object"),
                    "n_obs": pd.Series(dtype="int64"),
                    "p2_est": pd.Series(dtype="float64"),
                    "exact_cents": pd.Series(dtype="int64"),
                }
            )
        xs = [float(v) for v in ys]
        h = p2_fold_py(xs, p)
        # lower order statistic at 0-based index floor(p*(n-1)) — the
        # oracle restates the identical double multiply-then-floor
        exact = sorted(ys)[int(p * (len(ys) - 1))]
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_obs": [len(ys)],
                "p2_est": [h[2]],
                "exact_cents": [exact],
            }
        )

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fold, schema=schema)
    )


# UDF closures in this module must ship by value
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
