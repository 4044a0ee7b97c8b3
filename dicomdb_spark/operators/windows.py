"""Window / order-dependent operators (SURVEY.md §2 W1–W5, A2).

The reference did all of its ordered logic in Python (``sorted``,
``argsort`` over collected rows).  Here every one of them is a Spark
``Window`` — evaluated distributed, per partition-key, with a single
shuffle on the partition key and a local sort.  No driver-side
collection anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def representative_rows(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_by: Sequence[Column],
    count_alias: str = "doublon",
    min_count: int = 2,
) -> DataFrame:
    """A2 — MySQL "bare-column GROUP BY" rewritten with ANSI semantics.

    MySQL's ``select count(*) as doublon, e.* ... group by k`` picks an
    arbitrary representative row per group (Cenir_DB.py:271,453;
    cenir_view.sql:20).  ANSI/Spark equivalent: count per key plus a
    *deterministic* representative under an explicit ascending
    ``order_by`` (SURVEY §7 risk (a)).

    Scale shape (round-5 rewrite): ONE hash aggregate — ``min_by`` of
    the payload struct keyed on the order tuple picks the
    representative inside the same aggregation that counts the group,
    so the whole operator is a single shuffle with map-side partial
    aggregation and NO sort anywhere.  The previous formulation
    (dup-key agg → semi-join → windowed row_number) paid a second
    shuffle plus a per-key sort; min_by is associative, so it also
    partial-aggregates before the exchange — at 100 TB the shuffle
    carries one row per (mapper, key), not the duplicate population.

    ``order_by`` must be plain ascending column expressions (struct
    ordering is lexicographic; no SortOrder wrappers) and must be
    unique within a group for the pick to be deterministic — both true
    for every reference call site (primary-key order).
    """
    # materialize expression keys as named columns so the aggregate
    # groups on exactly what the caller asked
    names: list[str] = []
    out = df
    for i, k in enumerate(keys):
        if isinstance(k, str):
            names.append(k)
        else:
            out = out.withColumn(f"__k{i}", k)
            names.append(f"__k{i}")
    payload = [c for c in df.columns if c not in names]
    rep = (
        out.groupBy(*names)
        .agg(
            F.count("*").alias(count_alias),
            F.min_by(F.struct(*payload), F.struct(*order_by)).alias("__rep"),
        )
        .filter(F.col(count_alias) >= min_count)
    )
    result = rep.select(
        *[n for n in names if not n.startswith("__k")],
        *[F.col("__rep")[c].alias(c) for c in payload],
        count_alias,
    )
    return result


def first_last_duration(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    ts_col: str,
    dur_col: str | None = None,
    out_alias: str = "duration_min",
) -> DataFrame:
    """W1 — the reference's flagship derived metric: exam duration.

    duration = last.AcqTime − first.AcqTime (+ last series duration),
    ceil to minutes; series ordered by SNumber (Exam_info.py:197-232,
    SQL twin Cenir_DB.py:839-868).  One hash aggregate with
    min_by/max_by — no window sort needed because only the two
    extreme rows matter.

    Midnight rollover (reference adds 24h when the difference is
    negative, Exam_info.py:224-225) is preserved as a when() guard.
    """
    secs_last = F.max_by(F.col(ts_col), F.col(order_col))
    secs_first = F.min_by(F.col(ts_col), F.col(order_col))
    agg_cols = [
        secs_first.alias("first_ts"),
        secs_last.alias("last_ts"),
        F.count("*").alias("n_items"),
    ]
    if dur_col is not None:
        agg_cols.append(F.max_by(F.col(dur_col), F.col(order_col)).alias("last_dur"))
    g = df.groupBy(*keys).agg(*agg_cols)
    diff = F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
    diff = F.when(diff < 0, diff + 24 * 3600).otherwise(diff)
    if dur_col is not None:
        diff = diff + F.coalesce(F.col("last_dur"), F.lit(0))
    return g.withColumn(out_alias, F.ceil(diff / 60.0).cast("long"))


def rank_latest(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_by: Sequence[Column],
    rank_alias: str = "rn",
) -> DataFrame:
    """W2 core — rank copies within a duplicate group, rank 1 = keeper.

    Reference: ``argsort(mtime of first file)``, keep latest, emit
    move/delete commands for the rest (Cenir_DB.py:479-547,281-353).
    ``order_by`` should end with a unique tiebreak column so ranking
    is total (the reference's argsort was stable on list order —
    nondeterministic across runs; we do better).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_alias, F.row_number().over(w))


def keep_latest(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_by: Sequence[Column],
    action_alias: str = "action",
) -> DataFrame:
    """W2/R1/R2 — classify each duplicate-group member keep/remove.

    Output contains every row of every duplicate group with an
    ``action`` column (``keep`` for the top-ranked copy, ``remove``
    otherwise) — the dataframe twin of the reference's generated
    remediation scripts (S9, Cenir_DB.py:174-187).
    """
    w = Window.partitionBy(*keys)
    ranked = rank_latest(df, keys, order_by)
    return (
        ranked.withColumn("__cnt", F.count("*").over(w))
        .filter(F.col("__cnt") >= 2)
        .withColumn(
            action_alias,
            F.when(F.col("rn") == 1, F.lit("keep")).otherwise(F.lit("remove")),
        )
        .drop("__cnt")
    )


def sessionize_by_day(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """W3 — split an entity's rows into per-day sessions, ordered inside.

    Reference split an exam directory's series into separate exams per
    distinct AcquisitionDate, each sorted by AcquisitionTime
    (Exam_info.py:1380-1459).  Spark shape: groupBy(entity, day) +
    sort_array(collect_list(struct(ts, id))) — the sort happens
    per-group after the shuffle, and the struct ordering gives a
    total, deterministic order (ts then id).
    """
    return (
        df.groupBy(
            F.col(entity_col).alias(entity_col),
            F.to_date(ts_col).alias("session_day"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col(ts_col), F.col(id_col)))),
                lambda s: s[id_col],
            ).alias("ordered_ids"),
        )
    )


def adjacent_diff(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_alias: str = "delta",
    eps: float | None = None,
) -> DataFrame:
    """W5 — pairwise adjacent difference via lag, with ε-clamp to zero.

    Reference computed slice gap from the first two slice positions and
    clamped |gap| < 1e-5 to 0 (Exam_info.py:556-569).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    d = F.col(value_col) - F.lag(value_col).over(w)
    if eps is not None:
        d = F.when(F.abs(d) < eps, F.lit(0.0)).otherwise(d)
    return df.withColumn(out_alias, d)


def sessionize_by_gap(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the
    inactivity gap exceeds ``gap_sec`` (the classic 30-minute web
    session; the reference's analog is the 300 s time-proximity
    window, Cenir_DB.py:421-447, generalized to runs).

    Two window functions over ONE (key, ts, tiebreak) sort — the lag
    gap flag and its running sum share the same window spec, so Spark
    plans a single exchange + sort; the per-session aggregate that
    typically follows reuses the same hash partitioning.  Scale: cost
    is one shuffle of the events table, session state never leaves
    the executor (contrast with collect-and-loop sessionizers).
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    new_s = F.when(prev.isNull() | (gap > gap_sec), 1).otherwise(0)
    seq = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_seq", seq.cast("int"))


# ---------------------------------------------------------------------------
# Distributed global order statistics (no single-partition sorts)
# ---------------------------------------------------------------------------
# ``Window.orderBy`` with no ``partitionBy`` executes the WHOLE input on
# ONE task — fine for a 128-row histogram, a scale killer for an
# entity-grain table (10^8-row customer dim at 100 TB).  The two helpers
# below give the same global row_number / rank / running sums with the
# classic two-phase plan every distributed sort uses:
#
#   1. bucket each row by a BOUNDED-cardinality integer/string key that
#      is monotone non-decreasing in the target sort order (range
#      buckets of the leading sort column, or an order-preserving
#      prefix of a hash/text column);
#   2. aggregate per-bucket counts/sums (a bucket-cardinality table,
#      e.g. 64 rows), turn them into EXCLUSIVE prefix offsets with a
#      window over that tiny table (the only global sort left, bounded
#      by construction), broadcast the offsets back;
#   3. rank/cumsum WITHIN each bucket with an ordinary partitioned
#      window, and add the bucket offset.
#
# Every task sorts one bucket (~n/buckets rows); nothing global ever
# materializes on a single executor.  Ties are safe because rows equal
# on the leading sort column land in the same bucket by monotonicity.


def monotone_range_bucket(
    df: DataFrame,
    col: Column | str,
    n_buckets: int = 64,
    ascending: bool = True,
    out_col: str = "__bkt",
) -> DataFrame:
    """Add an integer bucket column monotone in ``col``'s sort
    direction via a min/max affine map (one 1-row aggregate broadcast
    back — the same stats pass sketch_hist_quantiles already pays).
    ``col`` must be numeric and non-null.  Equal values always share a
    bucket, so tiebreak columns never straddle a boundary."""
    c = F.col(col) if isinstance(col, str) else col
    st = df.agg(F.min(c).alias("__bk_mn"), F.max(c).alias("__bk_mx"))
    b = df.crossJoin(F.broadcast(st))
    span = (F.col("__bk_mx") - F.col("__bk_mn")).cast("double")
    raw = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor(
                (c - F.col("__bk_mn")).cast("double") * n_buckets / span
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bkt = raw if ascending else (F.lit(n_buckets - 1) - raw)
    return b.withColumn(out_col, bkt.cast("int")).drop("__bk_mn", "__bk_mx")


def quantile_range_bucket(
    df: DataFrame,
    col: Column | str,
    n_buckets: int = 64,
    ascending: bool = True,
    out_col: str = "__bkt",
    accuracy: int = 10000,
) -> DataFrame:
    """Distribution-ADAPTIVE sibling of monotone_range_bucket: bucket
    boundaries come from percentile_approx cut points (one 1-row
    aggregate broadcast back), so bucket POPULATIONS equalize even when
    the key is Zipfian — the affine min/max map only adapts to the
    range, and a hot band (e.g. the 'T' prefix of English text) still
    collapses into one or two buckets under it.  The bucket id is the
    count of cut points strictly below the value (a 63-element
    F.aggregate fold, JVM-side), so equal keys always share a bucket
    and the id is monotone non-decreasing in ``col`` — exactly the
    contract bucketed_running / boundary-exchange consumers need.
    Cut placement only affects BALANCE, never results: any monotone
    bucketing yields the same global order downstream.

    NULL handling: NULL values are bucketed EXPLICITLY to the
    NULLS-FIRST end of the requested order (bucket 0 when ascending,
    bucket n_buckets-1 when descending), matching Spark's default
    ``asc``/``desc`` null placement — so the monotone contract holds
    for both directions even with NULL keys."""
    c = F.col(col) if isinstance(col, str) else col
    qs = [i / n_buckets for i in range(1, n_buckets)]
    st = df.agg(F.percentile_approx(c, qs, accuracy).alias("__bk_cuts"))
    b = df.crossJoin(F.broadcast(st))
    fold = F.aggregate(
        "__bk_cuts",
        F.lit(0),
        lambda acc, cut: acc + F.when(c > cut, 1).otherwise(0),
    )
    raw = F.when(c.isNull(), F.lit(0)).otherwise(fold)
    bkt = raw if ascending else (F.lit(n_buckets - 1) - raw)
    return b.withColumn(out_col, bkt.cast("int")).drop("__bk_cuts")


def bucketed_running(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    bucket_col: str = "__bkt",
    sum_cols: Sequence[str] = (),
    rn_col: str | None = None,
    rank_col: str | None = None,
    cum_prefix: str = "cum_",
    drop_bucket: bool = True,
) -> DataFrame:
    """Global ``row_number`` / ``rank`` / inclusive running ``sum`` over
    ``order_cols`` WITHOUT a single-partition sort (see module note).

    ``bucket_col`` must already be on ``df`` and monotone non-decreasing
    in the ``order_cols`` ordering with bounded cardinality.  Running
    sums land as ``{cum_prefix}{col}``; ranks are int64.  The window
    over the per-bucket offsets table is the one remaining global sort
    — bounded by the bucket count, never the data.
    """
    aggs = [F.count("*").alias("__bk_c")] + [
        F.sum(s).alias(f"__bk_s_{s}") for s in sum_cols
    ]
    per = df.groupBy(bucket_col).agg(*aggs)
    wprev = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )  # bounded: one row per bucket
    offs = per.select(
        bucket_col,
        F.coalesce(F.sum("__bk_c").over(wprev), F.lit(0)).alias("__bk_off_c"),
        *[
            F.coalesce(F.sum(f"__bk_s_{s}").over(wprev), F.lit(0)).alias(
                f"__bk_off_{s}"
            )
            for s in sum_cols
        ],
    )
    w = Window.partitionBy(bucket_col).orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.join(F.broadcast(offs), bucket_col)
    if rn_col is not None:
        out = out.withColumn(
            rn_col,
            (F.col("__bk_off_c") + F.row_number().over(w)).cast("long"),
        )
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (F.col("__bk_off_c") + F.rank().over(w)).cast("long"),
        )
    for s in sum_cols:
        out = out.withColumn(
            cum_prefix + s, F.col(f"__bk_off_{s}") + F.sum(s).over(wrun)
        )
    out = out.drop("__bk_off_c", *[f"__bk_off_{s}" for s in sum_cols])
    return out.drop(bucket_col) if drop_bucket else out


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """SQL-standard ``ntile(k)`` reconstructed from a global rank:
    bucket sizes differ by at most one, larger buckets first — the
    exact assignment Spark and DuckDB both produce over a uniquely
    tiebroken order.  Lets deciles/terciles ride the distributed rank
    instead of a single-partition ntile window."""
    # n = k*b + r: first r tiles have b+1 rows, the rest b rows.
    b = F.floor(n.cast("long") / k).cast("long")
    r = (n.cast("long") % k).cast("long")
    cut = r * (b + 1)
    big = F.floor((rn - 1) / (b + 1)).cast("long") + 1
    small = r + F.floor((rn - cut - 1) / F.greatest(b, F.lit(1))).cast("long") + 1
    return F.when(rn <= cut, big).otherwise(small)
