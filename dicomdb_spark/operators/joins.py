"""Join operators (SURVEY.md §2 J1–J10, S7 merge classification).

Join-strategy policy at scale:

* fact ⋈ dimension → leave the strategy to planner stats + AQE:
  constant-size dims (region/nation) broadcast from file statistics;
  SF-scaling sides (customer, exam) broadcast only while measured
  small and degrade to shuffled hash joins at scale.  Pinned
  ``F.broadcast`` hints are reserved for provably bounded sets
  (single-row aggregates, fixed salt ranges, top-k id lists).
* fact ⋈ fact on the same key across stages → hash-partition once and
  reuse (AQE keeps the exchange if the key matches).
* band/self joins (J3) are pre-bucketed by their coarse key (same
  entity, same day) so the theta predicate only runs inside small
  buckets — never a broadcast-nested-loop over the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exam_series(exam: DataFrame, serie: DataFrame, exam_key: str, serie_fk: str) -> DataFrame:
    """J1 — the ``ExamSeries`` denormalized view (cenir_view.sql:8).

    Inner equi-join; the exam side is the smaller one (19k rows in
    the reference production dump) but grows with the archive, so the
    strategy is left to stats + AQE: broadcast while measured under
    the threshold, shuffled hash join beyond it.
    """
    return serie.join(exam, exam[exam_key] == serie[serie_fk], "inner")


def orphans(parent: DataFrame, child: DataFrame, parent_key: str, child_fk: str) -> DataFrame:
    """J2 — parents with no children: LEFT OUTER + IS NULL ⇒ left_anti.

    Reference: orphan exams feeding a delete list (Cenir_DB.py:596-601).
    """
    return parent.join(child, parent[parent_key] == child[child_fk], "left_anti")


def time_proximity_pairs(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    threshold_s: int = 300,
) -> DataFrame:
    """J3/R6 — time-proximity duplicate pairs (band self-join).

    Reference: correlated EXISTS — same day, same rid, |Δt| < 300 s,
    different id (do_dicom.py:55-89).  Spark plan: bucket time by the
    band width itself — ``floor(epoch / threshold_s)`` — and self
    equi-join on (entity, bucket), with the LEFT side probing its own
    bucket ±1 (|Δt| < w ⟹ the two buckets differ by at most 1, a
    property of floor, so the union of three probes is LOSSLESS and a
    qualifying pair meets on exactly one probe — no dedup needed).
    The exact band predicate, the reference's same-day constraint, and
    ``id1 < id2`` run as post-filters.  Candidate volume per entity is
    bounded by occupancy of a 2w window instead of a whole day — the
    previous (entity, day) key was the bench's worst scaler (2.83× at
    5×) precisely because dense days grow quadratically.  (Pairs that
    straddle midnight are out of scope — matching the reference's
    ``same day`` semantics exactly.)
    """
    day = F.to_date(F.col(ts_col)).alias("__day")
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)).cast("long") / threshold_s
    ).cast("long")
    l = df.select(
        *entity_cols,
        F.col(ts_col).alias("__ts1"),
        F.col(id_col).alias("__id1"),
        day,
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__probe"),
    )
    r = df.select(
        *[F.col(c).alias(f"__r_{c}") for c in entity_cols],
        F.col(ts_col).alias("__ts2"),
        F.col(id_col).alias("__id2"),
        day.alias("__r_day"),
        bucket.alias("__r_bucket"),
    )
    cond = F.col("__probe") == F.col("__r_bucket")
    for c in entity_cols:
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    joined = l.join(r, cond, "inner").filter(
        (F.col("__id1") < F.col("__id2"))
        & (F.col("__day") == F.col("__r_day"))
        & (
            F.abs(
                F.unix_timestamp("__ts1").cast("long")
                - F.unix_timestamp("__ts2").cast("long")
            )
            < threshold_s
        )
    )
    return joined.select(
        *entity_cols,
        F.col("__day").alias("day"),
        F.col("__id1").alias("id1"),
        F.col("__id2").alias("id2"),
        F.col("__ts1").alias("ts1"),
        F.col("__ts2").alias("ts2"),
    )


def pairwise_doubles(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
) -> DataFrame:
    """J4/R7 — equal-key pair enumeration with id1 < id2 dedup.

    Reference: O(n²) Python loop over extracted exams comparing
    AcquisitionTime and MachineName (Exam_info.py:1515-1542).  As a
    self equi-join the cost is Σ per-key (k²) — linear when keys are
    near-unique, and the shuffle co-locates equal keys.
    """
    l = df.select(*keys, F.col(id_col).alias("id1"))
    r = df.select(*[F.col(c).alias(f"__r_{c}") for c in keys], F.col(id_col).alias("id2"))
    cond = F.col("id1") < F.col("id2")
    for c in keys:
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    return l.join(r, cond, "inner").select(*keys, "id1", "id2")


def two_key_lookup(
    df: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left_semi",
) -> DataFrame:
    """J6 — existence probe on a composite key (Cenir_DB.py:778-788).

    left_semi == the reference's "select ... fetchone() is not None".
    Probe-side size is caller data — strategy left to stats + AQE.
    """
    return df.join(dim, list(keys), how)


def anti_by_keys(df: DataFrame, processed: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J7/J10 — remove rows whose key tuple appears in another set.

    Covers the DB↔filesystem reconciliation (rows whose path no longer
    exists, Cenir_DB.py:171-206) and qcview's resume-by-anti-join
    (qcview.py:189-231).
    """
    return df.join(processed.select(*keys), list(keys), "left_anti")


def full_outer_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    status_alias: str = "status",
) -> DataFrame:
    """J8/R5 — tree↔tree reconciliation as a full-outer diff.

    Reference walked two directory trees reporting missing-subject /
    missing-series / count-mismatch / identical
    (do_dicom_compare_recup_to.py:142-265).  DataFrame shape:
    full_outer on the key tuple, then a when-chain over null-ness and
    the compare columns.  Output is one row per key with a status.
    """
    # explicit presence flags: null-ness of a compare column cannot
    # distinguish "row absent" from "row present with NULL value", and
    # the mismatch predicate must be null-safe so NULL-vs-value on any
    # column reports mismatch, not identical
    lsel = left.select(
        *keys,
        *[F.col(c).alias(f"l_{c}") for c in compare_cols],
        F.lit(1).alias("__l_present"),
    )
    rsel = right.select(
        *keys,
        *[F.col(c).alias(f"r_{c}") for c in compare_cols],
        F.lit(1).alias("__r_present"),
    )
    j = lsel.join(rsel, list(keys), "full_outer")
    mismatch = F.lit(False)
    for c in compare_cols:
        mismatch = mismatch | ~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))
    return j.withColumn(
        status_alias,
        F.when(F.col("__l_present").isNull(), F.lit("missing_left"))
        .when(F.col("__r_present").isNull(), F.lit("missing_right"))
        .when(mismatch, F.lit("mismatch"))
        .otherwise(F.lit("identical")),
    ).drop("__l_present", "__r_present")


def merge_classify(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    float_cols: Sequence[str] = (),
    exclude_cols: Sequence[str] = (),
    action_alias: str = "action",
) -> DataFrame:
    """S7 — the pure half of the JDBC upsert: insert/update/noop classes.

    Reference upsert: select-if-exists → insert new / update rows whose
    fields changed, with float fields compared under round(×1e5)
    tolerance (P4, Cenir_DB.py:938) and an exclude-column list
    (Cenir_DB.py:97).  The side-effecting writer
    (``sinks.jdbc.upsert_partition``) consumes this classification;
    this half is deterministic and oracle-checkable.

    Returns ``incoming``'s columns + ``action`` ∈ {insert, update, noop}.
    """
    cmp_cols = [c for c in compare_cols if c not in set(exclude_cols)]
    floats = set(float_cols)
    ex = existing.select(
        *keys, *[F.col(c).alias(f"__old_{c}") for c in cmp_cols], F.lit(1).alias("__exists")
    )
    j = incoming.join(ex, list(keys), "left_outer")
    changed = F.lit(False)
    for c in cmp_cols:
        new, old = F.col(c), F.col(f"__old_{c}")
        if c in floats:
            # P4 float tolerance: round(x*1e5) equality, preserved
            # exactly from Cenir_DB.py:938; eqNullSafe so a change
            # to/from NULL also counts as a change
            changed = changed | ~F.round(new * 100000).eqNullSafe(F.round(old * 100000))
        else:
            changed = changed | ~new.eqNullSafe(old)
    out = j.withColumn(
        action_alias,
        F.when(F.col("__exists").isNull(), F.lit("insert"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("noop")),
    )
    return out.select(*incoming.columns, action_alias)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the LATEST right row per key with
    ``right_ts <= left_ts`` (NULL values when no prior right row).
    ``direction="forward"`` flips the inequality: the EARLIEST right
    row with ``right_ts >= left_ts`` — the same single-shuffle
    union-and-carry plan traversed in descending time order.

    Spark has no asof operator; the scalable relational form is the
    union-and-carry-forward plan: tag both sides, sort each key\'s
    merged event stream by time, and carry the most recent right-side
    values forward with ``last(..., ignorenulls)``.  ONE shuffle on the
    key and one sort — the same data movement as a sort-merge join,
    with no range-condition blowup; skew follows key cardinality like
    any window.  (A cogrouped pandas ``merge_asof`` would match
    semantics at Arrow-transfer cost; this stays JVM-side.)

    At equal timestamps the right row is eligible (ASOF ``>=``
    semantics): right rows sort before left rows at the same instant.
    Output = left columns + ``<value>_asof`` per value column.
    """
    lcols = left.columns
    payload = [c for c in lcols if c not in keys]
    l_tag = left.select(
        *keys,
        *payload,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    r_tag = right.select(
        *keys,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *keys,
        *payload,
        "__is_r",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}_asof")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_r") == 0).drop("__is_r")


def interval_range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Range join: point rows matched to every interval (per key) with
    ``start <= ts <= end`` — WITHOUT a nested-loop join.

    Spark plans a bare range predicate as BNLJ (quadratic); the
    scale-safe shape buckets time at ``bucket_width_s``: each interval
    explodes to the buckets it covers (bounded by span/width), each
    point carries its single bucket, and candidates meet through a
    plain equi-join on (keys…, bucket) with the exact range predicate
    as a post-filter.  Each qualifying (point, interval) pair meets in
    exactly one bucket — the point's — so no dedup is needed.  Pick
    ``bucket_width_s`` near the typical interval span: cost is
    candidates-per-bucket, not |points|×|intervals|.
    """
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    pb = points.withColumn("__b", F.floor(sec(ts_col) / bucket_width_s))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(sec(start_col) / bucket_width_s),
                F.floor(sec(end_col) / bucket_width_s),
            )
        ),
    )
    return (
        pb.join(ib, [*keys, "__b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (per key): pairs with
    ``l_start <= r_end AND r_start <= l_end`` — the temporal-overlap
    shape (concurrent sessions, conflicting bookings) that
    interval_range_join's point-in-interval cannot express.

    Grid pattern at scale: both sides explode to the time buckets
    they cover, candidates meet via equi-join on (keys…, bucket), the
    exact predicate post-filters, and DISTINCT collapses pairs that
    share several buckets (an overlapping pair meets in every shared
    bucket — unlike the point join there is no unique meeting bucket,
    so the dedup is load-bearing).  Cost follows bucket occupancy ×
    span/width, never |L|×|R|.
    """
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731

    def fan(df, s, e):
        return df.withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(sec(s) / bucket_width_s),
                    F.floor(sec(e) / bucket_width_s),
                )
            ),
        )

    out = (
        fan(left, l_start, l_end)
        .join(fan(right, r_start, r_end), [*keys, "__b"])
        .filter(
            (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
        )
        .drop("__b")
    )
    return out.distinct()
