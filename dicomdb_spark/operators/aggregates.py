"""Aggregation operators (SURVEY.md §2 A1–A9).

All pure DataFrame built-ins — JVM-side, whole-stage-codegen'd, with
map-side partial aggregation.  At 100 TB each ``groupBy`` here is one
hash-aggregate + one shuffle on the grouping key; there is no Python
in any hot path.

Determinism note: floating-point SUM is order-dependent, so any sum
that must hash-match an external oracle goes through ``dsum`` — the
per-row value is floored at a fixed scale (bitwise-portable, unlike
double→DECIMAL casts), summed as exact integers, and scaled back.
Same trick in the oracle SQL ⇒ bitwise-identical results on both
engines regardless of partitioning or scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, engine-portable sum of a double expression.

    Per row: ``floor(x · 10⁴)`` — floor of a double is bitwise
    identical on every IEEE engine (unlike double→DECIMAL casts, whose
    rounding rules differ between Spark and DuckDB) — summed as exact
    integers, then scaled back.  The result does not depend on
    partition count or aggregation order — safe at any scale factor
    and hash-comparable against DuckDB's
    ``CAST(SUM(CAST(floor(x * 10000) AS BIGINT)) / 10000.0 AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(F.floor(c * 10000).cast("long")) / 10000.0).cast("double")
    return out.alias(alias) if alias else out


def group_count_having(
    df: DataFrame,
    keys: Sequence[Column | str],
    min_count: int = 2,
    count_alias: str = "doublon",
) -> DataFrame:
    """A1 — duplicate detection: GROUP BY keys HAVING count(*) > n.

    Reference ran four variants of this shape (by SUID, by
    (SNumber, substr(AcqTime,1,16), MachineName), ...) —
    Cenir_DB.py:215,271,453,421.  Key-expression columns (timestamp
    truncations etc.) are passed pre-built so the same operator
    covers all variants.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias(count_alias))
        .filter(F.col(count_alias) >= min_count)
    )


def per_group_stats(
    df: DataFrame,
    keys: Sequence[str],
    count_alias: str = "nbs",
    sum_col: str | None = None,
    sum_alias: str = "nbd",
) -> DataFrame:
    """A3/A7 — count(*) and optional exact sum per group.

    Reference: ``select count(*) as nbs, sum(nb_dic_file) as nbd from
    serie where ExamRef=%d`` (Cenir_DB.py:506-511).  Expressed as a
    full groupBy instead of a per-key correlated query: one shuffle
    replaces N round-trips.
    """
    aggs = [F.count("*").alias(count_alias)]
    if sum_col is not None:
        aggs.append(dsum(sum_col, sum_alias))
    return df.groupBy(*keys).agg(*aggs)


def min_max_by(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    prefix_min: str = "first_",
    prefix_max: str = "last_",
) -> DataFrame:
    """A4/A8 — per group, the value columns of the min- and max-ordered row.

    Reference used scalar subqueries ``(select min(SNumber) from serie
    where ExamRef=..)`` then fetched that row (Cenir_DB.py:839-868);
    here it is a single hash aggregate with ``min_by``/``max_by`` —
    one pass, no join, no subquery per key.  ``order_col`` must be
    unique within a group for deterministic results (reference grain
    guarantees it: SNumber per exam, InstanceNumber per stack).

    NULL observations are SKIPPED per value column (the picked row is
    the extremal one whose value is non-NULL): Spark's ``max_by(v, k)``
    would happily return a NULL ``v`` from the extremal row while
    DuckDB's ``arg_max`` ignores NULL-v rows — nulling the ordering key
    when ``v`` is NULL makes Spark match (``max_by`` ignores NULL
    keys), which is also the useful last-known-observation semantic.
    """
    aggs = []
    for v in value_cols:
        key = F.when(F.col(v).isNotNull(), F.col(order_col))
        aggs.append(F.min_by(v, key).alias(f"{prefix_min}{v}"))
        aggs.append(F.max_by(v, key).alias(f"{prefix_max}{v}"))
    aggs.append(F.min(order_col).alias(f"{prefix_min}{order_col}"))
    aggs.append(F.max(order_col).alias(f"{prefix_max}{order_col}"))
    return df.groupBy(*keys).agg(*aggs)


def distinct_values(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5 — ``select distinct <cols>`` (Cenir_DB.py:550-562)."""
    return df.select(*cols).distinct()


def year_histogram(
    df: DataFrame,
    ts_col: str,
    sum_col: str | None = None,
    count_alias: str = "n",
    sum_alias: str = "total",
) -> DataFrame:
    """A6 — per-year counts + exact sum (Exam_info.py:104-114).

    The reference looped with np.unique over collected rows; this is a
    2-column aggregate over a year() projection — parquet scans only
    the two referenced columns.
    """
    out = df.groupBy(F.year(ts_col).cast("int").alias("year"))
    aggs = [F.count("*").alias(count_alias)]
    if sum_col is not None:
        aggs.append(dsum(sum_col, sum_alias))
    return out.agg(*aggs)


def completeness_audit(
    df: DataFrame,
    keys: Sequence[str],
    expected: Column,
    actual: Column,
    flag_alias: str = "corrupt",
) -> DataFrame:
    """A9/R8 — expected-vs-actual count audit with corrupt flags.

    Reference computed expected DICOM-file counts from protocol math
    and emitted ``missingDicomFile_%d`` / ``tomuchDicomFile_`` codes
    (Exam_info.py:1344-1363).  Shape: pure column arithmetic + a
    when/otherwise flag — no UDF.
    """
    exp = expected.alias("expected")
    act = actual.alias("actual")
    return df.select(*keys, exp, act).withColumn(
        flag_alias,
        F.when(
            F.col("actual") < F.col("expected"),
            F.concat(
                F.lit("missingDicomFile_"),
                # explicit floor: Spark's double→long cast truncates
                # while DuckDB's rounds — never rely on the implicit
                F.floor(F.col("expected") - F.col("actual")).cast("long").cast("string"),
            ),
        )
        .when(F.col("actual") > F.col("expected"), F.lit("tomuchDicomFile_"))
        .otherwise(F.lit("ok")),
    )


def approx_stats(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    quantile_col: str,
    quantiles: Sequence[float] = (0.5,),
    rsd: float = 0.05,
) -> DataFrame:
    """Approximate aggregates — the 100 TB variants of exact
    distinct-count and percentile (HLL++ and GK sketches; both
    mergeable, so partial aggregation applies).  Not oracle-hashable
    (sketch results are engine-specific); accuracy is asserted against
    exact values in unit tests instead.
    """
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
        F.percentile_approx(
            quantile_col, list(quantiles), 10000
        ).alias("approx_quantiles"),
    )
