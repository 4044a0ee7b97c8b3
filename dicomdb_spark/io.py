"""Table loading for the driver testdata layout.

``/root/testdata/sf*/{name}.parquet`` — see TESTDATA.md.  Parquet is
the canonical storage: columnar, so Catalyst's column pruning is the
engine's equivalent of the reference's header-only DICOM reads
(``stop_before_pixels``, reference Exam_info.py:130) — never touch
bytes the query doesn't need.

Timestamp normalization
-----------------------
The testdata writes ``events.ts`` as parquet TIMESTAMP(NANOS), which
Spark cannot read natively; with
``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a LongType of
epoch-nanoseconds.  We convert to TIMESTAMP_NTZ at microsecond
precision with *integer* division (``div 1000`` — double division
would lose microseconds at 1e18 magnitudes).  DuckDB reads the same
column as TIMESTAMP (micros, truncated), so both engines see identical
values.  All other timestamps are parquet micros → TIMESTAMP_NTZ
natively.  NTZ everywhere == DuckDB's naive timestamp semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns stored as TIMESTAMP(NANOS) in parquet (→ long under the
# legacy conf) that must be rebuilt as TIMESTAMP_NTZ micros
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def prepare(spark: SparkSession) -> SparkSession:
    """Set runtime confs the engine depends on.

    Safe to call repeatedly; called by every query entry so the engine
    behaves identically under the driver's own SparkSession.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; filters/projections push into the scan."""
    prepare(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(
                c,
                F.expr(f"cast(timestamp_micros({c} div 1000) as timestamp_ntz)"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (directory
    pruning: a partition-key filter skips whole directories before any
    file I/O — at corpus scale the difference between touching one day
    and one hundred terabytes) with optional within-file ordering so
    min/max row-group stats also prune inside each partition (see
    sources/layout.py for the footer-stats proof).
    """
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
