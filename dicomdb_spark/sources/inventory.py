"""File-inventory sources (SURVEY.md §2 S1–S3, S5).

The reference crawled a protocol/subject/series directory tree with
per-level regexes (common.py:314-369) and an mtime window
(common.py:267-306).  Spark-first shape: one ``binaryFile`` (or
file-listing) scan produces an inventory DataFrame; the per-level
regex descent becomes ``rlike`` filters on path segments — evaluated
distributed, with partition pruning when the tree is laid out as
``proto=/suj=/...`` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_files(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    modified_after: str | None = None,
) -> DataFrame:
    """S1/S2 — recursive file scan → (path, modificationTime, length).

    ``modified_after`` (ISO timestamp) is the reference's mtime-delta
    incremental contract (``get_all_newer_subdir``, common.py:267-306)
    pushed into the source: Spark prunes files before reading a byte.
    The streaming twin (checkpoint instead of logfile mtime) is
    ``streaming.incremental.stream_inventory``.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    return reader.load(root).select(
        F.col("path"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("size"),
        F.col("content"),
    )


def split_tree_levels(
    inv: DataFrame,
    path_col: str = "path",
    levels: tuple[str, ...] = ("proto", "suj", "ser"),
) -> DataFrame:
    """Derive per-level columns from the path's trailing segments.

    ``.../<proto>/<suj>/<ser>/<file>`` → proto/suj/ser columns; the
    regex-descent filters (S1) then become plain column predicates.
    """
    parts = F.split(F.col(path_col), "/")
    n = F.size(parts)
    out = inv
    for i, name in enumerate(levels):
        # element_at is 1-based; file is the last segment
        out = out.withColumn(name, F.element_at(parts, n - (len(levels) - i)))
    return out


def regex_descent(
    inv: DataFrame,
    proto_reg: str = ".*",
    suj_reg: str = ".*",
    ser_reg: str = "^S",
) -> DataFrame:
    """S1 — the reference's per-level regex filters
    (``get_subdir_regex``, common.py:314-369; series '^S' selection
    Exam_info.py:57) as pushed-down column predicates."""
    return inv.filter(
        F.col("proto").rlike(proto_reg)
        & F.col("suj").rlike(suj_reg)
        & F.col("ser").rlike(ser_reg)
    )


def is_dicom_magic(content_col: str = "content") -> F.Column:
    """S3 — the DICM magic-number sniff (offset 128, 4 bytes;
    Exam_info.py:1673-1679) on a binary column — no Python, pure
    substring on bytes."""
    return F.substring(F.col(content_col), 129, 4) == F.lit(b"DICM")


def path_name_filters(inv: DataFrame, path_col: str = "path") -> DataFrame:
    """P8 — exclude files named diffusion/dicom_info/xml/dot-files
    (do_dicom.py:276-288)."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return inv.filter(
        ~base.rlike(r"^(diffusion|dicom_info)") & ~base.rlike(r"\.xml$") & ~base.startswith(".")
    )


def read_id_path_list(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """S5 — the ``id,path`` CSV list source with duplicate-id check
    (``readList``, common.py:470-494).

    The reference raised on duplicate ids; here the assertion is a
    distributed aggregate — callers get the clean frame, and a
    ``ValueError`` when duplicates exist (strict mode).
    """
    df = (
        spark.read.option("header", "false")
        .schema("id STRING, path STRING")
        .csv(path)
    )
    if strict:
        dups = (
            df.groupBy("id").count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dups:
            raise ValueError(f"duplicate id in list file: {dups[0]['id']}")
    return df
