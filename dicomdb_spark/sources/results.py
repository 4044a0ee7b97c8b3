"""Results-file harvest (SURVEY.md §2 S11, R9).

The reference scanned MPRAGE series, derived each one's processing
directory from ``nifti_dir`` path algebra, probed
``<res_dir>/<...>/vbm8/*seg8.txt`` and parsed three tab-separated
floats (gray/white/csf volumes) into ``results_anat``
(do_results_DB.py:83-153; parse :120-128, path derivation :105-108).

Spark shape: one ``spark.read.text`` over the whole results tree with
``input_file_name`` keying, pure-expression parsing, then a join back
to the serie frame on the derived path — no per-series file probes
(the reference did one filesystem probe per series; here the listing
IS the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def derive_proc_dir(nifti_dir_col: str, res_root: str, suffix: str = "vbm8") -> F.Column:
    """Path algebra: ``<res_root>/<proto>/<suj>/<ser>/vbm8`` from the
    trailing three segments of nifti_dir (do_results_DB.py:105-108)."""
    parts = F.split(F.col(nifti_dir_col), "/")
    n = F.size(parts)
    return F.concat_ws(
        "/",
        F.lit(res_root.rstrip("/")),
        F.element_at(parts, n - 2),
        F.element_at(parts, n - 1),
        F.element_at(parts, n),
        F.lit(suffix),
    )


def read_seg8_files(spark: SparkSession, res_root: str) -> DataFrame:
    """Scan every ``*seg8.txt`` under the results tree → one row per
    file: (proc_dir, gray, white, csf, status).

    status=1 when the line parses to three floats, 0 otherwise (the
    reference's corrupt-seg8 path, do_results_DB.py:120-131).
    """
    df = (
        spark.read.format("text")
        .option("pathGlobFilter", "*seg8.txt")
        .option("recursiveFileLookup", "true")
        .load(res_root)
        .select(
            F.input_file_name().alias("file_path"),
            F.col("value").alias("line"),
        )
    )
    parts = F.split(F.trim(F.col("line")), r"\t")
    # try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW on
    # the corrupt-seg8 lines the reference tolerated — malformed rows
    # must become status=0, not job failures
    parsed = df.select(
        F.regexp_replace(F.col("file_path"), r"/[^/]*seg8\.txt$", "").alias("proc_dir"),
        F.try_element_at(parts, F.lit(1)).try_cast("float").alias("vbmgrayvol"),
        F.try_element_at(parts, F.lit(2)).try_cast("float").alias("vbmwhitevol"),
        F.try_element_at(parts, F.lit(3)).try_cast("float").alias("vbmcsfvol"),
    )
    ok = (
        F.col("vbmgrayvol").isNotNull()
        & F.col("vbmwhitevol").isNotNull()
        & F.col("vbmcsfvol").isNotNull()
    )
    return parsed.withColumn("status", F.when(ok, F.lit(1)).otherwise(F.lit(0)))


def harvest_results(
    spark: SparkSession,
    serie: DataFrame,
    res_root: str,
    seq_type: str = "MPRAGE",
) -> DataFrame:
    """R9 — the full harvest: MPRAGE series with a nifti_dir (P6 LIKE
    filter + null skip), proc-dir derivation, join to parsed seg8
    rows.  Output = results_anat-shaped rows ready for the S7 upsert
    (``merge_classify`` + ``sources.jdbc``)."""
    candidates = serie.filter(
        F.col("SeqType").like(seq_type) & F.col("nifti_dir").isNotNull()
    ).select(
        "Sid",
        derive_proc_dir("nifti_dir", res_root).alias("proc_dir"),
    )
    seg8 = read_seg8_files(spark, res_root)
    # strip the file-scheme prefix Spark adds to input_file_name
    seg8 = seg8.withColumn(
        "proc_dir", F.regexp_replace("proc_dir", r"^file:/{0,2}", "/")
    ).withColumn("proc_dir", F.regexp_replace("proc_dir", r"^//", "/"))
    return candidates.join(seg8, "proc_dir", "inner").select(
        "Sid",
        "status",
        "vbmgrayvol",
        "vbmwhitevol",
        "vbmcsfvol",
        F.col("proc_dir").alias("dir_path"),
    )
