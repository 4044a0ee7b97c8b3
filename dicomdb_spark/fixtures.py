"""Deterministic domain-table fixtures (FIXTURES.md §1).

Synthetic exam/serie frames with the reference's pathologies injected
arithmetically (no RNG — everything derives from the row index, so
fixtures are identical across runs and engines):

* duplicate exams on (AcquisitionTime, MachineName)  — R1/J4
* cross-exam duplicate SUIDs                          — R2/A1
* orphan exams with zero series                       — J2
* time-proximity pairs < 300 s on the same day        — J3/R6
* doublon-marked dicom_dir paths                      — P9
* series counts ≠ expected                            — A9/R8
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_exam(spark: SparkSession, n: int = 200) -> DataFrame:
    """Exam frame keyed Eid 0..n-1.

    Eid % 17 == 0 → duplicated (copy at Eid+10000, same
    AcquisitionTime/Machine); Eid % 23 == 3 → time-proximate sibling
    at Eid+20000 (+120 s); Eid % 29 == 7 → doublon path.
    """
    base = spark.range(n).select(
        F.col("id").alias("Eid"),
        F.concat(F.lit("PROTO_"), (F.col("id") % 12).cast("string")).alias("ExamName"),
        F.element_at(
            F.array(*[F.lit(m) for m in ("TrioTim", "Verio", "Prisma_fit", "SIGNA PET/MR")]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("MachineName"),
        F.concat(F.lit("subj_"), (F.col("id") % 50).cast("string")).alias("PatientsName"),
        (
            F.lit("2014-01-01 08:00:00").cast("timestamp_ntz")
            + F.make_interval(secs=(F.col("id") * 1800).cast("double"))
        ).alias("AcquisitionTime"),
        F.when(F.col("id") % 29 == 7, F.concat(F.lit("/data/doublon/e"), F.col("id")))
        .otherwise(F.concat(F.lit("/data/raw/e"), F.col("id")))
        .alias("dicom_dir"),
        F.concat(F.lit("1.2.840."), F.col("id").cast("string")).alias("EUID"),
    )
    dup = base.filter(F.col("Eid") % 17 == 0).select(
        (F.col("Eid") + 10000).alias("Eid"),
        "ExamName",
        "MachineName",
        "PatientsName",
        "AcquisitionTime",
        F.concat(F.col("dicom_dir"), F.lit("_copy")).alias("dicom_dir"),
        F.concat(F.col("EUID"), F.lit(".dup")).alias("EUID"),
    )
    near = base.filter(F.col("Eid") % 23 == 3).select(
        (F.col("Eid") + 20000).alias("Eid"),
        "ExamName",
        "MachineName",
        "PatientsName",
        (F.col("AcquisitionTime") + F.make_interval(secs=F.lit(120.0))).alias(
            "AcquisitionTime"
        ),
        "dicom_dir",
        F.concat(F.col("EUID"), F.lit(".near")).alias("EUID"),
    )
    return base.unionAll(dup).unionAll(near)


def make_serie(spark: SparkSession, exam: DataFrame, per_exam: int = 4) -> DataFrame:
    """Series for every exam except orphans (Eid % 19 == 5).

    SUID duplicated across exams when (Eid*10+s) % 31 == 1; actual
    file count diverges from expected when (Eid+s) % 13 == 2.
    """
    parents = exam.filter(F.col("Eid") % 19 != 5).select(
        "Eid", "AcquisitionTime", "MachineName"
    )
    s = parents.crossJoin(
        F.broadcast(
            parents.sparkSession.range(per_exam).select(
                F.col("id").cast("int").alias("SNumber")
            )
        )
    )
    sid = F.col("Eid") * 100 + F.col("SNumber")
    expected = F.lit(64)
    actual = F.when((F.col("Eid") + F.col("SNumber")) % 13 == 2, F.lit(60)).otherwise(
        expected
    )
    return s.select(
        sid.alias("Sid"),
        F.col("Eid").alias("ExamRef"),
        (F.col("SNumber") + 1).alias("SNumber"),
        F.when(
            sid % 31 == 1, F.lit("1.3.12.shared")
        )
        .otherwise(F.concat(F.lit("1.3.12."), sid.cast("string")))
        .alias("SUID"),
        (
            F.col("AcquisitionTime")
            + F.make_interval(secs=(F.col("SNumber") * 300).cast("double"))
        ).alias("AcqTime"),
        F.lit(240).alias("Duration"),
        expected.alias("expected_files"),
        actual.alias("nb_dic_file"),
        (actual.cast("long") * 131072).alias("fsize"),
    )


SCALE_COPY_TABLES = ("region", "nation", "customer", "supplier", "part")
SCALE_REP_TABLES = {
    # table -> id columns receiving a per-replica offset (FK pairs get
    # the SAME offset so join fan-in is preserved at every factor)
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_SCALE_OFFSET = 1_000_000_000


def replicate_scaled(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int = 5
) -> None:
    """Write a ``factor``× key-offset replica of the testdata tables.

    Dimension tables are copied verbatim (their cardinality is not what
    scales in production); fact tables get ``factor`` replicas with
    offset primary keys, so per-group sizes and join selectivities grow
    the way real growth would.  Used by the bench harness's scale-ratio
    guard — a query whose wall time grows faster than the replica
    factor is flagged before any driver sees it.
    """
    import os

    for t in SCALE_COPY_TABLES:
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t, keys in SCALE_REP_TABLES.items():
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        reps = []
        for i in range(factor):
            r = df
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * _SCALE_OFFSET))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
