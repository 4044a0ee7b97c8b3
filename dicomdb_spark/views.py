"""The reference's SQL views, Spark-side (cenir_view.sql).

* ``ExamSeries`` — inner equi-join exam ⋈ serie (cenir_view.sql:8).
* ``seqname`` — MySQL's pick-arbitrary-row-per-SeqName2 catalog
  (cenir_view.sql:20); illegal in ANSI — rewritten as a deterministic
  window pick (SURVEY §2 A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exam_series(exam: DataFrame, serie: DataFrame) -> DataFrame:
    """cenir_view.sql:8 — the workhorse denormalized relation.

    The exam side is the smaller one (19k rows in the reference's
    production dump) but archive-sized, so no pinned hint: stats/AQE
    broadcast it while small and shuffle at scale.  Exam's duplicated
    column names keep an ``e_`` prefix where they collide.
    """
    collisions = set(exam.columns) & set(serie.columns)
    e = exam
    for c in collisions:
        e = e.withColumnRenamed(c, f"e_{c}")
    return serie.join(e, e["Eid"] == serie["ExamRef"], "inner")


def seqname_catalog(serie: DataFrame) -> DataFrame:
    """cenir_view.sql:20 — one representative serie per SeqName2.

    MySQL picked an arbitrary row; we pin ``ORDER BY Sid`` so the
    representative is deterministic across engines and runs.
    """
    w = Window.partitionBy("SeqName2").orderBy(F.col("Sid"))
    return (
        serie.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
