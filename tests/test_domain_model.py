"""The engine's operators running on the actual DICOM domain model
(exam/serie schemas + FIXTURES.md pathologies) — not TPC-H stand-ins."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from dicomdb_spark import fixtures, views
from dicomdb_spark.operators import aggregates as agg
from dicomdb_spark.operators import joins as oj
from dicomdb_spark.operators import windows as ow


@pytest.fixture(scope="module")
def exam(spark):
    return fixtures.make_exam(spark).cache()


@pytest.fixture(scope="module")
def serie(spark, exam):
    return fixtures.make_serie(spark, exam).cache()


def test_r1_duplicate_exams(exam):
    """A1 on (AcquisitionTime, MachineName) finds exactly the injected
    exam copies; W2 keep-latest ranks the higher Eid as removable."""
    dups = agg.group_count_having(exam, ["AcquisitionTime", "MachineName"])
    n_expected = exam.filter((F.col("Eid") % 17 == 0) & (F.col("Eid") < 10000)).count()
    assert dups.count() == n_expected
    resolved = ow.keep_latest(
        exam,
        ["AcquisitionTime", "MachineName"],
        [F.col("Eid").desc()],
    )
    removals = resolved.filter(F.col("action") == "remove").select("Eid").collect()
    assert all(r.Eid % 17 == 0 and r.Eid < 10000 for r in removals)


def test_j2_orphan_exams(exam, serie):
    orphans = oj.orphans(exam, serie, "Eid", "ExamRef")
    got = sorted(r.Eid for r in orphans.collect())
    assert got and all(e % 19 == 5 for e in got)


def test_j3_time_proximity_siblings(exam):
    pairs = oj.time_proximity_pairs(
        exam, ["MachineName"], "AcquisitionTime", "Eid", threshold_s=300
    )
    rows = pairs.collect()
    assert rows
    # every detected pair is either an exact copy (Δt=0) or the
    # injected +120 s sibling
    for r in rows:
        assert r.id2 - r.id1 in (10000, 20000), (r.id1, r.id2)


def test_r2_duplicate_suids(serie):
    dups = agg.group_count_having(serie, ["SUID"])
    rows = dups.collect()
    assert len(rows) == 1 and rows[0].SUID == "1.3.12.shared"
    assert rows[0].doublon >= 2


def test_a9_completeness_flags(serie):
    audited = agg.completeness_audit(
        serie,
        ["Sid"],
        expected=F.col("expected_files").cast("double"),
        actual=F.col("nb_dic_file").cast("double"),
    )
    bad = audited.filter(F.col("corrupt") != "ok")
    assert bad.count() == serie.filter((F.col("ExamRef") + F.col("SNumber") - 1) % 13 == 2).count()
    assert all(r.corrupt == "missingDicomFile_4" for r in bad.collect())


def test_w1_exam_duration(serie):
    dur = ow.first_last_duration(
        serie, ["ExamRef"], order_col="SNumber", ts_col="AcqTime", dur_col="Duration"
    )
    row = dur.filter(F.col("ExamRef") == 0).first()
    # 4 series, 300 s apart → span 900 s + last Duration 240 → 1140 s → 19 min
    assert row.n_items == 4 and row.duration_min == 19


def test_p9_doublon_guard(exam):
    guarded = exam.filter(~F.col("dicom_dir").contains("doublon"))
    assert guarded.count() == exam.filter(~(F.col("Eid") % 29 == 7)).count()


def test_exam_series_view(exam, serie):
    es = views.exam_series(exam, serie)
    # inner join drops orphan exams' absent series only
    assert es.count() == serie.count()
    assert "ExamName" in es.columns and "SUID" in es.columns
