"""MySQL-dialect end-to-end rendering of the streaming import.

Round 5 plumbed ``dialect`` through ``incremental_import_stream`` but
only the ansi/DuckDB branch ever executed in tests.  No MySQL server
exists in the container, so this drives the FULL streaming path
(foreachBatch → serie land → key-tuple fetch → exam rebuild → upsert)
against a recording fake DB-API connection with ``dialect="mysql"``
and byte-checks the statements the stream would issue: backtick
identifiers, MySQL literal escaping, and the reference's
``INSERT ... ON DUPLICATE KEY UPDATE`` upsert form
(Cenir_DB.py:994-1024).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dicomdb_spark import pipeline as P
from dicomdb_spark.sources.dicom import parse_headers, synthetic_part10_from_ids

# one canned serie row handed back for the driver's serie-state fetch:
# types mirror pipeline.serie_schema
_CANNED_SERIE = (
    "1.2.826.0.1.42", 7, 1.8, "1.2.826.0.6", "20240101", 3600.0, 120.0
)


class _RecordingConn:
    """DB-API surface used by the writer + the driver fetches; every
    statement appends to ``log_path`` (single-writer: coalesce(1) in
    the stream plus the driver-side fetches)."""

    def __init__(self, log_path: str):
        self.log_path = log_path
        self._rows: list = []

    # cursor() returns self — execute/commit live on one object
    def cursor(self):
        return self

    def execute(self, sql: str):
        with open(self.log_path, "a") as fh:
            fh.write(sql.replace("\n", " ") + "\n")
        if "FROM `serie`" in sql:
            self._rows = [_CANNED_SERIE]
        else:
            self._rows = []
        return self

    def fetchall(self):
        return self._rows

    def commit(self):
        pass

    def close(self):
        pass


class _Connector:
    """Picklable zero-arg connect factory (closures over lambdas are
    not stable across the executor pickle boundary)."""

    def __init__(self, log_path: str):
        self.log_path = log_path

    def __call__(self):
        return _RecordingConn(self.log_path)


def test_mysql_dialect_streams_reference_upsert_form(spark, tmp_path):
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    log_path = str(tmp_path / "sql.log")
    ids = [6, 12, 24, 30]
    files = synthetic_part10_from_ids(
        spark.createDataFrame([(i,) for i in ids], "id long")
    )
    files.write.mode("append").parquet(landing)

    writer = P.incremental_import_stream(
        spark, landing, checkpoint, _Connector(log_path), dialect="mysql"
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert os.path.exists(log_path)
    stmts = [s for s in open(log_path).read().splitlines() if s.strip()]
    serie_ins = [s for s in stmts if s.startswith("INSERT INTO `serie` ")]
    exam_ins = [s for s in stmts if s.startswith("INSERT INTO `exam` ")]
    selects = [s for s in stmts if s.startswith("SELECT ")]
    assert serie_ins and exam_ins and selects

    # every upsert is the reference's MySQL form — never the ANSI
    # ON CONFLICT branch, never double-quoted identifiers
    for s in serie_ins + exam_ins:
        assert "ON DUPLICATE KEY UPDATE" in s, s
        assert "ON CONFLICT" not in s and '"' not in s, s
        assert "= VALUES(`" in s, s

    # byte-check one serie upsert against a hand-written rendering
    # (NOT render_upsert_sql — that would just test the renderer
    # against itself).  id=6: SeriesInstanceUID 1.2.826.0.1.6,
    # StudyInstanceUID 1.2.826.0.6, SeriesNumber 7, EchoTime 0.6,
    # acq time 06:06:00 → 21960 s (synthetic_part10_from_ids fields)
    headers = parse_headers(
        synthetic_part10_from_ids(
            spark.createDataFrame([(6,)], "id long")
        )
    ).filter(F.col("SeriesInstanceUID").isNotNull())
    row = P.build_serie_frame(headers).collect()[0]

    def lit(v):  # hand-rendered literal rules for the values seen here
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return f"'{v}'"
        return repr(v)

    expected = (
        "INSERT INTO `serie` (`SeriesInstanceUID`, `SeriesNumber`, "
        "`EchoTime`, `EUID`, `AcquisitionDate`, `first_acq_seconds`, "
        "`duration_s`) VALUES ("
        f"{lit(row['SeriesInstanceUID'])}, {lit(row['SeriesNumber'])}, "
        f"{lit(row['EchoTime'])}, {lit(row['EUID'])}, "
        f"{lit(row['AcquisitionDate'])}, {lit(row['first_acq_seconds'])}, "
        f"{lit(row['duration_s'])}) "
        "ON DUPLICATE KEY UPDATE `EUID` = VALUES(`EUID`), "
        "`AcquisitionDate` = VALUES(`AcquisitionDate`), "
        "`first_acq_seconds` = VALUES(`first_acq_seconds`), "
        "`duration_s` = VALUES(`duration_s`)"
    )
    assert expected in serie_ins, (expected, serie_ins[:2])

    # the driver's key-tuple fetches render backticked identifiers and
    # MySQL single-quote literals
    serie_sel = [s for s in selects if "FROM `serie`" in s]
    assert serie_sel, selects
    assert "(`EUID`, `AcquisitionDate`) IN ((" in serie_sel[0]
    assert "('1.2.826.0." in serie_sel[0]

    # the canned serie fetch produced an exam rebuild whose INSERT
    # carries the canned key (proof the fetched state, not the batch
    # view, feeds the exam upsert)
    assert any("'1.2.826.0.6'" in s for s in exam_ins), exam_ins[:2]
