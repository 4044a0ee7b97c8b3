"""S10 / S12 / S13 — the three formerly out-of-scope connectors.

S12 (NIfTI sink): format round-trip, skip-if-exists idempotence, and
the ``duplicate_but_different`` flag.  S13 (tar sink): command
generation + real archives with deterministic bytes.  S10 (C-FIND):
the injectable-client fan-out feeding J9's reconciliation join.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tarfile

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------- S12
def _slice_rows(sid: str, n: int, rows: int = 4, cols: int = 3, seed: int = 0):
    out = []
    meta = json.dumps({"SeriesInstanceUID": sid, "TR": 2000})
    for k in range(n):
        plane = (np.arange(rows * cols, dtype="<i2") + k + seed).tobytes()
        out.append((sid, k + 1, bytearray(plane), rows, cols, meta))
    return out


def test_nifti_roundtrip_bytes():
    from dicomdb_spark.sources.nifti import decode_nifti1, encode_nifti1

    vol = np.arange(24, dtype="int16").reshape((2, 3, 4))
    blob = encode_nifti1(vol)
    assert blob[:2] == b"\x1f\x8b"  # gzip magic
    back = decode_nifti1(blob)
    assert back.shape == (2, 3, 4)
    assert (back == vol).all()
    # determinism: identical voxels -> identical bytes (mtime pinned)
    assert encode_nifti1(vol) == blob
    raw = gzip.decompress(blob)
    assert raw[344:347] == b"n+1"  # NIfTI-1 single-file magic


def test_nifti_sink_idempotence_and_conflict(spark, tmp_path):
    from dicomdb_spark.sources.nifti import write_nifti_volumes

    out = str(tmp_path / "nii")
    schema = (
        "SeriesInstanceUID string, InstanceNumber int, pixels binary,"
        " rows int, cols int, meta_json string"
    )
    df = spark.createDataFrame(
        _slice_rows("1.2.3", 5) + _slice_rows("1.2.4", 3), schema
    )
    first = {
        r["SeriesInstanceUID"]: r for r in write_nifti_volumes(df, out).collect()
    }
    assert {r["status"] for r in first.values()} == {"written"}
    assert first["1.2.3"]["n_slices"] == 5
    sidecar = json.load(open(first["1.2.3"]["json_path"]))
    assert sidecar["TR"] == 2000

    # re-run over identical input: skip-if-exists + content-compare
    again = {
        r["SeriesInstanceUID"]: r for r in write_nifti_volumes(df, out).collect()
    }
    assert {r["status"] for r in again.values()} == {"skipped_identical"}

    # same series name, different voxels -> flagged, never overwritten
    df2 = spark.createDataFrame(_slice_rows("1.2.3", 5, seed=9), schema)
    flagged = write_nifti_volumes(df2, out).collect()
    assert flagged[0]["status"] == "duplicate_but_different"

    # crash recovery: a run that died between the .nii.gz write and the
    # sidecar write left the sidecar missing — a skipped_identical
    # re-run must backfill it rather than skip forever
    import os

    os.remove(first["1.2.3"]["json_path"])
    backfilled = {
        r["SeriesInstanceUID"]: r for r in write_nifti_volumes(df, out).collect()
    }
    assert backfilled["1.2.3"]["status"] == "skipped_identical"
    assert json.load(open(first["1.2.3"]["json_path"]))["TR"] == 2000


# ---------------------------------------------------------------------- S13
def test_tar_command_generation(spark, tmp_path):
    from dicomdb_spark.sources.tar_sink import tar_commands

    series = spark.createDataFrame(
        [("1.2.3", "/data/e1/S02"), ("1.2.4", "/data/e1/S03")],
        "SeriesInstanceUID string, serie_dir string",
    )
    cmds = {r["SeriesInstanceUID"]: r["command"]
            for r in tar_commands(series, str(tmp_path)).collect()}
    assert cmds["1.2.3"] == (
        f"tar -czf {tmp_path}/1.2.3.tar.gz -C /data/e1/S02 ."
    )


def test_tar_archives_real_and_deterministic(spark, tmp_path):
    from dicomdb_spark.sources.tar_sink import write_tar_archives

    out = str(tmp_path / "tars")
    files = spark.createDataFrame(
        [
            ("1.2.3", "/e1/S02/a.dic", bytearray(b"AAAA")),
            ("1.2.3", "/e1/S02/b.dic", bytearray(b"BBBB")),
            ("1.2.4", "/e1/S03/c.dic", bytearray(b"CC")),
        ],
        "SeriesInstanceUID string, path string, content binary",
    )
    audit = {r["SeriesInstanceUID"]: r
             for r in write_tar_archives(files, out).collect()}
    assert audit["1.2.3"]["n_members"] == 2
    with tarfile.open(audit["1.2.3"]["tar_path"]) as tf:
        names = sorted(tf.getnames())
        assert names == ["e1/S02/a.dic", "e1/S02/b.dic"]
        assert tf.extractfile("e1/S02/b.dic").read() == b"BBBB"
    sig1 = open(audit["1.2.3"]["tar_path"], "rb").read()
    # deterministic bytes: re-archive identical content -> identical file
    write_tar_archives(files, out).collect()
    assert open(audit["1.2.3"]["tar_path"], "rb").read() == sig1


# ---------------------------------------------------------------------- S10
def fake_cfind_client(level: str, keys: dict) -> list[dict]:
    """Deterministic PACS stand-in: every study has 3 series whose
    remote instance counts derive from the study uid."""
    assert level == "SERIES"
    study = keys["StudyInstanceUID"]
    base = int(study.rsplit(".", 1)[-1])
    return [
        {
            "SeriesInstanceUID": f"{study}.{k}",
            "SeriesNumber": k,
            "NumberOfSeriesRelatedInstances": base * 10 + k,
        }
        for k in range(1, 4)
    ]


def test_cfind_fanout_and_j9_reconciliation(spark):
    from dicomdb_spark.sources.cfind import cfind_series_counts, findscu_command

    studies = spark.createDataFrame(
        [("1.2.826.0.7",), ("1.2.826.0.8",), ("1.2.826.0.7",)],
        "StudyInstanceUID string",
    )
    remote = cfind_series_counts(studies, fake_cfind_client, ae_title="PRISMA")
    rows = remote.collect()
    assert len(rows) == 6  # 2 distinct studies x 3 series
    by_uid = {r["SeriesInstanceUID"]: r for r in rows}
    assert by_uid["1.2.826.0.7.2"]["NumberOfSeriesRelatedInstances"] == 72
    assert by_uid["1.2.826.0.8.3"]["ae_title"] == "PRISMA"

    # J9: remote counts vs local file counts -> mismatches only
    local = spark.createDataFrame(
        [("1.2.826.0.7.1", 71), ("1.2.826.0.7.2", 70), ("1.2.826.0.8.1", 81)],
        "SeriesInstanceUID string, n_local int",
    )
    diff = (
        remote.join(local, "SeriesInstanceUID", "left")
        .filter(
            ~F.col("n_local").eqNullSafe(
                F.col("NumberOfSeriesRelatedInstances")
            )
        )
        .select("SeriesInstanceUID")
    )
    assert sorted(r[0] for r in diff.collect()) == [
        "1.2.826.0.7.2",  # count mismatch (70 != 72)
        "1.2.826.0.7.3",  # missing locally
        "1.2.826.0.8.2",
        "1.2.826.0.8.3",
    ]

    cmd = findscu_command("pacs.host", 104, "HARVEST", "PRISMA", "1.2.826.0.7")
    assert "-k QueryRetrieveLevel=SERIES" in cmd
    assert "-k StudyInstanceUID=1.2.826.0.7" in cmd
