"""Golden-bytes proofs of the injectable parser/decoder seams.

``parse_headers`` (sources/dicom.py) and ``decode_image_meta``
(llm/multimodal.py) take injectable implementations; only the built-in
minimal/synthetic ones run in this container.  These tests feed REAL
library implementations (pydicom / PIL) through the same seams so the
contracts are proven against a production parser the day the
environment provides one — skip-gated, green wherever the libs exist.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dicomdb_spark.sources.dicom import (
    encode_minimal_dicom,
    minimal_parser,
    parse_headers,
)

pydicom = pytest.importorskip("pydicom", reason="pydicom not installed")


GOLDEN_FIELDS = {
    "SeriesInstanceUID": "1.2.826.0.1.42",
    "StudyInstanceUID": "1.2.826.0.7",
    "SeriesNumber": "11",
    "InstanceNumber": "3",
    "EchoTime": "4.9",
    "AcquisitionDate": "20240101",
    "AcquisitionTimeRaw": "134500.000000",
    "Manufacturer": "SIEMENS",
    "SequenceName": "tfl3d1",
    "RepetitionTime": "2300",
    "ImageType": ["ORIGINAL", "PRIMARY"],
}


def pydicom_parser(content: bytes) -> dict:
    """A pydicom-backed HeaderParser — the injectable production seam."""
    import io

    ds = pydicom.dcmread(io.BytesIO(content), stop_before_pixels=True)
    it = ds.get("ImageType")
    return {
        "SeriesInstanceUID": str(ds.get("SeriesInstanceUID") or "") or None,
        "StudyInstanceUID": str(ds.get("StudyInstanceUID") or "") or None,
        "SeriesNumber": int(ds.SeriesNumber) if "SeriesNumber" in ds else None,
        "InstanceNumber": int(ds.InstanceNumber) if "InstanceNumber" in ds else None,
        "EchoTime": float(ds.EchoTime) if "EchoTime" in ds else None,
        "AcquisitionDate": str(ds.get("AcquisitionDate") or "") or None,
        "AcquisitionTimeRaw": str(ds.get("AcquisitionTime") or "") or None,
        "ImageType": list(it) if it is not None else None,
        "csa_meta": {
            k: str(ds.get(k))
            for k in ("Manufacturer", "SequenceName", "RepetitionTime")
            if k in ds
        },
    }


def test_pydicom_reads_our_part10_bytes():
    """Our Part-10 writer emits streams a REAL reader accepts, and both
    parsers agree field-for-field on the golden fixture — explicit AND
    implicit VR."""
    for ts in ("1.2.840.10008.1.2.1", "1.2.840.10008.1.2"):
        blob = encode_minimal_dicom(GOLDEN_FIELDS, transfer_syntax=ts)
        real = pydicom_parser(blob)
        ours = minimal_parser(blob)
        for k in (
            "SeriesInstanceUID",
            "StudyInstanceUID",
            "SeriesNumber",
            "InstanceNumber",
            "EchoTime",
            "AcquisitionDate",
            "AcquisitionTimeRaw",
            "ImageType",
        ):
            assert real[k] == ours[k], (ts, k, real[k], ours[k])


def test_parse_headers_accepts_pydicom_parser(spark):
    """The mapInPandas operator runs UNCHANGED with the real parser
    injected — proving the HeaderParser contract, not just the
    built-in implementation."""
    blob = encode_minimal_dicom(GOLDEN_FIELDS)
    inv = spark.createDataFrame(
        [("/golden/1.dic", bytearray(blob))], "path string, content binary"
    )
    out = parse_headers(inv, parser=pydicom_parser).collect()
    assert len(out) == 1
    row = out[0]
    assert row["SeriesInstanceUID"] == "1.2.826.0.1.42"
    assert row["SeriesNumber"] == 11
    assert row["EchoTime"] == 4.9
    assert row["ImageType"] == ["ORIGINAL", "PRIMARY"]
