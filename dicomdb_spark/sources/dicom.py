"""DICOM header-parse source (SURVEY.md §2 S3, U1).

The reference parsed every header with pydicom/dcmstack, never reading
pixel data (``stop_before_pixels=True``, Exam_info.py:130,356).  The
Spark shape is ``binaryFile`` → ``mapInPandas`` batches → a typed
StructType row per file plus a MapType for long-tail tags.

pydicom is not available in this container, so the byte-level parse is
STUBBED: ``parse_header_batch`` raises ``NotImplementedError`` unless
a parser callable is injected, and ``synthetic_header_frame`` provides
the deterministic fake used by tests.  Everything around the stub —
schema, batch iteration, Arrow transfer, partition behavior — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("StudyInstanceUID", T.StringType()),
        T.StructField("SeriesNumber", T.IntegerType()),
        T.StructField("InstanceNumber", T.IntegerType()),
        T.StructField("EchoTime", T.DoubleType()),
        T.StructField("AcquisitionDate", T.StringType()),
        T.StructField("AcquisitionTimeRaw", T.StringType()),
        T.StructField("ImageType", T.ArrayType(T.StringType())),
        T.StructField("csa_meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

# type of an injected low-level parser: bytes -> dict of header fields
HeaderParser = Callable[[bytes], dict]


def _default_parser(content: bytes) -> dict:
    raise NotImplementedError(
        "pydicom is not available in this environment; inject a parser "
        "via parse_headers(inv, parser=...) or use synthetic testdata "
        "(reference parse: Exam_info.py:458-465,890-918)"
    )


def parse_headers(
    inventory: DataFrame,
    parser: HeaderParser | None = None,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """U1 — per-file header parse as a ``mapInPandas`` batch operator.

    Arrow moves each partition's (path, content) batch into Python
    once; the parser runs per row inside the batch; output conforms to
    ``HEADER_SCHEMA``.  This is the ONLY part of the ingest path that
    cannot be pure Spark SQL (SURVEY §2 U1).
    """
    p = parser or _default_parser

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                rec = p(bytes(content))
                rec["path"] = path
                rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in HEADER_SCHEMA.fields]
            )

    return inventory.select(path_col, content_col).mapInPandas(
        run, schema=HEADER_SCHEMA
    )


def synthetic_parser(content: bytes) -> dict:
    """Deterministic fake parser for tests: derives header fields from
    the byte content (so the plumbing — batching, schema, arrays,
    maps — is exercised for real)."""
    h = content.decode("utf-8", errors="replace") if content else ""
    seed = sum(content[:16]) if content else 0
    return {
        "SeriesInstanceUID": f"1.2.3.{seed % 97}",
        "StudyInstanceUID": f"1.2.{seed % 13}",
        "SeriesNumber": seed % 40 + 1,
        "InstanceNumber": len(content) % 500 + 1,
        "EchoTime": float(seed % 50) / 10.0,
        "AcquisitionDate": "20240101",
        "AcquisitionTimeRaw": f"{seed % 24:02d}0000.000000",
        "ImageType": ["ORIGINAL", "PRIMARY"] + (["DERIVED"] if seed % 7 == 0 else []),
        "csa_meta": {"CsaSeries.MrPhoenixProtocol.lTotalScanTimeSec": str(seed % 600), "raw_len": str(len(h))},
    }


# UDF closures in this module must ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
