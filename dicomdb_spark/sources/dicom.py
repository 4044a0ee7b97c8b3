"""DICOM header-parse source (SURVEY.md §2 S3, U1).

The reference parsed every header with pydicom/dcmstack, never reading
pixel data (``stop_before_pixels=True``, Exam_info.py:130,356).  The
Spark shape is ``binaryFile`` → ``mapInPandas`` batches → a typed
StructType row per file plus a MapType for long-tail tags.

pydicom is not available in this container, so this module carries its
own minimal reader built from the PUBLIC file format alone (DICOM
PS3.10 §7.1: 128-byte preamble + ``DICM`` magic + explicit-VR file
meta; PS3.5 §7: data-element encoding): ``read_tags`` walks the tag
stream for the ~12 header tags the reference extracted
(Exam_info.py:458-465,890-918), stops before pixel data, handles
explicit and implicit VR little endian and skips sequences (nested
datasets are depth-tracked so a nested tag can never shadow a
top-level one).  ``minimal_parser`` adapts it to HEADER_SCHEMA; a
richer parser (pydicom) can still be injected via
``parse_headers(inv, parser=...)``.  ``encode_minimal_dicom`` writes
the same subset — the test/fixture generator for real byte-level
round-trips.
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

# -- minimal Part-10 reader (public format knowledge only) ------------------

_TS_EXPLICIT_LE = "1.2.840.10008.1.2.1"
_TS_IMPLICIT_LE = "1.2.840.10008.1.2"
# VRs with a 2-byte reserved field + 4-byte length (PS3.5 table 7.1-1)
_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC", b"UR", b"UT", b"UN"}
_UNDEFINED = 0xFFFFFFFF

# the header tags the reference's extraction needed
TAG_IMAGE_TYPE = (0x0008, 0x0008)
TAG_ACQ_DATE = (0x0008, 0x0022)
TAG_ACQ_TIME = (0x0008, 0x0032)
TAG_MANUFACTURER = (0x0008, 0x0070)
TAG_SEQUENCE_NAME = (0x0018, 0x0024)
TAG_TR = (0x0018, 0x0080)
TAG_TE = (0x0018, 0x0081)
TAG_STUDY_UID = (0x0020, 0x000D)
TAG_SERIES_UID = (0x0020, 0x000E)
TAG_SERIES_NUMBER = (0x0020, 0x0011)
TAG_INSTANCE_NUMBER = (0x0020, 0x0013)
TAG_CSA_IMAGE = (0x0029, 0x1010)  # Siemens private: CSA Image Header Info
TAG_PIXEL_DATA = (0x7FE0, 0x0010)

DEFAULT_TAGS = frozenset(
    {
        TAG_IMAGE_TYPE,
        TAG_ACQ_DATE,
        TAG_ACQ_TIME,
        TAG_MANUFACTURER,
        TAG_SEQUENCE_NAME,
        TAG_TR,
        TAG_TE,
        TAG_STUDY_UID,
        TAG_SERIES_UID,
        TAG_SERIES_NUMBER,
        TAG_INSTANCE_NUMBER,
        TAG_CSA_IMAGE,
    }
)


def read_tags(
    content: bytes, wanted: frozenset[tuple[int, int]] = DEFAULT_TAGS
) -> dict[tuple[int, int], bytes]:
    """Walk a Part-10 stream, returning raw values for ``wanted`` tags.

    Stops at pixel data (the reference's stop_before_pixels).  Raises
    ValueError on a missing DICM magic; any structural damage after
    that simply ends the walk (malformed headers degrade to NULL
    fields, never stage failures).
    """
    if len(content) < 132 or content[128:132] != b"DICM":
        raise ValueError("not a DICOM Part-10 stream (no DICM magic)")
    buf = memoryview(content)
    out: dict[tuple[int, int], bytes] = {}
    pos = 132
    explicit = True  # file meta group is always explicit VR LE
    ts = None
    in_meta = True
    depth = 0  # >0 while inside an undefined-length sequence
    n = len(content)
    while pos + 8 <= n:
        group = int.from_bytes(buf[pos : pos + 2], "little")
        elem = int.from_bytes(buf[pos + 2 : pos + 4], "little")
        tag = (group, elem)
        if group == 0xFFFE:  # item / delimiters inside sequences
            length = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            pos += 8
            if elem == 0xE0DD:  # sequence delimitation: leave the SQ
                depth = max(depth - 1, 0)
            # E000 item (walk through its dataset) / E00D item delim
            continue
        if in_meta and group != 0x0002:
            # file meta ended: switch to the negotiated syntax
            in_meta = False
            explicit = (ts or _TS_EXPLICIT_LE) != _TS_IMPLICIT_LE
        if tag == TAG_PIXEL_DATA:
            break
        if explicit or group == 0x0002:
            vr = bytes(buf[pos + 4 : pos + 6])
            if vr in _LONG_VRS:
                length = int.from_bytes(buf[pos + 8 : pos + 12], "little")
                hdr = 12
            else:
                length = int.from_bytes(buf[pos + 6 : pos + 8], "little")
                hdr = 8
        else:
            vr = None
            length = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            hdr = 8
        start = pos + hdr
        if length == _UNDEFINED:
            # undefined-length SQ (or UN): walk INTO it, tracking depth
            depth += 1
            pos = start
            continue
        if vr == b"SQ":
            pos = start + length  # defined-length sequence: skip whole
            continue
        if group == 0x0002 and elem == 0x0010:
            ts = bytes(buf[start : start + length]).rstrip(b"\x00 ").decode("ascii", "replace")
        elif depth == 0 and tag in wanted and tag not in out:
            out[tag] = bytes(buf[start : start + length])
        pos = start + length
    return out


# -- Siemens CSA2 private header (public "SV10" format) ---------------------
# Layout (documented publicly, e.g. nibabel's nicom csareader and the
# DICOM community wiki): "SV10" + 4 magic bytes, uint32 n_tags, uint32
# unused; per tag 64-byte nul-padded name, int32 vm, 4-byte vr, int32
# syngodt, int32 nitems, int32 xx; per item four uint32s (length at
# index 1) then the payload padded to 4 bytes.  Carried in private
# elements (0029,1010) CSA Image / (0029,1020) CSA Series.


def parse_csa2(blob: bytes) -> dict[str, str]:
    """Decode a CSA2 block to {tag_name: first_item_string}.

    Only scalar first items are surfaced (that is all the reference's
    extraction consumed, Exam_info.py:533-554); malformed blocks raise
    ValueError (callers degrade to a flag).
    """
    if len(blob) < 16 or blob[:4] != b"SV10":
        raise ValueError("not a CSA2 (SV10) block")
    n_tags = int.from_bytes(blob[8:12], "little")
    # 0 is a well-formed (empty) block — only absurd counts are
    # corrupt (caught by tests/test_codec_properties.py round-trip)
    if not 0 <= n_tags < 1024:
        raise ValueError(f"implausible CSA tag count {n_tags}")
    out: dict[str, str] = {}
    pos = 16
    for _ in range(n_tags):
        if pos + 84 > len(blob):
            break
        name = blob[pos : pos + 64].split(b"\x00", 1)[0].decode("ascii", "replace")
        nitems = int.from_bytes(blob[pos + 76 : pos + 80], "little")
        pos += 84
        first = None
        for _ in range(nitems):
            if pos + 16 > len(blob):
                pos = len(blob)
                break
            ln = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            data = blob[pos + 16 : pos + 16 + ln]
            if first is None and ln:
                first = data.rstrip(b"\x00 ").decode("ascii", "replace").strip()
            pos += 16 + (ln + 3) // 4 * 4
        if name and first:
            out[name] = first
    return out


def encode_csa2(tags: dict[str, str]) -> bytes:
    """Serialize {name: value} into a CSA2 block (one item per tag)."""
    body = b""
    for name, value in tags.items():
        nb = name.encode("ascii")[:63].ljust(64, b"\x00")
        data = str(value).encode("ascii") + b"\x00"
        ln = len(data)
        item = (
            ln.to_bytes(4, "little") * 2
            + (77).to_bytes(4, "little")
            + ln.to_bytes(4, "little")
            + data
            + b"\x00" * ((4 - ln % 4) % 4)
        )
        body += (
            nb
            + (1).to_bytes(4, "little")  # vm
            + b"CS\x00\x00"  # vr
            + (0).to_bytes(4, "little")  # syngodt
            + (1).to_bytes(4, "little")  # nitems
            + (77).to_bytes(4, "little")  # xx
            + item
        )
    return (
        b"SV10"
        + b"\x04\x03\x02\x01"
        + len(tags).to_bytes(4, "little")
        + (77).to_bytes(4, "little")
        + body
    )


def _s(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    return raw.rstrip(b"\x00 ").decode("ascii", "replace").strip() or None


def _f(raw: bytes | None) -> float | None:
    s = _s(raw)
    try:
        return float(s) if s is not None else None
    except ValueError:
        return None


def _i(raw: bytes | None) -> int | None:
    s = _s(raw)
    try:
        return int(s) if s is not None else None
    except ValueError:
        return None


def minimal_parser(content: bytes) -> dict:
    """bytes → HEADER_SCHEMA fields via the minimal Part-10 reader.

    When the Siemens CSA Image block (0029,1010) is present, its
    scalar tags are surfaced as ``CsaImage.<name>`` map entries, and
    SequenceName falls back to ``CsaImage.SequenceName`` when the
    standard tag is absent — the reference's fallback order
    (Exam_info.py:533-538).
    """
    tags = read_tags(content)
    it = _s(tags.get(TAG_IMAGE_TYPE))
    csa = {}
    for key, tag in (
        ("Manufacturer", TAG_MANUFACTURER),
        ("SequenceName", TAG_SEQUENCE_NAME),
        ("RepetitionTime", TAG_TR),
    ):
        v = _s(tags.get(tag))
        if v is not None:
            csa[key] = v
    blob = tags.get(TAG_CSA_IMAGE)
    if blob:
        try:
            for k, v in parse_csa2(bytes(blob)).items():
                csa[f"CsaImage.{k}"] = v
        except ValueError:
            csa["csa_corrupt"] = "1"
        if "SequenceName" not in csa and "CsaImage.SequenceName" in csa:
            csa["SequenceName"] = csa["CsaImage.SequenceName"]
    return {
        "SeriesInstanceUID": _s(tags.get(TAG_SERIES_UID)),
        "StudyInstanceUID": _s(tags.get(TAG_STUDY_UID)),
        "SeriesNumber": _i(tags.get(TAG_SERIES_NUMBER)),
        "InstanceNumber": _i(tags.get(TAG_INSTANCE_NUMBER)),
        "EchoTime": _f(tags.get(TAG_TE)),
        "AcquisitionDate": _s(tags.get(TAG_ACQ_DATE)),
        "AcquisitionTimeRaw": _s(tags.get(TAG_ACQ_TIME)),
        "ImageType": it.split("\\") if it else None,
        "csa_meta": csa,
    }


_default_parser = minimal_parser


# -- minimal Part-10 writer (test/fixture generator) ------------------------

_VR_BY_TAG = {
    TAG_IMAGE_TYPE: b"CS",
    TAG_ACQ_DATE: b"DA",
    TAG_ACQ_TIME: b"TM",
    TAG_MANUFACTURER: b"LO",
    TAG_SEQUENCE_NAME: b"SH",
    TAG_TR: b"DS",
    TAG_TE: b"DS",
    TAG_STUDY_UID: b"UI",
    TAG_SERIES_UID: b"UI",
    TAG_SERIES_NUMBER: b"IS",
    TAG_INSTANCE_NUMBER: b"IS",
}


def _element(tag: tuple[int, int], vr: bytes, value: bytes, explicit: bool) -> bytes:
    if len(value) % 2:  # values are even-length (PS3.5 §6.2)
        value += b"\x00" if vr == b"UI" else b" "
    head = tag[0].to_bytes(2, "little") + tag[1].to_bytes(2, "little")
    if not explicit:
        return head + len(value).to_bytes(4, "little") + value
    if vr in _LONG_VRS:
        return head + vr + b"\x00\x00" + len(value).to_bytes(4, "little") + value
    return head + vr + len(value).to_bytes(2, "little") + value


def encode_minimal_dicom(
    fields: dict,
    transfer_syntax: str = _TS_EXPLICIT_LE,
    with_pixels: bytes = b"\x00\x01\x02\x03",
) -> bytes:
    """Serialize header fields into a real Part-10 byte stream.

    ``fields`` keys mirror minimal_parser output (ImageType may be a
    list).  A small pixel-data element is appended so readers prove
    they stop before pixels.
    """
    explicit = transfer_syntax != _TS_IMPLICIT_LE
    body = b""
    values: dict[tuple[int, int], str] = {}
    for name, tag in (
        ("ImageType", TAG_IMAGE_TYPE),
        ("AcquisitionDate", TAG_ACQ_DATE),
        ("AcquisitionTimeRaw", TAG_ACQ_TIME),
        ("Manufacturer", TAG_MANUFACTURER),
        ("SequenceName", TAG_SEQUENCE_NAME),
        ("RepetitionTime", TAG_TR),
        ("EchoTime", TAG_TE),
        ("StudyInstanceUID", TAG_STUDY_UID),
        ("SeriesInstanceUID", TAG_SERIES_UID),
        ("SeriesNumber", TAG_SERIES_NUMBER),
        ("InstanceNumber", TAG_INSTANCE_NUMBER),
    ):
        v = fields.get(name)
        if v is None:
            continue
        values[tag] = "\\".join(v) if isinstance(v, (list, tuple)) else str(v)
    for tag in sorted(values):  # data set is ascending tag order
        body += _element(tag, _VR_BY_TAG[tag], values[tag].encode("ascii"), explicit)
    csa_tags = fields.get("csa_image")
    if csa_tags:
        body += _element(TAG_CSA_IMAGE, b"OB", encode_csa2(csa_tags), explicit)
    if with_pixels is not None:
        body += _element(TAG_PIXEL_DATA, b"OB", with_pixels, explicit)
    ts_el = _element((0x0002, 0x0010), b"UI", transfer_syntax.encode("ascii"), True)
    meta = _element((0x0002, 0x0000), b"UL", len(ts_el).to_bytes(4, "little"), True)
    return b"\x00" * 128 + b"DICM" + meta + ts_el + body


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

    cols = [f.name for f in HEADER_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar batch assembly: appending into per-column lists
            # and building the DataFrame once is ~3× cheaper than
            # list-of-dicts row inference at these batch sizes
            data: dict[str, list] = {c: [] for c in cols}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    rec = p(bytes(content))
                except Exception as e:  # noqa: BLE001
                    # malformed file → corrupt-flagged NULL row, never a
                    # stage failure (the reference logged 'Bad
                    # DICOMextract' and carried on, Exam_info.py:460-465)
                    rec = {}
                    rec["csa_meta"] = {"corrupt": f"{type(e).__name__}: {e}"[:200]}
                rec["path"] = path
                for c in cols:
                    data[c].append(rec.get(c))
            yield pd.DataFrame(data, columns=cols)

    return inventory.select(path_col, content_col).mapInPandas(
        run, schema=HEADER_SCHEMA
    )


def synthetic_part10_from_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic Part-10 byte streams derived from an id column.

    Map-only fixture generator for end-to-end parse runs at any scale:
    every 7th id encodes implicit VR, every 13th is corrupted (no DICM
    magic) to exercise the degrade path.  Returns (path, content).
    """
    from pyspark.sql import functions as F

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[id_col]:
                i = int(raw)
                if i % 13 == 0:
                    blob = b"\x00" * 200  # no magic → corrupt row
                else:
                    ts = _TS_IMPLICIT_LE if i % 7 == 0 else _TS_EXPLICIT_LE
                    seq = ("tfl3d1", "epfid2d1_64", "spc3d1")[i % 3]
                    fields = {
                        "SeriesInstanceUID": f"1.2.826.0.1.{i % 500}",
                        "StudyInstanceUID": f"1.2.826.0.{i % 50}",
                        "SeriesNumber": str(i % 40 + 1),
                        "InstanceNumber": str(i % 300 + 1),
                        "EchoTime": f"{(i % 50) / 10.0}",
                        "AcquisitionDate": "20240101",
                        "AcquisitionTimeRaw": f"{i % 24:02d}{i % 60:02d}00.000000",
                        "Manufacturer": "SIEMENS" if i % 3 else "GE MEDICAL SYSTEMS",
                        "SequenceName": seq,
                        "RepetitionTime": str(2000 + i % 7 * 100),
                        "ImageType": ["ORIGINAL", "PRIMARY"]
                        + (["DERIVED"] if i % 11 == 0 else []),
                    }
                    if i % 5 == 0:
                        # CSA-only SequenceName: exercises the
                        # reference's private-header fallback path
                        del fields["SequenceName"]
                        fields["csa_image"] = {
                            "SequenceName": seq,
                            "FlipAngle": str(5 + i % 85),
                        }
                    blob = encode_minimal_dicom(fields, transfer_syntax=ts)
                rows.append((f"/synthetic/{i}.dic", blob))
            yield pd.DataFrame(rows, columns=["path", "content"])

    return df.select(F.col(id_col)).mapInPandas(run, "path string, content binary")


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
