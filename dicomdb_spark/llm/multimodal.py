"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns + typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested.
Since round 10 the default image decode is REAL for the four
container formats whose dimensions are pure header parses (PNG IHDR,
GIF logical screen descriptor, BMP DIB header, JPEG SOFn) —
``stdlib_decoder`` below, zero dependencies, same move as the
pure-Python DICOM Part-10 reader (sources/dicom.py).  Pixel-level
decode (PIL/libvips/ffmpeg) stays an injected ``decoder=`` seam;
``fake_decoder`` remains only as a deterministic TEST stub.

At 100 TB the rules encoded here: binary payloads never enter a
shuffle (metadata is extracted map-side, then only metadata moves);
batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so one partition's payloads never materialize at once.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

Decoder = Callable[[bytes], dict]


def fake_decoder(payload: bytes) -> dict:
    """Deterministic TEST STUB (demoted from default in round 10):
    derives plausible metadata purely from the byte count, for
    fixtures whose payloads carry no real container header.  Real
    container metadata comes from ``stdlib_decoder`` (the default);
    pixel decode comes from an injected PIL/libvips ``decoder=``."""
    n = len(payload)
    return {
        "format": "fake/raw",
        "width": (n % 1024) + 1,
        "height": ((n * 7) % 1024) + 1,
    }


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_UNKNOWN = {"format": "application/octet-stream", "width": None, "height": None}


def stdlib_decoder(payload: bytes) -> dict:
    """REAL image-container metadata decode, pure stdlib: dimensions
    are header-field parses, no pixel codec needed.

    * PNG (RFC 2083 §3.1/§4.1.1): 8-byte signature, then the IHDR
      chunk — width/height are the first two big-endian u32 of the
      chunk data (payload bytes 16..24).
    * GIF (GIF89a spec §18): ``GIF87a``/``GIF89a`` signature, then the
      logical screen descriptor — width/height little-endian u16 at
      bytes 6..10.
    * BMP (Windows BITMAPINFOHEADER): ``BM`` + 14-byte file header;
      DIB size at 14..18 picks the header flavor — i32 dims at 18..26
      for the 40+-byte family (height may be negative for top-down
      rows: abs), u16 dims for the ancient 12-byte BITMAPCOREHEADER.
    * JPEG (ITU T.81 §B.2.2): walk the marker segments from SOI to
      the first frame header SOFn (C0–CF minus DHT C4 / JPG C8 /
      DAC CC); the frame's height/width are big-endian u16 at offsets
      3/5 of the segment payload.

    Unrecognized/truncated payloads return the octet-stream fallback
    with NULL dims — never an exception, so one corrupt file cannot
    kill an Arrow batch."""
    b = payload
    if b[:8] == _PNG_MAGIC and len(b) >= 24 and b[12:16] == b"IHDR":
        return {
            "format": "image/png",
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
        }
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return {
            "format": "image/gif",
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
        }
    if b[:2] == b"BM" and len(b) >= 22:
        dib = int.from_bytes(b[14:18], "little")
        if dib >= 40 and len(b) >= 26:
            return {
                "format": "image/bmp",
                "width": abs(int.from_bytes(b[18:22], "little", signed=True)),
                "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
            }
        if dib == 12:
            return {
                "format": "image/bmp",
                "width": int.from_bytes(b[18:20], "little"),
                "height": int.from_bytes(b[20:22], "little"),
            }
        return dict(_UNKNOWN)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            m = b[i + 1]
            if m == 0xFF:  # fill byte
                i += 1
                continue
            if m == 0x01 or 0xD0 <= m <= 0xD9:  # standalone markers
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if seglen < 2:
                break
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    break
                return {
                    "format": "image/jpeg",
                    "height": int.from_bytes(b[i + 5 : i + 7], "big"),
                    "width": int.from_bytes(b[i + 7 : i + 9], "big"),
                }
            i += 2 + seglen
        return {"format": "image/jpeg", "width": None, "height": None}
    if b[:2] in (b"II", b"MM") and len(b) >= 8:
        return _tiff_dims(b)
    if b[:4] == b"RIFF" and len(b) >= 16 and b[8:12] == b"WEBP":
        return _webp_dims(b)
    return dict(_UNKNOWN)


def _tiff_dims(b: bytes) -> dict:
    """TIFF 6.0 §2: 2-byte byte-order mark (``II`` little / ``MM``
    big), u16 magic 42, u32 offset of the first IFD; the IFD is a u16
    entry count then 12-byte entries (tag u16, type u16, count u32,
    value-or-offset 4 bytes).  Dimensions are tags 256 (ImageWidth)
    and 257 (ImageLength); a SHORT (type 3) value sits in the FIRST
    two bytes of the value field in file byte order, a LONG (type 4)
    uses all four — both paths handled, both endiannesses."""
    endian = "little" if b[:2] == b"II" else "big"
    bad = {"format": "image/tiff", "width": None, "height": None}
    if int.from_bytes(b[2:4], endian) != 42:
        return dict(_UNKNOWN)
    ifd = int.from_bytes(b[4:8], endian)
    if ifd + 2 > len(b):
        return bad
    n = int.from_bytes(b[ifd : ifd + 2], endian)
    width = height = None
    for k in range(n):
        e = ifd + 2 + 12 * k
        if e + 12 > len(b):
            return bad
        tag = int.from_bytes(b[e : e + 2], endian)
        typ = int.from_bytes(b[e + 2 : e + 4], endian)
        if tag not in (256, 257):
            continue
        if typ == 3:  # SHORT: left-justified in the 4-byte value field
            val = int.from_bytes(b[e + 8 : e + 10], endian)
        elif typ == 4:  # LONG
            val = int.from_bytes(b[e + 8 : e + 12], endian)
        else:
            continue
        if tag == 256:
            width = val
        else:
            height = val
    return {"format": "image/tiff", "width": width, "height": height}


def _webp_dims(b: bytes) -> dict:
    """WebP container (RIFF): first chunk after the 12-byte RIFF/WEBP
    preamble decides the flavor.

    * ``VP8X`` (extended): 4 flag/reserved bytes then canvas
      width-minus-one / height-minus-one as little-endian u24s.
    * ``VP8 `` (lossy): 3-byte frame tag, start code 9D 01 2A, then
      14-bit width/height in little-endian u16s.
    * ``VP8L`` (lossless): signature byte 2F, then width-1 (14 bits)
      and height-1 (14 bits) packed LSB-first into the next 4 bytes.
    """
    bad = {"format": "image/webp", "width": None, "height": None}
    cid = b[12:16]
    if cid == b"VP8X" and len(b) >= 30:
        return {
            "format": "image/webp",
            "width": 1 + int.from_bytes(b[24:27], "little"),
            "height": 1 + int.from_bytes(b[27:30], "little"),
        }
    if cid == b"VP8 " and len(b) >= 30:
        if b[23:26] != b"\x9d\x01\x2a":
            return bad
        return {
            "format": "image/webp",
            "width": int.from_bytes(b[26:28], "little") & 0x3FFF,
            "height": int.from_bytes(b[28:30], "little") & 0x3FFF,
        }
    if cid == b"VP8L" and len(b) >= 25:
        if b[20] != 0x2F:
            return bad
        bits = int.from_bytes(b[21:25], "little")
        return {
            "format": "image/webp",
            "width": 1 + (bits & 0x3FFF),
            "height": 1 + ((bits >> 14) & 0x3FFF),
        }
    return bad


def build_container(doc_id: int, body: bytes) -> bytes:
    """Deterministic synthetic-container builder (fixture side of the
    real-decode round trip): wraps ``body`` in a structurally valid
    PNG / GIF89a / BMP / JPEG-SOF0 header chosen by ``doc_id % 4``,
    with width = doc_id % 1024 + 1 and height = (doc_id·7) % 1024 + 1
    — pure functions of doc_id that an SQL oracle can restate, while
    the decode path must actually parse the bytes to recover them.
    Header sizes: PNG 33 (sig + IHDR chunk), GIF 13 (sig + LSD),
    BMP 54 (file header + BITMAPINFOHEADER), JPEG 15 (SOI + SOF0)."""
    w = (doc_id % 1024) + 1
    h = ((doc_id * 7) % 1024) + 1
    k = doc_id % 4
    if k == 0:  # PNG: signature + IHDR (len, type, 13-byte data, crc)
        ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
        hdr = _PNG_MAGIC + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    elif k == 1:  # GIF89a: signature + logical screen descriptor
        hdr = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x91, 0, 0])
    elif k == 2:  # BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
        hdr = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
            )
        )
    else:  # JPEG: SOI + SOF0 (len=11: prec, h, w, 1 component)
        hdr = (
            b"\xff\xd8\xff\xc0"
            + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0])
        )
    return hdr + body


def build_container_v2(doc_id: int, body: bytes) -> bytes:
    """Round-11 companion to build_container: wraps ``body`` in a
    structurally valid TIFF (both byte orders, exercising SHORT and
    LONG value encodings) or WebP (VP8X and VP8L flavors) chosen by
    ``doc_id % 4``, with the SAME width/height functions of doc_id as
    build_container so the SQL oracle can restate them.  Header sizes:
    TIFF 38 (8-byte header + 2-entry IFD + next-IFD pointer),
    WebP/VP8X 30 (RIFF preamble + 8-byte chunk header + 10-byte
    payload), WebP/VP8L 25 (… + 5-byte payload)."""
    w = (doc_id % 1024) + 1
    h = ((doc_id * 7) % 1024) + 1
    k = doc_id % 4
    if k == 0:  # TIFF little-endian, LONG dims
        hdr = (
            b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 2)
            + struct.pack("<HHII", 256, 4, 1, w)
            + struct.pack("<HHII", 257, 4, 1, h)
            + struct.pack("<I", 0)
        )
    elif k == 1:  # TIFF big-endian, SHORT dims (left-justified values)
        hdr = (
            b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 2)
            + struct.pack(">HHIHH", 256, 3, 1, w, 0)
            + struct.pack(">HHIHH", 257, 3, 1, h, 0)
            + struct.pack(">I", 0)
        )
    elif k == 2:  # WebP extended header (VP8X): u24 minus-one dims
        payload = b"\x00\x00\x00\x00" + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        hdr = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + len(body))
            + b"WEBP" + b"VP8X" + struct.pack("<I", len(payload)) + payload
        )
    else:  # WebP lossless (VP8L): 14+14-bit dims packed LSB-first
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits)
        hdr = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + len(body))
            + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
        )
    return hdr + body


def _containerize(
    df: DataFrame,
    builder: Callable[[int, bytes], bytes],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shared fixture producer: wrap each document's UTF-8 bytes with
    ``builder(doc_id, body)`` as a map-only ``mapInPandas`` — payloads
    are built and consumed map-side, they never shuffle.

    NULL-text docs produce NO media row (a doc without content has no
    payload; oracles state the same ``text IS NOT NULL`` filter) — the
    alternative, a NULL payload, crashes byte-level decoders and has
    no parseable container semantics (r13 null-probe find).
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    src = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        builder(int(d), str(t).encode("utf-8"))
                        for d, t in zip(pdf["doc_id"], pdf["t"])
                    ],
                }
            )

    return src.mapInPandas(run, schema=schema)


def containerize_v2(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → TIFF/WebP payloads (see build_container_v2), the
    round-11 twin of containerize."""
    return _containerize(df, build_container_v2, text_col, id_col)


def containerize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → structurally valid PNG/GIF/BMP/JPEG payloads (see
    build_container), the fixture producer for the real-decode round
    trip."""
    return _containerize(df, build_container, text_col, id_col)


def binarize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Make an opaque binary payload column from testdata (stand-in for
    real media bytes) — UTF-8 encode is exact and portable.  NULL-text
    docs produce NO payload row (see _containerize; oracles filter
    ``text IS NOT NULL`` identically — r13 null-probe find)."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_meta(
    df: DataFrame,
    decoder: Decoder | None = None,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode/feature-extract as a ``mapInPandas`` batch operator.
    Default decoder is the REAL stdlib container parser
    (``stdlib_decoder``); inject PIL/libvips for pixel-level work or
    ``fake_decoder`` for header-less fixtures.

    Checksum via sha2 happens JVM-side BEFORE Python (cheap, codegen);
    only the decode itself crosses into pandas.
    """
    decoder = decoder or stdlib_decoder
    with_ck = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.sha2(F.col(payload_col), 256).alias("checksum"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload, ck in zip(pdf[id_col], pdf[payload_col], pdf["checksum"]):
                b = bytes(payload)
                meta = decoder(b)
                out.append(
                    {
                        "doc_id": did,
                        "n_bytes": len(b),
                        "format": meta["format"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "checksum": ck,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return with_ck.mapInPandas(run, schema=IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Row-expanding sample (1 payload → N frames) — the video
    frame-sampling shape.  The stub slices the byte stream; a real
    implementation injects an ffmpeg-backed slicer with the same
    signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_index": i,
                            "frame_payload": b[off : off + every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


# UDF closures in this module must ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize as a mapInPandas batch operator.

    A real deployment injects a PIL/libvips ``resizer``; the stub
    down-samples the byte stream deterministically (every k-th byte) so
    the plumbing — payload in, smaller payload out, typed dims — is
    exercised for real.
    """

    def default_resizer(b: bytes, w: int, h: int) -> bytes:
        stride = max(len(b) // (w * h), 1)
        return b[::stride][: w * h]

    fn = resizer or default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                out = fn(bytes(payload), target_w, target_h)
                rows.append(
                    {
                        "doc_id": did,
                        "width": target_w,
                        "height": target_h,
                        "resized_payload": out,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(
    df: DataFrame,
    bins: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-extract binary payloads: an L1-normalized byte histogram.

    Unlike the decode/resize steps this needs NO media library — the
    histogram is real math over the raw bytes (numpy bincount per Arrow
    batch), a genuine fixed-dimension feature vector usable by the ANN
    and clustering operators downstream.  A model-based extractor
    (CLIP-style) would replace the histogram with an injected callable;
    the batch shape is identical.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> int(np.log2(256 // bins)), minlength=bins)
                total = max(int(hist.sum()), 1)
                rows.append(
                    {
                        "doc_id": did,
                        "n_bytes": int(len(b)),
                        "features": [float(h) / total for h in hist],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio containers (round 10): REAL RIFF/WAVE header parse, the same
# zero-dependency move as stdlib_decoder for images.  Sample DECODE
# (codec work) stays an injected seam; the header fields below are pure
# byte parses.
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_AUDIO_UNKNOWN = {
    "format": "application/octet-stream",
    "channels": None,
    "sample_rate": None,
    "bits": None,
    "n_frames": None,
    "duration_ms": None,
}


def wav_decoder(payload: bytes) -> dict:
    """Parse RIFF/WAVE header bytes: the canonical little-endian fmt
    chunk (audio format, channels, sample rate, block align, bits) and
    the data chunk size, walking the chunk list with the RIFF odd-size
    padding rule.  n_frames = data_size // block_align and
    duration_ms = n_frames * 1000 // rate are exact integers.  Never
    throws: non-WAV or truncated input degrades to
    application/octet-stream, a malformed-but-RIFF file keeps
    format audio/wav with None fields (same contract as
    stdlib_decoder's truncated-JPEG case)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return dict(_AUDIO_UNKNOWN)
    out = dict(_AUDIO_UNKNOWN, format="audio/wav")
    pos, n = 12, len(payload)
    fmt = data_size = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # odd chunk sizes are padded
    if fmt is None:
        return out
    _, channels, rate, _, block_align, bits = fmt
    out.update(channels=channels, sample_rate=rate, bits=bits)
    if data_size is not None and block_align > 0 and rate > 0:
        frames = data_size // block_align
        out.update(n_frames=frames, duration_ms=frames * 1000 // rate)
    return out


def flac_decoder(payload: bytes) -> dict:
    """Parse a FLAC STREAMINFO header: ``fLaC`` magic, then metadata
    blocks — 1-byte header (bit 7 last-block flag, bits 0-6 type;
    type 0 = STREAMINFO) + u24 big-endian length.  STREAMINFO packs
    sample rate (20 bits), channels-1 (3), bits-per-sample-1 (5) and
    total samples (36) big-endian into the 8 bytes after the block-
    size/frame-size fields — unpacked here by shifting one u64.
    Same never-throws contract as wav_decoder."""
    if len(payload) < 4 or payload[:4] != b"fLaC":
        return dict(_AUDIO_UNKNOWN)
    out = dict(_AUDIO_UNKNOWN, format="audio/flac")
    pos, n = 4, len(payload)
    while pos + 4 <= n:
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if (hdr & 0x7F) == 0:  # STREAMINFO
            body = payload[pos + 4 : pos + 4 + size]
            if len(body) < 26:
                return out
            u = int.from_bytes(body[10:18], "big")
            rate = u >> 44
            channels = ((u >> 41) & 0x7) + 1
            bits = ((u >> 36) & 0x1F) + 1
            frames = u & 0xFFFFFFFFF
            out.update(
                channels=channels, sample_rate=rate, bits=bits,
                n_frames=frames,
                duration_ms=frames * 1000 // rate if rate > 0 else None,
            )
            return out
        if hdr & 0x80:  # last-block flag, no STREAMINFO seen
            return out
        pos += 4 + size
    return out


def audio_decoder(payload: bytes) -> dict:
    """Container-sniffing audio decode: RIFF/WAVE → wav_decoder, fLaC
    → flac_decoder, else octet-stream.  Behavior on WAV bytes is
    byte-identical to wav_decoder (the round-10 proven path)."""
    if payload[:4] == b"fLaC":
        return flac_decoder(payload)
    return wav_decoder(payload)


def build_flac(doc_id: int, body: bytes) -> bytes:
    """Deterministic synthetic FLAC builder: a 42-byte ``fLaC`` +
    last-flagged STREAMINFO block whose parameters are pure functions
    of doc_id — channels = doc_id%2 + 1, rate = 8000·(doc_id%5 + 1),
    bits = 8·(doc_id%3 + 1), total samples = doc_id % 100000 — with
    ``body`` as trailing frame bytes, so an SQL oracle can restate
    every field while the decode path must actually unpack the
    big-endian bit fields."""
    channels = doc_id % 2 + 1
    rate = 8000 * (doc_id % 5 + 1)
    bits = 8 * (doc_id % 3 + 1)
    frames = doc_id % 100000
    u = (
        (rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | frames
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 6                   # min/max framesize (unset)
        + u.to_bytes(8, "big")
        + b"\x00" * 16                  # unset MD5
    )
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo + body


def containerize_flac(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → structurally valid FLAC payloads (see build_flac)."""
    return _containerize(df, build_flac, text_col, id_col)


def build_wav(doc_id: int, body: bytes) -> bytes:
    """Deterministic synthetic WAV builder (fixture side of the audio
    round trip): a structurally valid 44-byte canonical header whose
    parameters are pure functions of doc_id — channels = doc_id%2 + 1,
    rate = 8000·(doc_id%5 + 1), bits = 8·(doc_id%3 + 1) — with
    ``body`` as the data chunk, so an SQL oracle can restate every
    field while the decode path must actually parse the bytes."""
    channels = doc_id % 2 + 1
    rate = 8000 * (doc_id % 5 + 1)
    bits = 8 * (doc_id % 3 + 1)
    block_align = channels * bits // 8
    byte_rate = rate * block_align
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block_align, bits)
        + b"data"
        + struct.pack("<I", len(body))
    )
    return hdr + body


def containerize_audio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → structurally valid WAV payloads (see build_wav)."""
    return _containerize(df, build_wav, text_col, id_col)


def decode_audio_meta(
    df: DataFrame,
    decoder: Decoder | None = None,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio-metadata extraction as a map-only ``mapInPandas`` batch
    operator (default = the REAL container-sniffing audio_decoder:
    RIFF/WAVE + FLAC STREAMINFO); only typed metadata leaves Python,
    payload bytes never shuffle."""
    decoder = decoder or audio_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                meta = decoder(b)
                out.append(
                    {
                        "doc_id": did,
                        "n_bytes": len(b),
                        "format": meta["format"],
                        "channels": meta["channels"],
                        "sample_rate": meta["sample_rate"],
                        "bits": meta["bits"],
                        "n_frames": meta["n_frames"],
                        "duration_ms": meta["duration_ms"],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )
