"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns + typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual media decode is STUBBED (image/audio libraries are not in this
container): ``decode_image_meta`` uses a deterministic fake unless a
real decoder is injected, and ``frame_sample`` demonstrates the
row-expanding (1 video → N frames) UDTF shape.

At 100 TB the rules encoded here: binary payloads never enter a
shuffle (metadata is extracted map-side, then only metadata moves);
batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so one partition's payloads never materialize at once.
"""

from __future__ import annotations

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
    """Deterministic stand-in for an image decoder: derives plausible
    metadata purely from the bytes.  Replace with PIL/libvips via the
    ``decoder=`` parameter in production."""
    n = len(payload)
    return {
        "format": "fake/raw",
        "width": (n % 1024) + 1,
        "height": ((n * 7) % 1024) + 1,
    }


def binarize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Make an opaque binary payload column from testdata (stand-in for
    real media bytes) — UTF-8 encode is exact and portable."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_meta(
    df: DataFrame,
    decoder: Decoder = fake_decoder,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode/feature-extract as a ``mapInPandas`` batch operator.

    Checksum via sha2 happens JVM-side BEFORE Python (cheap, codegen);
    only the decode itself crosses into pandas.
    """
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
