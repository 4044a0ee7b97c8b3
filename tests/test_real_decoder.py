"""PIL-gated proof of the injectable image-decoder seam.

``decode_image_meta`` (llm/multimodal.py) runs a deterministic fake
decoder in this container; this test injects a REAL PIL-backed decoder
through the same ``decoder=`` parameter and drives the unchanged
mapInPandas plumbing over real PNG bytes — skip-gated, green wherever
PIL exists.
"""

from __future__ import annotations

import hashlib
import io

import pytest

from dicomdb_spark.llm.multimodal import decode_image_meta

Image = pytest.importorskip("PIL.Image", reason="PIL not installed")


def pil_decoder(payload: bytes) -> dict:
    img = Image.open(io.BytesIO(payload))
    return {
        "format": (img.format or "unknown").lower(),
        "width": img.width,
        "height": img.height,
    }


def _png_bytes(w: int, h: int) -> bytes:
    img = Image.new("RGB", (w, h), (w % 256, h % 256, 7))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_meta_with_real_pil_decoder(spark):
    payloads = [(1, _png_bytes(32, 16)), (2, _png_bytes(100, 7))]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in payloads],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_image_meta(df, decoder=pil_decoder).collect()}
    assert rows[1]["format"] == "png"
    assert (rows[1]["width"], rows[1]["height"]) == (32, 16)
    assert (rows[2]["width"], rows[2]["height"]) == (100, 7)
    # the JVM-side sha2 checksum covers the raw payload bytes
    assert rows[1]["checksum"] == hashlib.sha256(payloads[0][1]).hexdigest()
    assert rows[1]["n_bytes"] == len(payloads[0][1])
