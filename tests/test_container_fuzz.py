"""Property tests for the stdlib media-container codecs (rounds
10-11): build→decode round trips over the full parameter space, and
never-throws robustness on arbitrary byte soup.  Companion to
test_codec_properties.py (tar/xlsx/NIfTI/DICOM) for the image/audio
family."""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from dicomdb_spark.llm.multimodal import (
    audio_decoder,
    build_container,
    build_container_v2,
    build_flac,
    build_wav,
    flac_decoder,
    stdlib_decoder,
    wav_decoder,
)


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=2**31 - 1),
       body=st.binary(max_size=64))
def test_image_container_roundtrip_any_doc_id(doc_id, body):
    """All 8 image variants (PNG/GIF/BMP/JPEG + TIFF-II/TIFF-MM/
    VP8X/VP8L) decode back to the builder's dims for ANY doc_id."""
    w = (doc_id % 1024) + 1
    h = ((doc_id * 7) % 1024) + 1
    for builder in (build_container, build_container_v2):
        m = stdlib_decoder(builder(doc_id, body))
        assert (m["width"], m["height"]) == (w, h), (builder.__name__, doc_id)


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=2**31 - 1),
       body=st.binary(max_size=64))
def test_audio_container_roundtrip_any_doc_id(doc_id, body):
    for builder, fmt in ((build_wav, "audio/wav"), (build_flac, "audio/flac")):
        m = audio_decoder(builder(doc_id, body))
        assert m["format"] == fmt
        assert m["channels"] == doc_id % 2 + 1
        assert m["sample_rate"] == 8000 * (doc_id % 5 + 1)
        assert m["bits"] == 8 * (doc_id % 3 + 1)


@settings(max_examples=300, deadline=None)
@given(data=st.binary(max_size=128))
def test_decoders_never_throw_on_byte_soup(data):
    """Arbitrary bytes must degrade to a metadata dict, never raise —
    the one-corrupt-file-cannot-kill-an-Arrow-batch contract."""
    for dec in (stdlib_decoder, wav_decoder, flac_decoder, audio_decoder):
        out = dec(data)
        assert isinstance(out, dict) and "format" in out


@settings(max_examples=200, deadline=None)
@given(data=st.binary(min_size=0, max_size=96),
       magic=st.sampled_from(
           [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8", b"II",
            b"MM", b"RIFF", b"fLaC"]))
def test_decoders_never_throw_on_magic_prefixed_soup(data, magic):
    """Byte soup BEHIND a valid magic exercises the deep parser paths
    (IFD walks, chunk walks, marker scans) — still never raises."""
    payload = magic + data
    for dec in (stdlib_decoder, audio_decoder):
        out = dec(payload)
        assert isinstance(out, dict) and "format" in out


@settings(max_examples=100, deadline=None)
@given(w=st.integers(min_value=1, max_value=0x3FFF),
       h=st.integers(min_value=1, max_value=0x3FFF))
def test_webp_vp8l_bit_packing_full_range(w, h):
    """VP8L packs width-1/height-1 as 14-bit LSB-first fields; check
    the unpack across the entire 14-bit range, not just the fixture's
    doc_id-derived dims."""
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits)
    b = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload))
        + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    )
    m = stdlib_decoder(b)
    assert (m["width"], m["height"]) == (w, h)


@settings(max_examples=100, deadline=None)
@given(w=st.integers(min_value=1, max_value=2**24),
       h=st.integers(min_value=1, max_value=2**24))
def test_webp_vp8x_u24_full_range(w, h):
    payload = (
        b"\x00\x00\x00\x00"
        + struct.pack("<I", w - 1)[:3]
        + struct.pack("<I", h - 1)[:3]
    )
    b = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload))
        + b"WEBP" + b"VP8X" + struct.pack("<I", len(payload)) + payload
    )
    m = stdlib_decoder(b)
    assert (m["width"], m["height"]) == (w, h)
