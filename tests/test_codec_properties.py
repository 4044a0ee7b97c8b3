"""Property-based round-trips for the byte codecs (tar, xlsx, NIfTI).

The fixture queries (s4/s12/s13 roundtrips) pin driver-checkable
behavior on structured inputs; these properties hammer the same codecs
with Hypothesis-generated adversarial content — XML-special
characters, empty payloads, random int16 volumes, name edge cases —
where hand-written fixtures have blind spots.  Pure Python (no Spark
session), so the whole module runs in seconds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# member names: portable relative path chars (tarfile length limit 100
# for plain names; stay under it and avoid '..' path tricks)
_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.-",
    min_size=1,
    max_size=40,
).filter(lambda s: s not in (".", "..") and not s.startswith("-"))


@given(
    st.lists(
        st.tuples(_name, st.binary(max_size=200)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_tar_roundtrip_and_determinism(items):
    from dicomdb_spark.sources.tar_sink import read_tar_gz, tar_gz_bytes

    blob1 = tar_gz_bytes(items)
    blob2 = tar_gz_bytes(list(items))
    # byte determinism: identical input → identical archive bytes
    assert blob1 == blob2
    members = read_tar_gz(blob1)
    assert [(n, d) for n, _s, d in members] == [
        (n, bytes(d)) for n, d in items
    ]
    assert all(s == len(d) for _n, s, d in members)


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.integers(min_value=-(2**53), max_value=2**53),
                st.text(
                    alphabet=st.characters(
                        codec="utf-8",
                        exclude_categories=("Cc", "Cs"),  # no control chars
                    ),
                    max_size=30,
                ),
                st.none(),
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_xlsx_roundtrip_values(rows):
    """write_xlsx → read_xlsx_rows preserves every cell: ints
    canonically, strings verbatim (including XML-special &<>"'),
    None as absent."""
    from dicomdb_spark.sources.xlsx import read_xlsx_rows, write_xlsx

    blob = write_xlsx({"sheet1": rows})
    parsed = read_xlsx_rows(blob)
    assert len(parsed) == len(rows)
    for (sheet, rnum, cells), (i, row) in zip(parsed, enumerate(rows, 1)):
        assert sheet == "sheet1" and rnum == i
        # reader emits a dense list up to the right-most populated cell
        for j, val in enumerate(row):
            got = cells[j] if j < len(cells) else None
            if val is None:
                assert got is None
            elif isinstance(val, int):
                assert got == str(val)
            else:
                # empty string cells read back as None (no text node)
                assert got == (val or None)


@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_nifti_roundtrip_identity(nx, ny, nz, seed):
    import numpy as np

    from dicomdb_spark.sources.nifti import decode_nifti1, encode_nifti1

    rng = np.random.default_rng(seed)
    vol = rng.integers(-32768, 32767, size=(nx, ny, nz), dtype=np.int16)
    blob1 = encode_nifti1(vol)
    blob2 = encode_nifti1(vol.copy())
    assert blob1 == blob2  # byte determinism (gzip mtime pinned)
    dec = decode_nifti1(blob1)
    assert dec.shape == (nx, ny, nz)
    assert (dec == vol).all()


# --- Part-10 DICOM + CSA2 codec properties ------------------------------

# DICOM string values: printable ASCII minus backslash (the multi-value
# separator) with no leading/trailing whitespace (PS3.5 padding strips)
_dicom_text = (
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=30,
    )
    .filter(lambda s: "\\" not in s)
)


@given(
    uid=st.from_regex(r"[0-9.]{1,30}", fullmatch=True).filter(
        lambda s: s.strip(".") != ""
    ),
    study=st.from_regex(r"[0-9.]{1,30}", fullmatch=True),
    sn=st.integers(min_value=0, max_value=9999),
    inst=st.integers(min_value=0, max_value=99999),
    te=st.integers(min_value=0, max_value=500),
    manu=_dicom_text,
    seq=_dicom_text,
    itype=st.lists(_dicom_text, min_size=1, max_size=4),
    explicit=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_part10_header_roundtrip(
    uid, study, sn, inst, te, manu, seq, itype, explicit
):
    """encode_minimal_dicom → minimal_parser preserves every field in
    BOTH transfer syntaxes (explicit and implicit VR little-endian),
    including odd-length values that require PS3.5 §6.2 padding."""
    from dicomdb_spark.sources.dicom import (
        _TS_EXPLICIT_LE,
        _TS_IMPLICIT_LE,
        encode_minimal_dicom,
        minimal_parser,
    )

    fields = {
        "SeriesInstanceUID": uid,
        "StudyInstanceUID": study,
        "SeriesNumber": sn,
        "InstanceNumber": inst,
        "EchoTime": te,
        "Manufacturer": manu,
        "SequenceName": seq,
        "ImageType": itype,
        "AcquisitionDate": "20240101",
        "AcquisitionTimeRaw": "120000.000000",
    }
    ts = _TS_EXPLICIT_LE if explicit else _TS_IMPLICIT_LE
    out = minimal_parser(encode_minimal_dicom(fields, transfer_syntax=ts))
    assert out["SeriesInstanceUID"] == uid
    assert out["StudyInstanceUID"] == study
    assert out["SeriesNumber"] == sn
    assert out["InstanceNumber"] == inst
    assert out["EchoTime"] == float(te)
    assert out["AcquisitionDate"] == "20240101"
    assert out["ImageType"] == itype
    csa = out["csa_meta"] or {}
    assert csa.get("Manufacturer") == manu
    assert csa.get("SequenceName") == seq


@given(
    st.dictionaries(
        keys=st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
            min_size=1,
            max_size=40,
        ),
        values=st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_csa2_roundtrip(tags):
    """encode_csa2 → parse_csa2 preserves every (name, value) pair —
    the Siemens private-header path the reference depended on for
    SequenceName/FlipAngle fallbacks (Exam_info.py:533-554)."""
    from dicomdb_spark.sources.dicom import encode_csa2, parse_csa2

    assert parse_csa2(encode_csa2(tags)) == tags
