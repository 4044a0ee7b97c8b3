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
