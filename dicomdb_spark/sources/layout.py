"""Data-layout writer: range-partitioned, sorted parquet for data skipping.

At 100 TB the cheapest predicate is the one that never reads a file:
parquet row-group min/max statistics prune scans when the data is
laid out sorted on the filter column.  ``write_sorted`` is the
engine's layout step — repartitionByRange (so each FILE covers a
disjoint key range) + sortWithinPartitions (so row groups within a
file are tight).

``file_column_ranges`` reads back the per-file min/max from the
parquet footers (pyarrow) — used by tests to PROVE the layout
property instead of assuming it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Map an integer column into [0, 2^bits) by its (min, max) range.

    Pure integer arithmetic — ``floor((x − mn)·2^bits / (mx − mn + 1))``
    — so the same expression replays exactly in any engine; mn/mx come
    from a 1-row broadcast aggregate (never a per-row window).
    """
    span = mx - mn + F.lit(1)
    return F.floor(((col - mn) * F.lit(2**bits)) / span).cast("long")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton / Z-order interleaving of pre-bucketized dimensions
    (public technique: Morton 1966; used by every lakehouse layout
    optimizer for multi-dimensional data skipping).

    Each input must already be a non-negative int < 2^bits (see
    :func:`bucketize`).  Bit b of dimension i lands at position
    ``b·ndims + i``, so a sort by the key interleaves all dimensions —
    per-file min/max footer ranges then stay tight on EVERY dimension,
    where a lexicographic sort keeps them tight only on the first.
    Pure bitwise Catalyst expressions (shift/and/or), whole-stage
    codegen friendly, and bit-replayable in SQL.
    """
    n = len(cols)
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, b * n + i))
    return acc


def write_sorted(df: DataFrame, path: str, cols: list[str], n_files: int = 8) -> None:
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file, from footer stats."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def ranges_are_disjoint(ranges: list[tuple]) -> bool:
    """True when the per-file key ranges do not overlap — the property
    that lets a point/range predicate skip all but one file."""
    for i, (_, hi) in enumerate(sorted(ranges)[:-1]):
        lo_next = sorted(ranges)[i + 1][0]
        if hi > lo_next:
            return False
    return True
