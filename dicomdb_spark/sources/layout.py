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

from pyspark.sql import DataFrame


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
