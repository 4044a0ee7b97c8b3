"""Grouped-map operators (SURVEY.md §2 U3/U4) — the pandas-UDF surface.

These are the only operators whose semantics genuinely exceed SQL:
per-stack assembly with congruence validation and the per-series
numeric bvec kernel.  Both run as ``applyInPandas`` — one Arrow batch
per group, numpy inside, typed StructType out.  Group keys are the T1
stack tuple, so the shuffle partitions by stack and each group fits in
memory by construction (a stack is one series' files).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# T1 stack grouping keys (Exam_info.py:881-922; EchoTime appended for
# fieldmaps per the comment at :884)
STACK_KEYS = ("SeriesInstanceUID", "SeriesNumber", "EchoTime")

STACK_SCHEMA = T.StructType(
    [
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("SeriesNumber", T.IntegerType()),
        T.StructField("EchoTime", T.DoubleType()),
        T.StructField("nb_dic_file", T.IntegerType(), False),
        T.StructField("first_file", T.StringType()),
        T.StructField("last_file", T.StringType()),
        T.StructField("n_duplicates", T.IntegerType(), False),
        T.StructField("n_missing", T.IntegerType(), False),
        T.StructField("corrupt", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def _assemble_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """U3 — order by InstanceNumber, detect repeats/gaps, derive the
    per-volume duration (Exam_info.py:752-857).

    corrupt codes reproduce the reference's:
    ``%dDuplicate`` (ImageCollisionError count, :802),
    ``missingDicomFile_%d`` (:1352).
    """
    pdf = pdf.sort_values(["InstanceNumber", "path"], kind="mergesort")
    # malformed headers degrade to flags, never stage failure: rows with
    # NULL InstanceNumber are counted into corrupt instead of feeding
    # int(NaN) into np.unique
    null_inst = pdf["InstanceNumber"].isna()
    n_null_inst = int(null_inst.sum())
    key = pdf.iloc[0]
    n_total = len(pdf)
    first_file = pdf["path"].iloc[0] if n_total else None
    last_file = pdf["path"].iloc[-1] if n_total else None
    pdf = pdf[~null_inst]
    inst = pdf["InstanceNumber"].to_numpy()
    n = len(pdf)
    uniq, counts = np.unique(inst, return_counts=True)
    n_dup = int((counts - 1).sum())
    expected = int(uniq.max() - uniq.min() + 1) if n else 0
    n_missing = max(expected - len(uniq), 0)
    flags = []
    if n_dup:
        flags.append(f"{n_dup}Duplicate")
    if n_missing:
        flags.append(f"missingDicomFile_{n_missing}")
    if n_null_inst:
        flags.append(f"nullInstanceNumber_{n_null_inst}")
    # per-volume duration: t2 − t1 of the first two instants, with the
    # reference's midnight rollover guard (Exam_info.py:856-857)
    dur = None
    secs = pdf["acq_seconds"].to_numpy(dtype="float64")
    if n >= 2 and not np.isnan(secs[:2]).any():
        d = float(secs[1] - secs[0])
        if d < 0:
            d += 24 * 3600
        dur = d
    return pd.DataFrame(
        [
            {
                "SeriesInstanceUID": key["SeriesInstanceUID"],
                "SeriesNumber": key["SeriesNumber"],
                "EchoTime": key["EchoTime"],
                "nb_dic_file": n_total,
                "first_file": first_file,
                "last_file": last_file,
                "n_duplicates": n_dup,
                "n_missing": n_missing,
                "corrupt": ";".join(flags) if flags else "ok",
                "duration_s": dur,
            }
        ]
    )


def assemble_stacks(headers: DataFrame) -> DataFrame:
    """U3 — group per-file header rows into validated stacks.

    Input needs columns: STACK_KEYS + path, InstanceNumber,
    acq_seconds (seconds-of-day, from F4 parsing).  One output row per
    stack.
    """
    return headers.groupBy(*STACK_KEYS).applyInPandas(
        _assemble_one, schema=STACK_SCHEMA
    )


BVEC_SCHEMA = T.StructType(
    [
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("bvecs_rotated", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("bvals", T.ArrayType(T.DoubleType())),
    ]
)


def _rotate_bvecs_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """U4 — the bvec rotation kernel (Exam_info.py:1148-1220).

    Per 4-D diffusion series: invert the affine's rotation part, apply
    to each gradient vector, manufacturer-specific sign flips.  The
    numerics are the reference's algorithm re-expressed in batch numpy
    (inverse + diag + cross product, :1174-1209).
    """
    pdf = pdf.sort_values("volume_index", kind="mergesort")
    affine = np.array(pdf["affine"].iloc[0], dtype="float64")
    rot = affine[:6].reshape(2, 3)
    row_x, row_y = rot[0], rot[1]
    row_z = np.cross(row_x, row_y)
    R = np.stack([row_x, row_y, row_z])
    Rinv = np.linalg.inv(R)
    bvecs = np.array(list(pdf["bvec"]), dtype="float64")
    # reference builds `rotations` with the direction cosines as COLUMNS
    # and computes np.dot(bv, rotations) (Exam_info.py:1196-1209); our R
    # stacks cosines as ROWS, so rotations == R.T == Rinv (orthonormal)
    # and the matching product is bvecs @ Rinv.
    rotated = bvecs @ Rinv
    flip = np.array(pdf["flip_sign"].iloc[0], dtype="float64")
    rotated = rotated * flip
    return pd.DataFrame(
        [
            {
                "SeriesInstanceUID": pdf["SeriesInstanceUID"].iloc[0],
                "bvecs_rotated": [list(map(float, v)) for v in rotated],
                "bvals": [float(b) for b in pdf["bval"]],
            }
        ]
    )


def rotate_bvecs(series_volumes: DataFrame) -> DataFrame:
    """U4 — needs columns: SeriesInstanceUID, volume_index, bvec
    (array<double>(3)), bval, affine (array<double>(9)), flip_sign
    (array<double>(3))."""
    return series_volumes.groupBy("SeriesInstanceUID").applyInPandas(
        _rotate_bvecs_one, schema=BVEC_SCHEMA
    )


# UDF closures in this module must ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
