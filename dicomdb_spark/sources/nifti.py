"""S12 — NIfTI-1 sink + sidecar JSON (Exam_info.py:962-1057).

The reference stacked per-series DICOM slices into ``.nii.gz`` volumes
via nibabel, with three semantics this sink preserves exactly:

* deterministic artifact naming from serie metadata
  (``Exam_info.py:970-988``),
* **skip-if-exists + content-compare** idempotence: an existing file
  with identical voxel content is skipped; same name but different
  bytes flags ``duplicate_but_different`` (``:999-1025``),
* a ``dic_param_*.json`` sidecar carrying the acquisition metadata
  (``:1042-1054``).

nibabel is not in this container, so the writer emits the NIfTI-1
format directly — the 348-byte header is public (NIfTI-1 C struct,
https://nifti.nimh.nih.gov/nifti-1) and needs only ``struct`` +
``gzip`` + numpy.  Execution is ``applyInPandas`` per series: each
group materializes ONE volume on an executor and writes it to shared
storage; only the (path, status) audit row returns to the plan — the
voxel bytes never enter a shuffle (the multimodal rule).
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

NIFTI_SINK_SCHEMA = T.StructType(
    [
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("nifti_path", T.StringType()),
        T.StructField("json_path", T.StringType()),
        T.StructField("status", T.StringType()),  # written|skipped_identical|duplicate_but_different
        T.StructField("n_slices", T.IntegerType()),
    ]
)


def nifti1_header(dim: tuple[int, int, int], voxdim: tuple[float, float, float]) -> bytes:
    """The 348-byte NIfTI-1 header for a 3-D int16 volume (public
    format, single-file ``.nii`` layout: magic ``n+1``, vox_offset
    352)."""
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)  # sizeof_hdr
    struct.pack_into("<8h", hdr, 40, 3, dim[0], dim[1], dim[2], 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)  # datatype: int16
    struct.pack_into("<h", hdr, 72, 16)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, voxdim[0], voxdim[1], voxdim[2], 1, 1, 1, 1)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    hdr[344:348] = b"n+1\x00"
    return bytes(hdr)


def encode_nifti1(volume: np.ndarray, voxdim=(1.0, 1.0, 1.0)) -> bytes:
    """volume (x, y, z) int16 → gzipped single-file NIfTI-1 bytes.
    mtime is pinned to 0 in the gzip header so identical voxels give
    identical BYTES — the content-compare can be a byte compare."""
    vol = np.ascontiguousarray(volume.astype("<i2"), dtype="<i2")
    raw = (
        nifti1_header(vol.shape, voxdim)
        + b"\x00" * 4  # extender
        + vol.tobytes(order="F")
    )
    return gzip.compress(raw, mtime=0)


def decode_nifti1(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_nifti1` (round-trip test support)."""
    raw = gzip.decompress(blob)
    ndim, nx, ny, nz = struct.unpack_from("<4h", raw, 40)
    assert ndim == 3
    vox_offset = int(struct.unpack_from("<f", raw, 108)[0])
    arr = np.frombuffer(raw, dtype="<i2", offset=vox_offset, count=nx * ny * nz)
    return arr.reshape((nx, ny, nz), order="F")


def write_nifti_volumes(
    slices: DataFrame,
    out_dir: str,
    voxdim=(1.0, 1.0, 1.0),
) -> DataFrame:
    """S12 — per-series NIfTI + sidecar write with the reference's
    idempotence semantics.

    Input columns: SeriesInstanceUID, InstanceNumber (slice order),
    pixels (binary: one slice's int16 row-major plane), rows, cols,
    and meta_json (the sidecar payload, identical within a series).
    Returns one audit row per series; re-running over the same input
    yields all-``skipped_identical``.
    """

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("InstanceNumber", kind="mergesort")
        sid = str(pdf["SeriesInstanceUID"].iloc[0])
        rows = int(pdf["rows"].iloc[0])
        cols = int(pdf["cols"].iloc[0])
        planes = [
            np.frombuffer(bytes(b), dtype="<i2").reshape((rows, cols))
            for b in pdf["pixels"]
        ]
        vol = np.stack(planes, axis=-1)  # (x, y, z)
        blob = encode_nifti1(vol, voxdim)
        safe = sid.replace(".", "_")
        nii = os.path.join(out_dir, f"s_{safe}.nii.gz")
        sidecar = os.path.join(out_dir, f"dic_param_{safe}.json")
        # skip-if-exists + content-compare (Exam_info.py:999-1025)
        if os.path.exists(nii):
            with open(nii, "rb") as fh:
                status = (
                    "skipped_identical"
                    if fh.read() == blob
                    else "duplicate_but_different"
                )
            # crash-recovery backfill: a prior run dying between the
            # .nii.gz write and the sidecar write would otherwise leave
            # the sidecar permanently missing (every re-run skips)
            if status == "skipped_identical" and not os.path.exists(sidecar):
                with open(sidecar, "w") as fh:
                    json.dump(
                        json.loads(pdf["meta_json"].iloc[0]), fh, sort_keys=True
                    )
        else:
            os.makedirs(out_dir, exist_ok=True)
            with open(nii, "wb") as fh:
                fh.write(blob)
            with open(sidecar, "w") as fh:
                json.dump(json.loads(pdf["meta_json"].iloc[0]), fh, sort_keys=True)
            status = "written"
        return pd.DataFrame(
            [
                {
                    "SeriesInstanceUID": sid,
                    "nifti_path": nii,
                    "json_path": sidecar,
                    "status": status,
                    "n_slices": len(pdf),
                }
            ]
        )

    return slices.groupBy("SeriesInstanceUID").applyInPandas(
        one, schema=NIFTI_SINK_SCHEMA
    )


# UDF closures ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
