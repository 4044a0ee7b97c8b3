"""S13 — per-series tar sink (do_results_DB.py:404-417).

The reference's ``--create_tar`` emitted ``tar -czf <serie>.tar.gz
<dir>`` shell commands per series — command GENERATION, not
execution, exactly the S9 shell-script-sink pattern.  Both halves
live here:

* :func:`tar_commands` — the relational half: one command row per
  series, written with the S9 text sink; auditable, idempotent,
  scale-free (commands are metadata).
* :func:`write_tar_archives` — a direct executor-side writer for
  environments without a shell step: per-series stdlib ``tarfile``
  archives via ``applyInPandas``, bytes never entering a shuffle.
  Deterministic (mtime pinned, name-sorted members) so re-archiving
  identical content yields identical bytes.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAR_SINK_SCHEMA = T.StructType(
    [
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("tar_path", T.StringType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def tar_commands(
    series: DataFrame,
    out_dir: str,
    uid_col: str = "SeriesInstanceUID",
    dir_col: str = "serie_dir",
) -> DataFrame:
    """One ``tar -czf`` command per series (do_results_DB.py:404-417),
    ready for ``sources.jdbc.render_remediation_scripts``."""
    safe = F.regexp_replace(F.col(uid_col), r"[^A-Za-z0-9_.-]", "_")
    return series.select(
        F.col(uid_col),
        F.concat(
            F.lit("tar -czf "),
            F.lit(out_dir.rstrip("/") + "/"),
            safe,
            F.lit(".tar.gz -C "),
            F.col(dir_col),
            F.lit(" ."),
        ).alias("command"),
    )


def tar_gz_bytes(items) -> bytes:
    """Deterministic ``.tar.gz`` bytes from (name, content) pairs.
    gzip mtime pinned to 0 ("w:gz" would embed wall-clock time in the
    stream header) and member mtime 0, so identical content yields
    identical BYTES — the same idempotence discipline as the NIfTI
    sink.  Caller orders the pairs (name-sorted at the call sites)."""
    buf = io.BytesIO()
    with gzip.GzipFile(
        filename="", mode="wb", fileobj=buf, mtime=0
    ) as gz, tarfile.open(fileobj=gz, mode="w") as tf:
        for name, content in items:
            data = bytes(content)
            info = tarfile.TarInfo(name=str(name).lstrip("/"))
            info.size = len(data)
            info.mtime = 0  # deterministic bytes
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def read_tar_gz(blob: bytes):
    """Inverse of :func:`tar_gz_bytes` — [(name, size, content)] in
    archive order (round-trip support)."""
    out = []
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tf:
        for m in tf.getmembers():
            f = tf.extractfile(m)
            out.append((m.name, int(m.size), f.read() if f else b""))
    return out


def write_tar_archives(files: DataFrame, out_dir: str) -> DataFrame:
    """Archive each series' files into ``<uid>.tar.gz`` on shared
    storage.  Input columns: SeriesInstanceUID, path, content
    (binary).  Returns one audit row per archive."""

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("path", kind="mergesort")
        sid = str(pdf["SeriesInstanceUID"].iloc[0])
        safe = "".join(c if c.isalnum() or c in "_.-" else "_" for c in sid)
        os.makedirs(out_dir, exist_ok=True)
        tar_path = os.path.join(out_dir, f"{safe}.tar.gz")
        blob = tar_gz_bytes(zip(pdf["path"], pdf["content"]))
        with open(tar_path, "wb") as raw:
            raw.write(blob)
        return pd.DataFrame(
            [
                {
                    "SeriesInstanceUID": sid,
                    "tar_path": tar_path,
                    "n_members": len(pdf),
                    "n_bytes": int(os.path.getsize(tar_path)),
                }
            ]
        )

    return files.groupBy("SeriesInstanceUID").applyInPandas(
        one, schema=TAR_SINK_SCHEMA
    )


# UDF closures ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
