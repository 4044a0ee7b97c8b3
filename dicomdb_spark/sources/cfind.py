"""S10 — DICOM network source (C-FIND) as an injectable client seam
(do_results_DB.py:263-347; association setup :349-402).

The reference walked the hierarchical PATIENT → STUDY → SERIES query
model against two scanner AEs (Prisma/Verio) with netdicom, collecting
``NumberOfSeriesRelatedInstances`` per series to reconcile against the
on-disk file counts (operator J9/R4).

No DICOM network stack exists in this container, so — exactly like the
HeaderParser and Decoder seams — the transport is INJECTABLE:

* ``CFindClient``: ``(level, keys) -> list[dict]``.  The production
  implementation wraps pynetdicom or shells out to ``findscu``
  (:func:`findscu_command` renders the exact CLI the reference's
  setup implies); tests inject a deterministic fake.
* :func:`cfind_series_counts` distributes the per-study queries with
  ``mapInPandas`` — each executor task holds ONE association and
  walks its batch of studies, the right unit of parallelism for a
  PACS (associations are expensive, queries inside one are cheap).

The result is a plain DataFrame (study, series, remote count) that
feeds J9's scanner↔disk reconciliation join — the analytic half that
was always in scope.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# (level, match keys) -> identifier dicts
CFindClient = Callable[[str, dict], list[dict]]

CFIND_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("StudyInstanceUID", T.StringType()),
        T.StructField("SeriesInstanceUID", T.StringType()),
        T.StructField("SeriesNumber", T.IntegerType()),
        T.StructField("NumberOfSeriesRelatedInstances", T.IntegerType()),
        T.StructField("ae_title", T.StringType()),
    ]
)


def findscu_command(
    host: str,
    port: int,
    aet: str,
    aec: str,
    study_uid: str,
) -> str:
    """The ``findscu`` CLI for one SERIES-level query under a study —
    the subprocess path when a DICOM toolkit exists on the executors
    (association parameters per do_results_DB.py:349-402)."""
    return (
        f"findscu -S -aet {aet} -aec {aec} "
        f'-k QueryRetrieveLevel=SERIES -k StudyInstanceUID={study_uid} '
        f"-k SeriesInstanceUID -k SeriesNumber "
        f"-k NumberOfSeriesRelatedInstances {host} {port}"
    )


def cfind_series_counts(
    studies: DataFrame,
    client: CFindClient,
    ae_title: str = "PRISMA",
    study_col: str = "StudyInstanceUID",
) -> DataFrame:
    """SERIES-level C-FIND fan-out: one identifier query per study in
    ``studies``, executed batch-at-a-time on the executors through the
    injected ``client``.  Returns per-series remote instance counts —
    the left side of the J9 scanner↔disk count join."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CFIND_SERIES_SCHEMA.fields]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for study_uid in pdf[study_col]:
                for rec in client(
                    "SERIES", {"StudyInstanceUID": str(study_uid)}
                ):
                    out["StudyInstanceUID"].append(str(study_uid))
                    out["SeriesInstanceUID"].append(
                        rec.get("SeriesInstanceUID")
                    )
                    sn = rec.get("SeriesNumber")
                    out["SeriesNumber"].append(
                        int(sn) if sn is not None else None
                    )
                    cnt = rec.get("NumberOfSeriesRelatedInstances")
                    out["NumberOfSeriesRelatedInstances"].append(
                        int(cnt) if cnt is not None else None
                    )
                    out["ae_title"].append(ae_title)
            yield pd.DataFrame(out, columns=cols)

    return studies.select(study_col).distinct().mapInPandas(
        run, schema=CFIND_SERIES_SCHEMA
    )


# UDF closures ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
