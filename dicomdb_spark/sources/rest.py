"""HTTP/REST sink (SURVEY.md §2 S8).

The reference POSTed each exam record to a reservation API with
range/log/token/test params (Cenir_DB.py:137-158; do_dicom.py:101-128).
Spark shape: render the JSON payload as a COLUMN (pure, testable,
JVM-side via to_json — this is also F9), then ship per partition with
one session per partition, never per row.

``requests`` may be absent in minimal environments → import-gated at
call time; the payload rendering has no dependency.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def render_payload(cols: Sequence[str], extra: dict[str, str] | None = None) -> Column:
    """F9/S8 — one JSON document per row from the named columns plus
    constant request params (the reference's range/log/token/test)."""
    fields = [F.col(c) for c in cols]
    names = list(cols)
    for k, v in (extra or {}).items():
        fields.append(F.lit(v))
        names.append(k)
    return F.to_json(F.struct(*[f.alias(n) for f, n in zip(fields, names)]))


def post_partition_writer(url: str, payload_col: str = "payload", timeout_s: int = 30):
    """foreachPartition callable POSTing each row's payload.

    One HTTP session per partition; failures raise so Spark retries
    the task (at-least-once — absorbed downstream exactly like the
    reference's upsert idempotence)."""

    def write(rows: Iterator[Row]) -> None:
        import requests  # gated: absent in minimal envs

        with requests.Session() as s:
            for row in rows:
                resp = s.post(url, data=row[payload_col], timeout=timeout_s)
                resp.raise_for_status()

    return write
