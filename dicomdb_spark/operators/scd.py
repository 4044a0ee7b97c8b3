"""Slowly-changing-dimension (SCD2) / CDC history maintenance.

The reference's upsert (S7) keeps only the latest row; an auditable
pipeline keeps history.  Without Delta's MERGE INTO (no lake-format
jars in this environment), SCD2 is emulated with the classic
anti-join + union + window plan (the pattern the Spark ecosystem used
pre-Delta):

1. classify the incoming snapshot against the OPEN rows (insert /
   update / noop — reuses ``merge_classify``);
2. close changed rows (set valid_to = batch timestamp);
3. append new versions (valid_from = batch ts, valid_to = NULL).

The whole step is two joins + a union — one shuffle on the business
key; applied per batch it is idempotent for identical redeliveries
(noop rows touch nothing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dicomdb_spark.operators.joins import merge_classify


def scd2_apply(
    history: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    batch_ts: str,
    float_cols: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the new history table after applying ``incoming``.

    ``history`` columns: business columns + valid_from/valid_to
    (NULL valid_to = open row).  ``incoming``: business columns only.
    """
    ts = F.lit(batch_ts).cast("timestamp_ntz")
    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    classified = merge_classify(
        open_rows.drop(valid_from, valid_to),
        incoming,
        keys,
        compare_cols,
        float_cols,
    )
    changed_keys = classified.filter(F.col("action") == "update").select(*keys)
    new_rows = classified.filter(F.col("action").isin("insert", "update")).drop(
        "action"
    )

    # close open rows whose key changed
    still_open = open_rows.join(changed_keys, list(keys), "left_anti")
    newly_closed = open_rows.join(changed_keys, list(keys), "left_semi").withColumn(
        valid_to, ts
    )
    opened = new_rows.withColumn(valid_from, ts).withColumn(
        valid_to, F.lit(None).cast("timestamp_ntz")
    )
    cols = history.columns
    return (
        closed_rows.select(*cols)
        .unionAll(newly_closed.select(*cols))
        .unionAll(still_open.select(*cols))
        .unionAll(opened.select(*cols))
    )
