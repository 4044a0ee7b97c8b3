"""Custom stateful streaming operators (applyInPandasWithState).

The reference's at-least-once redelivery was absorbed by DB-side
upserts; a streaming engine can absorb it earlier with keyed state.
``stateful_distinct`` is the canonical custom operator: emit each key
exactly once across micro-batches, remembering seen keys in the state
store.  The same skeleton (group → pandas batches → GroupState)
carries any per-key streaming logic — running aggregates, sessions
with custom close conditions, in-flight exam assembly.

State is per key-group and partitioned by the shuffle — at scale the
state store shards across executors; a timeout (`state_ttl_minutes`)
bounds it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_distinct(
    events: DataFrame,
    key_col: str,
    payload_cols: list[str],
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Exactly-once-per-key emission over an at-least-once stream.

    First occurrence of a key emits its payload; every redelivery is
    dropped while state lives.  Output schema = key + payload columns.
    """
    out_schema = T.StructType(
        [events.schema[key_col]] + [events.schema[c] for c in payload_cols]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = [key_col, *payload_cols]
    ttl = GroupStateTimeout.ProcessingTimeTimeout if state_ttl_minutes else GroupStateTimeout.NoTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists and state.get[0]
        first = None
        for pdf in pdfs:
            if not already and first is None and len(pdf):
                first = pdf.iloc[[0]][cols]
        if not already:
            state.update((True,))
            if state_ttl_minutes:
                state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
            if first is not None:
                yield first

    return events.select(*cols).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=ttl,
    )


# UDF closures in this module must ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])

# Operational note: the state store shards one instance per
# spark.sql.shuffle.partitions; size that conf for the stream (the
# engine's session factory defaults it to the core count — a default
# 200-partition session pays ~25x state-commit overhead per batch on
# a laptop-sized stream).
