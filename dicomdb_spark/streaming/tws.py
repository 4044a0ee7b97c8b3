"""transformWithState (Spark 4) twin of the applyInPandasWithState
operators — the successor stateful API: typed per-key state handles
(value/list/map state), timers, and a processor object instead of a
closure.

Only `stateful_distinct` is twinned here (the canonical shape); the
semantics contract is identical to streaming/stateful.py and the test
asserts both APIs emit the same rows on the same stream.  Requires the
RocksDB state-store provider
(`spark.sql.streaming.stateStore.providerClass` →
`...state.RocksDBStateStoreProvider`), which transformWithState
mandates; the session factory leaves the default HDFS-backed store for
everything else, so tests set it per-run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class _DistinctProcessor(StatefulProcessor):
    """Emit each key's first payload once across all micro-batches."""

    def __init__(self, cols: list[str]):
        self._cols = cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        first = None
        for pdf in rows:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][self._cols]
        self._seen.update((True,))
        if first is not None:
            yield first

    def close(self) -> None:
        pass


def stateful_distinct_tws(
    events: DataFrame,
    key_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """transformWithStateInPandas twin of
    streaming.stateful.stateful_distinct — same exactly-once-per-key
    emission, expressed against the typed-state API."""
    out_schema = T.StructType(
        [events.schema[key_col]] + [events.schema[c] for c in payload_cols]
    )
    cols = [key_col, *payload_cols]
    return events.select(*cols).groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_DistinctProcessor(cols),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


# UDF closures in this module must ship by value (see package __init__)
import sys as _sys  # noqa: E402

from dicomdb_spark import register_for_udf_pickling as _reg  # noqa: E402

_reg(_sys.modules[__name__])
