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


def stateful_sessions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: int,
) -> DataFrame:
    """Gap-close sessionization as a CUSTOM stateful operator — the
    applyInPandasWithState twin of the batch lag-flag sessionizer
    (operators/windows.sessionize_by_gap) for when session_window's
    fixed semantics aren't enough (custom close conditions, per-key
    session payloads, side effects on close).

    State per key: (session_start, last_ts, n_events) as epoch
    microseconds.  An event arriving more than ``gap_sec`` after
    last_ts CLOSES the running session (emits one row) and opens a new
    one; the final open session stays in state — a terminating test
    stream never emits it, exactly like a live stream wouldn't.
    Events are processed in (ts) order within each micro-batch; cross-
    batch order is the file-source arrival order (production streams
    pair this with watermarked ingestion).

    Output: (key, session_start, session_end, n_events).
    """
    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    gap_us = gap_sec * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            for ts in pdf[ts_col].sort_values():
                t_us = ts.value // 1000
                if start_us is None:
                    start_us, last_us, n = t_us, t_us, 1
                elif t_us - last_us > gap_us:
                    closed.append((key[0], start_us, last_us, n))
                    start_us, last_us, n = t_us, t_us, 1
                else:
                    last_us, n = t_us, n + 1
        if start_us is not None:
            state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.select(key_col, ts_col).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_lww(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    op_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """CDC last-writer-wins compaction as a custom stateful operator —
    the streaming twin of the batch ``cdc_last_writer_state`` query:
    per key, state holds the (ts, tiebreak)-max op seen so far plus
    the applied-op count; each micro-batch that touches a key emits
    the key's CURRENT winner row (tombstones included — the consumer
    filters, exactly like reading a compacted changelog topic).

    Out-of-order and redelivered events are absorbed by the total
    (ts, tiebreak) order — a late event that loses the comparison
    cannot flip the state, so replaying any permutation of the log in
    any micro-batch split converges to the same final state as the
    batch window (proven event-for-event in tests).

    Output: (key, last_ts, last_op, last_value, ops_applied);
    ops_applied is monotone per key, so the row with the max count IS
    the final state."""
    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("last_ts", events.schema[ts_col].dataType),
            T.StructField("last_op", T.StringType()),
            T.StructField("last_value", T.DoubleType()),
            T.StructField("ops_applied", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_ns", T.LongType()),
            T.StructField("tie", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("val", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ts_ns, tie, op, val, n = (
            state.get if state.exists else (None, None, None, None, 0)
        )
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            for t, k, o, v in zip(
                pdf[ts_col].astype("int64"),
                pdf[tie_col],
                pdf[op_col],
                pdf[value_col],
            ):
                n += 1
                if ts_ns is None or (int(t), int(k)) > (ts_ns, tie):
                    ts_ns, tie, op, val = int(t), int(k), str(o), float(v)
        if touched:
            state.update((ts_ns, tie, op, val, n))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "last_ts": [pd.Timestamp(ts_ns, unit="ns")],
                    "last_op": [op],
                    "last_value": [val],
                    "ops_applied": [n],
                }
            )

    return events.select(
        key_col, ts_col, tie_col, op_col, value_col
    ).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_zscore(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    frame: int = 20,
    threshold: float = 2.5,
) -> DataFrame:
    """Streaming twin of the batch rolling z-score window
    (registry.w_anomaly_zscore): per key, each event is scored against
    the trailing ``frame`` events' mean/std, with the trailing window
    carried ACROSS micro-batches in an array-typed state column.

    Exactness contract: the state holds the last frame−1 floor-scaled
    int64 readings, so every z-score is the identical IEEE chain the
    batch window computes — the equivalence test compares
    event-for-event.  State size is a constant frame−1 longs per key.

    Output: (key, id, zscore nullable, is_anomaly).
    """
    out_schema = T.StructType(
        [
            events.schema[key_col],
            events.schema[id_col],
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("tail", T.ArrayType(T.LongType()))]
    )
    import math

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        tail: list[int] = list(state.get[0]) if state.exists else []
        ids, zs, flags = [], [], []
        # a group's micro-batch rows may arrive SPLIT across several
        # pandas chunks in arbitrary order — sorting each chunk alone
        # would fold events out of (ts, id) order and the rolling
        # window is order-sensitive.  Concat everything, sort ONCE.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, id_col])
            # column zip, not iterrows: iterrows materializes a Series
            # per row and dominated the per-event cost of this
            # (inherently sequential) fold — guide §4.2
            for rid, val in zip(pdf[id_col].tolist(), pdf[value_col].tolist()):
                vi = math.floor(val * 10000)
                win = tail[-(frame - 1):] + [vi]
                n = len(win)
                sx = sum(win)
                sxx = sum(v * v for v in win)
                mean = float(sx) / n
                var = float(sxx) / n - mean * mean
                z = (float(vi) - mean) / math.sqrt(var) if var > 0 else None
                ids.append(rid)
                zs.append(z)
                flags.append(bool(z is not None and abs(z) > threshold))
                tail = win
        state.update((tail[-(frame - 1):],))
        if ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(ids),
                    id_col: ids,
                    "zscore": pd.array(zs, dtype="float64"),
                    "is_anomaly": flags,
                }
            )

    return events.select(key_col, ts_col, id_col, value_col).groupBy(
        key_col
    ).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_cusum(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    ref: float = 250.0,
    threshold_scaled: int = 50_000_000,
) -> DataFrame:
    """Streaming one-sided CUSUM drift detector — the stateful twin of
    the batch closed form (registry.w_cusum_drift): per key, state is
    a single int64 S; each event applies S ← max(0, S + (⌊v·10⁴⌋ −
    ⌊ref·10⁴⌋)) and emits (id, cusum, alarm).  Because S and every
    deviation are exact integers, the streaming recursion and the
    batch running-sum/running-min identity produce the SAME value at
    every event regardless of micro-batch boundaries — the
    equivalence test compares event-for-event.  State is 8 bytes per
    key, forever."""
    import math

    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            events.schema[id_col],
            T.StructField("cusum", T.LongType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )
    state_schema = T.StructType([T.StructField("s", T.LongType())])
    ref_scaled = math.floor(ref * 10000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        s = state.get[0] if state.exists else 0
        ids, cs, al = [], [], []
        # CUSUM's max(0, S+d) recursion is order-sensitive and a
        # group's rows can arrive split across chunks in arbitrary
        # order — concat all chunks and sort ONCE by (ts, id) so the
        # fold order matches the batch closed form regardless of how
        # the engine chunked the micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, id_col])
            # column zip, not iterrows (guide §4.2 — see stateful_zscore)
            for rid, val in zip(pdf[id_col].tolist(), pdf[value_col].tolist()):
                d = math.floor(val * 10000) - ref_scaled
                s = max(0, s + d)
                ids.append(rid)
                cs.append(s)
                al.append(s > threshold_scaled)
        state.update((s,))
        if ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(ids),
                    id_col: ids,
                    "cusum": pd.array(cs, dtype="int64"),
                    "alarm": al,
                }
            )

    return events.select(key_col, ts_col, id_col, value_col).groupBy(
        key_col
    ).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
