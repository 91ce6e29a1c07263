"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no arbitrary-state operator (its only state is the
offset-ack bookkeeping, SURVEY §2.A A18-A20, which Spark's checkpoint
subsumes); this is the §2.B escape hatch for semantics the built-in
windows/dedup can't express — running per-key aggregates that survive
across micro-batches, custom TTL eviction, and the like.

Scale notes: state lives in the state store, partitioned by group key —
the same shuffle-by-key contract as any streaming aggregation, so skewed
keys hurt here first (salt upstream if a single key dominates). State is
bounded by the configured TTL (processing-time timeout), never O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals", "sessionize_gapped"]


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key cumulative (count, sum) emitted every micro-batch.

    Unlike a windowed aggregation the totals are *lifetime* (since state
    birth), and unlike ``outputMode("complete")`` only keys seen in the
    current batch re-emit — the classic use is a per-entity counter or
    spend meter at keyspace sizes where complete-mode re-emission is
    impossible. ``ttl_ms`` evicts idle keys via processing-time timeout.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def sessionize_gapped(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_ms: int,
) -> DataFrame:
    """Event-time sessionization with gap closure — the executable twin
    of ``streaming/tws.py::sessionize`` (same close protocol on the
    Spark 3.x ``applyInPandasWithState`` API, which needs no protobuf
    runtime).

    A session closes (a) inline, when a later same-key event exceeds the
    gap, or (b) via event-time TIMEOUT once the watermark passes
    ``last + gap`` — so idle keys close without traffic. Emits only
    CLOSED sessions (append semantics): key, session_start_ms,
    session_end_ms, n_events, total_value.

    The input must carry ``withWatermark(ts_col, ...)``. State is one
    row per OPEN session per key — size tracks active keys, never
    stream length.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("session_start_ms", T.LongType()),
            T.StructField("session_end_ms", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def row(s):
            return pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start_ms": [s[0]],
                    "session_end_ms": [s[1]],
                    "n_events": [s[2]],
                    "total_value": [s[3]],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                yield row(state.get)
            state.remove()
            return

        events = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_ms = events[ts_col].values.astype("datetime64[ms]").astype("int64").tolist()
        vals = events[value_col].astype(float).tolist()
        s = state.get if state.exists else None
        for t, v in zip(ts_ms, vals):
            if s is not None and t - s[1] > gap_ms:
                yield row(s)
                s = None
            if s is None:
                s = (t, t, 0, 0.0)
            s = (s[0], max(s[1], t), s[2] + 1, s[3] + v)
        state.update(s)
        state.setTimeoutTimestamp(s[1] + gap_ms)

    return df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
