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

__all__ = ["running_totals"]


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
