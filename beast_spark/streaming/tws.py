"""Arbitrary-state streaming operators on the ``transformWithState`` API.

``applyInPandasWithState`` (streaming/stateful.py) is the Spark 3.x-era
escape hatch; Spark 4 adds ``transformWithStateInPandas`` with typed state
variables, **store-managed TTL** and **timers**. Two operators live here:

* :func:`ttl_fingerprint_dedup` — cross-batch first-arrival-wins dedup
  whose per-key state expires via *native state TTL*: the store evicts
  the entry itself (RocksDB compaction-filter style), no watermark
  bookkeeping in user code. This is the modern form of the
  retention-bounded corpus-dedup stream (streaming/windows.py uses
  ``dropDuplicatesWithinWatermark``; here the retention contract is on
  the state variable).
* :func:`sessionize` — event-time sessionization with *timers*: a
  session closes either when a later event of the same key exceeds the
  gap (close-on-next-event) or when the watermark passes ``last + gap``
  with no further events (timer closure). Built-in ``session_window``
  can only emit on watermark; the timer path additionally lets a custom
  processor own the close condition (max-length splits, inactivity
  actions, …). The same close protocol EXECUTES in this container via
  ``streaming/stateful.py::sessionize_gapped`` (applyInPandasWithState
  + event-time timeout) — this module is its forward-looking twin on
  the typed-state API.

The reference's only state is offset-ack bookkeeping (SURVEY §2.A
A18-A21), subsumed by checkpoints; these operators are §2.B engine
surface.

Scale: state is partitioned by the group key in the RocksDB store
(engine default, beast_spark/session.py) — the same shuffle contract as
any streaming aggregation. Dedup state is TTL-bounded; session state is
one row per *open* session and timers are store-managed, so state size
tracks active keys, never stream length.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

__all__ = ["ttl_fingerprint_dedup", "sessionize", "tws_available"]

# transformWithState runs its StatefulProcessor in a standalone Python
# "driver worker" process that does NOT inherit the submitting driver's
# sys.path — a processor class pickled by reference would fail to import
# there (ModuleNotFoundError: beast_spark). Registering this module for
# pickle-by-value ships the class code inside the pickle instead, so the
# operator works from any session without deploy-time PYTHONPATH plumbing.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def tws_available() -> bool:
    """True when the transformWithState runtime can execute here.

    Spark's Python<->JVM state protocol for transformWithState is built
    on protobuf messages (pyspark/sql/streaming/proto/StateMessage_pb2),
    which needs the ``google.protobuf`` runtime — an optional pyspark
    dependency this container does not ship (and cannot fetch: no
    network egress; probe documented in COVERAGE.md). The operators
    below are complete and their tests auto-un-skip the moment a
    protobuf runtime is present; until then applyInPandasWithState
    (streaming/stateful.py) is the executed arbitrary-state surface.
    """
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace at all
        return False


class _TTLDedupProcessor(StatefulProcessor):
    """Keep-first per key; the `seen` mark expires via native state TTL."""

    def __init__(self, columns: list[str], ttl_ms: int | None):
        self._columns = columns
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "first_seen_ms long", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator:
        if self._seen.exists():
            return
        for pdf in rows:
            if len(pdf):
                self._seen.update((timerValues.getCurrentProcessingTimeInMs(),))
                yield pdf.iloc[[0]][self._columns]
                return

    def close(self) -> None:
        pass


def ttl_fingerprint_dedup(
    df: DataFrame, key_cols: list[str], ttl_ms: int | None = None
) -> DataFrame:
    """First-arrival-wins streaming dedup with store-managed state TTL.

    A key re-appearing within ``ttl_ms`` of its first arrival is dropped;
    after the TTL the store has evicted the mark and the key passes again
    (the bounded-retention contract: "duplicates only recur after N days",
    priced as O(active keys) state). ``ttl_ms=None`` keeps state forever —
    only for keyspaces known to fit the store.
    """
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.groupBy(*key_cols).transformWithStateInPandas(
        _TTLDedupProcessor([f.name for f in df.schema.fields], ttl_ms),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


class _SessionProcessor(StatefulProcessor):
    """One open session per key: (start_ms, last_ms, n, total)."""

    def __init__(self, ts_col: str, value_col: str, gap_ms: int):
        self._ts_col = ts_col
        self._value_col = value_col
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState(
            "sess", "start_ms long, last_ms long, n long, total double"
        )
        self._handle = handle

    def _closed_row(self, key, s):
        import pandas as pd

        return pd.DataFrame(
            {
                "key": [key[0]],
                "session_start_ms": [s[0]],
                "session_end_ms": [s[1]],
                "n_events": [s[2]],
                "total_value": [s[3]],
            }
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator:
        import pandas as pd

        pdfs = [p for p in rows if len(p)]
        if not pdfs:
            return
        events = pd.concat(pdfs).sort_values(self._ts_col)
        # datetime64 unit varies by conversion path (ns vs us) — normalize.
        ts_ms = events[self._ts_col].values.astype("datetime64[ms]").astype("int64").tolist()
        vals = events[self._value_col].astype(float).tolist()

        s = tuple(self._sess.get()) if self._sess.exists() else None
        for t, v in zip(ts_ms, vals):
            if s is not None and t - s[1] > self._gap_ms:
                yield self._closed_row(key, s)
                s = None
            if s is None:
                s = (t, t, 0, 0.0)
            s = (s[0], max(s[1], t), s[2] + 1, s[3] + v)
        self._sess.update(s)
        # One live timer per key: re-arm at the open session's deadline.
        for t_old in list(self._handle.listTimers()):
            self._handle.deleteTimer(t_old)
        self._handle.registerTimer(s[1] + self._gap_ms)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator:
        if not self._sess.exists():
            return
        s = tuple(self._sess.get())
        # A stale timer (session extended since it was armed) closes nothing.
        if expiredTimerInfo.getExpiryTimeInMs() >= s[1] + self._gap_ms:
            yield self._closed_row(key, s)
            self._sess.clear()

    def close(self) -> None:
        pass


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, gap_ms: int
) -> DataFrame:
    """Event-time sessions with gap ``gap_ms``; emits CLOSED sessions.

    Close paths: (a) a later same-key event beyond the gap, emitted
    inline; (b) the event-time timer once the watermark passes
    ``last_event + gap`` — so idle keys close without traffic, which
    ``dropDuplicates``-style state never does. The input must carry a
    watermark on ``ts_col``.

    Output: key, session_start_ms, session_end_ms, n_events, total_value.
    """
    return df.groupBy(key_col).transformWithStateInPandas(
        _SessionProcessor(ts_col, value_col, gap_ms),
        outputStructType=(
            "key long, session_start_ms long, session_end_ms long, "
            "n_events long, total_value double"
        ),
        outputMode="Append",
        timeMode="EventTime",
    )
