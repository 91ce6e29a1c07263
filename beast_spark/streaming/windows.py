"""Streaming window operators + observability (SURVEY §2.B streaming row,
A25 metrics).

Thin, typed wrappers over Structured Streaming's native machinery —
watermarks, tumbling/sliding windows, session windows, stateful dedup —
plus a ``StreamingQueryListener`` that collects per-batch metrics the way
the reference's StatsD client instruments every stage
(``stats/Stats.java:16-84``). All of these run identically on a batch
DataFrame (windows/session_window are plain expressions), which is how
the batch-face queries q23/q24 validate the same logical plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

__all__ = [
    "tumbling",
    "sliding",
    "sessionized",
    "dedup_within_watermark",
    "interval_join",
    "MetricsListener",
]


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (append-able with watermark)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("window"), *keys).agg(*aggs)


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide).alias("window"), *keys).agg(*aggs)


def sessionized(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (dynamic gap-close); streaming form of q24's
    gaps-and-islands batch plan."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap).alias("session"), *keys).agg(*aggs)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time interval.

    Both sides carry the same watermark and the join condition adds
    ``left_ts - lower <= right_ts <= left_ts + upper``; the time bound is
    what lets Spark expire join state (state stays O(watermark + interval)
    per key instead of unbounded). Works identically on batch frames,
    which is how the operator is correctness-tested against a plain join.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for key in on:
        c = F.col(f"l.{key}") == F.col(f"r.{key}")
        cond = c if cond is None else cond & c
    lo = F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
    hi = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
    cond = cond & F.col(f"r.{right_ts}").between(lo, hi)
    return lw.join(rw, cond, how)


def dedup_within_watermark(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """Stateful dedup bounded by the watermark — the streaming analog of
    the reference's insertId-based effectively-once
    (``BQRowWithInsertId.java:9-12``): state stays O(watermark window)
    instead of O(stream)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


@dataclass
class BatchMetrics:
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    sink_description: str


class MetricsListener(StreamingQueryListener):
    """Collects per-micro-batch throughput metrics (A25).

    The reference emits statsd counters/timers per push
    (``stats/Stats.java:16-84``); Spark surfaces the same numbers in
    query-progress events — this listener adapts them into a list a
    metrics exporter can drain.
    """

    def __init__(self, statsd=None, table: str = "") -> None:
        self.progress: list[BatchMetrics] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        self.statsd = statsd  # optional streaming.stats.StatsDClient (A25 wire)
        self.table = table

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = BatchMetrics(
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            input_rows_per_second=p.inputRowsPerSecond or 0.0,
            process_rows_per_second=p.processedRowsPerSecond or 0.0,
            sink_description=p.sink.description if p.sink else "",
        )
        self.progress.append(m)
        if self.statsd is not None:
            self.statsd.emit_batch(m, table=self.table)

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass
