"""Shared builders for the event-stream window queries and their
streamed twins (q23/q24 ↔ q200/q201).

The batch queries and the streaming maintainers MUST compute through
the same column expressions or the twins drift — the factoring rule
every additive maintainer in this repo follows (see
``streaming/tokenstats.py``). Two shapes live here:

* **Tumbling hourly stats** decompose into per-(window, event_type,
  user) PARTIALS — every q23 output is a sum over them (``count
  DISTINCT user`` becomes ``count(*)`` of partial rows), so streaming
  maintenance is purely additive keyed merge.
* **Sessions** (30-min gap) are MERGEABLE intervals: per-batch
  sessionization yields sub-intervals of the final sessions, and
  re-merging intervals on endpoint gaps reproduces event-level
  sessionization of the union exactly — order- and split-independent
  (property-tested against adversarially interleaved splits). This is
  the classic session-window merge (the same algebra Spark's
  ``session_window`` state store applies); expressing it over plain
  DataFrames is what lets the streamed state be a shard-replaceable
  table instead of an opaque state store.

Reference parity: the reference has no window engine (its BQ sink
defers analytics to the warehouse, ``sink/bq/BqSink.java:82-93``);
these close the SURVEY §2.B streaming row with oracle-checkable
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.queries._util import cents, rnd

__all__ = [
    "hourly_user_partials",
    "hourly_window_stats",
    "session_intervals",
    "merge_session_intervals",
    "numbered_sessions",
]

SESSION_GAP_MS = 1_800_000  # q24's 30-minute gap


def hourly_user_partials(events: DataFrame, grain_minutes: int = 60) -> DataFrame:
    """Per-(grain window, event_type, user) additive partials: n_events,
    n_value (non-null count, the avg denominator) and sum_cents (exact
    integer value mass — see ``_util.cents`` for why cents, not
    doubles). One row per distinct key ⟹ ``count(*)`` downstream IS
    ``count(DISTINCT user_id)``.

    ``grain_minutes`` is the partials' bucket width (default the
    original hourly grain): a finer grain is what lets one maintained
    state serve SUB-hour sliding geometries exactly (a sliding window
    whose slide is a multiple of the grain is a sum of grain buckets —
    ``HourlyWindowStatsMaintainer.read_sliding_minutes``). The bucket
    start is the UTC-epoch floor for EVERY grain — exactly
    ``F.window``'s absolute grid, and the grid ``read_sliding_minutes``
    snaps to. (One grid, one branch: a ``date_trunc('hour')`` default
    would be session-timezone-dependent and drift off the epoch grid
    in non-whole-hour-offset zones — review finding.)"""
    g = grain_minutes * 60
    window_start = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / F.lit(g)).cast("long") * g
    )
    return events.groupBy(
        window_start.alias("window_start"),
        "event_type",
        "user_id",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("value").alias("n_value"),
        # no coalesce-to-0: an all-NULL group must stay NULL so the
        # finalizer's sums (which skip NULL partials, like SQL's) agree
        # with a direct sum over the events — total_value NULL, not 0.00
        F.sum(cents(F.col("value"))).cast("long").alias("sum_cents"),
    )


def hourly_window_stats(partials: DataFrame) -> DataFrame:
    """q23's output shape from the additive partials (batch and stream
    share this finalizer; only the partials' provenance differs)."""
    return partials.groupBy("window_start", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        rnd(F.sum("sum_cents") / 100.0, 2).alias("total_value"),
        rnd(F.sum("sum_cents") / F.sum("n_value") / 100.0, 2).alias("avg_value"),
        # count(col), not count(*): a NULL-user partial row must not
        # count — countDistinct (the batch form this replaces) skips
        # NULLs
        F.count("user_id").alias("n_users"),
    )


def session_intervals(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """Event-level sessionization (gaps-and-islands) to per-session
    intervals: (user_id, session_start, session_end, n_events). The
    cumulative-sum plan of q24, minus the ordinal id (ids are assigned
    on the MERGED result — :func:`numbered_sessions` — because a
    per-batch ordinal is meaningless once batches merge)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.expr("unix_millis(ts)")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (ms - F.lag(ms).over(w) > gap_ms) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("new_sess"),
    )
    grp = (
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    return (
        flagged.withColumn("_grp", grp)
        .groupBy("user_id", "_grp")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_grp")
    )


def merge_session_intervals(
    sessions: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """Re-merge session intervals across batches: two intervals of one
    user join when the later one starts within ``gap_ms`` of the
    running MAX end of everything before it (endpoints are actual
    event times, so endpoint adjacency IS event adjacency). Exact and
    idempotent: merge(sessions(full)) == sessions(full), and
    merge(∪ sessions(any partition)) == sessions(full) — the
    mergeable-session-window algebra, property-tested on interleaved
    splits. Same gaps-and-islands shape as :func:`session_intervals`,
    lifted from events to intervals, with a running-max because an
    earlier-starting interval can also end later."""
    start_ms = F.expr("unix_millis(session_start)")
    end_ms = F.expr("unix_millis(session_end)")
    w = Window.partitionBy("user_id").orderBy("session_start", "session_end")
    prev_max_end = F.max(end_ms).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = sessions.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (start_ms - prev_max_end > gap_ms), 1
        ).otherwise(0),
    )
    grp = (
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    return (
        flagged.withColumn("_grp", grp)
        .groupBy("user_id", "_grp")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("_grp")
    )


def numbered_sessions(sessions: DataFrame) -> DataFrame:
    """q24's output shape: per-user ordinal session ids (sessions are
    disjoint, so ordering by start reproduces the cumulative-flag
    numbering) + duration."""
    w = Window.partitionBy("user_id").orderBy("session_start")
    return sessions.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "n_events",
        "session_start",
        "session_end",
        (
            F.expr("unix_millis(session_end)") - F.expr("unix_millis(session_start)")
        ).alias("duration_ms"),
    )
