"""transformWithState operators: native-TTL dedup and timer-closed
sessions. Both properties need state that outlives a micro-batch, which
no stateless plan can fake."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beast_spark.streaming.tws import sessionize, ttl_fingerprint_dedup, tws_available

needs_tws_runtime = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs the google.protobuf runtime "
    "(pyspark optional dep; absent in this container, no network egress "
    "to fetch it — see COVERAGE.md). Auto-un-skips when present.",
)

DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _stream(spark, src):
    return (
        spark.readStream.schema(spark.createDataFrame([], DDL).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )


@needs_tws_runtime
def test_ttl_dedup_keeps_first_across_batches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    b0 = [(1, base, 100, "a", 1.0), (2, base, 200, "b", 2.0), (3, base, 100, "a", 3.0)]
    b1 = [(4, base, 100, "a", 4.0), (5, base, 300, "c", 5.0)]
    src = tmp_path / "src"
    spark.createDataFrame(b0, DDL).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(b1, DDL).coalesce(1).write.parquet(str(src / "b1"))

    out = ttl_fingerprint_dedup(_stream(spark, src), ["user_id"], ttl_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("ttldedup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ttldedup").collect()

    # one survivor per key, and key 100's batch-2 replay was dropped by
    # state carried across batches
    assert sorted(r.user_id for r in rows) == [100, 200, 300]
    surv = {r.user_id: r.event_id for r in rows}
    assert surv[100] in (1, 3)  # first batch won, not event 4
    assert surv[300] == 5


@needs_tws_runtime
def test_sessionize_closes_by_gap_and_timer(spark, tmp_path):
    """user 100: two sessions entirely in batch 1 — the first closed by
    the next event (gap exceeded), the second by TIMER (no later events,
    watermark moves past last+gap in batch 2). user 200: arrives last,
    stays open, never emitted."""
    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    b0 = [
        (1, at(0), 100, "e", 1.0),
        (2, at(10), 100, "e", 2.0),
        (3, at(100), 100, "e", 4.0),
    ]
    b1 = [(4, at(1000), 200, "e", 8.0)]
    src = tmp_path / "src"
    spark.createDataFrame(b0, DDL).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(b1, DDL).coalesce(1).write.parquet(str(src / "b1"))

    stream = _stream(spark, src).withWatermark("ts", "0 seconds")
    out = sessionize(stream, "user_id", "ts", "value", gap_ms=30_000)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions ORDER BY session_start_ms").collect()

    ms0 = int(t0.timestamp() * 1000)
    got = [(r.key, r.session_start_ms - ms0, r.session_end_ms - ms0, r.n_events, r.total_value) for r in rows]
    assert (100, 0, 10_000, 2, 3.0) in got  # closed by next event
    assert (100, 100_000, 100_000, 1, 4.0) in got  # closed by TIMER
    assert all(k != 200 for k, *_ in got)  # still open -> not emitted

    # batch equivalence on the closed sessions
    batch = (
        spark.createDataFrame(b0 + b1, DDL)
        .groupBy("user_id", F.session_window("ts", "30 seconds"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    batch_set = {
        (r.user_id, int(r.session_window.start.timestamp() * 1000) - ms0, r.n, r.tv)
        for r in batch
    }
    for k, start, _end, n, tv in got:
        assert (k, start, n, tv) in batch_set


# ---- runtime-independent checks (run even without google.protobuf) ----


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttl = ttlDurationMs
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return iter(list(self.timers))


def test_tws_plan_constructs_without_runtime(spark):
    """The operators must at least build a logical plan on any session."""
    df = spark.createDataFrame([], DDL)
    out = ttl_fingerprint_dedup(df, ["user_id"], ttl_ms=1000)
    assert [f.name for f in out.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    out2 = sessionize(df, "user_id", "ts", "value", gap_ms=1000)
    assert [f.name for f in out2.schema.fields] == [
        "key", "session_start_ms", "session_end_ms", "n_events", "total_value",
    ]


def test_session_processor_logic_direct():
    """Drive the processor against stub state: gap-close, timer-close,
    stale-timer no-op — the full close protocol without the runtime."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo, TimerValues

    from beast_spark.streaming.tws import _SessionProcessor

    p = _SessionProcessor("ts", "value", gap_ms=30_000)
    h = _FakeHandle()
    p.init(h)
    tv = TimerValues(0, 0)

    def batch(rows):
        return iter(
            [pd.DataFrame({"ts": pd.to_datetime([r[0] for r in rows], unit="ms"),
                           "value": [r[1] for r in rows]})]
        )

    # events at 0s, 10s, 100s: first session closes on the 100s event
    out = list(p.handleInputRows((7,), batch([(0, 1.0), (10_000, 2.0), (100_000, 4.0)]), tv))
    assert len(out) == 1
    closed = out[0].iloc[0]
    assert (closed.session_start_ms, closed.session_end_ms, closed.n_events,
            closed.total_value) == (0, 10_000, 2, 3.0)
    # open session state + one armed timer at last+gap
    assert h.state.v == (100_000, 100_000, 1, 4.0)
    assert h.timers == [130_000]

    # stale timer (before deadline) closes nothing
    out = list(p.handleExpiredTimer((7,), tv, ExpiredTimerInfo(120_000)))
    assert out == [] and h.state.exists()
    # due timer closes the open session and clears state
    out = list(p.handleExpiredTimer((7,), tv, ExpiredTimerInfo(130_000)))
    assert len(out) == 1 and not h.state.exists()
    assert out[0].iloc[0].n_events == 1


def test_ttl_dedup_processor_logic_direct():
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import TimerValues

    from beast_spark.streaming.tws import _TTLDedupProcessor

    p = _TTLDedupProcessor(["a"], ttl_ms=60_000)
    h = _FakeHandle()
    p.init(h)
    assert h.ttl == 60_000  # TTL is delegated to the store
    tv = TimerValues(1000, -1)
    out = list(p.handleInputRows((1,), iter([pd.DataFrame({"a": [10, 11]})]), tv))
    assert len(out) == 1 and out[0].iloc[0].a == 10  # first row survives
    out = list(p.handleInputRows((1,), iter([pd.DataFrame({"a": [12]})]), tv))
    assert out == []  # later batch suppressed by state
    h.state.clear()  # simulate store-side TTL eviction
    out = list(p.handleInputRows((1,), iter([pd.DataFrame({"a": [13]})]), tv))
    assert len(out) == 1 and out[0].iloc[0].a == 13  # passes again post-TTL
