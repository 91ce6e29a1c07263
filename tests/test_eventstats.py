"""Streamed event-window twins (q200/q201): merge algebra, exactly-once
choreography, touched-shard-only I/O, config guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beast_spark.operators.eventwindows import (
    merge_session_intervals,
    numbered_sessions,
    session_intervals,
)
from beast_spark.streaming.eventstats import (
    HourlyWindowStatsMaintainer,
    SessionStatsMaintainer,
)

EVENTS_DDL = "event_id long, user_id long, event_type string, ts timestamp, value double"


def _ev(eid, uid, minutes, etype="click", value=1.0):
    return (eid, uid, etype, dt.datetime(2024, 3, 1, 8, 0, 0) + dt.timedelta(minutes=minutes), value)


def _sessions_set(df):
    return {
        (r.user_id, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in df.collect()
    }


def test_session_merge_stitches_across_batches_any_split(spark):
    """The mergeable-interval algebra: event-level sessionization of the
    union == interval re-merge of per-batch sessions, for adversarial
    splits — including the chain case where batch A's two far-apart
    sessions are only connected by batch B's bridging event."""
    rows = [
        _ev(1, 1, 0),      # s1: 08:00
        _ev(2, 1, 25),     # bridges to 08:25
        _ev(3, 1, 50),     # bridges to 08:50 (gap 25)
        _ev(4, 1, 120),    # new session: gap 70
        _ev(5, 2, 0),
        _ev(6, 2, 31),     # user 2: two singleton sessions (gap 31)
        _ev(7, 3, 10),
    ]
    full = spark.createDataFrame(rows, EVENTS_DDL)
    expected = _sessions_set(numbered_sessions(session_intervals(full)))
    # splits: time-interleaved parity, bridge-last, and singletons
    splits = [
        [rows[0::2], rows[1::2]],
        [[rows[0], rows[2], rows[3]], [rows[1]], rows[4:]],
        [[r] for r in rows],
    ]
    for parts in splits:
        merged = None
        for part in parts:
            inc = session_intervals(spark.createDataFrame(part, EVENTS_DDL))
            merged = inc if merged is None else merge_session_intervals(
                merged.unionByName(inc)
            )
        assert _sessions_set(numbered_sessions(merged)) == expected


def test_hourly_maintainer_replay_and_touched_shards(spark, tmp_path):
    m = HourlyWindowStatsMaintainer(str(tmp_path / "state"))
    b0 = spark.createDataFrame([_ev(i, i % 4, i) for i in range(20)], EVENTS_DDL)
    m.apply_batch(b0, 0)
    first = {tuple(r) for r in m.read_stats(spark).collect()}
    # replay after a post-commit crash: a no-op
    m.apply_batch(b0, 0)
    assert {tuple(r) for r in m.read_stats(spark).collect()} == first

    # a batch touching ONE user rewrites only that key's shards: every
    # other fragment leaf survives byte-identical (path-identical)
    before = set(m.sub_leaves("partials"))
    one_user = spark.createDataFrame([_ev(100, 1, 30)], EVENTS_DDL)
    touched = m.touched_shards(
        m._batch_rows(one_user), *m._KEYS
    )
    m.apply_batch(one_user, 1)
    after = set(m.sub_leaves("partials"))
    untouched_kept = {
        leaf for leaf in before
        if not any(leaf.endswith(f"_shard={s}") for s in touched)
    }
    assert untouched_kept <= after  # untouched shards' leaves survive


def test_hourly_maintainer_matches_batch_on_fixture(spark, sf_dir):
    from beast_spark.queries import all_queries

    batch = all_queries()["q23_events_hourly_window"].fn(spark, sf_dir)
    import uuid, tempfile, os
    state = os.path.join(tempfile.gettempdir(), f"evs_{uuid.uuid4().hex}")
    m = HourlyWindowStatsMaintainer(state)
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    for b in range(4):
        m.apply_batch(e.filter(F.col("event_id") % 4 == b), b)
    assert {tuple(r) for r in m.read_stats(spark).collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_session_maintainer_guard_rejects_changed_gap(spark, tmp_path):
    m = SessionStatsMaintainer(str(tmp_path / "state"), gap_ms=1_800_000)
    m.apply_batch(spark.createDataFrame([_ev(1, 1, 0)], EVENTS_DDL), 0)
    m2 = SessionStatsMaintainer(str(tmp_path / "state"), gap_ms=60_000)
    with pytest.raises(ValueError, match="mixed-config"):
        m2.apply_batch(spark.createDataFrame([_ev(2, 1, 5)], EVENTS_DDL), 1)
    with pytest.raises(ValueError, match="mixed-config"):
        m2.read_sessions(spark)
    # the original config still reads fine
    assert m.read_sessions(spark).count() == 1


def test_session_maintainer_empty_batch_is_committed(spark, tmp_path):
    m = SessionStatsMaintainer(str(tmp_path / "state"))
    m.apply_batch(spark.createDataFrame([_ev(1, 1, 0)], EVENTS_DDL), 0)
    m.apply_batch(spark.createDataFrame([], EVENTS_DDL), 1)
    assert 1 in m.applied_batches()
    assert m.read_sessions(spark).count() == 1


def test_session_merge_random_events_random_splits(spark):
    """Hypothesis-style randomized check of the merge algebra (fixed
    seeds — each case is a Spark job, so the example count is bounded):
    random event times per user, random batch assignment, sessions of
    the union must equal the interval re-merge fold in every case."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(3, 30)
        rows = [
            _ev(i, rng.randint(1, 3), rng.randint(0, 300), value=1.0)
            for i in range(n)
        ]
        n_batches = rng.randint(2, 4)
        parts = [[] for _ in range(n_batches)]
        for r in rows:
            parts[rng.randrange(n_batches)].append(r)
        full = spark.createDataFrame(rows, EVENTS_DDL)
        expected = _sessions_set(numbered_sessions(session_intervals(full)))
        merged = None
        for part in parts:
            if not part:
                continue
            inc = session_intervals(spark.createDataFrame(part, EVENTS_DDL))
            merged = inc if merged is None else merge_session_intervals(
                merged.unionByName(inc)
            )
        got = _sessions_set(numbered_sessions(merged))
        assert got == expected, f"seed={seed}"


def test_read_sliding_matches_spark_window_for_slide_gt_one(spark, tmp_path):
    """read_sliding must reproduce F.window's epoch-aligned grid for
    slide_hours > 1 (review finding: exploding from the raw hour emits
    misaligned starts — odd-hour buckets must snap DOWN to the slide
    grid first)."""
    rows = [_ev(i, 1, m, value=float(i)) for i, m in enumerate([0, 30, 90, 150, 210, 400])]
    e = spark.createDataFrame(rows, EVENTS_DDL)
    m = HourlyWindowStatsMaintainer(str(tmp_path / "state"))
    m.apply_batch(e, 0)
    got = {
        (r.wstart, r.wend, r.n_events, r.sum_value_cents)
        for r in m.read_sliding(spark, window_hours=4, slide_hours=2).collect()
    }
    from beast_spark.queries._util import cents

    expected = {
        tuple(r)
        for r in e.groupBy(F.window("ts", "4 hours", "2 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("s"),
        )
        .select(F.col("w.start"), F.col("w.end"), "n", "s")
        .collect()
    }
    assert got == expected


def test_read_sliding_minutes_subhour_matches_spark_window(spark, tmp_path):
    """Round-10: a maintainer built at a 30-min partials grain serves a
    60m/30m sliding geometry exactly (F.window's epoch grid), and the
    grid refuses what it cannot serve exactly — a slide that is not a
    multiple of the grain, and an hourly-grain maintainer asked for a
    sub-hour slide."""
    rows = [
        _ev(i, 1, m, value=float(i))
        for i, m in enumerate([0, 10, 29, 30, 31, 75, 140, 400])
    ]
    e = spark.createDataFrame(rows, EVENTS_DDL)
    m = HourlyWindowStatsMaintainer(str(tmp_path / "state"), grain_minutes=30)
    m.apply_batch(e, 0)
    got = {
        (r.wstart, r.wend, r.n_events, r.sum_value_cents)
        for r in m.read_sliding_minutes(spark, 60, 30).collect()
    }
    from beast_spark.queries._util import cents

    expected = {
        tuple(r)
        for r in e.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("value"))).alias("s"))
        .select(F.col("w.start"), F.col("w.end"), "n", "s")
        .collect()
    }
    assert got == expected
    with pytest.raises(ValueError, match="multiple of this"):
        m.read_sliding_minutes(spark, 90, 45)  # 45 % 30 != 0
    hourly = HourlyWindowStatsMaintainer(str(tmp_path / "state_h"))
    hourly.apply_batch(e, 0)
    with pytest.raises(ValueError, match="grain_minutes=60"):
        hourly.read_sliding_minutes(spark, 60, 30)
    # the grain is part of the state's meaning: reopening a 30-min state
    # dir with the hourly default must refuse (meta guard)
    with pytest.raises(ValueError, match="mixed-config"):
        HourlyWindowStatsMaintainer(str(tmp_path / "state")).apply_batch(e, 1)
    with pytest.raises(ValueError, match="divide 1440"):
        HourlyWindowStatsMaintainer(str(tmp_path / "x"), grain_minutes=7)


def test_read_user_sessions_prunes_to_probed_shards(spark, tmp_path):
    """The serving read returns exactly read_sessions restricted to the
    probed users AND reads only their hash shards (inputFiles ⊆ the
    touched shards' leaves)."""
    rows = [_ev(i, i % 11, i * 3) for i in range(120)]
    m = SessionStatsMaintainer(str(tmp_path / "state"))
    for b in range(3):
        m.apply_batch(
            spark.createDataFrame([r for r in rows if r[0] % 3 == b], EVENTS_DDL), b
        )
    users = spark.createDataFrame([(3,), (7,)], "user_id long")
    got = m.read_user_sessions(spark, users)
    want = (
        m.read_sessions(spark)
        .filter(F.col("user_id").isin(3, 7))
        .collect()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))
    touched = m.touched_shards(users, "user_id")
    allowed = set()
    for leaf in m.sub_leaves("sessions", shards=touched):
        allowed.add(leaf.rstrip("/"))
    for f in got.inputFiles():
        assert any(a in f for a in allowed), f
    # users never seen: empty result with the full schema, no raise
    ghost = spark.createDataFrame([(10_000,)], "user_id long")
    empty = m.read_user_sessions(spark, ghost)
    assert empty.count() == 0
    assert empty.columns == got.columns
    fresh = SessionStatsMaintainer(str(tmp_path / "none"))
    with pytest.raises(ValueError, match="nothing ingested"):
        fresh.read_user_sessions(spark, users)
