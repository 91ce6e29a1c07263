"""applyInPandasWithState operator: cumulative per-key totals must carry
state ACROSS micro-batches (the property no stateless plan can fake)."""

from __future__ import annotations

import datetime as dt

from beast_spark.streaming.stateful import running_totals

DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    batch1 = [(i, base, i % 2, "click", 10.0) for i in range(4)]  # users 0,1 ×2
    batch2 = [(10 + i, base, 0, "click", 5.0) for i in range(3)]  # user 0 ×3

    src = tmp_path / "src"
    spark.createDataFrame(batch1, DDL).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(batch2, DDL).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(spark.createDataFrame([], DDL).schema)
        .option("maxFilesPerTrigger", 1)  # force ≥2 micro-batches
        .parquet(str(src) + "/*")
    )
    out = running_totals(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running").collect()

    # last emission per key reflects the lifetime totals
    final = {}
    for r in rows:
        final[r.key] = (r.n_events, r.total_value)
    assert final[0] == (2 + 3, 2 * 10.0 + 3 * 5.0)
    assert final[1] == (2, 20.0)
    # user 0 must have emitted more than once (state carried, not recomputed)
    assert sum(1 for r in rows if r.key == 0) >= 2


def test_sessionize_gapped_closes_by_gap_and_timeout(spark, tmp_path):
    """EXECUTABLE timer-closed sessions (the env-gated tws.sessionize's
    working twin): first session closed inline by a gap-exceeding next
    event, second by EVENT-TIME TIMEOUT with no further traffic for the
    key, still-open session never emitted. Closed sessions match the
    batch session_window aggregation."""
    from pyspark.sql import functions as F

    from beast_spark.streaming.stateful import sessionize_gapped

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

    stream = (
        spark.readStream.schema(spark.createDataFrame([], DDL).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    out = sessionize_gapped(stream, "user_id", "ts", "value", gap_ms=30_000)
    q = (
        out.writeStream.format("memory")
        .queryName("gsessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM gsessions").collect()

    ms0 = int(t0.timestamp() * 1000)
    got = {
        (r.key, r.session_start_ms - ms0, r.session_end_ms - ms0, r.n_events, r.total_value)
        for r in rows
    }
    assert (100, 0, 10_000, 2, 3.0) in got  # closed by next event
    assert (100, 100_000, 100_000, 1, 4.0) in got  # closed by TIMEOUT
    assert all(k != 200 for k, *_ in got)  # open session not emitted

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
