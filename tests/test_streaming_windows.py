"""Structured Streaming window operators driven end-to-end with a file
source → memory sink, validated against the equivalent batch plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from beast_spark.streaming.windows import (
    MetricsListener,
    dedup_within_watermark,
    sessionized,
    tumbling,
)


def _event_rows():
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    for i in range(60):
        rows.append((i, base + dt.timedelta(minutes=i), i % 3, "click", float(i)))
    # a duplicate event id within the watermark window
    rows.append((5, base + dt.timedelta(minutes=5), 2, "click", 5.0))
    return rows


EVENT_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _stream_from(spark, tmp_path, rows):
    src = tmp_path / "src"
    spark.createDataFrame(rows, EVENT_DDL).write.parquet(str(src / "b0"))
    return (
        spark.readStream.schema(spark.createDataFrame([], EVENT_DDL).schema)
        .format("parquet")
        .load(str(src) + "/*")
    )


def _run(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = _stream_from(spark, tmp_path, _event_rows())
        agg = tumbling(
            stream, "ts", "15 minutes", ["user_id"],
            [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        )
        out = _run(agg, spark, "tumbled")
        batch = (
            spark.createDataFrame(_event_rows(), EVENT_DDL)
            .groupBy(F.window("ts", "15 minutes").alias("window"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        got = {(r.window.start, r.user_id): (r.n, r.total) for r in out.collect()}
        want = {(r.window.start, r.user_id): (r.n, r.total) for r in batch.collect()}
        assert got == want and len(got) > 0
        assert sum(m.num_input_rows for m in listener.progress) == 61  # A25 metrics flow
    finally:
        spark.streams.removeListener(listener)


def test_session_window_stream(spark, tmp_path):
    # two bursts separated by > gap → two sessions per user
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0) for i in range(3)] + [
        (10 + i, base + dt.timedelta(hours=2, minutes=i), 1, "click", 1.0) for i in range(2)
    ]
    stream = _stream_from(spark, tmp_path, rows)
    agg = sessionized(stream, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")])
    out = _run(agg, spark, "sessions").collect()
    assert sorted(r.n for r in out) == [2, 3]


def test_stream_static_join(spark, tmp_path):
    """Stream-static broadcast join: enrich the event stream with a static
    dimension (SURVEY §2.B joins row, streaming case)."""
    from pyspark.sql import functions as F2

    dim = spark.createDataFrame([(0, "bronze"), (1, "silver"), (2, "gold")], "user_id long, tier string")
    stream = _stream_from(spark, tmp_path, _event_rows())
    enriched = stream.join(F2.broadcast(dim), "user_id").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = _run(enriched, spark, "enriched").collect()
    assert {r.tier: r.n for r in out} == {"bronze": 20, "silver": 20, "gold": 21}


def test_dedup_within_watermark_stream(spark, tmp_path):
    stream = _stream_from(spark, tmp_path, _event_rows())
    deduped = dedup_within_watermark(stream, ["event_id"], "ts", "1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup")
    assert out.count() == 60  # 61 inputs, one duplicate event_id dropped


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream equi-join with watermarks + event-time interval bound
    (SURVEY §2.B joins row, stream-stream case). Validated against the
    identical batch plan — interval_join builds the same logical join."""
    from beast_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1)
    clicks = [(i, base + dt.timedelta(minutes=2 * i), i % 3, "click", 1.0) for i in range(20)]
    buys = [(100 + i, base + dt.timedelta(minutes=2 * i + 1), i % 3, "buy", 9.0) for i in range(10)]

    src_l, src_r = tmp_path / "l", tmp_path / "r"
    spark.createDataFrame(clicks, EVENT_DDL).write.parquet(str(src_l / "b0"))
    spark.createDataFrame(buys, EVENT_DDL).write.parquet(str(src_r / "b0"))
    schema = spark.createDataFrame([], EVENT_DDL).schema
    ls = spark.readStream.schema(schema).parquet(str(src_l) + "/*").selectExpr(
        "event_id AS click_id", "ts AS click_ts", "user_id"
    )
    rs = spark.readStream.schema(schema).parquet(str(src_r) + "/*").selectExpr(
        "event_id AS buy_id", "ts AS buy_ts", "user_id"
    )
    joined = interval_join(
        ls, rs, ["user_id"], "click_ts", "buy_ts", watermark="1 hour",
        lower="0 seconds", upper="5 minutes",
    ).select("click_id", "buy_id")
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.buy_id) for r in spark.sql("SELECT * FROM ssj").collect()}

    bl = spark.createDataFrame(clicks, EVENT_DDL).selectExpr(
        "event_id AS click_id", "ts AS click_ts", "user_id"
    )
    br = spark.createDataFrame(buys, EVENT_DDL).selectExpr(
        "event_id AS buy_id", "ts AS buy_ts", "user_id"
    )
    want = {
        (r.click_id, r.buy_id)
        for r in bl.join(br, "user_id")
        .filter(
            (F.col("buy_ts") >= F.col("click_ts"))
            & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 5 minutes"))
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_rate_source_smoke(spark):
    """Rate source (SURVEY §2.B scans row, test/dev source): schema and a
    non-empty first batch."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    assert [f.name for f in stream.schema.fields] == ["timestamp", "value"]
    q = (
        stream.writeStream.format("memory").queryName("rate_smoke")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) AS n FROM rate_smoke").collect()[0].n >= 0


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    from beast_spark.streaming.windows import sliding

    stream = _stream_from(spark, tmp_path, _event_rows())
    agg = sliding(
        stream, "ts", "30 minutes", "15 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n")], watermark="2 hours",
    )
    out = _run(agg, spark, "slid")
    batch = (
        spark.createDataFrame(_event_rows(), EVENT_DDL)
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("window"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.window.start, r.user_id): r.n for r in out.collect()}
    want = {(r.window.start, r.user_id): r.n for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """LEFT OUTER stream-stream interval join — the semantics users get
    wrong most: unmatched left rows must emit null-extended only AFTER
    the watermark passes their join window (they sit in state until the
    engine can prove no match can still arrive), and the final output
    must equal the batch left join over the expired region.

    Driven as two availableNow runs over a shared checkpoint: run 1
    (all real events; watermark stays below every join window) must
    produce ONLY inner matches; run 2 adds far-future heartbeats on
    both sides (the watermark is the min across sources), advancing the
    watermark past the batch-0 windows so the unmatched lefts flush.
    """
    import glob

    from beast_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1)

    def m(minutes):
        return base + dt.timedelta(minutes=minutes)

    clicks_b0 = [
        (1, m(0), 1, "click", 1.0),   # matched by buy 101
        (2, m(5), 2, "click", 1.0),   # no buy for user 2 -> null-extended
        (3, m(30), 1, "click", 1.0),  # user 1 again, but no buy in window
    ]
    buys_b0 = [
        (101, m(2), 1, "buy", 9.0),
        (102, m(8), 3, "buy", 9.0),   # unmatched RIGHT row: absent from left join
    ]
    hb_l = [(998, m(600), 998, "click", 0.0)]  # advances left watermark only
    hb_r = [(999, m(600), 999, "buy", 0.0)]

    src_l, src_r = tmp_path / "l", tmp_path / "r"
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(clicks_b0, EVENT_DDL).write.parquet(str(src_l / "b0"))
    spark.createDataFrame(buys_b0, EVENT_DDL).write.parquet(str(src_r / "b0"))
    schema = spark.createDataFrame([], EVENT_DDL).schema

    def run_once():
        ls = spark.readStream.schema(schema).parquet(str(src_l) + "/*").selectExpr(
            "event_id AS click_id", "ts AS click_ts", "user_id"
        )
        rs = spark.readStream.schema(schema).parquet(str(src_r) + "/*").selectExpr(
            "event_id AS buy_id", "ts AS buy_ts", "user_id"
        )
        joined = interval_join(
            ls, rs, ["user_id"], "click_ts", "buy_ts", watermark="1 hour",
            lower="0 seconds", upper="5 minutes", how="left",
        ).select("click_id", "buy_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    def collect():
        if not glob.glob(out_dir + "/*.parquet"):
            return set()
        return {
            (r.click_id, r.buy_id) for r in spark.read.parquet(out_dir).collect()
        }

    run_once()
    got1 = collect()
    # Watermark (max ts 30m − 1h) has not passed any join window yet:
    # the unmatched lefts MUST NOT have emitted.
    assert got1 == {(1, 101)}, got1

    spark.createDataFrame(hb_l, EVENT_DDL).write.parquet(str(src_l / "b1"))
    spark.createDataFrame(hb_r, EVENT_DDL).write.parquet(str(src_r / "b1"))
    for _ in range(3):  # restart until the no-data batch flushes expired state
        run_once()
        if len(collect()) >= 3:
            break
    got2 = collect()

    # Batch equivalence over the expired region: every batch-0 left row's
    # window is now below the watermark (9h), so the stream output must
    # equal the batch LEFT join restricted to rows the watermark released
    # (the heartbeat left at 10h is still in state, hence absent).
    bl = spark.createDataFrame(clicks_b0 + hb_l, EVENT_DDL).selectExpr(
        "event_id AS click_id", "ts AS click_ts", "user_id"
    )
    br = spark.createDataFrame(buys_b0 + hb_r, EVENT_DDL).selectExpr(
        "event_id AS buy_id", "ts AS buy_ts", "user_id"
    )
    batch = bl.join(
        br,
        (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 5 minutes"))
        & (bl.user_id == br.user_id),
        "left",
    ).select("click_id", "buy_id")
    want = {
        (r.click_id, r.buy_id) for r in batch.collect() if r.click_id != 998
    }
    assert got2 == want == {(1, 101), (2, None), (3, None)}, got2


def test_stream_stream_full_outer_interval_join(spark, tmp_path):
    """FULL OUTER variant: unmatched rows on BOTH sides emit
    null-extended after the watermark passes their join window."""
    import glob

    from beast_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1)

    def m(minutes):
        return base + dt.timedelta(minutes=minutes)

    clicks_b0 = [(1, m(0), 1, "click", 1.0), (2, m(5), 2, "click", 1.0)]
    buys_b0 = [(101, m(2), 1, "buy", 9.0), (102, m(8), 3, "buy", 9.0)]
    hb_l = [(998, m(600), 998, "click", 0.0)]
    hb_r = [(999, m(600), 999, "buy", 0.0)]

    src_l, src_r = tmp_path / "l", tmp_path / "r"
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(clicks_b0, EVENT_DDL).write.parquet(str(src_l / "b0"))
    spark.createDataFrame(buys_b0, EVENT_DDL).write.parquet(str(src_r / "b0"))
    schema = spark.createDataFrame([], EVENT_DDL).schema

    def run_once():
        ls = spark.readStream.schema(schema).parquet(str(src_l) + "/*").selectExpr(
            "event_id AS click_id", "ts AS click_ts", "user_id"
        )
        rs = spark.readStream.schema(schema).parquet(str(src_r) + "/*").selectExpr(
            "event_id AS buy_id", "ts AS buy_ts", "user_id"
        )
        joined = interval_join(
            ls, rs, ["user_id"], "click_ts", "buy_ts", watermark="1 hour",
            lower="0 seconds", upper="5 minutes", how="full_outer",
        ).select("click_id", "buy_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    def collect():
        if not glob.glob(out_dir + "/*.parquet"):
            return set()
        return {(r.click_id, r.buy_id) for r in spark.read.parquet(out_dir).collect()}

    run_once()
    assert collect() == {(1, 101)}
    spark.createDataFrame(hb_l, EVENT_DDL).write.parquet(str(src_l / "b1"))
    spark.createDataFrame(hb_r, EVENT_DDL).write.parquet(str(src_r / "b1"))
    for _ in range(3):
        run_once()
        if len(collect()) >= 4:
            break
    # Both the unmatched left (2) and the unmatched right (102) flush;
    # the 10h heartbeats are still within watermark and stay in state.
    assert collect() == {(1, 101), (2, None), (None, 102)}
