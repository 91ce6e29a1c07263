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
