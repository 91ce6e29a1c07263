"""Retention + compaction: the maintenance jobs behind the day-partitioned
sink (expirationMs enforcement, BQTableDefinition.java:45-59; small-file
rewrite the BigQuery storage layer does implicitly)."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F

from beast_spark.streaming.evolution import SchemaEvolver
from beast_spark.streaming.maintenance import (
    compact_partition,
    expire_partitions,
    expired_partitions,
    partition_stats,
    recover_compaction,
)
from beast_spark.streaming.sink import WarehouseSink

NOW = dt.datetime(2024, 3, 1, 12, 0, 0)


def _write_days(spark, path, days, rows_per_day=10):
    for i, day in enumerate(days):
        df = spark.createDataFrame(
            [(i * 100 + j, day) for j in range(rows_per_day)], "id long, day string"
        ).withColumn("ts", F.to_timestamp("day"))
        sink = WarehouseSink(table_path=path, partition_col="ts")
        sink.push(df)


def test_expiry_drops_only_partitions_past_ttl(spark, tmp_path):
    path = str(tmp_path / "wh")
    _write_days(spark, path, ["2024-01-01", "2024-02-01", "2024-02-28"])
    ttl_30d = 30 * 86400000
    doomed = expired_partitions(spark, path, ttl_30d, now=NOW)
    assert [d for d, _ in doomed] == ["2024-01-01"]

    dropped = expire_partitions(spark, path, expiry_ms=ttl_30d, now=NOW)
    assert dropped == ["2024-01-01"]
    assert not glob.glob(f"{path}/dt=2024-01-01")
    remaining = spark.read.parquet(path)
    assert remaining.count() == 20  # the two younger partitions intact
    # idempotent: second run is a no-op
    assert expire_partitions(spark, path, expiry_ms=ttl_30d, now=NOW) == []


def test_expiry_zero_means_never(spark, tmp_path):
    path = str(tmp_path / "wh")
    _write_days(spark, path, ["2020-01-01"])
    assert expired_partitions(spark, path, 0, now=NOW) == []
    assert expire_partitions(spark, path, expiry_ms=0, now=NOW) == []


def test_expiry_reads_ttl_from_table_property(spark, tmp_path):
    """The documented loop closed: sync_properties records expirationMs
    (BQClient parity), expire_partitions enforces it, and the catalog
    stops listing the dropped partition."""
    path = str(tmp_path / "wh")
    _write_days(spark, path, ["2024-01-01", "2024-02-28"])
    spark.sql("CREATE DATABASE IF NOT EXISTS maint_test")
    spark.sql("DROP TABLE IF EXISTS maint_test.t")
    spark.sql(
        "CREATE TABLE maint_test.t (id long, day string, ts timestamp, insert_id string) "
        f"USING parquet PARTITIONED BY (dt date) LOCATION '{path}'"
    )
    spark.sql("MSCK REPAIR TABLE maint_test.t")
    assert spark.sql("SHOW PARTITIONS maint_test.t").count() == 2

    ev = SchemaEvolver(table="maint_test.t", partition_expiry_ms=30 * 86400000)
    ev.sync_properties(spark)
    dropped = expire_partitions(spark, path, table="maint_test.t", now=NOW)
    assert dropped == ["2024-01-01"]
    assert spark.sql("SHOW PARTITIONS maint_test.t").count() == 1
    spark.sql("DROP TABLE maint_test.t")


def test_expire_needs_a_ttl_source(spark, tmp_path):
    with pytest.raises(ValueError, match="expiry_ms"):
        expire_partitions(spark, str(tmp_path / "wh"))


def test_require_partition_filter_policy(spark, tmp_path):
    """A24's requirePartitionFilter=true: an unfiltered scan of the
    day-partitioned table is rejected; a dt-predicated one passes."""
    from beast_spark.streaming.maintenance import require_partition_filter

    path = str(tmp_path / "wh")
    _write_days(spark, path, ["2024-01-01", "2024-02-01"])
    unfiltered = spark.read.parquet(path)
    with pytest.raises(ValueError, match="partition filter"):
        require_partition_filter(unfiltered)
    filtered = unfiltered.filter(F.col("dt") == "2024-01-01")
    require_partition_filter(filtered)  # no raise
    # non-partitioned frames are not policed
    require_partition_filter(spark.range(5))


def test_compaction_rewrites_small_files_preserving_rows(spark, tmp_path):
    path = str(tmp_path / "wh")
    # 6 separate pushes → ≥6 file sets in one day partition
    for batch in range(6):
        df = spark.createDataFrame(
            [(batch * 10 + j, "2024-02-01") for j in range(10)], "id long, day string"
        ).withColumn("ts", F.to_timestamp("day"))
        WarehouseSink(table_path=path, partition_col="ts").push(df)
    before = partition_stats(spark, f"{path}/dt=2024-02-01")
    assert before["n_files"] >= 6
    rows_before = {r.id for r in spark.read.parquet(path).collect()}

    result = compact_partition(spark, path, "2024-02-01", target_file_bytes=1 << 30)
    assert result["compacted"] and result["after"]["n_files"] == 1
    rows_after = {r.id for r in spark.read.parquet(path).collect()}
    assert rows_after == rows_before  # lossless rewrite
    assert not glob.glob(f"{path}/.dt=*")  # no temp/replaced dirs left

    # already-compact partition: no-op
    again = compact_partition(spark, path, "2024-02-01", target_file_bytes=1 << 30)
    assert not again["compacted"]


def test_compaction_crash_between_renames_recovers(spark, tmp_path):
    """A crash between the two swap renames leaves the partition's data
    stranded in the hidden .dt=<day>.replaced dir (ADVICE r3: invisible
    to readers, no recovery). recover_compaction must restore it, and
    compact_partition must self-heal by running recovery first."""
    import os
    import shutil

    path = str(tmp_path / "wh")
    _write_days(spark, path, ["2024-02-01"], rows_per_day=20)
    rows = {r.id for r in spark.read.parquet(path).collect()}

    # Simulate the crash window: live renamed to .replaced, tmp never
    # swapped in → the partition is missing entirely.
    os.rename(f"{path}/dt=2024-02-01", f"{path}/.dt=2024-02-01.replaced")
    assert not glob.glob(f"{path}/dt=*")

    assert recover_compaction(spark, path) == ["2024-02-01"]
    assert {r.id for r in spark.read.parquet(path).collect()} == rows
    assert not glob.glob(f"{path}/.dt=*")
    assert recover_compaction(spark, path) == []  # idempotent

    # A completed swap whose cleanup delete crashed: stale .replaced
    # beside a live partition is deleted, not restored.
    shutil.copytree(f"{path}/dt=2024-02-01", f"{path}/.dt=2024-02-01.replaced")
    assert recover_compaction(spark, path) == []
    assert not glob.glob(f"{path}/.dt=*")
    assert {r.id for r in spark.read.parquet(path).collect()} == rows

    # compact_partition self-heals: crash state in, compacted table out.
    for batch in range(4):
        df = spark.createDataFrame(
            [(1000 + batch * 20 + j, "2024-02-02") for j in range(20)],
            "id long, day string",
        ).withColumn("ts", F.to_timestamp("day"))
        WarehouseSink(table_path=path, partition_col="ts").push(df)
    os.rename(f"{path}/dt=2024-02-01", f"{path}/.dt=2024-02-01.replaced")
    result = compact_partition(spark, path, "2024-02-02", target_file_bytes=1 << 30)
    assert result["compacted"]
    assert glob.glob(f"{path}/dt=2024-02-01")  # recovered by the compaction run
    assert {r.id for r in spark.read.parquet(path).collect()} > rows


def test_compaction_respects_target_file_size(spark, tmp_path):
    path = str(tmp_path / "wh")
    for batch in range(4):
        df = spark.createDataFrame(
            [(batch * 1000 + j, "2024-02-01") for j in range(1000)], "id long, day string"
        ).withColumn("ts", F.to_timestamp("day"))
        WarehouseSink(table_path=path, partition_col="ts").push(df)
    before = partition_stats(spark, f"{path}/dt=2024-02-01")
    # target ~ half the data → ≥2 output files, far fewer than before
    result = compact_partition(
        spark, path, "2024-02-01", target_file_bytes=before["total_bytes"] // 2
    )
    assert result["compacted"]
    assert 2 <= result["after"]["n_files"] < before["n_files"]
