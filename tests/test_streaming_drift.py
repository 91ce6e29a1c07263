"""Streaming PSI drift: the maintained current-window histogram (and
the PSI derived from it) must equal the batch computation over every
prefix of micro-batches, with exactly-once replay and a frozen-baseline
guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DDL = "event_id long, event_type string, value double, ts timestamp"


def _run_once(spark, m, src_dir, ckpt):
    stream = spark.readStream.schema(DDL).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def _events(spark, sf_dir):
    from beast_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )


def test_streamed_psi_equals_batch_per_prefix(spark, sf_dir, tmp_path):
    from beast_spark.streaming.drift import (
        DriftMaintainer,
        bucket_histogram,
        psi_from_histograms,
    )

    e = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    bucket_histogram(e.filter(F.col("ts") < cutoff)).write.parquet(
        str(tmp_path / "baseline")
    )
    baseline = spark.read.parquet(str(tmp_path / "baseline"))
    m = DriftMaintainer(str(tmp_path / "state"), str(tmp_path / "baseline"))
    cur = e.filter(F.col("ts") >= cutoff)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    seen = None
    for k in range(3):
        sl = cur.filter(F.col("event_id") % 3 == k)
        sl.write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        seen = sl if seen is None else seen.unionByName(sl)
        got = {tuple(r) for r in m.read_psi(spark).collect()}
        want = {
            tuple(r)
            for r in psi_from_histograms(
                baseline, bucket_histogram(seen)
            ).collect()
        }
        assert got == want and got, f"prefix {k}"


def test_streamed_psi_replay_noop_and_baseline_guard(spark, sf_dir, tmp_path):
    from beast_spark.streaming.drift import DriftMaintainer, bucket_histogram

    e = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    bucket_histogram(e.filter(F.col("ts") < cutoff)).write.parquet(
        str(tmp_path / "baseline")
    )
    m = DriftMaintainer(str(tmp_path / "state"), str(tmp_path / "baseline"))
    cur = e.filter(F.col("ts") >= cutoff)
    m.apply_batch(cur.filter(F.col("event_id") % 2 == 0), 0)
    before = {tuple(r) for r in m.read_psi(spark).collect()}

    # post-commit crash replay: ledger no-op (a re-applied batch would
    # double-count every event in it)
    m.apply_batch(cur.filter(F.col("event_id") % 2 == 0), 0)
    assert {tuple(r) for r in m.read_psi(spark).collect()} == before

    # baseline rewritten in place: rejected, not silently compared
    import shutil

    shutil.rmtree(str(tmp_path / "baseline"))
    bucket_histogram(e.filter(F.col("ts") < cutoff).limit(100)).write.parquet(
        str(tmp_path / "baseline")
    )
    with pytest.raises(ValueError, match="DriftMaintainer"):
        m.apply_batch(cur.filter(F.col("event_id") % 2 == 1), 1)

    # different bucket config over existing state: rejected too
    m2 = DriftMaintainer(
        str(tmp_path / "state"), str(tmp_path / "baseline"), width=25.0
    )
    with pytest.raises(ValueError, match="DriftMaintainer"):
        m2.apply_batch(cur.filter(F.col("event_id") % 2 == 1), 1)


def test_streamed_grid_ks_equals_batch_per_prefix(spark, sf_dir, tmp_path):
    """The grid-KS read of the maintained histogram equals the batch
    computation per prefix. (The grid_ks <= exact_ks estimator bound is
    checked per key by q190's hash-verified grid_le_exact column.)"""
    from beast_spark.streaming.drift import (
        DriftMaintainer,
        bucket_histogram,
        grid_ks_from_histograms,
    )

    e = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    bucket_histogram(
        e.filter(F.col("ts") < cutoff), width=5.0, n_buckets=100
    ).write.parquet(str(tmp_path / "baseline"))
    baseline = spark.read.parquet(str(tmp_path / "baseline"))
    m = DriftMaintainer(
        str(tmp_path / "state"), str(tmp_path / "baseline"), width=5.0, n_buckets=100
    )
    cur = e.filter(F.col("ts") >= cutoff)
    seen = None
    for k in range(2):
        sl = cur.filter(F.col("event_id") % 2 == k)
        m.apply_batch(sl, k)
        seen = sl if seen is None else seen.unionByName(sl)
        got = {tuple(r) for r in m.read_grid_ks(spark).collect()}
        want = {
            tuple(r)
            for r in grid_ks_from_histograms(
                baseline, bucket_histogram(seen, width=5.0, n_buckets=100)
            ).collect()
        }
        assert got == want and got, f"prefix {k}"


def test_grid_ks_new_key_reports_maximal_drift_instead_of_crashing(spark, tmp_path):
    """An event type that first appears AFTER the baseline freeze is
    exactly the drift the monitor exists to catch: its missing side's
    CDF is taken as 0, so the key reports grid_ks = 1.0 — never a
    divide-by-zero crash of the whole monitoring read."""
    from beast_spark.streaming.drift import grid_ks_from_histograms

    hist_ddl = "key string, bucket int, n long"
    baseline = spark.createDataFrame([("old", 0, 5), ("old", 1, 5)], hist_ddl)
    current = spark.createDataFrame(
        [("old", 0, 5), ("old", 1, 5), ("brand_new", 2, 7)], hist_ddl
    )
    got = {r.key: r.grid_ks for r in grid_ks_from_histograms(baseline, current).collect()}
    assert got == {"old": 0.0, "brand_new": 1.0}


def test_read_grid_ks_coarsen_rebins_and_bounds(spark, sf_dir, tmp_path):
    """The read-time grid parameter: coarsen=k rebins the maintained
    histogram additively, equals grid_ks over a directly-built k-times
    coarser histogram, never exceeds the fine-grid statistic (nested
    boundaries), and rejects a non-divisor factor (whose boundaries
    would not nest, voiding the contract chain)."""
    import pytest
    from pyspark.sql import functions as F

    from beast_spark.streaming.drift import (
        DriftMaintainer,
        bucket_histogram,
        grid_ks_from_histograms,
    )

    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    bucket_histogram(
        e.filter(F.col("ts") < cutoff), width=5.0, n_buckets=100
    ).write.parquet(str(tmp_path / "baseline"))
    m = DriftMaintainer(
        str(tmp_path / "state"), str(tmp_path / "baseline"), width=5.0, n_buckets=100
    )
    cur = e.filter(~F.coalesce(F.col("ts") < cutoff, F.lit(False)))
    m.apply_batch(cur, 0)

    got = {tuple(r) for r in m.read_grid_ks(spark, coarsen=5).collect()}
    want = {
        tuple(r)
        for r in grid_ks_from_histograms(
            bucket_histogram(e.filter(F.col("ts") < cutoff), width=25.0, n_buckets=20),
            bucket_histogram(cur, width=25.0, n_buckets=20),
        ).collect()
    }
    assert got == want and got

    fine = {r.key: r.grid_ks for r in m.read_grid_ks(spark).collect()}
    for r in m.read_grid_ks(spark, coarsen=5).collect():
        assert r.grid_ks <= fine[r.key], r.key

    with pytest.raises(ValueError, match="divisor"):
        m.read_grid_ks(spark, coarsen=3)
