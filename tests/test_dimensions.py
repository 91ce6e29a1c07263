"""Streaming SCD2 maintenance: the history table a changelog stream
maintains batch-by-batch must equal the from-scratch rebuild over all
rows, and replays must be no-ops (swap-committed ledger)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from beast_spark.operators.scd import scd2_from_changelog
from beast_spark.streaming.dimensions import Scd2Maintainer

DDL = "k long, seq long, ts timestamp, v string"
ARGS = dict(key_cols=["k"], attr_col="v", order_cols=["ts", "seq"])


def _rows(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _histset(df):
    return {tuple(r) for r in df.collect()}


def test_streamed_history_equals_full_rebuild(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)

    def at(d):
        return t0 + dt.timedelta(days=d)

    b0 = [(1, 1, at(0), "A"), (1, 2, at(1), "A"), (2, 1, at(0), "X")]
    b1 = [(1, 3, at(2), "B"), (3, 1, at(2), "Z")]
    b2 = [(1, 4, at(3), "B"), (2, 2, at(3), "Y")]

    src = tmp_path / "src"
    for i, b in enumerate([b0, b1, b2]):
        _rows(spark, b).coalesce(1).write.parquet(str(src / f"b{i}"))

    m = Scd2Maintainer(str(tmp_path / "hist"), **ARGS)
    stream = (
        spark.readStream.schema(_rows(spark, []).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = m.stream_from(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert len(m.applied_batches()) == 3
    got = _histset(m.read_history(spark))
    want = _histset(scd2_from_changelog(_rows(spark, b0 + b1 + b2), **ARGS))
    assert got == want

    # restarting with the same checkpoint and no new data changes nothing
    q2 = m.stream_from(
        spark.readStream.schema(_rows(spark, []).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert _histset(m.read_history(spark)) == want


def test_replayed_batch_is_noop(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    m = Scd2Maintainer(str(tmp_path / "hist"), **ARGS)
    b0 = _rows(spark, [(1, 1, t0, "A")])
    b1 = _rows(spark, [(1, 2, t0 + dt.timedelta(days=1), "B")])
    m.apply_batch(b0, 0)
    m.apply_batch(b1, 1)
    want = _histset(m.read_history(spark))
    # simulate the driver replaying batch 1 after a post-swap crash:
    # n_rows must NOT double
    m.apply_batch(b1, 1)
    assert _histset(m.read_history(spark)) == want
    assert m.applied_batches() == {0, 1}


def test_crashed_swap_recovers(spark, tmp_path):
    import os

    t0 = dt.datetime(2024, 1, 1)
    m = Scd2Maintainer(str(tmp_path / "hist"), **ARGS)
    m.apply_batch(_rows(spark, [(1, 1, t0, "A")]), 0)
    want = _histset(m.read_history(spark))
    # simulate a crash between the two renames: live gone, .replaced left
    os.rename(m.history_path, m.history_path + ".replaced")
    assert m.read_history(spark) is not None  # _recover healed it
    assert _histset(m.read_history(spark)) == want


def test_versioned_scd2_maintainer_time_travels(spark, tmp_path):
    """Each batch commits a snapshot of the history; current == full
    rebuild, intermediate versions == rebuild over their prefix."""
    import datetime as dt

    from beast_spark.streaming.dimensions import VersionedScd2Maintainer

    t0 = dt.datetime(2024, 1, 1)

    def at(d):
        return t0 + dt.timedelta(days=d)

    b0 = [(1, 1, at(0), "A"), (2, 1, at(0), "X")]
    b1 = [(1, 2, at(1), "B")]
    m = VersionedScd2Maintainer(str(tmp_path / "vhist"), **ARGS)
    m.apply_batch(_rows(spark, b0), 0)
    m.apply_batch(_rows(spark, b1), 1)
    m.apply_batch(_rows(spark, b1), 1)  # replay: no-op
    assert m.versions() == [1, 2]
    assert m.applied_batches() == {0, 1}
    assert _histset(m.read_history(spark)) == _histset(
        scd2_from_changelog(_rows(spark, b0 + b1), **ARGS)
    )
    assert _histset(m.read(spark, version=1)) == _histset(
        scd2_from_changelog(_rows(spark, b0), **ARGS)
    )


def test_versioned_maintainer_exposes_history_path(tmp_path):
    """The backend-generic history_path accessor must work on BOTH commit
    backends (SwapCommittedTable stores .path, VersionedTable .root —
    the versioned variant aliases it)."""
    from beast_spark.streaming.dimensions import VersionedScd2Maintainer

    root = str(tmp_path / "vhist2")
    m = VersionedScd2Maintainer(root, **ARGS)
    assert m.history_path == root
