"""Streaming gate accounting: the maintained per-rule counts must equal
the batch q180 computation over every prefix of micro-batches, with
exactly-once replay and a threshold-change guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _run_once(spark, m, src_dir, ckpt):
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = spark.readStream.schema(schema).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def test_streamed_gate_stats_equals_batch_per_prefix(spark, sf_dir, tmp_path):
    from beast_spark.streaming.gatestats import GateStatsMaintainer

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = GateStatsMaintainer(str(tmp_path / "state"))
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    seen = None
    for k in range(3):
        sl = d.filter(F.col("doc_id") % 3 == k)
        sl.write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        seen = sl if seen is None else seen.unionByName(sl)
        got = m.read_stats(spark).first().asDict()
        # the full q180-shaped row INCLUDING the derived retained_frac —
        # comparing raw counts alone would let a broken derivation pass
        from beast_spark.operators.quality import (
            gate_rejection_counts,
            gate_stats_row,
            gopher_signals,
        )

        want = gate_stats_row(
            gate_rejection_counts(gopher_signals(seen))
        ).first().asDict()
        assert set(got) == set(want)
        for key, v in want.items():
            assert got[key] == v, f"prefix {k}: {key} {got[key]} != {v}"


def test_streamed_gate_stats_replay_and_threshold_guard(spark, sf_dir, tmp_path):
    from beast_spark.streaming.gatestats import GateStatsMaintainer

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = GateStatsMaintainer(str(tmp_path / "state"))
    m.apply_batch(d.filter(F.col("doc_id") % 2 == 0), 0)
    before = tuple(m.read_stats(spark).first())

    # post-commit crash replay: no double counting
    m.apply_batch(d.filter(F.col("doc_id") % 2 == 0), 0)
    assert tuple(m.read_stats(spark).first()) == before

    # changed thresholds over existing state: rejected — on the READ
    # path too (a reader must not attribute old-regime counts to its
    # own config)
    m2 = GateStatsMaintainer(str(tmp_path / "state"), min_words=5)
    with pytest.raises(ValueError, match="GateStatsMaintainer"):
        m2.apply_batch(d.filter(F.col("doc_id") % 2 == 1), 1)
    with pytest.raises(ValueError, match="GateStatsMaintainer"):
        m2.read_stats(spark)


def test_gate_stats_tuple_kwargs_survive_marker_roundtrip(spark, sf_dir, tmp_path):
    """A tuple-valued gate kwarg (keep_cols) must not poison the meta
    marker: JSON reads tuples back as lists, so without normalization
    the second batch would spuriously raise 'thresholds changed'."""
    from beast_spark.streaming.gatestats import GateStatsMaintainer

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = GateStatsMaintainer(str(tmp_path / "state"), keep_cols=("lang",))
    m.apply_batch(d.filter(F.col("doc_id") % 2 == 0), 0)
    m.apply_batch(d.filter(F.col("doc_id") % 2 == 1), 1)  # must not raise
    assert m.read_stats(spark).first().n_docs == d.count()
