"""Streaming embedding near-dup maintenance: streamed index + pair set
must equal the full multi-table rebuild over everything ingested, batch
by batch, with exactly-once replay — at the PRODUCTION multi-table
configuration (the single-table config q172 measures at ~7% pair
recall is no longer the maintainer's default)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _run_once(spark, m, src_dir, ckpt):
    schema = "vec_id long, embedding array<double>, label long"
    stream = spark.readStream.schema(schema).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def test_streamed_neardup_equals_full_rebuild_per_prefix(spark, sf_dir, tmp_path):
    """At the production config (75 tables × 8 planes): after every
    micro-batch, the accumulated pair set equals a full
    lsh_multitable_neardup_pairs rebuild over everything ingested."""
    from beast_spark.operators.similarity import lsh_multitable_neardup_pairs
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
        F.lit(0).alias("label"),
    )
    thr = 0.3
    slices = [e.filter(F.col("vec_id") % 3 == k) for k in range(3)]
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = EmbeddingNearDupMaintainer(str(tmp_path / "state"), dims=64, threshold=thr)

    seen = None
    for k, sl in enumerate(slices):
        sl.write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        seen = sl if seen is None else seen.unionByName(sl)
        got = {(r.vec1, r.vec2, r.cos_sim) for r in m.read_pairs(spark).collect()}
        want = {
            (r.vec1, r.vec2, r.cos_sim)
            for r in lsh_multitable_neardup_pairs(
                seen, dims=64, threshold=thr, tables=m.tables
            ).collect()
        }
        assert got == want, f"prefix {k}"
        assert m.read_vectors(spark).count() == seen.count()
        assert m.read_postings(spark).count() == seen.count() * len(m.tables)
    assert got  # the run actually found pairs


def test_streamed_neardup_restart_and_replay_noop(spark, tmp_path):
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>, label long"
    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)], 0) for i in range(30)]
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=0.9, n_planes=4, n_tables=8
    )
    spark.createDataFrame(rows[:15], ddl).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    spark.createDataFrame(rows[15:], ddl).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    before = {tuple(r) for r in m.read_pairs(spark).collect()}
    applied = m.applied_batches()

    # restart with no new data
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert m.applied_batches() == applied
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == before

    # post-commit crash replay of an applied batch: no double-counted pairs
    m.apply_batch(spark.createDataFrame(rows[15:], ddl), max(applied))
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == before


def test_streamed_neardup_releases_operator_caches(spark, tmp_path):
    """The operator persists its per-batch increment frames; the
    maintainer must unpersist them after commit or a long-lived stream
    accumulates cached blocks every micro-batch (round-5 ADVICE)."""
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>, label long"
    rows = [(i, [float((i * 3 + d) % 7) for d in range(8)], 0) for i in range(40)]
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=0.9, n_planes=4, n_tables=8
    )
    # start from a clean cache: the session fixture is shared, and the
    # async ContextCleaner collecting OTHER tests' stale blocks
    # mid-test makes a before/after equality flaky in full-suite runs
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for b in range(4):
        m.apply_batch(spark.createDataFrame(rows[b * 10 : (b + 1) * 10], ddl), b)
    assert jsc.getPersistentRDDs().size() <= before


def test_streamed_neardup_rejects_old_single_table_state(spark, tmp_path):
    """A state dir written by the pre-multi-table maintainer (an 'index'
    sub-table) must raise, not be silently treated as an empty
    postings+vectors index while its pairs and ledger are honored."""
    import json
    import os

    import pytest

    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    state = tmp_path / "state"
    spark.createDataFrame(
        [(1, [1.0, 0.0], 100, 1.0)],
        "vec_id long, embedding array<double>, bucket long, nrm double",
    ).write.parquet(str(state / "index"))
    with open(state / "_applied_batches.json", "w") as fh:
        json.dump([0], fh)

    m = EmbeddingNearDupMaintainer(str(state), dims=2, n_planes=2, n_tables=2)
    batch = spark.createDataFrame(
        [(2, [0.0, 1.0], 0)], "vec_id long, embedding array<double>, label long"
    )
    with pytest.raises(ValueError, match="single-table"):
        m.apply_batch(batch, 1)
