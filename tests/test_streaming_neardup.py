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


def test_streamed_neardup_cross_batch_resend_supersedes(spark, tmp_path):
    """The round-10 verdict's last semantic gap: an id re-sent in a
    LATER batch with a NEW payload must supersede its stored rows —
    after the corrective batch, the live postings/vectors/pairs views
    equal a full batch rebuild over each id's LATEST payload."""
    from beast_spark.operators.similarity import lsh_multitable_neardup_pairs
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>"
    thr = 0.9

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    true_rows = [(i, vec(i)) for i in range(30)]
    # ids 0..9 first arrive with a WRONG payload (reversed vector)
    wrong = [(i, list(reversed(vec(i)))) for i in range(10)]
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=thr, n_planes=4, n_tables=8
    )
    m.apply_batch(spark.createDataFrame(wrong + true_rows[10:20], ddl), 0)
    m.apply_batch(spark.createDataFrame(true_rows[20:], ddl), 1)
    # the corrective re-send: ids 0..9 with their true payload
    m.apply_batch(spark.createDataFrame(true_rows[:10], ddl), 2)

    want_pairs = {
        tuple(r)
        for r in lsh_multitable_neardup_pairs(
            spark.createDataFrame(true_rows, ddl),
            dims=8,
            threshold=thr,
            tables=m.tables,
        ).collect()
    }
    got_pairs = {tuple(r) for r in m.read_pairs(spark).collect()}
    assert got_pairs == want_pairs
    # live vectors are the LATEST payloads, one row per id
    got_vecs = {
        (r["vec_id"], tuple(r["embedding"])) for r in m.read_vectors(spark).collect()
    }
    assert got_vecs == {(i, tuple(v)) for i, v in true_rows}
    # live postings match a re-bucketing of the latest payloads, and the
    # maintained occupancy equals a countDistinct over the live postings
    assert m.read_postings(spark).count() == len(true_rows) * len(m.tables)
    occ = {
        (r["t"], r["bucket"]): r["n_exist"]
        for r in m.read_occupancy(spark).collect()
    }
    live = {
        (r["t"], r["bucket"]): r["n"]
        for r in m.read_postings(spark)
        .groupBy("t", "bucket")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == live
    # the re-send log carries the watermark
    assert {
        (r["vec_id"], r["batch_id"]) for r in m.read_resent(spark).collect()
    } == {(i, 2) for i in range(10)}
    # replay of the corrective batch after a post-commit crash: no-op
    m.apply_batch(spark.createDataFrame(true_rows[:10], ddl), 2)
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == want_pairs


def test_streamed_neardup_resend_identical_payload_is_stable(spark, tmp_path):
    """A retry that re-sends an UNCHANGED payload must leave the live
    views exactly as a rebuild would: same pairs, one live vector row,
    occupancy unchanged."""
    from beast_spark.operators.similarity import lsh_multitable_neardup_pairs
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>"
    rows = [(i, [float((i * 3 + d) % 7) for d in range(8)]) for i in range(20)]
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=0.9, n_planes=4, n_tables=8
    )
    m.apply_batch(spark.createDataFrame(rows, ddl), 0)
    m.apply_batch(spark.createDataFrame(rows[5:8], ddl), 1)  # pure retry
    want = {
        tuple(r)
        for r in lsh_multitable_neardup_pairs(
            spark.createDataFrame(rows, ddl), dims=8, threshold=0.9, tables=m.tables
        ).collect()
    }
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == want
    assert m.read_vectors(spark).count() == len(rows)
    occ = {
        (r["t"], r["bucket"]): r["n_exist"]
        for r in m.read_occupancy(spark).collect()
    }
    live = {
        (r["t"], r["bucket"]): r["n"]
        for r in m.read_postings(spark)
        .groupBy("t", "bucket")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == live


def test_streamed_neardup_resend_under_cap_no_backfill(spark, tmp_path):
    """The documented cap/re-send interaction (round-11 review): a
    re-send decrement that brings a previously-over bucket back under
    max_bucket does NOT back-fill the existing-vs-existing pairs the
    bucket skipped while over (the capped batch rebuild's own
    non-monotone behavior class) — but later increments DO mine
    against the now-under-cap bucket again, and the occupancy stays
    exact."""
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>"
    # one plane table so every near-identical vector lands in ONE bucket
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=4, threshold=0.9,
        n_planes=2, n_tables=1, max_bucket=3,
    )
    v = [1.0, 0.02, 0.0, 0.0]
    far = [-1.0, 0.5, 0.3, 0.1]
    # batch 0: 3 near-identical vectors — at cap, pairs mined
    m.apply_batch(spark.createDataFrame([(i, v) for i in range(3)], ddl), 0)
    assert m.read_pairs(spark).count() == 3  # all 3 pairs of {0,1,2}
    # batch 1: a 4th lands in the same bucket — crosses the cap: no new
    # pairs, accounting row committed, earlier pairs kept (never un-found)
    m.apply_batch(spark.createDataFrame([(3, v)], ddl), 1)
    assert m.read_pairs(spark).count() == 3
    assert m.read_capped(spark).count() == 1
    # batch 2: id 1 re-sent with a payload hashing to a DIFFERENT
    # bucket — the decrement brings the bucket back to 3 (= cap).
    # Documented: id 3's skipped pairs with {0, 2} are NOT back-filled;
    # id 1's old pairs (stale payload) are filtered out.
    m.apply_batch(spark.createDataFrame([(1, far)], ddl), 2)
    live = {(r["vec1"], r["vec2"]) for r in m.read_pairs(spark).collect()}
    assert live == {(0, 2)}
    # occupancy reflects the decrement exactly
    occ = {
        (r["t"], r["bucket"]): r["n_exist"]
        for r in m.read_occupancy(spark).collect()
    }
    livepost = {
        (r["t"], r["bucket"]): r["n"]
        for r in m.read_postings(spark)
        .groupBy("t", "bucket")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == livepost
    # batch 3: re-sending id 3 (unchanged payload) supersedes its old
    # row and re-probes the now-under-cap bucket {0, 2} — so the pairs
    # the cap skipped at batch 1 are re-mined THROUGH the re-send, and
    # the live view converges to exactly the batch rebuild over the
    # latest payloads (bucket {0,2,3} = 3 <= cap mines all pairs).
    # back-fill is never automatic, but any re-send of a skipped member
    # recovers its pairs
    m.apply_batch(spark.createDataFrame([(3, v)], ddl), 3)
    assert {(r["vec1"], r["vec2"]) for r in m.read_pairs(spark).collect()} == {
        (0, 2),
        (0, 3),
        (2, 3),
    }


def test_neardup_compact_resends_read_equivalence(spark, tmp_path):
    """compact_resends (round-12, verdict #1): after a corrupted-then-
    corrected choreography, folding the re-send state must (a) leave
    every live view bit-identical, (b) truncate the resent log so
    reads stop paying the watermark join, (c) shrink on-disk bytes,
    and (d) keep the contract live for FURTHER re-sends."""
    from beast_spark.operators.similarity import lsh_multitable_neardup_pairs
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>"
    thr = 0.9

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    true_rows = [(i, vec(i)) for i in range(30)]
    wrong = [(i, list(reversed(vec(i)))) for i in range(10)]
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=thr, n_planes=4, n_tables=8
    )
    m.apply_batch(spark.createDataFrame(wrong + true_rows[10:20], ddl), 0)
    m.apply_batch(spark.createDataFrame(true_rows[20:], ddl), 1)
    m.apply_batch(spark.createDataFrame(true_rows[:10], ddl), 2)

    before_pairs = {tuple(r) for r in m.read_pairs(spark).collect()}
    before_vecs = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    before_post = {tuple(r) for r in m.read_postings(spark).collect()}
    before_occ = {tuple(r) for r in m.read_occupancy(spark).collect()}

    def _bytes(path):
        total = 0
        for root, _d, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    bytes_before = _bytes(str(tmp_path / "state"))
    assert m.compact_resends(spark) is True
    # live views identical, watermark log gone, dead bytes gone
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == before_pairs
    assert {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    } == before_vecs
    assert {tuple(r) for r in m.read_postings(spark).collect()} == before_post
    assert {tuple(r) for r in m.read_occupancy(spark).collect()} == before_occ
    assert m.read_resent(spark) is None
    assert _bytes(str(tmp_path / "state")) < bytes_before
    # stamps preserved: the raw sub still carries _b (contract-mode dir)
    assert "_b" in m._read_sub(spark, "vectors").columns
    # the id-lookup side collapsed to one row per ever-seen id
    ids = m._read_sub(spark, "ids")
    assert ids.count() == ids.select("vec_id").distinct().count() == 30
    # idempotent / no-op second call
    assert m.compact_resends(spark) is False
    # a FURTHER re-send after compaction still supersedes correctly
    moved = [(3, vec(97)), (31, vec(31))]
    m.apply_batch(spark.createDataFrame(moved, ddl), 3)
    latest = {i: v for i, v in true_rows}
    latest.update({i: v for i, v in moved})
    want = {
        tuple(r)
        for r in lsh_multitable_neardup_pairs(
            spark.createDataFrame(sorted(latest.items()), ddl),
            dims=8,
            threshold=thr,
            tables=m.tables,
        ).collect()
    }
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == want
    assert {
        (r["vec_id"], r["batch_id"]) for r in m.read_resent(spark).collect()
    } == {(3, 3)}


def test_neardup_as_of_across_resend_and_fold(spark, tmp_path):
    """Generation time travel on the near-dup index (round-13 — the
    family-wide as_of_gen rollout): a retained generation's pair/
    vector views reproduce the snapshot it served — wrong payloads
    before the corrective re-send, corrected after — and stay exact
    ACROSS compact_resends, which physically deletes the live
    watermark log."""
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    ddl = "vec_id long, embedding array<double>"

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    true_rows = [(i, vec(i)) for i in range(30)]
    wrong = [(i, list(reversed(vec(i)))) for i in range(10)]
    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=8, threshold=0.9, n_planes=4,
        n_tables=8, gc_grace_gens=6,
    )
    m.apply_batch(spark.createDataFrame(wrong + true_rows[10:20], ddl), 0)
    m.apply_batch(spark.createDataFrame(true_rows[20:], ddl), 1)
    gen_wrong = m._manifest()["gen"]
    pairs_wrong = {tuple(r) for r in m.read_pairs(spark).collect()}
    vecs_wrong = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    m.apply_batch(spark.createDataFrame(true_rows[:10], ddl), 2)  # corrective
    gen_fixed = m._manifest()["gen"]
    pairs_fixed = {tuple(r) for r in m.read_pairs(spark).collect()}
    assert pairs_fixed != pairs_wrong  # the correction changed the graph

    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None  # live log folded away
    assert {tuple(r) for r in m.read_pairs(spark).collect()} == pairs_fixed
    # travel across the fold: both retained generations exact, the
    # travelled-to resent log readable from the old manifest
    assert m.read_resent(spark, as_of_gen=gen_fixed) is not None
    assert {
        tuple(r) for r in m.read_pairs(spark, as_of_gen=gen_fixed).collect()
    } == pairs_fixed
    assert {
        tuple(r) for r in m.read_pairs(spark, as_of_gen=gen_wrong).collect()
    } == pairs_wrong
    assert {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark, as_of_gen=gen_wrong).collect()
    } == vecs_wrong
