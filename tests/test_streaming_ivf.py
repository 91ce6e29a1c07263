"""Streaming IVF ANN index maintenance: with frozen centroids (and,
optionally, a frozen int8 codebook) the maintained state and its search
results must equal the full-corpus batch forms after every prefix of
micro-batches, with exactly-once replay and an append-only id guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DDL = "vec_id long, embedding array<double>"


def _run_once(spark, m, src_dir, ckpt):
    stream = spark.readStream.schema(DDL).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _freeze(spark, sf_dir, tmp_path, codebook=False):
    """Write the frozen offline artifacts: centroids (deterministic
    stand-in: first 16 vectors by id) and optionally the int8 codebook
    derived from the full corpus."""
    from beast_spark.operators.similarity import quantization_params
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    cpath = str(tmp_path / "centroids")
    e.filter(F.col("vec_id") < 16).write.parquet(cpath)
    qpath = None
    if codebook:
        qpath = str(tmp_path / "codebook")
        quantization_params(e).write.parquet(qpath)
    m = IvfIndexMaintainer(str(tmp_path / "state"), cpath, codebook_path=qpath)
    return e, m


def test_streamed_ivf_state_equals_batch_per_prefix(spark, sf_dir, tmp_path):
    from beast_spark.operators.similarity import ivf_assign

    e, m = _freeze(spark, sf_dir, tmp_path)
    cent = spark.read.parquet(m.centroids_path)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    seen = None
    for k in range(3):
        sl = e.filter(F.col("vec_id") % 3 == k)
        sl.write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        seen = sl if seen is None else seen.unionByName(sl)
        got = {(r.vec_id, r.cid) for r in m.read_assigned(spark).collect()}
        want = {
            (r.vec_id, r.cid)
            for r in ivf_assign(seen, cent).select("vec_id", "cid").collect()
        }
        assert got == want and got, f"prefix {k}"
        assert m.read_vectors(spark).count() == seen.count()


def test_streamed_ivf_search_equals_one_shot_rebuild(spark, sf_dir, tmp_path):
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e, m = _freeze(spark, sf_dir, tmp_path)
    for b in range(2):
        m.apply_batch(e.filter(F.col("vec_id") % 2 == b), b)
    rebuilt = IvfIndexMaintainer(str(tmp_path / "state1"), m.centroids_path)
    rebuilt.apply_batch(e, 0)
    qs = e.filter(F.col("vec_id") < 5)
    got = {
        tuple(r) for r in m.search(spark, qs, nprobe=2, k=10).collect()
    }
    want = {
        tuple(r) for r in rebuilt.search(spark, qs, nprobe=2, k=10).collect()
    }
    assert got == want and got


def test_streamed_ivf_int8_search_equals_batch_composition(spark, sf_dir, tmp_path):
    """int8 path: maintained codes equal a one-shot quantization of the
    corpus against the same frozen codebook, and the composed search
    (dq shortlist → exact re-rank) equals the same composition computed
    over a single-batch rebuild."""
    from beast_spark.operators.similarity import quantize_codes
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e, m = _freeze(spark, sf_dir, tmp_path, codebook=True)
    for b in range(2):
        m.apply_batch(e.filter(F.col("vec_id") % 2 == b), b)
    codebook = spark.read.parquet(m.codebook_path)
    got_codes = {
        (r.vec_id, tuple(r.codes)) for r in m.read_codes(spark).collect()
    }
    want_codes = {
        (r.vec_id, tuple(r.codes)) for r in quantize_codes(e, codebook).collect()
    }
    assert got_codes == want_codes

    rebuilt = IvfIndexMaintainer(
        str(tmp_path / "state1"), m.centroids_path, codebook_path=m.codebook_path
    )
    rebuilt.apply_batch(e, 0)
    qs = e.filter(F.col("vec_id") < 5)
    got = {tuple(r) for r in m.search(spark, qs, nprobe=2, k=5).collect()}
    want = {tuple(r) for r in rebuilt.search(spark, qs, nprobe=2, k=5).collect()}
    assert got == want and got


def test_streamed_ivf_restart_replay_and_append_only_guard(spark, tmp_path):
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(30)]
    spark.createDataFrame(rows[:4], DDL).write.parquet(str(tmp_path / "centroids"))
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = IvfIndexMaintainer(str(tmp_path / "state"), str(tmp_path / "centroids"))
    spark.createDataFrame(rows[:15], DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    spark.createDataFrame(rows[15:], DDL).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    before = {tuple(r) for r in m.read_assigned(spark).collect()}
    applied = m.applied_batches()

    # restart with no new data: nothing reprocessed
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert m.applied_batches() == applied
    assert {tuple(r) for r in m.read_assigned(spark).collect()} == before

    # post-commit crash replay: ledger no-op
    m.apply_batch(spark.createDataFrame(rows[15:], DDL), max(applied))
    assert {tuple(r) for r in m.read_assigned(spark).collect()} == before

    # a NEW batch re-sending an ingested id raises under the fail-fast
    # policy (on_resend='reject' — the pre-round-12 default behavior)
    mr = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "centroids"), on_resend="reject"
    )
    with pytest.raises(ValueError, match="append-only"):
        mr.apply_batch(spark.createDataFrame(rows[:1], DDL), max(applied) + 1)
    # an intra-batch duplicate raises under EITHER policy (ambiguous)
    m2 = IvfIndexMaintainer(str(tmp_path / "state2"), str(tmp_path / "centroids"))
    with pytest.raises(ValueError, match="intra-batch duplicate"):
        m2.apply_batch(spark.createDataFrame([rows[0], rows[0]], DDL), 0)
    with pytest.raises(ValueError, match="on_resend"):
        IvfIndexMaintainer(
            str(tmp_path / "state3"), str(tmp_path / "centroids"), on_resend="x"
        )


def test_streamed_ivf_probe_broadcasts_and_never_shuffles_postings(
    spark, sf_dir, tmp_path
):
    """The search's candidate join must broadcast the (Q × nprobe)-sized
    probe list onto the postings scan — the corpus-sized assigned side
    joins with no shuffle Exchange below the broadcast join."""
    e, m = _freeze(spark, sf_dir, tmp_path)
    m.apply_batch(e, 0)
    qs = e.filter(F.col("vec_id") < 5)
    cand = m.candidates(spark, qs, nprobe=2)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the STREAMED side is printed between the join node and its
    # BroadcastExchange build side; the probe side inside the broadcast
    # may rank with a (Q × nprobe)-sized Exchange, the postings must not
    streamed_side = plan.split("BroadcastHashJoin")[-1].split("BroadcastExchange")[0]
    assert "Exchange" not in streamed_side, streamed_side
    # it IS the postings scan (the path string may be elided in toString)
    assert "struct<vec_id:bigint,cid:bigint>" in streamed_side, streamed_side


def test_streamed_pq_codes_and_adc_search_equal_batch(spark, sf_dir, tmp_path):
    """PQ tier: maintained codes equal a one-shot encode under the
    frozen per-subspace codebooks, and adc_search over the maintained
    state equals the batch ADC ranking (integer-exact, so set-equality
    of full rows including the adc values)."""
    from beast_spark.operators.similarity import (
        pq_adc_lut,
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    cpath, ppath = str(tmp_path / "centroids"), str(tmp_path / "pq_cb")
    e.filter(F.col("vec_id") < 16).write.parquet(cpath)
    pq_codebooks(e, dims=64).write.parquet(ppath)
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), cpath, pq_codebooks_path=ppath, dims=64
    )
    for b in range(2):
        m.apply_batch(e.filter(F.col("vec_id") % 2 == b), b)
    cb = spark.read.parquet(ppath)
    got_codes = {(r.vec_id, r.s, r.code) for r in m.read_pq(spark).collect()}
    want_codes = {(r.vec_id, r.s, r.code) for r in pq_codes(e, cb, 64).collect()}
    assert got_codes == want_codes and got_codes

    qs = e.filter(F.col("vec_id") < 5)
    got = {tuple(r) for r in m.adc_search(spark, qs, k=7).collect()}
    want = {
        tuple(r)
        for r in pq_adc_topk(
            pq_codes(e, cb, 64), pq_adc_lut(qs, cb, 64), k=7
        ).collect()
    }
    assert got == want and got


def test_rebuild_swaps_retrained_artifacts_atomically(spark, sf_dir, tmp_path):
    """Offline retrain: rebuild() against NEW centroids re-derives every
    derived sub-table from the maintained vectors, equals a fresh build
    under the new artifacts, and preserves the applied-batch ledger so
    the stream resumes exactly-once."""
    from beast_spark.operators.similarity import ivf_assign
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    c1, c2 = str(tmp_path / "cent1"), str(tmp_path / "cent2")
    e.filter(F.col("vec_id") < 8).write.parquet(c1)
    e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 24)).write.parquet(c2)
    m = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    for b in range(2):
        m.apply_batch(e.filter(F.col("vec_id") % 2 == b), b)
    applied = m.applied_batches()
    before = {(r.vec_id, r.cid) for r in m.read_assigned(spark).collect()}

    m.rebuild(spark, c2)
    after = {(r.vec_id, r.cid) for r in m.read_assigned(spark).collect()}
    want = {
        (r.vec_id, r.cid)
        for r in ivf_assign(e, spark.read.parquet(c2)).select("vec_id", "cid").collect()
    }
    assert after == want and after != before
    assert m.applied_batches() == applied  # ledger preserved
    # replay of an applied batch is still a no-op after the rebuild
    m.apply_batch(e.filter(F.col("vec_id") % 2 == 0), max(applied) - 1)
    assert {(r.vec_id, r.cid) for r in m.read_assigned(spark).collect()} == after


def test_artifact_swap_without_rebuild_is_rejected(spark, sf_dir, tmp_path):
    """Assignments are additive only while the frozen artifacts stay
    bit-identical: a maintainer pointed at different centroids (or a
    mid-stream enable of a codes tier) over existing state must raise,
    not silently mix index generations — the decontam marker pattern."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    c1, c2 = str(tmp_path / "cent1"), str(tmp_path / "cent2")
    e.filter(F.col("vec_id") < 8).write.parquet(c1)
    e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).write.parquet(c2)
    m = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    m.apply_batch(e.filter(F.col("vec_id") % 2 == 0), 0)

    # same state dir, retrained centroids, no rebuild(): rejected
    m2 = IvfIndexMaintainer(str(tmp_path / "state"), c2)
    with pytest.raises(ValueError, match="artifacts or config changed"):
        m2.apply_batch(e.filter(F.col("vec_id") % 2 == 1), 1)

    # mid-stream enable of the int8 tier: rejected (old vectors would
    # silently miss from the codes table)
    from beast_spark.operators.similarity import quantization_params

    qpath = str(tmp_path / "cb")
    quantization_params(e).write.parquet(qpath)
    m3 = IvfIndexMaintainer(str(tmp_path / "state"), c1, codebook_path=qpath)
    with pytest.raises(ValueError, match="artifacts or config changed"):
        m3.apply_batch(e.filter(F.col("vec_id") % 2 == 1), 1)

    # the original maintainer continues unaffected
    m.apply_batch(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert m.read_assigned(spark).count() == e.count()


def test_streamed_adc_reranked_equals_batch_composition(spark, sf_dir, tmp_path):
    """The production PQ recall point over streamed state: ADC
    shortlist from the maintained codes -> exact integer-L2 re-rank
    against the maintained vectors must equal the same composition
    computed from a one-shot batch encode (integer-exact, so full-row
    set equality including the d2i values)."""
    from pyspark.sql.window import Window

    from beast_spark.operators.similarity import (
        _d2i,
        pq_adc_lut,
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    cpath, ppath = str(tmp_path / "centroids"), str(tmp_path / "pq_cb")
    e.filter(F.col("vec_id") < 16).write.parquet(cpath)
    pq_codebooks(e, dims=64).write.parquet(ppath)
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), cpath, pq_codebooks_path=ppath, dims=64
    )
    for b in range(2):
        m.apply_batch(e.filter(F.col("vec_id") % 2 == b), b)
    qs = e.filter(F.col("vec_id") < 5)
    got = {
        tuple(r) for r in m.adc_search_reranked(spark, qs, k=7, shortlist=20).collect()
    }

    cb = spark.read.parquet(ppath)
    short = pq_adc_topk(pq_codes(e, cb, 64), pq_adc_lut(qs, cb, 64), k=20).select(
        "query_id", "vec_id"
    )
    qside = qs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("d2i"), F.col("vec_id"))
    want = {
        tuple(r)
        for r in short.join(e, "vec_id")
        .join(F.broadcast(qside), "query_id")
        .select(
            "query_id", "vec_id", _d2i(F.col("qvec"), F.col("embedding")).alias("d2i")
        )
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 7)
        .collect()
    }
    assert got == want and got


def test_marker_flips_atomically_with_rebuild(spark, sf_dir, tmp_path):
    """The frozen-artifact marker rides INSIDE the manifest, so rebuild
    installs state and marker in one rename: a maintainer restarted
    with the ORIGINAL artifact paths after a rebuild must be rejected —
    the crash-window scenario where a side-file marker written after
    the swap would have validated the old artifacts against rebuilt
    state and silently mixed index generations."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    e.filter(F.col("vec_id") < 8).write.parquet(c1)
    e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).write.parquet(c2)
    m = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    m.apply_batch(e.filter(F.col("vec_id") % 2 == 0), 0)
    m.rebuild(spark, c2)
    # no side-car marker file exists to drift out of sync
    assert not os.path.exists(str(tmp_path / "state") + ".meta.json")

    # restart pointed at the ORIGINAL artifacts: rejected, not mixed
    m_old = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    with pytest.raises(ValueError, match="artifacts or config changed"):
        m_old.apply_batch(e.filter(F.col("vec_id") % 2 == 1), 1)
    # restart pointed at the rebuilt artifacts: resumes
    m_new = IvfIndexMaintainer(str(tmp_path / "state"), c2)
    m_new.apply_batch(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert m_new.read_assigned(spark).count() == e.count()


def test_search_reads_validate_the_marker(spark, sf_dir, tmp_path):
    """READ paths validate the frozen-artifact marker too: after a
    rebuild, a search-only maintainer still pointed at the ORIGINAL
    centroids must raise — it would otherwise hash stale probe cells
    against new-generation assignments and return silently wrong
    candidates."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    e.filter(F.col("vec_id") < 8).write.parquet(c1)
    e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).write.parquet(c2)
    m = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    m.apply_batch(e, 0)
    m.rebuild(spark, c2)

    reader_old = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    with pytest.raises(ValueError, match="artifacts or config changed"):
        reader_old.candidates(spark, e.filter(F.col("vec_id") < 2))
    reader_new = IvfIndexMaintainer(str(tmp_path / "state"), c2)
    assert reader_new.search(spark, e.filter(F.col("vec_id") < 2), k=5).count()


def test_rebuild_works_over_legacy_unsharded_layout(spark, sf_dir, tmp_path):
    """rebuild() must succeed on a state dir whose assigned/vectors
    fragments predate the shard layout (plain unsharded appends): the
    drop + sharded-append form re-establishes the layout regardless of
    what it replaces — drift recovery cannot require a manual compact
    first."""
    from beast_spark.operators.similarity import ivf_assign
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    e = _emb(spark, sf_dir)
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    e.filter(F.col("vec_id") < 8).write.parquet(c1)
    e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).write.parquet(c2)
    m = IvfIndexMaintainer(str(tmp_path / "state"), c1)
    # hand-commit the PRE-SHARD layout: unsharded assigned + vectors
    cent = spark.read.parquet(c1)
    m.commit_delta(
        0,
        appends={
            "assigned": ivf_assign(e, cent).select("vec_id", "cid"),
            "vectors": e,
        },
        user_meta=m._meta(),
    )
    assert any("_shard=" not in leaf for leaf in m.sub_leaves("assigned"))

    m.rebuild(spark, c2)  # must not raise on the unsharded fragments
    assert all("_shard=" in leaf for leaf in m.sub_leaves("assigned"))
    assert all("_shard=" in leaf for leaf in m.sub_leaves("vectors"))
    want = {
        (r.vec_id, r.cid)
        for r in ivf_assign(e, spark.read.parquet(c2))
        .select("vec_id", "cid")
        .collect()
    }
    assert {(r.vec_id, r.cid) for r in m.read_assigned(spark).collect()} == want


def test_search_as_of_across_rebuild_boundary(spark, tmp_path):
    """Time-travel search validates against the TRAVELLED-TO
    generation's artifact fingerprints: after a rebuild with retrained
    centroids, the new-artifact maintainer is refused for a
    pre-rebuild generation (it would hash probe cells against the
    wrong centroids), while a maintainer pointed at the ORIGINAL
    artifacts reproduces the pre-rebuild search exactly."""
    import pytest as _pytest

    from beast_spark.streaming.ivf import IvfIndexMaintainer

    rows = [(i, [float((i * 3 + d) % 7 - 3) for d in range(8)]) for i in range(200)]
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    data.filter(F.col("vec_id") < 8).write.parquet(str(tmp_path / "cents_v1"))
    # retrained centroids: a different deterministic slice
    data.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).select(
        (F.col("vec_id") - 8).alias("vec_id"), "embedding"
    ).write.parquet(str(tmp_path / "cents_v2"))

    m = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cents_v1"), dims=8,
        gc_grace_gens=4,
    )
    m.apply_batch(data.filter(F.col("vec_id") % 2 == 0), 0)
    m.apply_batch(data.filter(F.col("vec_id") % 2 == 1), 1)
    qs = data.filter(F.col("vec_id") < 5)
    before = sorted(map(tuple, m.search(spark, qs, nprobe=2, k=5).collect()))

    m.rebuild(spark, str(tmp_path / "cents_v2"))
    # live search now runs under v2; the pre-rebuild generation was
    # built under v1 — the new-artifact maintainer must refuse it
    with _pytest.raises(ValueError, match="as-of read across a rebuild"):
        m.search(spark, qs, nprobe=2, k=5, as_of_gen=2)
    # a maintainer pointed at the ORIGINAL artifacts reproduces it
    old = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cents_v1"), dims=8,
        gc_grace_gens=4,
    )
    again = sorted(
        map(tuple, old.search(spark, qs, nprobe=2, k=5, as_of_gen=2).collect())
    )
    assert again == before
    # and the travelled read is a strict snapshot: a post-rebuild
    # append is invisible at generation 2
    m.apply_batch(
        spark.createDataFrame(
            [(500, [1.0] * 8)], "vec_id long, embedding array<double>"
        ),
        2,
    )
    still = sorted(
        map(tuple, old.search(spark, qs, nprobe=2, k=5, as_of_gen=2).collect())
    )
    assert still == before


def test_streamed_ivf_cross_batch_resend_supersedes(spark, tmp_path):
    """The round-12 re-send contract on the IVF index: an id re-sent in
    a LATER batch with a NEW payload supersedes its stored posting,
    vector and codes — search equals a fresh rebuild over each id's
    LATEST payload, compact_resends folds the dead rows out with
    identical reads, and the contract survives the fold."""
    from beast_spark.operators.similarity import quantization_params
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    true_rows = [(i, vec(i)) for i in range(30)]
    wrong = [(i, list(reversed(vec(i)))) for i in range(10)]
    spark.createDataFrame(true_rows[:4], DDL).write.parquet(
        str(tmp_path / "centroids")
    )
    quantization_params(spark.createDataFrame(true_rows, DDL)).write.parquet(
        str(tmp_path / "codebook")
    )
    m = IvfIndexMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "centroids"),
        codebook_path=str(tmp_path / "codebook"),
        dims=8,
    )
    m.apply_batch(spark.createDataFrame(wrong + true_rows[10:20], DDL), 0)
    m.apply_batch(spark.createDataFrame(true_rows[20:], DDL), 1)
    # the corrective re-send: ids 0..9 with their true payload
    m.apply_batch(spark.createDataFrame(true_rows[:10], DDL), 2)

    ref = IvfIndexMaintainer(
        str(tmp_path / "ref"),
        str(tmp_path / "centroids"),
        codebook_path=str(tmp_path / "codebook"),
        dims=8,
    )
    ref.apply_batch(spark.createDataFrame(true_rows, DDL), 0)
    qs = spark.createDataFrame(true_rows[:5], DDL)
    want = sorted(map(tuple, ref.search(spark, qs, nprobe=2, k=5).collect()))
    got = sorted(map(tuple, m.search(spark, qs, nprobe=2, k=5).collect()))
    assert got == want and got
    # live views hold one row per id, the LATEST payload
    assert m.read_assigned(spark).count() == 30
    vecs = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    assert vecs == {(i, tuple(v)) for i, v in true_rows}
    assert m.read_codes(spark).count() == 30
    assert {
        (r["vec_id"], r["batch_id"]) for r in m.read_resent(spark).collect()
    } == {(i, 2) for i in range(10)}
    # replay of the corrective batch: no-op
    m.apply_batch(spark.createDataFrame(true_rows[:10], DDL), 2)
    assert m.read_assigned(spark).count() == 30

    # the physical fold: identical reads, watermark log gone, dead rows
    # physically out (raw == live row counts), stamps preserved
    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None
    assert sorted(
        map(tuple, m.search(spark, qs, nprobe=2, k=5).collect())
    ) == want
    raw_vecs = m._read_sub(spark, "vectors")
    assert raw_vecs.count() == 30 and "_b" in raw_vecs.columns
    assert m._read_sub(spark, "codes").count() == 30
    assert m.compact_resends(spark) is False  # nothing left to fold
    # a FURTHER re-send after the fold still supersedes
    m.apply_batch(spark.createDataFrame([(3, vec(99))], DDL), 3)
    vecs = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    assert vecs == {(i, tuple(v)) for i, v in true_rows if i != 3} | {
        (3, tuple(vec(99)))
    }


def test_streamed_ivf_rebuild_folds_resends(spark, tmp_path):
    """rebuild() derives from LIVE vectors and drops the watermark log —
    a retrain is also a re-send fold — and the dir stays contract-mode
    (future re-sends still supersede the rebuilt rows)."""
    from beast_spark.operators.similarity import kmeans_lite
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    rows = [(i, vec(i)) for i in range(20)]
    spark.createDataFrame(rows[:4], DDL).write.parquet(str(tmp_path / "c0"))
    m = IvfIndexMaintainer(str(tmp_path / "state"), str(tmp_path / "c0"), dims=8)
    m.apply_batch(
        spark.createDataFrame([(0, list(reversed(vec(0))))] + rows[1:], DDL), 0
    )
    m.apply_batch(spark.createDataFrame(rows[:1], DDL), 1)  # corrective
    assert m.read_resent(spark) is not None
    cents = kmeans_lite(
        spark.createDataFrame(rows, DDL), k=4, iters=1
    ).select(F.col("cid").alias("vec_id"), F.col("cvec").alias("embedding"))
    cents.write.parquet(str(tmp_path / "c1"))
    m.rebuild(spark, str(tmp_path / "c1"))
    # the fold: watermark log dropped, one live row per id, true payloads
    assert m.read_resent(spark) is None
    vecs = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    assert vecs == {(i, tuple(v)) for i, v in rows}
    # contract survives the rebuild: a further re-send supersedes
    m.apply_batch(spark.createDataFrame([(5, vec(77))], DDL), 2)
    vecs = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_vectors(spark).collect()
    }
    assert vecs == {(i, tuple(v)) for i, v in rows if i != 5} | {(5, tuple(vec(77)))}


def test_search_as_of_across_resend_boundary(spark, tmp_path):
    """Time-travel across a RE-SEND: a retained pre-re-send generation
    must serve the ORIGINAL payload (filtered with the watermarks THAT
    generation saw — a later re-send must not retroactively hide rows
    that were live in the snapshot), while the live search serves the
    corrected payload."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(8)]

    rows = [(i, vec(i)) for i in range(30)]
    spark.createDataFrame(rows[:4], DDL).write.parquet(str(tmp_path / "cent"))
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), dims=8, gc_grace_gens=4
    )
    # batch 0 ingests id 5 with a WRONG payload; batch 1 corrects it
    wrong5 = (5, list(reversed(vec(5))))
    m.apply_batch(
        spark.createDataFrame([wrong5] + [r for r in rows if r[0] != 5], DDL), 0
    )
    qs = spark.createDataFrame(rows[:3], DDL)
    gen0 = m._manifest()["gen"]
    before = sorted(map(tuple, m.search(spark, qs, nprobe=2, k=5).collect()))
    m.apply_batch(spark.createDataFrame([rows[5]], DDL), 1)  # the re-send
    # live: the corrected payload — equals a fresh rebuild over latest
    ref = IvfIndexMaintainer(
        str(tmp_path / "ref"), str(tmp_path / "cent"), dims=8
    )
    ref.apply_batch(spark.createDataFrame(rows, DDL), 0)
    live = sorted(map(tuple, m.search(spark, qs, nprobe=2, k=5).collect()))
    assert live == sorted(
        map(tuple, ref.search(spark, qs, nprobe=2, k=5).collect())
    )
    # travelled-to: the PRE-re-send snapshot, wrong payload included
    asof = sorted(
        map(tuple, m.search(spark, qs, nprobe=2, k=5, as_of_gen=gen0).collect())
    )
    assert asof == before
    # the travelled-to vector view still holds the original payload
    old_vecs = m.live_rows(
        m._read_sub(spark, "vectors", as_of_gen=gen0),
        m.resend_watermarks(spark, "vec_id", as_of_gen=gen0),
        "vec_id",
        ["vec_id"],
    )
    got5 = [tuple(r["embedding"]) for r in old_vecs.filter(F.col("vec_id") == 5).collect()]
    assert got5 == [tuple(wrong5[1])]


def test_search_as_of_across_resend_fold(spark, tmp_path):
    """Time-travel across the RE-SEND FOLD (round-12 verdict missing
    #4): compact_resends physically rewrites the live sub-tables and
    drops the resent log from the LIVE manifest — but a retained
    pre-fold generation must stay fully readable: its manifest still
    references the pre-fold leaves (superseded rows included) and the
    old resent log, so search(as_of_gen=pre-fold) reproduces the
    travelled-to snapshot filtered with the watermarks THAT generation
    saw. Gates the one operation that physically deletes contract
    state against the retention contract (swap.py commit_delta grace
    window vs the drop=['resent'] flip)."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    def vec(i):
        return [float((i * 7 + d) % 5) for d in range(30)][:8]

    rows = [(i, vec(i)) for i in range(30)]
    spark.createDataFrame(rows[:4], DDL).write.parquet(str(tmp_path / "cent"))
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), dims=8, gc_grace_gens=6
    )
    wrong5 = (5, list(reversed(vec(5))))
    m.apply_batch(
        spark.createDataFrame([wrong5] + [r for r in rows if r[0] != 5], DDL), 0
    )
    qs = spark.createDataFrame(rows[:3], DDL)
    gen_pre_resend = m._manifest()["gen"]
    snap_pre_resend = sorted(
        map(tuple, m.search(spark, qs, nprobe=2, k=5).collect())
    )
    m.apply_batch(spark.createDataFrame([rows[5]], DDL), 1)  # corrective
    gen_post_resend = m._manifest()["gen"]
    snap_post_resend = sorted(
        map(tuple, m.search(spark, qs, nprobe=2, k=5).collect())
    )
    assert m.read_resent(spark) is not None

    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None  # live log folded away
    # live search unchanged by the fold
    assert (
        sorted(map(tuple, m.search(spark, qs, nprobe=2, k=5).collect()))
        == snap_post_resend
    )
    # travel ACROSS the fold to the post-re-send generation: its
    # manifest still references the pre-fold leaves AND the old resent
    # log, so the watermark filter reproduces the snapshot exactly
    assert (
        m.resend_watermarks(spark, "vec_id", as_of_gen=gen_post_resend)
        is not None
    )
    assert (
        sorted(
            map(
                tuple,
                m.search(
                    spark, qs, nprobe=2, k=5, as_of_gen=gen_post_resend
                ).collect(),
            )
        )
        == snap_post_resend
    )
    # ...and further back, to the PRE-re-send world: the superseded
    # (wrong) payload is live again per that generation's (empty)
    # watermark view
    assert (
        sorted(
            map(
                tuple,
                m.search(
                    spark, qs, nprobe=2, k=5, as_of_gen=gen_pre_resend
                ).collect(),
            )
        )
        == snap_pre_resend
    )
    old_vecs = m.live_rows(
        m._read_sub(spark, "vectors", as_of_gen=gen_pre_resend),
        m.resend_watermarks(spark, "vec_id", as_of_gen=gen_pre_resend),
        "vec_id",
        ["vec_id"],
    )
    got5 = [
        tuple(r["embedding"])
        for r in old_vecs.filter(F.col("vec_id") == 5).collect()
    ]
    assert got5 == [tuple(wrong5[1])]
