"""Streaming decontamination: contamination stats maintained as the
eval set grows must equal the batch decontam_stats over every prefix of
eval batches, with exactly-once replay and an append-only guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DOC_DDL = "doc_id long, text string"


def _run_once(spark, m, src_dir, ckpt):
    stream = spark.readStream.schema(DOC_DDL).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def _mk(spark, tmp_path):
    from beast_spark.streaming.decontam import DecontamMaintainer

    run_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    run_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    run_c = "c1 c2 c3 c4 c5 c6 c7 c8"
    train = [
        (100, f"{run_a} x1 x2 {run_b}"),  # shares a with e1/e3, b with e2
        (101, f"{run_c} y1 y2 y3 y4 y5"),  # shares c with e3
        (102, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),  # clean forever
    ]
    spark.createDataFrame(train, DOC_DDL).write.parquet(str(tmp_path / "train"))
    m = DecontamMaintainer(str(tmp_path / "state"), str(tmp_path / "train"))
    evals = [
        (1, f"q0 {run_a} q1"),          # batch 0: contaminates 100 via a
        (2, f"{run_b} q2 q3 q4 q5 q6"),  # batch 1: contaminates 100 via b
        (3, f"{run_a} {run_c}"),         # batch 2: a ALREADY seen (still bumps
                                         # n_eval_docs for 100), c new for 101
        (4, "r1 r2 r3 r4 r5 r6 r7 r8"),  # batch 3: zero matches
    ]
    return m, train, evals, run_a, run_b, run_c


def test_streamed_decontam_equals_batch_per_prefix(spark, tmp_path):
    from beast_spark.operators.decontam import decontam_stats

    m, train, evals, *_ = _mk(spark, tmp_path)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    train_df = spark.createDataFrame(train, DOC_DDL)

    seen = []
    for k, ev in enumerate(evals):
        seen.append(ev)
        spark.createDataFrame([ev], DOC_DDL).write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        got = {
            (r.train_doc_id, r.n_eval_docs, r.n_shared_grams)
            for r in m.read_contaminated(spark).collect()
        }
        want = {
            (r.train_doc_id, r.n_eval_docs, r.n_shared_grams)
            for r in decontam_stats(
                train_df, spark.createDataFrame(seen, DOC_DDL)
            ).collect()
        }
        assert got == want, f"prefix {k}: {got} != {want}"
    # the never-contaminated doc survives in the clean view
    assert {r.doc_id for r in m.clean_corpus_ids(spark).collect()} == {102}


def test_streamed_decontam_restart_replay_and_guard(spark, tmp_path):
    m, train, evals, *_ = _mk(spark, tmp_path)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    spark.createDataFrame(evals[:2], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    before = {tuple(r) for r in m.read_contaminated(spark).collect()}
    applied = m.applied_batches()

    # restart with no new data: nothing reprocessed
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert m.applied_batches() == applied
    assert {tuple(r) for r in m.read_contaminated(spark).collect()} == before

    # post-commit crash replay: ledger no-op
    m.apply_batch(spark.createDataFrame(evals[:2], DOC_DDL), max(applied))
    assert {tuple(r) for r in m.read_contaminated(spark).collect()} == before

    # a NEW batch re-sending an ingested eval id raises (append-only)
    spark.createDataFrame([evals[0]], DOC_DDL).write.parquet(str(src_dir / "b1"))
    with pytest.raises(Exception, match="append-only"):
        _run_once(spark, m, src_dir, tmp_path / "ckpt")

    # an intra-batch duplicate raises too
    m2_dir = tmp_path / "state2"
    from beast_spark.streaming.decontam import DecontamMaintainer

    m2 = DecontamMaintainer(str(m2_dir), str(tmp_path / "train"))
    dup = spark.createDataFrame([evals[0], evals[0]], DOC_DDL)
    with pytest.raises(ValueError, match="append-only"):
        m2.apply_batch(dup, 0)


def test_streamed_decontam_postings_built_once_and_immutable(spark, tmp_path):
    m, train, evals, *_ = _mk(spark, tmp_path)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    spark.createDataFrame([evals[0]], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    ppath = str(tmp_path / "state") + ".train_postings"
    mtimes = {
        f: os.path.getmtime(os.path.join(ppath, f)) for f in os.listdir(ppath)
    }
    spark.createDataFrame([evals[1]], DOC_DDL).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert {
        f: os.path.getmtime(os.path.join(ppath, f)) for f in os.listdir(ppath)
    } == mtimes  # corpus-sized postings never rewritten per batch


def test_decontam_rejects_train_corpus_rewritten_in_place(spark, tmp_path):
    """A train corpus rewritten at the SAME path (same n, same
    train_path) must not silently probe postings built from the old
    bytes — the meta marker carries a content fingerprint of the corpus
    files, so the stale-postings probe raises instead."""
    import shutil

    m, train, evals, *_ = _mk(spark, tmp_path)
    m.apply_batch(spark.createDataFrame([evals[0]], DOC_DDL), 0)
    # rewrite the frozen corpus in place: drop a doc, keep path and config
    shutil.rmtree(str(tmp_path / "train"))
    spark.createDataFrame(train[:2], DOC_DDL).write.parquet(str(tmp_path / "train"))
    with pytest.raises(ValueError, match="train postings"):
        m.apply_batch(spark.createDataFrame([evals[1]], DOC_DDL), 1)


def test_decontam_probe_broadcasts_eval_and_never_shuffles_postings(spark, tmp_path):
    """The per-batch probe must broadcast the (benchmark-sized) eval
    grams onto the postings scan — the corpus-sized postings side joins
    with ZERO shuffle Exchange, so each trigger reads postings once and
    moves only matched rows into the per-doc aggregate."""
    from beast_spark.operators.decontam import doc_gram_postings

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(30)]
    spark.createDataFrame(rows, DOC_DDL).write.parquet(str(tmp_path / "train"))
    doc_gram_postings(spark.read.parquet(str(tmp_path / "train"))).select(
        "g", F.col("doc_id").alias("train_doc_id")
    ).write.parquet(str(tmp_path / "postings"))
    postings = spark.read.parquet(str(tmp_path / "postings"))
    bgrams = spark.createDataFrame(
        [("x", 1)], "g string, eval_doc_id long"
    )
    probe = (
        postings.join(F.broadcast(bgrams), "g")
        .groupBy("train_doc_id")
        .agg(F.countDistinct("eval_doc_id").alias("d_eval"))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # hash exchanges allowed only ABOVE the join (countDistinct's
    # dedup + final agg — both carry matched rows only); the postings
    # scan below the broadcast join never shuffles
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
    below_join = plan.split("BroadcastHashJoin")[-1]
    assert "Exchange hashpartitioning" not in below_join, below_join


def test_decontam_stats_matches_q109_on_the_documents_split(spark, sf_dir):
    """decontam_stats (the comparator the streamed maintainer is tested
    against) and q109 (the oracle-gated batch query) implement the gram
    rule independently — pin them equal on q109's own train/eval split
    so a tokenizer/encode/slice drift in EITHER copy breaks a test."""
    from beast_spark.operators.decontam import decontam_stats
    from beast_spark.queries.datapipe import q109_decontamination
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    got = {
        (r.train_doc_id, r.n_eval_docs, r.n_shared_grams)
        for r in decontam_stats(
            d.filter(F.col("source") != "src0"), d.filter(F.col("source") == "src0")
        ).collect()
    }
    want = {
        (r.train_doc_id, r.n_eval_docs, r.n_shared_grams)
        for r in q109_decontamination(spark, sf_dir).collect()
    }
    assert got == want and want
