"""Streaming corpus-prep v3: retroactive SPAN removal maintained
incrementally — survivors must equal the batch q169 capstone over every
prefix of batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

DOC_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _run_once(spark, m, src_dir, ckpt):
    schema = DOC_DDL
    stream = spark.readStream.schema(schema).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def test_corpus_v3_stream_matches_batch_q169_per_prefix(spark, sf_dir, tmp_path):
    from beast_spark.queries.datapipe import q169_corpus_prep_v3
    from beast_spark.streaming.corpus_v3 import CorpusV3Maintainer

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slices = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = CorpusV3Maintainer(str(tmp_path / "state"))

    seen = None
    for k, sl in enumerate(slices):
        sl.write.parquet(str(src_dir / f"b{k}"))
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
        seen = sl if seen is None else seen.unionByName(sl)
        prefix_dir = tmp_path / f"prefix{k}"
        seen.coalesce(1).write.parquet(str(prefix_dir / "documents.parquet"))
        want = {
            (r.split, r.n_docs, r.total_tokens, r.id_checksum)
            for r in q169_corpus_prep_v3(spark, str(prefix_dir)).collect()
        }
        got = {
            (r.split, r.n_docs, r.total_tokens, r.id_checksum)
            for r in m.survivors_by_split(spark).collect()
        }
        assert got == want, f"prefix {k}: {got} != {want}"


def test_corpus_v3_retroactive_span_rewrites_accepted_doc(spark, tmp_path):
    """A doc accepted in batch 0 must be REWRITTEN (and here fully
    disqualified) when a later batch duplicates one of its runs."""
    from beast_spark.streaming.corpus_v3 import CorpusV3Maintainer

    # doc 1: 8-token run + 2 fresh tokens. Cleaned later to 2 tokens
    # (< min_clean_tokens) once doc 3 repeats the run.
    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    d1 = (1, f"{run} t1 t2", "en", "s1", 0)
    d2 = (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "en", "s1", 0)
    d3 = (3, f"z0 {run} z1 z2 z3 z4 z5", "en", "s2", 0)

    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = CorpusV3Maintainer(str(tmp_path / "state"))
    spark.createDataFrame([d1, d2], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert {r.doc_id for r in m.survivors(spark).collect()} == {1, 2}

    spark.createDataFrame([d3], DOC_DDL).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    # doc 1's run is now duplicated: cleaned falls to 2 tokens -> out.
    # doc 3 keeps 6 fresh tokens (z0..z5) -> in.
    assert {r.doc_id for r in m.survivors(spark).collect()} == {2, 3}


def test_corpus_v3_restart_replay_is_noop(spark, tmp_path):
    from beast_spark.streaming.corpus_v3 import CorpusV3Maintainer

    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = CorpusV3Maintainer(str(tmp_path / "state"))
    rows = [(1, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "s1", 0),
            (2, "h1 h2 h3 h4 h5 h6 h7 h8 h9", "en", "s1", 0)]
    spark.createDataFrame(rows, DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    before = {tuple(r) for r in m.survivors(spark).collect()}
    applied = m.applied_batches()

    _run_once(spark, m, src_dir, tmp_path / "ckpt")  # no new data
    assert m.applied_batches() == applied
    assert {tuple(r) for r in m.survivors(spark).collect()} == before

    m.apply_batch(spark.createDataFrame(rows[:1], DOC_DDL), max(applied))
    assert {tuple(r) for r in m.survivors(spark).collect()} == before
