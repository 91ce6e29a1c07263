"""Streaming corpus-prep v3: retroactive SPAN removal maintained
incrementally — survivors must equal the batch q169 capstone over every
prefix of batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(params=["inline", "pointer"])
def v3_cls(request):
    from beast_spark.streaming.corpus_v3 import (
        CorpusV3Maintainer,
        CorpusV3PointerMaintainer,
    )

    return {"inline": CorpusV3Maintainer, "pointer": CorpusV3PointerMaintainer}[
        request.param
    ]

DOC_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _run_once(spark, m, src_dir, ckpt):
    schema = DOC_DDL
    stream = spark.readStream.schema(schema).format("parquet").load(str(src_dir) + "/*")
    q = m.stream_from(stream, str(ckpt))
    q.awaitTermination(180)


def test_corpus_v3_stream_matches_batch_q169_per_prefix(spark, sf_dir, tmp_path, v3_cls):
    from beast_spark.queries.datapipe import q169_corpus_prep_v3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slices = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = v3_cls(str(tmp_path / "state"))

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


def test_corpus_v3_retroactive_span_rewrites_accepted_doc(spark, tmp_path, v3_cls):
    """A doc accepted in batch 0 must be REWRITTEN (and here fully
    disqualified) when a later batch duplicates one of its runs."""
    # doc 1: 8-token run + 2 fresh tokens. Cleaned later to 2 tokens
    # (< min_clean_tokens) once doc 3 repeats the run.
    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    d1 = (1, f"{run} t1 t2", "en", "s1", 0)
    d2 = (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "en", "s1", 0)
    d3 = (3, f"z0 {run} z1 z2 z3 z4 z5", "en", "s2", 0)

    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = v3_cls(str(tmp_path / "state"))
    spark.createDataFrame([d1, d2], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    assert {r.doc_id for r in m.survivors(spark).collect()} == {1, 2}

    spark.createDataFrame([d3], DOC_DDL).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    # doc 1's run is now duplicated: cleaned falls to 2 tokens -> out.
    # doc 3 keeps 6 fresh tokens (z0..z5) -> in.
    assert {r.doc_id for r in m.survivors(spark).collect()} == {2, 3}


def test_corpus_v3_restart_replay_is_noop(spark, tmp_path, v3_cls):
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = v3_cls(str(tmp_path / "state"))
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


def test_corpus_v3_pointer_state_stores_no_text(spark, tmp_path):
    """The pointer maintainer's docs sub-table must hold (doc_id,
    source, src_path) — never document text — so state size is
    independent of document length; re-derivation reads text back from
    the immutable source files, including for retroactive rewrites."""
    from beast_spark.streaming.corpus_v3 import CorpusV3PointerMaintainer

    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    big = " ".join(f"tok{i}" for i in range(5000))  # ~40 KB of text
    d1 = (1, f"{run} {big}", "en", "s1", 0)
    d2 = (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "en", "s1", 0)
    d3 = (3, f"z0 {run} z1 z2 z3 z4 z5", "en", "s2", 0)

    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = CorpusV3PointerMaintainer(str(tmp_path / "state"))
    spark.createDataFrame([d1, d2], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    spark.createDataFrame([d3], DOC_DDL).write.parquet(str(src_dir / "b1"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")

    docs_state = m._read_sub(spark, "docs")
    assert set(docs_state.columns) == {"doc_id", "source", "src_path"}
    assert docs_state.count() == 3
    # the retroactive rewrite (doc 1's run duplicated by doc 3) worked
    # off re-read text: doc 1 survives on its 5000 fresh tokens, doc 3
    # keeps its 6 fresh tokens
    assert {r.doc_id for r in m.survivors(spark).collect()} == {1, 2, 3}
    sig = m._read_sub(spark, "signals")
    r1 = sig.filter(F.col("doc_id") == 1).collect()[0]
    assert r1.n_removed == 8 and r1.n_clean == 5000
    # on-disk docs state is pointer-sized, not corpus-sized
    sz = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(str(tmp_path / "state" / "docs"))
        for f in fs
    )
    assert sz < 20_000, sz


def test_corpus_v3_rejects_resent_doc_ids(spark, tmp_path, v3_cls):
    """The retroactive machinery assumes counts never decrease; a
    reprocessed source re-sending a (possibly shrunk) document would
    double-count its window hashes silently — the maintainer must raise
    on a NEW batch carrying an already-ingested id (a replayed batch id
    is still the documented ledger no-op)."""
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = v3_cls(str(tmp_path / "state"))
    rows = [(1, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "s1", 0)]
    spark.createDataFrame(rows, DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")

    shrunk = [(1, "p1 p2 p3 p4 p5 p6 p7 p8", "en", "s1", 0)]
    spark.createDataFrame(shrunk, DOC_DDL).write.parquet(str(src_dir / "b1"))
    with pytest.raises(Exception, match="append-only"):
        _run_once(spark, m, src_dir, tmp_path / "ckpt")


def test_corpus_v3_rejects_intra_batch_duplicate_ids(spark, tmp_path, v3_cls):
    """A doc_id repeated WITHIN one batch would double-count its window
    hashes (every window crosses the >=2 flag from its own duplicate) —
    the guard must catch it even though the id was never ingested."""
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = v3_cls(str(tmp_path / "state"))
    rows = [
        (1, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "s1", 0),
        (1, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "s1", 0),
    ]
    spark.createDataFrame(rows, DOC_DDL).write.parquet(str(src_dir / "b0"))
    with pytest.raises(Exception, match="append-only"):
        _run_once(spark, m, src_dir, tmp_path / "ckpt")


def test_corpus_v3_pointer_reread_pins_source_file(spark, tmp_path):
    """A sub-window-threshold row reusing an ingested doc_id is exactly
    the row that could ambush a pointer-form re-read (it never enters
    bdocs, so it lives only in the source files) — the PRE-filter
    append-only guard must reject it at ingestion; the re-read's
    (doc_id, src_path) composite join key remains as defense-in-depth
    behind that contract."""
    from beast_spark.streaming.corpus_v3 import CorpusV3PointerMaintainer

    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    d1 = (1, f"{run} t1 t2 t3 t4 t5", "en", "s1", 0)
    # decoy: same id, SHORT text (< 8 tokens -> would be filtered
    # before ingestion, invisible to a post-filter guard)
    decoy = (1, "short decoy", "en", "s1", 0)
    d3 = (3, f"z0 {run} z1 z2 z3 z4 z5", "en", "s2", 0)

    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    m = CorpusV3PointerMaintainer(str(tmp_path / "state"))
    spark.createDataFrame([d1], DOC_DDL).write.parquet(str(src_dir / "b0"))
    _run_once(spark, m, src_dir, tmp_path / "ckpt")
    spark.createDataFrame([decoy, d3], DOC_DDL).write.parquet(str(src_dir / "b1"))
    with pytest.raises(Exception, match="append-only"):
        _run_once(spark, m, src_dir, tmp_path / "ckpt")
    # state is untouched by the rejected batch (swap never ran)
    assert {r.doc_id for r in m.survivors(spark).collect()} == {1}


def test_corpus_v3_resend_rebuild_composition(spark, sf_dir, tmp_path, v3_cls):
    """The documented re-send answer GATED (round-12 verdict missing
    #3): after the append-only guard rejects a corrective re-send,
    rebuilding a fresh state dir from the latest payload per doc_id
    (last-writer-wins over the stamped ingest log) must serve exactly
    the batch q169 capstone over the true corpus — the q238 pattern,
    applied to the last re-send boundary in the maintainer family."""
    from pyspark.sql.window import Window as W

    from beast_spark.queries.datapipe import q169_corpus_prep_v3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corrupted = F.col("doc_id") % 7 == 0
    spam = F.concat_ws(
        " ", F.array_repeat(F.lit("lorem ipsum dolor sit amet"), 24)
    )
    b0 = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "text", F.when(corrupted, spam).otherwise(F.col("text"))
    )
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(corrupted | (F.col("doc_id") % 3 == 2))

    m = v3_cls(str(tmp_path / "state"))
    if v3_cls.__name__ == "CorpusV3PointerMaintainer":
        # pointer form re-reads text from immutable source files: stage
        # each batch as parquet and ingest with its file pointer (the
        # column stream_from derives from the file source's _metadata)
        staged = []
        for k, b in enumerate((b0, b1, b2)):
            p = tmp_path / f"src{k}"
            b.write.parquet(str(p))
            staged.append(
                spark.read.parquet(str(p)).withColumn(
                    "src_path", F.col("_metadata.file_path")
                )
            )
        b0, b1, b2 = staged
    m.apply_batch(b0, 0)
    m.apply_batch(b1, 1)
    with pytest.raises(ValueError, match="append-only"):
        m.apply_batch(b2, 2)

    log = (
        b0.withColumn("_b", F.lit(0))
        .unionByName(b1.withColumn("_b", F.lit(1)))
        .unionByName(b2.withColumn("_b", F.lit(2)))
    )
    latest = (
        log.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("_b").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_b")
    )
    if v3_cls.__name__ == "CorpusV3PointerMaintainer":
        # latest-payload view staged as an immutable source for pointers
        p = tmp_path / "latest"
        latest.write.parquet(str(p))
        latest = spark.read.parquet(str(p))
    rebuilt = v3_cls(str(tmp_path / "rebuilt"))
    for k in range(2):
        rebuilt.apply_batch(latest.filter(F.col("doc_id") % 2 == k), k)

    true_dir = tmp_path / "true"
    docs.coalesce(1).write.parquet(str(true_dir / "documents.parquet"))
    want = {
        (r.split, r.n_docs, r.total_tokens, r.id_checksum)
        for r in q169_corpus_prep_v3(spark, str(true_dir)).collect()
    }
    got = {
        (r.split, r.n_docs, r.total_tokens, r.id_checksum)
        for r in rebuilt.survivors_by_split(spark).collect()
    }
    assert got == want


def test_corpus_v3_survivors_as_of_matches_prefix(spark, sf_dir, tmp_path, v3_cls):
    """Generation time travel on the corpus-v3 maintainer (round-13 —
    the family-wide as_of_gen rollout): survivors(as_of_gen=k) must
    equal the batch q169 capstone over exactly the documents the
    travelled-to generation had ingested — including retroactive span
    rewrites that LATER batches applied, which must NOT leak backwards
    into the snapshot (all five sub-tables resolve through the same
    retained manifest)."""
    from beast_spark.queries.datapipe import q169_corpus_prep_v3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slices = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    m = v3_cls(str(tmp_path / "state"), gc_grace_gens=6)
    if v3_cls.__name__ == "CorpusV3PointerMaintainer":
        staged = []
        for k, sl in enumerate(slices):
            p = tmp_path / f"src{k}"
            sl.write.parquet(str(p))
            staged.append(
                spark.read.parquet(str(p)).withColumn(
                    "src_path", F.col("_metadata.file_path")
                )
            )
        slices = staged

    gens = []
    for k, sl in enumerate(slices):
        m.apply_batch(sl, k)
        gens.append(m._manifest()["gen"])

    for k, gen in enumerate(gens):
        prefix_dir = tmp_path / f"prefix{k}"
        prefix = docs.filter(F.col("doc_id") % 3 <= k)
        prefix.coalesce(1).write.parquet(str(prefix_dir / "documents.parquet"))
        want = {
            (r.split, r.n_docs, r.total_tokens, r.id_checksum)
            for r in q169_corpus_prep_v3(spark, str(prefix_dir)).collect()
        }
        got = {
            (r.split, r.n_docs, r.total_tokens, r.id_checksum)
            for r in m.survivors_by_split(spark, as_of_gen=gen).collect()
        }
        assert got == want, f"as_of gen {gen} (prefix {k}): {got} != {want}"
