"""Streaming face of the corpus-prep pipeline (q89's batch semantics on
a document stream): quality filter → cross-batch exact dedup by content
fingerprint (streaming state) → deterministic split → warehouse append,
exactly-once across a checkpoint restart. This is how a 100 TB corpus is
actually built: documents arrive continuously, and the dedup state must
span micro-batches AND restarts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beast_spark.functions.hashing import md5_long
from beast_spark.functions.text import fingerprint, token_count, unique_ratio

DOC_DDL = "doc_id long, text string"


def _prep(stream):
    """The q89 stages, stream-side: filter → fingerprint → split."""
    n = token_count("text")
    kept = stream.filter(n.between(3, 100) & (unique_ratio("text") >= 0.5))
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        kept.withColumn("fp", fingerprint("text"))
        .dropDuplicates(["fp"])  # streaming state: first arrival wins, forever
        .withColumn("split", split)
        .withColumn("n_tokens", n)
    )


def test_streaming_corpus_prep_dedups_across_batches_and_restart(spark, tmp_path):
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    wh = str(tmp_path / "wh")

    def run_once():
        stream = spark.readStream.schema(DOC_DDL).format("parquet").load(str(src_dir) + "/*")
        q = (
            _prep(stream)
            .writeStream.format("parquet")
            .option("path", wh)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 0: 3 good docs (one duplicated content), 1 quality-reject
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha  beta gamma delta"),  # same fingerprint as doc 1
            (3, "epsilon zeta eta theta"),
            (4, "spam spam spam spam spam spam"),  # uniq_ratio too low
        ],
        DOC_DDL,
    ).write.parquet(str(src_dir / "b0"))
    run_once()
    rows = spark.read.parquet(wh).collect()
    # dup collapsed (one of doc 1/2 — in-batch dropDuplicates picks one),
    # low-quality doc 4 dropped
    assert len(rows) == 2
    ids = {r.doc_id for r in rows}
    assert len(ids & {1, 2}) == 1 and 3 in ids and 4 not in ids
    alpha_survivor = (ids & {1, 2}).pop()

    # batch 1 AFTER restart: a re-sent duplicate of the alpha content must
    # STAY deduped (state restored from checkpoint), new content lands
    spark.createDataFrame(
        [
            (5, "alpha beta  gamma delta"),  # dup of batch-0 content, across restart
            (6, "iota kappa lambda mu"),
        ],
        DOC_DDL,
    ).write.parquet(str(src_dir / "b1"))
    run_once()
    out = spark.read.parquet(wh)
    survivors = {alpha_survivor, 3, 6}
    assert {r.doc_id for r in out.collect()} == survivors

    # split assignment matches the batch operator (q88 determinism)
    batch_split = {
        r.doc_id: r.split
        for r in spark.createDataFrame([(i, "x") for i in survivors], DOC_DDL)
        .select(
            "doc_id",
            F.when(md5_long(F.col("doc_id").cast("string")) % 100 < 80, "train")
            .when(md5_long(F.col("doc_id").cast("string")) % 100 < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .collect()
    }
    assert {r.doc_id: r.split for r in out.collect()} == batch_split
