"""Streaming token accounting: q188's per-source token/char/subword
totals maintained as documents stream in.

A training-data pipeline budgets by TOKENS — per-source token counts
drive mixture weights, source caps, and cost projections — and the
number should be live over the ingest stream, not a nightly rescan.
Every quantity q188 reports is a sum of per-word values under a FROZEN
tokenizer (the trained BPE segmentation table — per-word subword
counts, the same frozen-artifact contract as the IVF centroids:
accounting is only additive while the tokenizer bytes stay identical),
so maintenance is purely additive: each micro-batch explodes ITS OWN
documents' words, joins the broadcast segmentation once, aggregates
per source, and merges by addition into O(sources) state.
streamed(prefix) == batch q188(prefix) exactly — the per-prefix
equivalence the tests pin; the registered q198 shares q188's oracle
VERBATIM.

Same contract family as ``streaming/gatestats.py``: documents are
observations (no duplicate-id guard — exactly-once per BATCH via the
swap ledger, replay no-op tested); the segmentation fingerprint is the
state's meta marker, so a maintainer pointed at a retrained tokenizer
over existing counts raises instead of mixing tokenizer generations.
State is O(sources) — the whole-table commit is the right protocol
here (``SwapCommittedTable``), not the fragment manifest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beast_spark.streaming.swap import (
    SwapCommittedTable,
    artifact_fingerprint,
    check_json_meta,
    write_json_meta,
)

__all__ = ["TokenAccountingMaintainer"]


class TokenAccountingMaintainer(SwapCommittedTable):
    """Owns one swap-committed state directory (counts — one row per
    source)."""

    def __init__(self, path: str, seg_path: str, fingerprint=None) -> None:
        SwapCommittedTable.__init__(self, path)
        self.seg_path = seg_path
        # storage-native fingerprint hook, as in streaming/ivf.py
        self.fingerprint = fingerprint or artifact_fingerprint

    def _meta(self) -> dict:
        return {"seg": self.fingerprint(self.seg_path)}

    def _guard(self) -> None:
        check_json_meta(
            self.path + ".meta.json",
            self._meta(),
            f"TokenAccountingMaintainer (state at {self.path})",
            "the frozen segmentation changed — token counts across "
            "tokenizer generations are meaningless; rebuild the state "
            "(fresh dir + checkpoint) against the retrained tokenizer.",
        )

    def _batch_counts(
        self, spark: SparkSession, batch_df: DataFrame
    ) -> DataFrame:
        # q188's shape: per-document words join the broadcast frozen
        # segmentation (a dictionary lookup, never a re-segmentation);
        # out-of-vocabulary words drop from the accounting exactly as
        # in the batch query (inner join)
        seg = spark.read.parquet(self.seg_path)
        words = batch_df.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("word")
        ).filter(F.length("word") > 0)
        return (
            words.join(F.broadcast(seg), "word")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum(F.length("word")).alias("n_chars"),
                F.sum("n_sub").alias("n_subwords"),
            )
        )

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches():
            return  # replay after a post-commit crash: already applied
        self._recover()
        meta = self._meta()
        if os.path.exists(self.path):
            self._guard()
        spark = batch_df.sparkSession
        inc = self._batch_counts(spark, batch_df)
        counts = self._read_sub(spark, "counts")
        merged = (
            inc
            if counts is None
            else counts.unionByName(inc)
            .groupBy("source")
            .agg(
                F.sum("n_words").alias("n_words"),
                F.sum("n_chars").alias("n_chars"),
                F.sum("n_subwords").alias("n_subwords"),
            )
        )
        if not os.path.exists(self.path):
            # marker BEFORE the first commit (see streaming/gatestats.py)
            write_json_meta(self.path + ".meta.json", meta)
        self.commit_frames({"counts": merged}, batch_id)

    # -- reads ------------------------------------------------------------

    def read_stats(self, spark: SparkSession) -> DataFrame:
        """q188's per-source accounting over everything ingested so far.
        Validates the segmentation marker FIRST — a reader holding a
        retrained tokenizer must not silently attribute old-generation
        counts to it (the gatestats read precedent)."""
        if os.path.exists(self.path):
            self._guard()
        counts = self._read_sub(spark, "counts")
        if counts is None:
            raise ValueError(
                "TokenAccountingMaintainer: no documents ingested yet"
            )
        return counts.select("source", "n_words", "n_chars", "n_subwords")

    # -- wiring ----------------------------------------------------------

    def stream_from(self, docs: DataFrame, checkpoint: str):
        """Start the maintenance stream (availableNow-compatible)."""
        return (
            docs.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
