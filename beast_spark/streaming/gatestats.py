"""Streaming quality-gate accounting: q180's per-rule rejection counts
maintained as documents stream in.

A production rule gate (``operators/quality.py::gopher_signals``) is
tuned by its rejection accounting — and the accounting should be a
LIVE number over the ingest stream, not a nightly rescan. Every
quantity q180 reports is a sum of per-document 0/1 indicators, so the
maintenance is purely additive: each micro-batch runs the gate over
ITS OWN documents only (one map stage — the gate is scan-side column
arithmetic), aggregates its counts, and merges by addition into a
single-row state. streamed(prefix) == batch q180(prefix) exactly —
the per-prefix equivalence the tests pin; the registered q189 shares
q180's oracle VERBATIM.

Same contract family as ``streaming/drift.py``: documents are
observations (no duplicate-id guard — exactly-once per BATCH via the
swap ledger, replay no-op tested); gate thresholds are part of the
state's meta marker, so a maintainer constructed with different rules
over existing counts raises instead of mixing accounting regimes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beast_spark.operators.quality import (
    gate_rejection_counts,
    gate_stats_row,
    gopher_signals,
)
from beast_spark.streaming.swap import (
    SwapCommittedTable,
    check_json_meta,
    write_json_meta,
)

__all__ = ["GateStatsMaintainer"]


class GateStatsMaintainer(SwapCommittedTable):
    """Owns one swap-committed state directory (counts — a single row)."""

    def __init__(self, path: str, **gate_kwargs) -> None:
        SwapCommittedTable.__init__(self, path)
        self.gate_kwargs = gate_kwargs

    def _meta(self) -> dict:
        return {"gate_kwargs": {k: self.gate_kwargs[k] for k in sorted(self.gate_kwargs)}}

    def _guard(self) -> None:
        check_json_meta(
            self.path + ".meta.json",
            self._meta(),
            f"GateStatsMaintainer (state at {self.path})",
            "the gate thresholds changed — accounting across regimes "
            "is meaningless; rebuild the state (fresh dir + checkpoint).",
        )

    def _batch_counts(self, batch_df: DataFrame) -> DataFrame:
        # the q180 builders, shared so the batch query and its streamed
        # twin cannot drift (their equality IS the q189 contract)
        return gate_rejection_counts(gopher_signals(batch_df, **self.gate_kwargs))

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches():
            return  # replay after a post-commit crash: already applied
        self._recover()
        meta = self._meta()
        if os.path.exists(self.path):
            self._guard()
        spark = batch_df.sparkSession
        inc = self._batch_counts(batch_df)
        counts = self._read_sub(spark, "counts")
        merged = (
            inc
            if counts is None
            else counts.unionByName(inc).agg(
                *[F.sum(c).alias(c) for c in inc.columns]
            )
        )
        if not os.path.exists(self.path):
            # marker BEFORE the first commit (see streaming/ivf.py)
            write_json_meta(self.path + ".meta.json", meta)
        self.commit_frames({"counts": merged}, batch_id)

    # -- reads ------------------------------------------------------------

    def read_stats(self, spark: SparkSession) -> DataFrame:
        """q180's single accounting row (rejections per rule, retention)
        over everything ingested so far. Validates the threshold marker
        FIRST — a reader constructed under different rules must not
        silently attribute old-regime counts to its own config (the
        drift read_psi precedent)."""
        if os.path.exists(self.path):
            self._guard()
        counts = self._read_sub(spark, "counts")
        if counts is None:
            raise ValueError("GateStatsMaintainer: no documents ingested yet")
        return gate_stats_row(counts)

    # -- wiring ----------------------------------------------------------

    def stream_from(self, docs: DataFrame, checkpoint: str):
        """Start the maintenance stream (availableNow-compatible)."""
        return (
            docs.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
