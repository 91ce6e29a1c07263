"""Streaming SCD2 dimension maintenance: a changelog stream keeps a
slowly-changing-dimension history table current via ``foreachBatch`` +
:func:`beast_spark.operators.scd.scd2_apply_increment`.

The reference streams rows into ONE flat BigQuery table
(`sink/bq/BqSink.java:82-93`) and leaves dimension modeling to the
warehouse. This module closes that gap engine-side: each micro-batch is
an append-only changelog increment, applied in O(increment) (untouched
keys never shuffle — see operators/scd.py), and committed by an atomic
directory swap.

Exactly-once: the applied-batch ledger is written INSIDE the new history
directory before the swap, so the swap is the single commit point — a
replayed batch after any crash either sees the old directory (ledger
lacks the batch → re-apply) or the new one (ledger has it → skip).
There is no window where the batch is half-applied, because nothing
mutates the live directory in place. The two-rename swap itself has the
same brief-absence window as partition compaction and reuses the same
``.replaced`` recovery rule (streaming/maintenance.py).

Scale: per batch the history is read once through broadcast anti/semi
joins (no shuffle) and rewritten. Rewriting the full history per batch
is the local-parquet simplification — at warehouse scale the same
operator feeds a keyed MERGE (streaming/sink.py staged keyed publish) or
rewrites only the key-bucket files the increment touched; the increment
algebra and the commit protocol are identical.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from beast_spark.operators.scd import scd2_apply_increment, scd2_from_changelog

_LEDGER = "_applied_batches.json"

__all__ = ["Scd2Maintainer"]


class Scd2Maintainer:
    """Owns one SCD2 history directory fed by a changelog stream."""

    def __init__(
        self,
        history_path: str,
        key_cols: Sequence[str],
        attr_col: str,
        order_cols: Sequence[str],
    ) -> None:
        self.history_path = history_path
        self.key_cols = list(key_cols)
        self.attr_col = attr_col
        self.order_cols = list(order_cols)

    # -- commit protocol -------------------------------------------------

    def _recover(self) -> None:
        """Heal a crash inside the two-rename swap: live dir missing but
        ``.replaced`` present → restore it."""
        replaced = self.history_path + ".replaced"
        if not os.path.exists(self.history_path) and os.path.exists(replaced):
            os.rename(replaced, self.history_path)

    def applied_batches(self) -> set[int]:
        self._recover()
        ledger = os.path.join(self.history_path, _LEDGER)
        if not os.path.exists(ledger):
            return set()
        with open(ledger) as fh:
            return set(json.load(fh))

    def read_history(self, spark: SparkSession) -> DataFrame | None:
        self._recover()
        if not os.path.exists(self.history_path):
            return None
        return spark.read.parquet(self.history_path)

    def _swap_in(self, tmp: str) -> None:
        replaced = self.history_path + ".replaced"
        if os.path.exists(replaced):
            import shutil

            shutil.rmtree(replaced)
        if os.path.exists(self.history_path):
            os.rename(self.history_path, replaced)
        os.rename(tmp, self.history_path)  # <- the commit point
        if os.path.exists(replaced):
            import shutil

            shutil.rmtree(replaced)

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches():
            return  # replay after a post-swap crash: already committed
        spark = batch_df.sparkSession
        history = self.read_history(spark)
        if history is None:
            updated = scd2_from_changelog(
                batch_df, self.key_cols, self.attr_col, self.order_cols
            )
        else:
            updated = scd2_apply_increment(
                history, batch_df, self.key_cols, self.attr_col, self.order_cols
            )
        tmp = self.history_path + ".applying"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        updated.write.parquet(tmp)
        with open(os.path.join(tmp, _LEDGER), "w") as fh:
            json.dump(sorted(self.applied_batches() | {batch_id}), fh)
        self._swap_in(tmp)

    # -- wiring ----------------------------------------------------------

    def stream_from(self, changelog: DataFrame, checkpoint: str):
        """Start the maintenance stream (availableNow-compatible). The
        changelog must arrive in per-key order (file/Kafka sources do
        within a key's partition) — out-of-order backfills need a full
        rebuild, same contract as scd2_apply_increment."""
        return (
            changelog.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
