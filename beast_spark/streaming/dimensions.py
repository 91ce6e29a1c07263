"""Streaming SCD2 dimension maintenance: a changelog stream keeps a
slowly-changing-dimension history table current via ``foreachBatch`` +
:func:`beast_spark.operators.scd.scd2_apply_increment`.

The reference streams rows into ONE flat BigQuery table
(`sink/bq/BqSink.java:82-93`) and leaves dimension modeling to the
warehouse. This module closes that gap engine-side: each micro-batch is
an append-only changelog increment, applied in O(increment) (untouched
keys never shuffle — see operators/scd.py), and committed by an atomic
directory swap.

Exactly-once commit is the shared swap-ledger protocol
(``streaming/swap.py``): ledger inside the new directory before the
swap, the swap as the single commit point, ``.replaced`` crash
recovery.

Scale: per batch the history is read once through broadcast anti/semi
joins (no shuffle) and rewritten. Rewriting the full history per batch
is the local-parquet simplification — at warehouse scale the same
operator feeds a keyed MERGE (streaming/sink.py staged keyed publish) or
rewrites only the key-bucket files the increment touched; the increment
algebra and the commit protocol are identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from beast_spark.operators.scd import scd2_apply_increment, scd2_from_changelog
from beast_spark.sources.versioned import VersionedTable
from beast_spark.streaming.swap import SwapCommittedTable

__all__ = ["Scd2Maintainer", "VersionedScd2Maintainer"]


class _Scd2Logic:
    """The maintenance algebra, independent of the commit backend
    (same factoring as ``streaming/rollup.py::_RollupLogic``)."""

    key_cols: list
    attr_col: str
    order_cols: list

    @property
    def history_path(self) -> str:
        return self.path

    def read_history(self, spark: SparkSession) -> DataFrame | None:
        return self.read_table(spark)

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches():
            return  # replay after a post-commit crash: already applied
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
        self.commit(updated, batch_id)

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


class Scd2Maintainer(_Scd2Logic, SwapCommittedTable):
    """Owns one SCD2 history directory fed by a changelog stream."""

    def __init__(
        self,
        history_path: str,
        key_cols: Sequence[str],
        attr_col: str,
        order_cols: Sequence[str],
    ) -> None:
        SwapCommittedTable.__init__(self, history_path)
        self.key_cols = list(key_cols)
        self.attr_col = attr_col
        self.order_cols = list(order_cols)


class VersionedScd2Maintainer(_Scd2Logic, VersionedTable):
    """SCD2 maintenance committing into a versioned table: every
    micro-batch becomes a retained snapshot of the dimension history —
    time travel answers "what did this dimension look like as-of batch
    N" (distinct from the SCD2 intervals themselves, which answer
    as-of EVENT time), with the exactly-once ledger in the same atomic
    manifest flip as the version pointer."""

    def __init__(
        self,
        history_path: str,
        key_cols: Sequence[str],
        attr_col: str,
        order_cols: Sequence[str],
        keep_versions: int = 3,
    ) -> None:
        VersionedTable.__init__(self, history_path, keep_versions=keep_versions)
        self.key_cols = list(key_cols)
        self.attr_col = attr_col
        self.order_cols = list(order_cols)
