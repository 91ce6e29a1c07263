"""Streaming embedding near-dup maintenance: an embedding stream keeps
the persisted LSH bucket index AND the discovered near-dup pair set
current via ``foreachBatch`` +
:func:`beast_spark.operators.similarity.incremental_lsh_neardup_pairs_indexed`.

The batch story (q164) proves one append is O(increment + touched
buckets); this maintainer is the continuous form: each micro-batch
buckets only ITS OWN vectors, probes the persisted index for candidate
partners, appends its index rows, and accumulates the new pairs —
pairs(after batch k) == pairs(full rebuild over everything ingested
through batch k), property of the disjoint-union exactness the operator
tests pin. Exactly-once commit is the shared swap-ledger protocol
(``streaming/swap.py``): the index append, the pair append, and the
ledger flip in ONE atomic rename, so a replayed batch after any crash
is a no-op and a crash between write and swap never double-counts a
pair. At warehouse scale write the ``index`` sub-table bucketed by
bucket (``sources/bucketing.py``) so each batch's probe stays
Exchange-free on the corpus side; locally it is plain parquet.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beast_spark.operators.similarity import (
    hyperplanes_md5,
    incremental_lsh_neardup_pairs_indexed,
)
from beast_spark.streaming.swap import SwapCommittedTable

__all__ = ["EmbeddingNearDupMaintainer"]


class EmbeddingNearDupMaintainer(SwapCommittedTable):
    """Owns one swap-committed state directory (index + pairs)."""

    def __init__(
        self,
        path: str,
        dims: int,
        threshold: float = 0.42,
        n_planes: int = 6,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        SwapCommittedTable.__init__(self, path)
        self.dims = dims
        self.threshold = threshold
        self.planes = hyperplanes_md5(dims, n_planes)
        self.id_col = id_col
        self.vec_col = vec_col

    def _read_sub(self, spark: SparkSession, name: str) -> DataFrame | None:
        self._recover()
        sub = os.path.join(self.path, name)
        if not os.path.exists(sub):
            return None
        return spark.read.parquet(sub)

    def read_index(self, spark: SparkSession) -> DataFrame | None:
        return self._read_sub(spark, "index")

    def read_pairs(self, spark: SparkSession) -> DataFrame | None:
        return self._read_sub(spark, "pairs")

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches():
            return  # replay after a post-commit crash: already applied
        spark = batch_df.sparkSession
        existing = self.read_index(spark)
        if existing is None:
            existing = spark.createDataFrame(
                [],
                f"{self.id_col} long, {self.vec_col} array<double>, "
                "bucket long, nrm double",
            )
        inc = batch_df.select(
            self.id_col,
            F.col(self.vec_col).cast("array<double>").alias(self.vec_col),
        )
        new_idx, new_pairs = incremental_lsh_neardup_pairs_indexed(
            existing,
            inc,
            dims=self.dims,
            id_col=self.id_col,
            vec_col=self.vec_col,
            threshold=self.threshold,
            planes=self.planes,
        )
        index = existing.select(self.id_col, self.vec_col, "bucket", "nrm").unionByName(
            new_idx.select(self.id_col, self.vec_col, "bucket", "nrm")
        )
        old_pairs = self.read_pairs(spark)
        pairs = new_pairs if old_pairs is None else old_pairs.unionByName(new_pairs)
        self._commit_state({"index": index, "pairs": pairs}, batch_id)

    def _commit_state(self, frames: dict[str, DataFrame], batch_id: int) -> None:
        tmp = self.path + ".applying"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        for name, df in frames.items():
            df.write.parquet(os.path.join(tmp, name))
        with open(os.path.join(tmp, "_applied_batches.json"), "w") as fh:
            json.dump(sorted(self.applied_batches() | {batch_id}), fh)
        self._swap_in(tmp)

    # -- wiring ----------------------------------------------------------

    def stream_from(self, vectors: DataFrame, checkpoint: str):
        """Start the maintenance stream (availableNow-compatible)."""
        return (
            vectors.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
