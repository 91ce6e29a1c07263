"""Streaming embedding near-dup maintenance: an embedding stream keeps
the persisted MULTI-TABLE LSH index AND the discovered near-dup pair
set current via ``foreachBatch`` +
:func:`beast_spark.operators.similarity.incremental_multitable_neardup_pairs`.

The batch story (q164/q173) proves one append is O(increment + touched
buckets); this maintainer is the continuous form: each micro-batch
buckets only ITS OWN vectors into all L tables (one Arrow-batched BLAS
matmul), probes the persisted postings for candidate partners, appends
its postings + vectors, and accumulates the new pairs —
pairs(after batch k) == pairs(full rebuild over everything ingested
through batch k), property of the disjoint-union exactness the operator
tests pin. Exactly-once commit is the shared manifest protocol
(``streaming/swap.py::ManifestSwapTable``): all three sub-tables are
APPEND-ONLY, so each micro-batch commits one new fragment per
sub-table holding only its own rows — bytes written per trigger are
O(increment), never O(index) — and the new fragments + the ledger flip
live in ONE atomic manifest rename, so a replayed batch after any
crash is a no-op and a crash between write and flip never
double-counts a pair.

Operating point: the default is the PRODUCTION multi-table
configuration (L=75 tables × P=8 planes) — the q172 evaluation
measures it at ~90% pair recall on the adversarially near-uniform
synthetic embeddings, where the previous single-table 6-plane default
(still available: ``n_tables=1, n_planes=6``) finds only ~7% of the
true pairs. The index splits into slim postings (t, bucket, id) and
ONE vectors table (id, vector, nrm), so L-fold fan-out applies to two
longs + an id per posting, never to the vectors. At warehouse scale
write ``postings`` bucketed by (t, bucket) and ``vectors`` bucketed by
id (``sources/bucketing.py``) so each batch's probe stays
Exchange-free on the corpus side; locally they are plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beast_spark.operators.similarity import (
    DEFAULT_MAX_BUCKET,
    incremental_multitable_neardup_pairs,
    multitable_planes,
)
from beast_spark.streaming.swap import ManifestSwapTable

__all__ = ["EmbeddingNearDupMaintainer"]


class EmbeddingNearDupMaintainer(ManifestSwapTable):
    """Owns one manifest-committed state directory
    (postings+vectors+pairs)."""

    def __init__(
        self,
        path: str,
        dims: int,
        threshold: float = 0.42,
        n_planes: int = 8,
        n_tables: int = 75,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_bucket: int = DEFAULT_MAX_BUCKET,
    ) -> None:
        ManifestSwapTable.__init__(self, path)
        self.dims = dims
        self.threshold = threshold
        self.tables = multitable_planes(dims, n_planes, n_tables)
        self.id_col = id_col
        self.vec_col = vec_col
        self.max_bucket = max_bucket


    def read_postings(self, spark: SparkSession) -> DataFrame | None:
        return self._read_sub(spark, "postings")

    def read_vectors(self, spark: SparkSession) -> DataFrame | None:
        return self._read_sub(spark, "vectors")

    def read_pairs(self, spark: SparkSession) -> DataFrame | None:
        return self._read_sub(spark, "pairs")

    def read_capped(self, spark: SparkSession) -> DataFrame | None:
        """Degenerate-bucket accounting: (t, bucket, bucket_size,
        batch_id), one row per (capped bucket, micro-batch that hit
        it). Absent (None) until a batch actually trips the cap — no
        silent caps, but also no empty-fragment churn per trigger."""
        return self._read_sub(spark, "capped")

    def read_occupancy(self, spark: SparkSession) -> DataFrame | None:
        """(t, bucket, n_exist): maintained per-bucket distinct-id
        counts over ALL committed postings — what the degenerate-bucket
        gate reads instead of re-aggregating the probed posting volume
        every micro-batch (the round-9 recompute form shuffled every
        probed posting row per trigger; this read is O(touched
        buckets), hash-shard replaced in the same manifest flip as the
        postings it counts). Bounded by the bucket-space size
        (≤ 2^P × L rows for P planes × L tables), not the corpus."""
        return self._read_sub(spark, "occupancy")

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(os.path.join(self.path, "index")):
            # Pre-round-6 state: single-table layout under 'index'.
            # Silently treating it as an empty multi-table index would
            # honor the old ledger + pairs while losing every already-
            # ingested vector from future probes. Checked before the
            # ledger read — the old layout has no manifest, so the
            # generic legacy-layout error would otherwise mask this
            # more specific one.
            raise ValueError(
                "EmbeddingNearDupMaintainer: state dir holds the old "
                "single-table 'index' layout; the maintainer now persists "
                "a multi-table postings+vectors index. Rebuild the state "
                "from the source stream (fresh state dir + checkpoint)."
            )
        if batch_id in self.applied_batches():
            return  # replay after a post-commit crash: already applied
        spark = batch_df.sparkSession
        postings = self.read_postings(spark)
        vectors = self.read_vectors(spark)
        have_postings = postings is not None
        if postings is None:
            postings = spark.createDataFrame(
                [], f"t int, bucket long, {self.id_col} long"
            )
            vectors = spark.createDataFrame(
                [], f"{self.id_col} long, {self.vec_col} array<double>, nrm double"
            )
        # stored per-bucket distinct-id counts for the cap gate (see
        # read_occupancy). Bootstrap: a pre-round-10 state dir carries
        # postings but no occupancy sub — rebuild the counts ONCE from
        # the postings (one O(index) aggregation, amortized over the
        # stream's lifetime) and commit them with this batch's delta.
        stored_occ = self.read_occupancy(spark)
        bootstrap = stored_occ is None and have_postings
        if bootstrap:
            # persisted for the batch: the rebuilt counts feed both the
            # gate and the merge write below — without the persist the
            # O(index) aggregation would run twice in the one batch
            # that pays it
            stored_occ = postings.groupBy("t", "bucket").agg(
                F.countDistinct(self.id_col).cast("long").alias("n_exist")
            ).persist()
        elif stored_occ is None:
            stored_occ = spark.createDataFrame([], "t int, bucket long, n_exist long")
        inc = batch_df.select(
            self.id_col,
            F.col(self.vec_col).cast("array<double>").alias(self.vec_col),
        )
        new_post, new_vec, new_pairs, dropped, occupancy = (
            incremental_multitable_neardup_pairs(
                postings,
                vectors,
                inc,
                dims=self.dims,
                id_col=self.id_col,
                vec_col=self.vec_col,
                threshold=self.threshold,
                tables=self.tables,
                max_bucket=self.max_bucket,
                with_dropped=True,
                existing_occupancy=stored_occ,
                with_occupancy=True,
            )
        )
        # the combined occupancy frame feeds the pair gate (via dropped),
        # the shard probe, AND the merge write — persist for the batch so
        # its overlap semi-join against the probed postings runs once
        occupancy = occupancy.persist()
        try:
            # append-only sub-tables: commit ONLY this batch's rows as
            # one new fragment each — O(increment) bytes, never O(index)
            appends = {
                "postings": new_post.select("t", "bucket", self.id_col),
                "vectors": new_vec.select(self.id_col, self.vec_col, "nrm"),
                "pairs": new_pairs,
            }
            # no silent caps: a batch that trips the degenerate-bucket
            # guard commits its accounting rows in the SAME atomic flip
            # as the (capped) pairs it stands for. The isEmpty probe is
            # one cheap action over slim counted postings; the common
            # all-buckets-healthy case writes no extra fragment.
            capped = dropped.withColumn("batch_id", F.lit(batch_id))
            if not dropped.isEmpty():
                appends["capped"] = capped
            # occupancy merge: combined counts replace the touched keys,
            # untouched keys in the touched shards carry over — the
            # whcounts discipline (corpus_v3). Postings append UNGATED,
            # so the operator's combined frame IS the new stored count
            # even for capped buckets. On bootstrap the whole rebuilt
            # set commits (no occupancy fragments exist yet, so every
            # shard is declared touched).
            touched_keys = occupancy.select("t", "bucket")
            new_rows = occupancy.select(
                "t", "bucket", F.col("bucket_size").cast("long").alias("n_exist")
            )
            if bootstrap:
                occ_shards = list(range(self.n_shards))
                old_occ = stored_occ
            else:
                occ_shards = self.touched_shards(occupancy, "t", "bucket")
                old_occ = self._read_sub(spark, "occupancy", shards=occ_shards)
            if old_occ is None:
                merged = new_rows
            else:
                merged = old_occ.join(
                    F.broadcast(touched_keys), ["t", "bucket"], "left_anti"
                ).unionByName(new_rows)
            self.commit_delta(
                batch_id,
                appends=appends,
                shard_replacements={
                    "occupancy": (
                        merged.withColumn(
                            "_shard", self.shard_of(F.col("t"), F.col("bucket"))
                        ),
                        occ_shards,
                    )
                },
            )
            # amortized fragment fold (small-file control; see
            # ManifestSwapTable.maybe_compact — occupancy is a
            # replacement sub, self-bound at n_shards fragments)
            for sub in ("postings", "vectors", "pairs", "capped"):
                self.maybe_compact(spark, sub)
        finally:
            # the operator persists its two increment frames; release them
            # once the commit lands or cached blocks accumulate for the
            # stream's lifetime (one leak per micro-batch)
            new_post.unpersist()
            new_vec.unpersist()
            occupancy.unpersist()
            if bootstrap:
                stored_occ.unpersist()


    # -- wiring ----------------------------------------------------------

    def stream_from(self, vectors: DataFrame, checkpoint: str):
        """Start the maintenance stream (availableNow-compatible)."""
        return (
            vectors.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
