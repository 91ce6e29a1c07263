"""Distributed global row numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves every
row through ONE window partition — the textbook scale cliff (Spark even
warns ``WindowExec: No Partition Defined``). The reference never needs
a global sequence (BQ insert ids are content-derived,
``BQRowWithInsertId.java:9-12``), but corpus pipelines do: contiguous
example ids before packing/sharding (q92), reproducible pagination,
stable exports.

Scale path, all DataFrame ops (no RDD, no collect of data rows):

1. range-repartition on the order key — partition *i* holds keys ≤
   partition *i+1*'s (boundaries are sampled, but the RESULT is
   boundary-independent for a total order key);
2. number rows *within* each partition with a window PARTITIONED by
   ``spark_partition_id()`` — N parallel sorts, never a global one;
3. per-partition counts (a partition-count-sized frame) → cumulative
   offsets via a window over that tiny frame → broadcast-join the
   offset back and add.

Result equals the single-partition ``row_number`` exactly when the
order key is a total order (enforced: caller must pass a tiebreak
column that makes it one — same contract the oracle's ORDER BY needs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["export_sharded", "with_row_ids"]


def with_row_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number ordered by ``order_cols``.

    ``order_cols`` must form a total order (include a unique tiebreak);
    otherwise the assignment among ties is partition-dependent.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    numbered = ranged.withColumn("_rn", F.row_number().over(w_in))
    # partition-count-sized frame: cumulative row offsets in pid order
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        numbered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select("_pid", (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_off"))
    )
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def export_sharded(
    df: DataFrame,
    order_cols: Sequence[str],
    rows_per_shard: int,
    path: str,
) -> int:
    """Write ``df`` as contiguous, reproducible shards.

    The corpus-export final step: shard ``k`` holds exactly rows
    ``[k * rows_per_shard, (k+1) * rows_per_shard)`` of the total order
    — so shard membership is a pure function of the data, not of the
    cluster's partitioning, and two runs (or two clusters) produce
    byte-identical shard assignments (property-tested). Downstream
    training jobs can then address ranges of examples by shard id.

    Returns the number of shards written.
    """
    if rows_per_shard < 1:
        raise ValueError("rows_per_shard must be >= 1")
    ids = with_row_ids(df, order_cols)
    sharded = ids.withColumn(
        "shard", ((F.col("row_id") - 1) / rows_per_shard).cast("int")
    )
    sharded.write.partitionBy("shard").parquet(path)
    n = df.count()
    return (n + rows_per_shard - 1) // rows_per_shard if n else 0
