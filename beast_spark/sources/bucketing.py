"""Bucketed tables: shuffle-free co-located joins for repeated join keys.

At 100 TB, the single biggest recurring cost is re-shuffling the same
fact table on the same key for every join. Bucketing pays that shuffle
once at write time (``bucketBy(n, key).sortBy(key)``) and every later
equi-join between tables bucketed on the same key with the same bucket
count runs with NO Exchange on either side — verify with
``assert_no_shuffle_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "assert_no_shuffle_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """``bucket_col`` may be one column or a list (composite bucket key —
    e.g. the LSH band index buckets by (band, bucket)); joins and
    aggregations clustering on the SAME full column set run Exchange-free.
    ``path`` makes the table external at that location instead of managed
    under the session warehouse dir."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    # Cluster the write to the bucket layout first: bucketBy assigns each
    # ROW to bucket pmod(murmur3(cols), n) but writes one file per
    # (task, bucket) pair, so M upstream partitions yield up to M×n tiny
    # files — and every later scan pays a task per file (openCost
    # dominates small files; measured as the round-10 q98/q173 serve
    # regressions). repartition(n, cols) uses the SAME hash/pmod, so each
    # task holds exactly one bucket's rows and the table lands as n
    # files, one per bucket — the compaction a warehouse bucketed write
    # does anyway.
    df = df.repartition(n_buckets, *[df[c] for c in cols])
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def assert_no_shuffle_join(spark: SparkSession, joined: DataFrame) -> None:
    """Raise if the physical plan re-shuffles either join side (bucket
    pruning failed — mismatched bucket counts or a non-bucketed side)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(f"join plan contains a shuffle exchange:\n{plan}")
