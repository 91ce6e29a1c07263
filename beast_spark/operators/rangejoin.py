"""Range-bucketed join: the big-big scale path for pure range joins.

A range join with an equi key (q29) hash-partitions on the key and
evaluates the interval as a residual — fine at any scale. A range join
with NO equi key (point-in-interval, interval-overlap) gives Spark only
BroadcastNestedLoopJoin or CartesianProduct: O(N·M) comparisons and a
broadcast that stops fitting the moment both sides are large. (Databricks
ships this same idea as the ``spark.databricks.optimizer.rangeJoin``
bin hint; open-source Spark has no equivalent, so the encoding below is
the portable form.)

The standard fix is to MANUFACTURE an equi key from the range dimension:

1. pick a ``bucket_width`` on the order of the typical interval length;
2. each point lands in exactly ONE bucket (floor(value / width));
3. each interval is replicated into every bucket it overlaps — at most
   2 when ``bucket_width`` >= the interval length, ceil(len/width)+1
   in general (correctness never depends on the width, only the
   replication factor does);
4. equi-join on the bucket id — an ordinary co-partitioned
   shuffle/sort-merge join — then apply the exact range predicate as a
   cheap residual filter.

Every qualifying (point, interval) pair meets in exactly one bucket (the
point's), so no post-join dedup is needed. Cost: one shuffle of each
side on the bucket id + the small interval-side replication —
sort-merge-join economics for a predicate Spark would otherwise nested-
loop. Skewed buckets (a hot time window) degrade like any skewed equi
join and respond to the same AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_bucket_join"]


def range_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join every ``points`` row to the ``intervals`` rows whose
    ``[lo_col, hi_col]`` contains its ``point_col`` — without an equi
    key and without a nested-loop join.

    All three range columns must be numeric (cast dates to epoch days
    first); column names must not collide between the two frames.
    Unmatched-point semantics (left join) compose on top: aggregate the
    matches, then left-join the aggregate back onto ``points``.
    """
    p = points.withColumn("_rb", F.floor(F.col(point_col) / bucket_width))
    i = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    return (
        p.join(i, "_rb", "inner")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_rb")
    )
