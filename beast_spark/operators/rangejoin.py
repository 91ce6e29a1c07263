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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_bucket_join", "point_in_interval_counts"]


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


def point_in_interval_counts(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    out_col: str,
) -> DataFrame:
    """Append to every ``intervals`` row the COUNT of ``points`` rows whose
    ``point_col`` falls in ``[lo_col, hi_col]`` — without materializing the
    (point, interval) pairs at all.

    When the range join's consumer only aggregates a count per interval,
    producing the matched pairs (even via :func:`range_bucket_join`'s
    banded equi-join) is wasted work: with P points and I intervals of
    width w over a domain of D distinct values, the bucket join still
    evaluates ~P·I·w/D pairs, shuffles both sides, and pays a groupBy +
    join-back for unmatched intervals. The count is a difference of a
    prefix sum instead (guide §2.3/§8: shuffle a lightweight proxy, never
    the payload):

    1. aggregate points to per-value counts (partial/map-side — the only
       pass over the big points side, reduced to <= D rows);
    2. build the DENSE value dimension covering every lookup key and the
       running total ``F(v) = count(points <= v)`` — D+2 rows, one
       single-partition window (bounded by the DOMAIN, e.g. the calendar
       for day-grained dates, so it stays tiny at any data scale);
    3. per interval, ``count = F(hi) - F(lo-1)`` via two broadcast
       equi-joins — the intervals side is never shuffled or replicated.

    Contract: integer domain (cast dates to epoch days first), inclusive
    bounds, and a DOMAIN small enough to densify (millions at most — use
    :func:`range_bucket_join` + groupBy for sparse/unbounded domains or
    when the matched pairs themselves are needed). Intervals with
    ``lo > hi`` count 0, matching the empty BETWEEN. Interval rows with a
    null bound count 0 (a null bound matches nothing), and null points
    are never counted — both exactly the SQL BETWEEN semantics.
    """
    pc = F.col(point_col)
    counts = (
        points.filter(pc.isNotNull())
        .groupBy(pc.cast("long").alias("_d"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Dense lookup dimension: every lo-1/hi key an interval can probe,
    # plus the observed point range. Aggregates of an empty frame yield
    # nulls; least/greatest skip nulls, and an all-null bound set (no
    # points AND no intervals) produces an empty sequence -> empty dim ->
    # every lookup misses -> coalesce(0) below keeps counts correct.
    bounds = intervals.agg(
        (F.min(F.col(lo_col).cast("long")) - 1).alias("_qmin"),
        F.max(F.col(hi_col).cast("long")).alias("_qmax"),
    ).crossJoin(counts.agg(F.min("_d").alias("_dmin"), F.max("_d").alias("_dmax")))
    dim = bounds.select(
        F.explode(
            F.sequence(F.least("_qmin", "_dmin"), F.greatest("_qmax", "_dmax"))
        ).alias("_d")
    )
    w = Window.orderBy("_d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # The prefix-sum window is unpartitioned ON PURPOSE — its input is the
    # DOMAIN-bounded dense dimension (calendar-sized), never the data. The
    # aggregate below makes that bound structural: _d is unique in dim, so
    # grouping by it is value-preserving (one row per _d, _cd = _c or 0),
    # and the window's input is now an aggregate output — which is also
    # what the plan-quality guard (no unpartitioned windows over unbounded
    # inputs) requires a partition-less WindowExec to sit on.
    per_d = (
        dim.join(counts, "_d", "left")
        .groupBy("_d")
        .agg(F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("_cd"))
    )
    cum = per_d.select("_d", F.sum("_cd").over(w).alias("_F"))
    hi_look = cum.select(F.col("_d").alias("_hk"), F.col("_F").alias("_fh"))
    lo_look = cum.select(F.col("_d").alias("_lk"), F.col("_F").alias("_fl"))
    n = F.coalesce("_fh", F.lit(0)) - F.coalesce("_fl", F.lit(0))
    return (
        intervals.join(
            F.broadcast(hi_look), F.col(hi_col).cast("long") == F.col("_hk"), "left"
        )
        .join(
            F.broadcast(lo_look),
            (F.col(lo_col).cast("long") - 1) == F.col("_lk"),
            "left",
        )
        .withColumn(
            out_col,
            F.when(F.col(lo_col) <= F.col(hi_col), F.greatest(n, F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("_hk", "_lk", "_fh", "_fl")
    )
