"""Deterministic stratified sampling at scale.

The rank formulation (q93: ``row_number() OVER (PARTITION BY stratum
ORDER BY salted_hash)``) is exact but serializes each stratum into one
window partition — a single giant stratum (one dominant language at
100 TB) sorts on one task. This operator keeps the EXACT same selection
contract — precisely ``ceil(frac · n)`` rows per stratum, chosen by
ascending ``(salted_hash, id)`` — without ever sorting a whole stratum:

1. histogram the hash space per stratum: ``bucket = h div 2^shift``
   (the bucket is a PREFIX of the hash, so bucket order == hash order);
   one groupBy moving ≤ strata × n_buckets pre-combined rows.
2. on that tiny frame, find each stratum's boundary bucket ``b*`` (the
   bucket containing the k-th smallest hash) and the residual rank
   ``r*`` within it — window over ≤ n_buckets rows per stratum.
3. broadcast the per-stratum thresholds back: rows in buckets < b* are
   kept outright (pure filter, no sort); ONLY rows in the boundary
   bucket — expected stratum_size / n_buckets of the data — are ranked
   by ``(h, id)`` to pick the remaining r*.

The only per-stratum sort left runs over the boundary bucket (~1/4096
of the stratum at the default shift), so a skewed stratum costs what a
uniform one does. Selection is identical to the rank formulation for
any ``n_buckets`` (property-tested across {1, 16, 4096}; ties are
impossible across buckets because equal hashes share a bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["stratified_sample_threshold"]


def stratified_sample_threshold(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    hash_col: Column,
    frac: float,
    hash_bits: int = 60,
    bucket_bits: int = 12,
) -> DataFrame:
    """Exactly ``ceil(frac·n)`` rows per stratum by ascending
    ``(hash, id)`` — no full-stratum sort. ``hash_col`` must be a
    non-negative deterministic hash expression over ``id_col`` (e.g.
    the md5-derived 60-bit salted hash); ``hash_bits`` its width.
    Returns the selected rows (all input columns + ``_h``).
    """
    if not 0 < bucket_bits <= hash_bits:
        raise ValueError(f"bucket_bits must be in (0, {hash_bits}], got {bucket_bits}")
    shift = hash_bits - bucket_bits
    t = df.withColumn("_h", hash_col).withColumn(
        "_bucket", F.shiftrightunsigned(F.col("_h"), shift)
    )
    # 1. per-stratum hash histogram: the ONLY full-data shuffle, and it
    # moves pre-combined (stratum, bucket) counts, not rows.
    hist = t.groupBy(stratum_col, "_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    # 2. boundary bucket + residual rank on the tiny histogram frame.
    w_cum = (
        Window.partitionBy(stratum_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(stratum_col)
    marked = hist.select(
        stratum_col,
        "_bucket",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.ceil(F.sum("_cnt").over(w_all) * F.lit(float(frac))).alias("_k"),
    )
    thresholds = marked.filter(
        ((F.col("_cum") - F.col("_cnt")) < F.col("_k")) & (F.col("_k") <= F.col("_cum"))
    ).select(
        stratum_col,
        F.col("_bucket").alias("_b_star"),
        (F.col("_k") - (F.col("_cum") - F.col("_cnt"))).alias("_r_star"),
    )
    joined = t.join(F.broadcast(thresholds), stratum_col, "inner")
    # 3a. everything strictly below the boundary bucket: filter, no sort.
    below = joined.filter(F.col("_bucket") < F.col("_b_star"))
    # 3b. boundary bucket only (~stratum/2^bucket_bits rows): rank the
    # residual r* by (h, id).
    w_rank = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    boundary = (
        joined.filter(F.col("_bucket") == F.col("_b_star"))
        .withColumn("_rk", F.row_number().over(w_rank))
        .filter(F.col("_rk") <= F.col("_r_star"))
        .drop("_rk")
    )
    drop = ["_bucket", "_b_star", "_r_star"]
    return below.drop(*drop).unionByName(boundary.drop(*drop))


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    shards: int = 4,
) -> DataFrame:
    """Deterministic PPS (probability-proportional-to-size) sampling via
    sharded systematic selection — integer-exact, no float comparisons.

    Rows are hashed into ``shards`` pseudo-random shards (md5 of the id,
    so the split is reproducible in any engine), each shard draws
    ``k // shards`` picks by walking its cumulative-weight line and
    selecting the row that crosses each of the ``k_s`` equally spaced
    boundaries: row selected iff
    ``floor(cum·k_s / W_s) > floor((cum - w)·k_s / W_s)``. All
    arithmetic is BIGINT (products ≤ total_weight · k — overflow-safe
    up to ~10^15 rows·weight at k ≤ 10^3), so two engines can never
    disagree on a boundary the way last-ulp ``pow``/``ln`` keys can.

    A row heavier than one step still yields a single pick (multiple
    boundaries inside one row collapse), so a shard returns at MOST
    ``k_s`` rows — the PPS contract: P(pick) ∝ weight, heavy rows
    capped at 1.

    Scale: every window is partitioned by shard — ``shards`` parallel
    sorts, no global ordering; raise ``shards`` with the corpus exactly
    like sequence packing (q92). The per-shard cumsum order is
    ``(weight-hash salt, id)`` — deterministic, engine-replayable.
    """
    from beast_spark.functions.hashing import md5_long

    k_s = k // shards
    if k_s < 1:
        raise ValueError(f"k={k} too small for {shards} shards")
    sid = (md5_long(F.col(id_col).cast("string")) % shards).alias("shard")
    w = F.col(weight_col).cast("long")
    d = df.select(F.col(id_col), w.alias("_w"), sid)

    order = Window.partitionBy("shard").orderBy(id_col)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = Window.partitionBy("shard")
    d = d.withColumn("_cum", F.sum("_w").over(run)).withColumn(
        "_tot", F.sum("_w").over(full)
    )
    picked = F.floor(F.col("_cum") * k_s / F.col("_tot")) > F.floor(
        (F.col("_cum") - F.col("_w")) * k_s / F.col("_tot")
    )
    return d.filter(picked).select(
        id_col,
        F.col("_w").alias(weight_col),
        "shard",
        F.floor(F.col("_cum") * k_s / F.col("_tot")).cast("long").alias("pick_idx"),
    )
