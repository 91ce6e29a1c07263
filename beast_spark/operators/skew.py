"""Skew-mitigation utilities for hot-key joins at scale.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in :func:`beast_spark.session.get_spark`) handles sort-merge
skew automatically. Salting is the manual fallback for the cases AQE
can't split — aggregations on hot keys and broadcast-ineligible
many-to-many joins:

* ``salted_join``: replicate the small side ``salt``× with an explicit
  salt column, spray the big side's rows uniformly across salts — each
  hot key's rows land on ``salt`` reducers instead of one.
* ``two_stage_agg``: partial-aggregate on (key, salt), then final on key
  — the classic combiner-style fix for a skewed groupBy with algebraic
  aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_stage_agg"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the big side sprayed over ``salt`` buckets.

    The small side is exploded ``salt``× (acceptable when it is orders of
    magnitude smaller); result columns match ``big.join(small, on, how)``.

    Only ``inner``/``left`` are supported: with ``right``/``full`` an
    unmatched small-side key would surface once per salt replica.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full would emit unmatched small-side keys salt times"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe groupBy for algebraic aggregates.

    ``partial_aggs`` run on (keys + salt); ``final_aggs`` combine the
    partials on keys (e.g. partial ``sum(x) as s`` → final
    ``sum(s) as total``)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
