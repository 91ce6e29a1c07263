"""Distributed exact percentiles (linear interpolation).

``percentile()`` (and the reference-free exact path generally) buffers
every value of a group in one aggregation buffer — at 100 TB a single
hot group OOMs an executor, and evaluation is single-threaded per group.
This operator computes the same number out of distributed primitives:

1. ``groupBy(keys, value).count()`` — collapses duplicates; the shuffle
   moves one row per DISTINCT value (map-side combined), not per row.
2. a cumulative-count window ordered by value within each key group,
3. the ANSI linear interpolation ``v_lo + frac·(v_hi − v_lo)`` at rank
   ``(n−1)·q``, located by range-containment on the cumulative counts —
   a conditional min aggregation, no per-group buffering anywhere.

Identical semantics to Spark ``percentile(col, q)`` / DuckDB
``quantile_cont`` (asserted in tests + the q41 oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["exact_percentiles"]


def exact_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
) -> DataFrame:
    """Per-key exact percentiles: one output column per ``{name: q}``."""
    # NULLs are ignored, matching percentile() / quantile_cont — a NULL
    # group would otherwise inflate n and shift every rank.
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols)
    ranked = counts.select(
        *key_cols,
        F.col(value_col).cast("double").alias("v"),
        F.col("cnt"),
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    aggs = []
    for name, q in quantiles.items():
        pos = (F.col("n") - 1) * F.lit(float(q))
        lo = F.floor(pos)
        hi = F.ceil(pos)
        frac = pos - lo
        in_lo = ((F.col("cum") - F.col("cnt")) <= lo) & (F.col("cum") > lo)
        in_hi = ((F.col("cum") - F.col("cnt")) <= hi) & (F.col("cum") > hi)
        v_lo = F.min(F.when(in_lo, F.col("v")))
        v_hi = F.min(F.when(in_hi, F.col("v")))
        fr = F.max(F.when(in_lo, frac))  # per-group constant
        aggs.append((v_lo + fr * (v_hi - v_lo)).alias(name))
    result = ranked.groupBy(*key_cols).agg(*aggs)
    # Groups whose values are ALL NULL vanish from `counts`; SQL
    # percentile()/quantile_cont returns such groups with a NULL result,
    # so surface them via a left join from the distinct key frame (tiny:
    # one row per group, broadcast-joined in practice). NULL is a valid
    # group key under groupBy semantics, so the join must be null-safe —
    # plain `on=key_cols` would orphan a NULL-keyed group's computed row.
    keys = df.select(*key_cols).distinct().alias("_pk")
    res = result.alias("_pr")
    cond = None
    for c in key_cols:
        term = F.col(f"_pk.{c}").eqNullSafe(F.col(f"_pr.{c}"))
        cond = term if cond is None else (cond & term)
    return keys.join(res, on=cond, how="left").select(
        *[F.col(f"_pk.{c}").alias(c) for c in key_cols],
        *[F.col(f"_pr.{name}").alias(name) for name in quantiles],
    )
