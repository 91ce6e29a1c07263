"""Mergeable distinct-count sketches for incremental table profiling.

The reference maintains day-partitioned warehouse tables
(``sink/bq/BQClient.java:66-114`` partition spec, ``BQTableDefinition.
java:18-63``); profiling them at 100 TB cannot rescan history on every
refresh. DataSketches HLL sketches are *mergeable aggregate state*:
build one sketch per slice (day / month partition) ONCE when the slice
lands, persist the binary next to the partition, and answer global or
rolling distinct-count questions by unioning the slice sketches —
O(slices) per refresh, never O(rows). This is the incremental twin of
the q95/q99 profile queries: q99 answers "distinct now" in one pass;
the sketch table answers it forever after at the cost of reading only
the new slice.

Estimator error: DataSketches HLL with ``lgk`` buckets has relative
standard error ~1.04 / sqrt(2^lgk) (lgk=12 → 1.63%); union of sketches
built at the same lgk preserves the bound, so a merged estimate carries
the same 3-sigma envelope the q49-style invariant oracles check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def hll_rse(lgk: int = DEFAULT_LGK) -> float:
    """Relative standard error of a DataSketches HLL at ``lgk``."""
    return 1.04 / (2.0 ** lgk) ** 0.5


def sketch_by_slice(
    df: DataFrame,
    slice_cols: Sequence[Column | str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One mergeable HLL sketch (binary) per slice.

    The slice grain should match the table's append grain (dt= day
    partitions for the reference's sink): then maintaining the sketch
    table on append means sketching ONLY the new slice and appending
    one row here — history is never rescanned.
    """
    return df.groupBy(*slice_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merged_distinct(sketches: DataFrame) -> DataFrame:
    """Global distinct estimate from a slice-sketch table.

    Unions the slice-count-sized binaries — the raw table is never
    touched, so this is constant-cost no matter how much data the
    slices summarize. Returns one row: ``distinct_est`` (long),
    ``n_slices``, ``n_rows`` (exact row total, carried alongside for
    the density ratio profilers want).
    """
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.count(F.lit(1)).alias("n_slices"),
        F.sum("n_rows").alias("n_rows"),
    )


def misra_gries_topk(df: DataFrame, col: str, k: int, cut: bool = True) -> DataFrame:
    """Mergeable Misra–Gries heavy-hitters summary of ``col``.

    Per-partition MG summaries (``k`` counters each, built in one
    Arrow-batched pass) are summed per item and (with ``cut=True``) cut
    back to the top ``k`` by estimate — the classic mergeable frequency
    sketch. Guarantees, with ``n`` the total row count, hold for the
    MERGED SUMMARY (``cut=False``): every ``est_count`` is a LOWER
    bound on the item's true count, the under-count is at most
    ``n/(k+1)``, and every item with true count > ``n/(k+1)`` survives
    into the summary. The final top-k-by-estimate cut does NOT inherit
    the completeness guarantee: a borderline heavy hitter whose summed
    lower bound landed near zero can be displaced by non-heavy items
    with larger estimates — callers needing the classical guarantee
    should take ``cut=False`` and apply their own count threshold.
    Unlike exact groupBy-count (q122's path), the shuffle moves at most
    ``partitions × k`` rows regardless of cardinality — the summary for
    a column whose distinct count is itself at data scale.

    Returns (item, est_count), deterministic under a fixed
    partitioning; final selection ties break on the item value.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def partials(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
                if len(counters) > k:
                    # bulk MG decrement: subtract the smallest counter
                    # from all, dropping those that reach zero
                    dec = min(counters.values())
                    counters = {
                        i: c - dec for i, c in counters.items() if c > dec
                    }
        yield pd.DataFrame(
            {"item": list(counters.keys()), "cnt": list(counters.values())}
        )

    partial = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partials, "item string, cnt long"
    )
    merged = partial.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    if not cut:
        return merged
    return merged.orderBy(F.desc("est_count"), F.asc("item")).limit(k)
