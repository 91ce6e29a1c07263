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
