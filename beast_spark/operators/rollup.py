"""Incremental aggregate-rollup (materialized-view) maintenance.

The reference lands an append-only stream into day-partitioned
warehouse tables (``sink/bq/BqSink.java:41-80``,
``BQClient.java:66-114``); every dashboard over those tables is a
GROUP BY that, naively, rescans all of history per refresh. Because
sum/count aggregate state is *mergeable*, a rollup keyed on the report
dimensions can instead be MAINTAINED: aggregate only the appended rows,
then merge the increment's partial aggregates into the stored rollup —
O(increment + rollup), never O(history). Averages derive from the
merged sums, so the maintained table is exactly equal to a full
rebuild (property-tested), not approximately.

Measure columns are carried as exact integer cents
(``queries/_util.py::cents`` rationale): integer sums are associative,
so merge order — and therefore the incremental path — cannot drift
from the rebuild by even an ulp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MEASURES = ("n_rows", "sum_cents")


def daily_rollup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Partial-aggregate rollup at (day, *key_cols) grain.

    Stores mergeable state only: exact row count and exact integer-cent
    sum. Derived metrics (totals, averages) are computed at read time
    from the merged state — never stored, so they stay consistent under
    any sequence of merges.
    """
    day = F.date_format(ts_col, "yyyy-MM-dd").alias("day")
    return df.groupBy(day, *key_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_cents"
        ),
    )


def merge_rollups(existing: DataFrame, increment: DataFrame) -> DataFrame:
    """Merge an increment's partial aggregates into a stored rollup.

    Both inputs are rollup-grain (aggregate-sized) frames; the merge
    shuffles only those — the raw history behind ``existing`` is never
    rescanned. Exact for sum/count state: union + re-sum is the
    aggregate monoid's associative combine, so
    ``merge(rollup(A), rollup(B)) == rollup(A ∪ B)`` row-for-row.
    Merging is associative, so nightly increments can be applied one at
    a time or batched — same result (property-tested).
    """
    keys = [c for c in existing.columns if c not in _MEASURES]
    if set(existing.columns) != set(increment.columns):
        raise ValueError(
            f"rollup schemas differ: {existing.columns} vs {increment.columns}"
        )
    return (
        existing.unionByName(increment)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
