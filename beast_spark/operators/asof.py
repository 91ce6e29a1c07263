"""As-of join: for each left row, the most recent right row at-or-before
its timestamp (per key). Spark has no native ASOF JOIN; the classic
range-join encoding (equi key + ``r.ts <= l.ts`` + window max) explodes
candidate pairs quadratically on hot keys.

This implementation uses the **union + last-value carry-forward** plan:

1. tag right rows side=0, left rows side=1;
2. union by (key, ts, side, payload);
3. one window per key ordered by (ts, side) carries the last non-null
   right payload forward;
4. keep left rows, unpack the carried payload.

Cost: ONE shuffle on the join key and a per-partition sort — the same
cost as a sort-merge join, independent of time-range density, so it
scales to 100 TB wherever a sort-merge join would. Ties (equal ts) are
inclusive: the right row sorts before the left row, matching DuckDB's
``ASOF JOIN … ON l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of (backward, inclusive) join.

    Returns all ``left`` columns plus ``<col><suffix>`` for each of
    ``right_cols`` (NULL when no right row precedes the left row).
    """
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")
    r = right.select(
        F.col(on).alias("_asof_key"),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload,
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_asof_key"),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_asof_key")
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns] + [
        F.col("_asof_match").getField(c).alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.filter(F.col("_asof_side") == 1).select(*out_cols)
