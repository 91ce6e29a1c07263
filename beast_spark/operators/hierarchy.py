"""Hierarchy flattening (recursive-CTE parity) by pointer doubling.

Spark has no ``WITH RECURSIVE``; warehouse workloads still need to
flatten parent-child hierarchies (org charts, BOM trees, category
taxonomies) into (node, root, depth) paths. A naive loop joins once per
LEVEL — O(depth) shuffles, hopeless on deep chains. Pointer doubling
(path doubling from PRAM lists) squares the distance covered each
round: every node's known ancestor jumps to THAT ancestor's known
ancestor, accumulating depth — O(log depth) self-joins total, each an
ordinary key-partitioned hash join. Roots self-loop with distance 0, so
the doubling has a fixed point exactly at (root, total depth).

Same iterative discipline as ``operators/dedup.py::dedup_clusters``:
``localCheckpoint`` truncates the growing lineage each round (durable
checkpoint at warehouse scale), and convergence is detected by a
LIMIT-1 probe, not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["flatten_hierarchy"]


def flatten_hierarchy(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    max_rounds: int = 25,
) -> DataFrame:
    """Resolve (id, parent — NULL for roots) to (id, root_id, depth).

    Malformed inputs raise instead of returning silently wrong rows:

    * a dangling ``parent`` value (no matching ``id``) would drop its
      subtree at the first inner join — detected by a row-count check
      and raised as ``ValueError``;
    * a cycle (or a chain deeper than 2^max_rounds, beyond any real
      hierarchy) never reaches the self-loop fixed point — detected by
      the still-advancing probe after round exhaustion and raised as
      ``ValueError``.  The probe compares BOTH ``anc`` and ``depth``:
      inside a cycle of length c, ``anc`` stabilizes whenever
      2^k % c == 0 (e.g. a self-parent row stabilizes immediately), but
      ``depth`` keeps doubling every round because no node on a cycle
      ever reaches a depth-0 self-loop root — so the depth term keeps
      the probe advancing and exhaustion raises as documented.
    """
    dangling = (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(F.col(parent_col).alias("p"))
        .join(nodes.select(F.col(id_col).alias("p")), "p", "left_anti")
        .limit(1)
        .count()
    )
    if dangling:
        raise ValueError(
            f"flatten_hierarchy: {parent_col} contains values with no matching "
            f"{id_col} (dangling parents would silently drop their subtrees)"
        )
    state = nodes.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), 0)
        .otherwise(1)
        .cast("long")
        .alias("depth"),
    ).localCheckpoint()
    for _ in range(max_rounds):
        nxt = (
            state.alias("a")
            .join(state.alias("b"), F.col("a.anc") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.anc").alias("anc"),
                (F.col("a.depth") + F.col("b.depth")).alias("depth"),
            )
            .localCheckpoint()
        )
        advanced = (
            nxt.alias("n")
            .join(state.alias("o"), "node")
            .filter(
                (F.col("n.anc") != F.col("o.anc"))
                | (F.col("n.depth") != F.col("o.depth"))
            )
            .limit(1)
            .count()
        )
        state = nxt
        if advanced == 0:
            break
    else:
        raise ValueError(
            f"flatten_hierarchy: still advancing after {max_rounds} doubling "
            f"rounds — the input contains a cycle (or a chain deeper than "
            f"2^{max_rounds}, beyond any real hierarchy)"
        )
    return state.select(
        F.col("node").alias(id_col),
        F.col("anc").alias("root_id"),
        "depth",
    )
