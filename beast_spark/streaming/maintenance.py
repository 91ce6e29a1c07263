"""Warehouse maintenance: partition expiry (TTL) + small-file compaction.

The reference's day-partitioned BigQuery tables expire old partitions
natively: ``BQTableDefinition.java:45-59`` sets ``expirationMs`` on the
time partitioning and ``BQClient.shouldUpdateTable`` keeps it in sync.
The Spark engine records that TTL as the ``beast.partition.expiry.ms``
table property (``plans/schema.py::table_properties_ddl``); this module
is the retention job that ENFORCES it: drop ``dt=`` partitions whose
day is past the TTL.

Compaction is the second maintenance face the BigQuery side gets for
free (its storage rewrites itself): a streaming sink appending one
parquet file set per micro-batch produces thousands of small files per
day partition, and at 100 TB the scan-planning and NameNode/listing
cost of that dominates reads. ``compact_partition`` rewrites one
``dt=`` partition into size-targeted files with an atomic swap.

Both operations work on the layout ``WarehouseSink`` writes
(``{table_path}/dt=YYYY-MM-DD/``) through the Hadoop FileSystem API of
the running session — no extra dependencies, works on any Hadoop FS
(local, HDFS, object stores with a Hadoop connector).
"""

from __future__ import annotations

import datetime as dt
import math
import re

from pyspark.sql import SparkSession

from beast_spark.plans.schema import EXPIRY_PROP

__all__ = [
    "expired_partitions",
    "expire_partitions",
    "compact_partition",
    "recover_compaction",
    "partition_stats",
    "require_partition_filter",
]

_DT_RE = re.compile(r"^dt=(\d{4}-\d{2}-\d{2})$")
_REPLACED_RE = re.compile(r"^\.dt=(\d{4}-\d{2}-\d{2})\.replaced$")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _list_day_partitions(spark: SparkSession, table_path: str) -> list[tuple[str, str]]:
    """[(day, partition_dir_path)] for every dt= child of the table."""
    fs, root, _ = _fs(spark, table_path)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        m = _DT_RE.match(status.getPath().getName())
        if m:
            out.append((m.group(1), status.getPath().toString()))
    return sorted(out)


def expired_partitions(
    spark: SparkSession,
    table_path: str,
    expiry_ms: int,
    now: dt.datetime | None = None,
) -> list[tuple[str, str]]:
    """Dry run: the (day, path) list that :func:`expire_partitions` would
    drop. BigQuery's rule (time_partitioning.expiration_ms): a partition
    expires when its day start is more than ``expiry_ms`` behind now."""
    if expiry_ms <= 0:  # 0 / unset = keep forever (expirationMs parity)
        return []
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    cutoff = now - dt.timedelta(milliseconds=expiry_ms)
    return [
        (day, p)
        for day, p in _list_day_partitions(spark, table_path)
        if dt.datetime.strptime(day, "%Y-%m-%d") < cutoff
    ]


def expire_partitions(
    spark: SparkSession,
    table_path: str,
    expiry_ms: int | None = None,
    table: str | None = None,
    now: dt.datetime | None = None,
) -> list[str]:
    """Drop day partitions past the TTL; returns the dropped days.

    ``expiry_ms`` defaults to the table's own ``beast.partition.expiry.ms``
    property when ``table`` (a catalog name) is given — the loop closed:
    ``SchemaEvolver.sync_properties`` records the reference's
    ``expirationMs`` and this job enforces it. For catalog tables the
    partitions are also dropped from the metastore so planners stop
    seeing them immediately.
    """
    if expiry_ms is None:
        if table is None:
            raise ValueError("need expiry_ms or a catalog table to read it from")
        props = {
            r.key: r.value for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        expiry_ms = int(props.get(EXPIRY_PROP, "0"))
    doomed = expired_partitions(spark, table_path, expiry_ms, now=now)
    if not doomed:
        return []
    fs, _, jvm = _fs(spark, table_path)
    for day, p in doomed:
        if table is not None:
            spark.sql(f"ALTER TABLE {table} DROP IF EXISTS PARTITION (dt='{day}')")
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
    return [day for day, _ in doomed]


def require_partition_filter(df) -> None:
    """BigQuery's ``requirePartitionFilter=true`` policy (A24,
    ``BQTableDefinition.java:18-63``): reject a query over a
    day-partitioned table whose plan does not prune on the partition
    column — at 100 TB an unfiltered scan of a years-deep table is
    almost always a bug, and BigQuery refuses to run it.

    Raises ValueError unless every scan of a dt-partitioned relation in
    the physical plan carries at least one partition filter. Call it on
    a frame before executing it (policy gate, not an optimizer hook)."""
    leaves = df._jdf.queryExecution().sparkPlan().collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() != "FileSourceScanExec":
            continue
        part_cols = list(leaf.relation().partitionSchema().fieldNames())
        if "dt" in part_cols and leaf.partitionFilters().isEmpty():
            raise ValueError(
                "query scans a day-partitioned table without a partition filter "
                "(requirePartitionFilter policy); add a dt predicate"
            )


def recover_compaction(spark: SparkSession, table_path: str) -> list[str]:
    """Heal crashed compaction swaps; returns the recovered days.

    :func:`compact_partition`'s swap is two renames (live → ``.replaced``,
    tmp → live). A crash between them leaves the partition's data alive
    but invisible in ``.dt=<day>.replaced``. This scans the table root for
    such orphans and renames them back to ``dt=<day>`` whenever the live
    dir is missing; a ``.replaced`` dir WITH a live sibling is a completed
    swap whose cleanup delete didn't run, so it is deleted instead. Safe
    to run any time (startup, cron, before each compaction — and
    ``compact_partition`` runs it automatically)."""
    fs, root, jvm = _fs(spark, table_path)
    if not fs.exists(root):
        return []
    Path = jvm.org.apache.hadoop.fs.Path
    recovered: list[str] = []
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        m = _REPLACED_RE.match(status.getPath().getName())
        if not m:
            continue
        day = m.group(1)
        live = Path(f"{table_path}/dt={day}")
        if fs.exists(live):
            fs.delete(status.getPath(), True)  # swap finished; orphan cleanup
        elif fs.rename(status.getPath(), live):
            recovered.append(day)
    return sorted(recovered)


def partition_stats(spark: SparkSession, partition_path: str) -> dict:
    """{n_files, total_bytes} of the data files in one partition dir."""
    fs, root, _ = _fs(spark, partition_path)
    n, total = 0, 0
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            n += 1
            total += status.getLen()
    return {"n_files": n, "total_bytes": total}


def compact_partition(
    spark: SparkSession,
    table_path: str,
    day: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite one ``dt=day`` partition into ~``target_file_bytes`` files.

    Skips partitions already at/below ``min_files``. The rewrite is
    read → repartition(ceil(bytes/target)) → write to a sibling temp dir
    → two-rename directory swap (live → ``.replaced``, tmp → live), so
    readers never see a HALF-compacted partition — but there IS a brief
    window between the two renames where the partition is absent
    entirely, and a crash inside that window strands the data in the
    hidden ``.dt=<day>.replaced`` dir. Both are handled: each run first
    calls :func:`recover_compaction` on the table, which restores any
    ``.replaced`` dir whose live partition is missing, so a crashed swap
    heals on the next maintenance pass (or an explicit recovery call).
    Returns before/after stats. Run per-partition from an orchestrator
    (each partition is independent — embarrassingly parallel across
    days).
    """
    recover_compaction(spark, table_path)
    part_path = f"{table_path}/dt={day}"
    before = partition_stats(spark, part_path)
    if before["n_files"] <= min_files:
        return {"day": day, "before": before, "after": before, "compacted": False}
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    fs, _, jvm = _fs(spark, part_path)
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(f"{table_path}/.dt={day}.compacting")
    old = Path(f"{table_path}/.dt={day}.replaced")
    fs.delete(tmp, True)
    fs.delete(old, True)
    (
        spark.read.parquet(part_path)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(tmp.toString())
    )
    live = Path(part_path)
    if not fs.rename(live, old):  # swap: live -> replaced, tmp -> live
        raise IOError(f"could not swap out {part_path}")
    if not fs.rename(tmp, live):
        fs.rename(old, live)  # roll back; partition untouched
        raise IOError(f"could not swap in compacted {part_path}")
    fs.delete(old, True)
    after = partition_stats(spark, part_path)
    return {"day": day, "before": before, "after": after, "compacted": True}
