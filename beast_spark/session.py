"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
setting here is chosen to also be the right default on a large cluster:

* AQE on (runtime coalescing, skew-join splitting, dynamic join strategy) —
  at 100 TB the static plan is always wrong somewhere; AQE re-plans from
  runtime stats.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as
  long as it is high enough.
* Arrow enabled so any pandas-UDF slow path is batch-vectorized.
* Session timezone pinned to UTC so timestamp semantics are engine-stable
  (and comparable against the DuckDB oracle, whose timestamps are naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "beast_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with engine defaults applied."""
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce to parallelism FIRST (Spark's own default), size second
        # (round 13): pure size-based coalescing (parallelismFirst=false,
        # rounds 10-12) collapsed small-but-compute-DENSE shuffles — ANN
        # candidate-pair scoring, percentile merges — to 1-4 tasks: q185's
        # 4.7 MB pair shuffle ran its entire distinct+score stage in ONE
        # task (2.9 s of a 4.3 s query; profiled via tools/profile_query).
        # With parallelismFirst=true those stages spread across the cores
        # (q185 4.3→~1.0 s, q173 2.7→1.5, q41/q95 −30%, measured
        # interleaved A/B); at warehouse scale post-shuffle data ≫
        # cores × minPartitionSize, so coalescing still lands on the
        # advisory size and this flip is a no-op there. The 512k floor
        # (default 1m) only binds on sub-cores×1m shuffles — exactly the
        # compute-dense candidate shuffles; q185 measures 2.3 s at the 1m
        # floor vs ~1.1 s at 512k (a 256k floor is bimodally WORSE on
        # the DSIR pair q219/q225 — cached-histogram consumers fragment
        # into 16 partitions and intermittently pay 3-4x — and 1k is
        # worse everywhere). The r10 concern that motivated
        # size-first (cached small frames keeping every partition) is
        # covered by canChangeCachedPlanOutputPartitioning below. All
        # three knobs stay env-overridable (SPARK_GRAFT_* below).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "512k")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan INSIDE cached plans too (off by default): a
        # persisted frame otherwise freezes its pre-AQE partitioning, so
        # a small pinned increment/postings cache keeps all
        # shuffle.partitions partitions and every consumer stage pays
        # that task count — measured locally as cache reads costing MORE
        # than recomputing the subtree (round-10's q98/q173 serve paths).
        # With this on, cached small frames coalesce like everything
        # else; coalesced hash partitioning still satisfies the same
        # clustering, so Exchange-free reuse of a cached repartition
        # survives.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Never use the bypass-merge shuffle writer (round 13): with
        # spark.sql.shuffle.partitions=2×cores (64 locally), EVERY SQL
        # exchange is under the 200-partition bypass threshold, and the
        # bypass writer opens one file PER REDUCE PARTITION per map task
        # — 64 creates/closes per task, ~2048 tiny files per shuffle.
        # Profiled on q183's encode legs: 150-700 ms of "shuffle write
        # time" PER TASK to emit ~500 rows; a 256k-row microbench halves
        # (1.01 s → 0.5-0.8 s) with the regular sort writer, which
        # buffers in memory and writes ONE file per map task. Scale
        # story: real clusters run shuffles ≫200 partitions where the
        # bypass path never engages, so this only changes the
        # small-shuffle regime the local bench lives in; a deployment
        # that wants bypass back for mid-size low-partition shuffles
        # overrides SPARK_GRAFT_BYPASS_MERGE_THRESHOLD below.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's parquet stores naive timestamps; read them as plain
        # TIMESTAMP (not NTZ) so timestamp functions/arithmetic behave the
        # same under our session as under any external one (tables.py also
        # normalizes NTZ on read for sessions we don't build).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Stateful streaming state lives in RocksDB, not the default
        # HDFS-backed in-memory provider: a corpus-dedup stream holds one
        # state entry per distinct key EVER seen, and at 100 TB that OOMs
        # executors under the in-memory provider long before the data runs
        # out. RocksDB spills to local disk (bounded heap), and changelog
        # checkpointing uploads per-batch deltas instead of full snapshots.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    # Scale-dependent AQE knobs stay env-parameterised (optimization
    # guide: never hard-code a local[32]-only value): unset, the
    # in-code defaults above apply; a deployment overrides per cluster.
    for env, key in (
        ("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "spark.sql.adaptive.advisoryPartitionSizeInBytes"),
        ("SPARK_GRAFT_PARALLELISM_FIRST", "spark.sql.adaptive.coalescePartitions.parallelismFirst"),
        ("SPARK_GRAFT_MIN_PARTITION_SIZE", "spark.sql.adaptive.coalescePartitions.minPartitionSize"),
        ("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "spark.shuffle.sort.bypassMergeThreshold"),
    ):
        v = os.environ.get(env)
        if v:
            builder = builder.config(key, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
