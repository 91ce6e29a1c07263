"""Batch table catalog over the driver-generated parquet testdata.

Parquet scans are declared via ``spark.read.parquet`` so Catalyst performs
predicate pushdown + column pruning natively (check with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).

``SMALL_DIMS`` marks dimension tables that stay broadcast-joinable at any
scale factor (region: 5 rows, nation: 25 rows — fixed-size in TPC-H-style
generators). Other tables are left to AQE's runtime join-strategy choice,
which is the right call at 100 TB: customer/part may still broadcast at
small SF but must shuffle at scale, and AQE decides from actual sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed-cardinality dimensions: always safe to broadcast regardless of sf.
SMALL_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _normalize_timestamps(_load_events(spark, sf_dir))
    return _normalize_timestamps(spark.read.parquet(table_path(sf_dir, name)))


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (session-tz) on read.

    The driver's parquet stores naive timestamps (isAdjustedToUTC=false),
    which Spark 4 infers as TIMESTAMP_NTZ when
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on (the default —
    and the driver's own SparkSession may leave it on). NTZ rejects
    ``unix_millis``/arithmetic helpers and collects differently from the
    DuckDB oracle's naive timestamps. Casting NTZ -> TIMESTAMP keeps the
    wall-clock value (interpreted in the session tz), so downstream
    functions and the stringified oracle compare behave identically
    regardless of which session loaded the table. Column-pruning and
    filter pushdown still reach the scan: the cast is a Project above it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects outright. Read it as raw nanos (legacy conf, runtime-settable)
    and floor-divide to microseconds — the same truncation DuckDB applies —
    so timestamp semantics match the oracle exactly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not `/`: epoch-nanos exceed double's 2^53 exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
