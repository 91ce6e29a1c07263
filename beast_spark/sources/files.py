"""File-format scans and sinks (SURVEY §2.B scans/sinks rows).

Thin declarations over Spark's native readers — the point is the
contract each enforces for scale:

* explicit schemas everywhere (``inferSchema`` re-reads the data and
  produces drifting types across runs — never in production paths);
* parquet is the default interchange (columnar, predicate pushdown,
  column pruning);
* JDBC runs against any driver on the classpath. The container ships no
  network-DB drivers (postgres/mysql stay gated), but Spark's own
  distribution bundles Derby — the embedded pure-Java database it uses
  for the Hive metastore — so the JDBC read/write legs are exercised for
  real against ``jdbc:derby:`` (see tests/test_sources.py and the JDBC
  WarehouseSink cases in tests/test_sink.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Embedded pure-Java driver shipped in Spark's own jars/ (derby-10.16 +
#: derbytools); the in-container stand-in for a warehouse JDBC endpoint.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — Spark's second native columnar format (predicate
    pushdown + column pruning like parquet; the interchange format
    Hive-era warehouses still emit)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw text corpus scan: one row per LINE (``value`` string), or one
    row per FILE with ``wholetext`` — the ingestion shape for text
    corpora that arrive as flat files rather than tables. Pair with
    ``input_file_name()``/``_metadata.file_path`` for provenance."""
    return spark.read.text(path, wholetext=whole)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet", mode: str = "append"
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Sort-on-write for data skipping (single-dimension Z-order).

    Sorting within partitions before the write clusters each parquet
    row group into a narrow ``sort_cols`` range, so the footer min/max
    statistics let any reader (Spark, DuckDB, Trino) skip row groups
    that cannot match a selective predicate — at 100 TB the difference
    between touching every row group and touching a handful. A
    per-partition sort only: no shuffle is added (repartition by range
    first if cross-file clustering is worth one)."""
    df.sortWithinPartitions(*sort_cols).write.mode(mode).format(fmt).save(path)


def jdbc_available(spark: SparkSession, driver_class: str = "org.postgresql.Driver") -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver_class: str = "org.postgresql.Driver", **options
) -> DataFrame:
    if not jdbc_available(spark, driver_class):
        raise RuntimeError(
            f"JDBC driver {driver_class} not on the classpath; add it via spark.jars"
        )
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver_class: str = "org.postgresql.Driver",
    mode: str = "append",
    **options,
) -> None:
    """Append a frame to a JDBC table (creates it on first append — the
    Spark JDBC writer's SaveMode.Append contract). The scale contract:
    one INSERT batch per partition, ``numPartitions``/``batchsize``
    options bound the connection fan-out against a real warehouse."""
    if not jdbc_available(df.sparkSession, driver_class):
        raise RuntimeError(
            f"JDBC driver {driver_class} not on the classpath; add it via spark.jars"
        )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver_class)
        .options(**options)
        .mode(mode)
        .save()
    )
