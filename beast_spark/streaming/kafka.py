"""Kafka source wiring (A1/A2) — options mirror the reference's consumer
configuration (``config/KafkaConfig.java:17-29``, ``BeastFactory.java:193-202``).

The runtime container lacks the spark-sql-kafka connector jar, so
``read_stream`` raises a clear error when the source is unavailable;
``kafka_options`` stays pure/testable. The semantics the reference builds
by hand map onto the source directly:

* regex topic subscription → ``subscribePattern``
* manual offset commit after sink ack (A18–A21) → checkpointed offsets
* ``max.poll.records`` batching (A2) → ``maxOffsetsPerTrigger``
* rebalance listener (A26) → internal to the source
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KAFKA_FORMAT = "kafka"


def kafka_options(
    brokers: str,
    topic_pattern: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 500,  # KAFKA_CONSUMER_MAX_POLL_RECORDS default
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribePattern": topic_pattern,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source_available(spark: SparkSession) -> bool:
    # Class.forName, NOT attribute access: py4j resolves a missing class
    # path to a JavaPackage object without raising, which made the
    # attribute-probe version report the connector present when it isn't.
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(spark: SparkSession, **options_kwargs) -> DataFrame:
    if not kafka_source_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector jar not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        )
    opts = kafka_options(**options_kwargs)
    return spark.readStream.format(KAFKA_FORMAT).options(**opts).load()
