"""End-to-end ingest pipeline (A3-A9) over Kafka-shaped frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beast_spark.config import IngestSettings
from beast_spark.streaming.ingest import ProtoIngest
from tests.fixtures import KAFKA_DDL, TEST_SCHEMA, kafka_rows


def _kafka_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_DDL)


def test_decode_map_metadata(spark):
    df = _kafka_df(spark, kafka_rows(5))
    valid, invalid = ProtoIngest(TEST_SCHEMA).apply(df)
    out = valid.orderBy("message_offset").collect()
    assert len(out) == 5 and invalid.count() == 0
    first = out[0]
    assert first.order_number == "order-0"
    # A8 metadata columns (ConsumerRecordConverter.java:80-93)
    assert first.message_topic == "orders"
    assert first.message_partition == 0
    assert first.message_offset == 100
    assert first.load_time is not None
    # proto3 elision: order 0 has discount=0 → NULL (RowMapper.java:61)
    assert first.discount is None
    assert out[1].discount == 10


def test_invalid_split_and_null_messages(spark):
    rows = kafka_rows(3)
    rows.append((b"k", None, "orders", 0, 999, rows[0][5]))  # null message (A4)
    rows.append((b"k", b"\xff\xff\xff", "orders", 1, 1000, rows[0][5]))  # corrupt (A9)
    valid, invalid = ProtoIngest(TEST_SCHEMA).apply(_kafka_df(spark, rows))
    assert valid.count() == 3
    bad = {r.offset: r.error for r in invalid.collect()}
    assert bad[999] == "null message"
    assert bad[1000].startswith("DESERIALIZE")
    # default flags: neither error is fatal (drop-and-continue mode)
    assert invalid.filter(F.col("fatal")).count() == 0


def test_fail_flags_mark_fatal(spark):
    rows = kafka_rows(1)
    rows.append((b"k", None, "orders", 0, 999, rows[0][5]))
    settings = IngestSettings(
        fail_on_null_message=True, fail_on_deserialize_error=True, fail_on_unknown_fields=True
    )
    _, invalid = ProtoIngest(TEST_SCHEMA, settings=settings).apply(_kafka_df(spark, rows))
    assert invalid.filter(F.col("fatal")).count() == 1


def test_custom_mapping_projection(spark):
    mapping = {"1": "order_id", "5": "state", "11": {"record_name": "cart", "1": "sku"}}
    valid, _ = ProtoIngest(TEST_SCHEMA, mapping=mapping).apply(_kafka_df(spark, kafka_rows(2)))
    assert set(valid.columns) == {
        "order_id", "state", "cart",
        "message_partition", "message_offset", "message_topic", "message_timestamp", "load_time",
    }


def test_metadata_namespace(spark):
    settings = IngestSettings(metadata_namespace="__kafka_metadata")
    valid, _ = ProtoIngest(TEST_SCHEMA, settings=settings).apply(_kafka_df(spark, kafka_rows(2)))
    assert "__kafka_metadata" in valid.columns
    r = valid.first()
    assert r["__kafka_metadata"].message_topic == "orders"


def test_metadata_collision_raises(spark):
    mapping = {"1": "load_time"}  # user column collides with metadata (A8)
    with pytest.raises(ValueError, match="collide"):
        ProtoIngest(TEST_SCHEMA, mapping=mapping).apply(_kafka_df(spark, kafka_rows(1)))


def test_unknown_field_tolerance_modes(spark):
    """FAIL_ON_UNKNOWN_FIELDS (ProtoMappingConfig.java:14-16): narrow schema
    decoding a wider message fails by default, passes when disabled."""
    narrow = TEST_SCHEMA[:3]
    df = _kafka_df(spark, kafka_rows(2))
    strict_valid, strict_invalid = ProtoIngest(narrow).apply(df)
    assert strict_valid.count() == 0 and strict_invalid.count() == 2
    lax = IngestSettings(fail_on_unknown_fields=False)
    lax_valid, lax_invalid = ProtoIngest(narrow, settings=lax).apply(df)
    assert lax_valid.count() == 2 and lax_invalid.count() == 0
