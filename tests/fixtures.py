"""Deterministic proto fixtures mirroring the reference's TestMessage
(src/test/proto/TestMessage.proto:14-64): every type category — string,
enum, bool, ints (incl. zigzag), double/float, bytes, timestamp, duration,
Struct(JSON), nested message, repeated message/scalar, map-as-repeated-kv.
Builders play the role of the reference's ProtoUtil/RecordsUtil
(src/test/java/com/gojek/beast/util/ProtoUtil.java:15-37).
"""

from __future__ import annotations

import datetime as dt

from beast_spark.plans.protowire import PField, encode_message

STATUS_ENUM = ((0, "UNKNOWN"), (1, "CREATED"), (2, "COMPLETED"))

ITEM_FIELDS = (
    PField(1, "item_id", "int64"),
    PField(2, "quantity", "int32"),
    PField(3, "name", "string"),
)

KV_FIELDS = (PField(1, "key", "string"), PField(2, "value", "string"))

TEST_SCHEMA = (
    PField(1, "order_number", "string"),
    PField(2, "order_url", "string"),
    PField(3, "order_details", "string"),
    PField(4, "created_at", "timestamp"),
    PField(5, "status", "enum", enum_names=STATUS_ENUM),
    PField(6, "discount", "int64"),
    PField(7, "success", "bool"),
    PField(8, "price", "double"),
    PField(9, "weight", "float"),
    PField(10, "blob", "bytes"),
    PField(11, "items", "message", repeated=True, fields=ITEM_FIELDS),
    PField(12, "shipping", "message", fields=ITEM_FIELDS),
    PField(13, "tags", "string", repeated=True),
    PField(14, "counts", "int64", repeated=True),
    PField(15, "took", "duration"),
    PField(16, "properties", "struct"),
    PField(17, "current_state", "message", repeated=True, fields=KV_FIELDS),
    PField(18, "signed", "sint64"),
)


def sample_order(i: int = 1) -> dict:
    return {
        "order_number": f"order-{i}",
        "order_url": f"https://example.test/orders/{i}",
        "order_details": f"details-{i}",
        "created_at": dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(minutes=i),
        "status": "CREATED" if i % 2 else "COMPLETED",
        "discount": i * 10,
        "success": True,
        "price": 100.5 + i,
        "weight": 1.5,
        "blob": bytes([i % 256, 0xFF, 0x00]),
        "items": [
            {"item_id": i * 100 + 1, "quantity": 2, "name": "widget"},
            {"item_id": i * 100 + 2, "quantity": 1, "name": "gadget"},
        ],
        "shipping": {"item_id": i, "quantity": 1, "name": "box"},
        "tags": ["a", "b"],
        "counts": [1, 2, 3],
        "took": {"seconds": 3, "nanos": 500},
        "properties": '{"color": "red", "size": 2.0}',
        "current_state": [{"key": "state", "value": "ok"}],
        "signed": -42,
    }


def encoded_order(i: int = 1) -> bytes:
    return encode_message(sample_order(i), TEST_SCHEMA)


def kafka_rows(n: int = 5, topic: str = "orders") -> list[tuple]:
    """(key, value, topic, partition, offset, timestamp) tuples."""
    base_ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    return [
        (
            f"k{i}".encode(),
            encoded_order(i),
            topic,
            i % 2,
            100 + i,
            base_ts + dt.timedelta(seconds=i),
        )
        for i in range(n)
    ]


KAFKA_DDL = (
    "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
)
