"""Unit tests for the proto wire codec — the reference's RowMapperTest
analog (src/test/java/com/gojek/beast/converter/RowMapperTest.java:56-80),
table-driven over every type category plus the failure modes."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from beast_spark.plans.protowire import (
    PField,
    UnknownFieldError,
    decode_message,
    encode_message,
)
from tests.fixtures import TEST_SCHEMA, sample_order


def test_roundtrip_all_types():
    src = sample_order(3)
    decoded = decode_message(encode_message(src, TEST_SCHEMA), TEST_SCHEMA)
    assert decoded["order_number"] == "order-3"
    assert decoded["status"] == "CREATED"
    assert decoded["discount"] == 30
    assert decoded["success"] is True
    assert decoded["price"] == pytest.approx(103.5)
    assert decoded["weight"] == pytest.approx(1.5)
    assert decoded["blob"] == bytes([3, 0xFF, 0x00])
    assert decoded["created_at"] == dt.datetime(2024, 1, 1, 12, 3, 0)
    assert decoded["items"] == [
        {"item_id": 301, "quantity": 2, "name": "widget"},
        {"item_id": 302, "quantity": 1, "name": "gadget"},
    ]
    assert decoded["shipping"]["name"] == "box"
    assert decoded["tags"] == ["a", "b"]
    assert decoded["counts"] == [1, 2, 3]
    assert decoded["took"] == {"seconds": 3, "nanos": 500}
    assert json.loads(decoded["properties"]) == {"color": "red", "size": 2.0}
    assert decoded["current_state"] == [{"key": "state", "value": "ok"}]
    assert decoded["signed"] == -42


def test_proto3_default_elision():
    """RowMapper.java:61 — defaults are absent from the row (NULL downstream)."""
    raw = encode_message(
        {"order_number": "", "discount": 0, "success": False, "price": 0.0, "tags": []},
        TEST_SCHEMA,
    )
    assert raw == b""
    assert decode_message(raw, TEST_SCHEMA) == {}


def test_negative_varints():
    raw = encode_message({"discount": -5, "signed": -99}, TEST_SCHEMA)
    decoded = decode_message(raw, TEST_SCHEMA)
    assert decoded["discount"] == -5  # two's-complement varint
    assert decoded["signed"] == -99  # zigzag


def test_unknown_field_policy():
    """RowMapper.java:44-49 — unknown field numbers fail (default) or skip."""
    wide = TEST_SCHEMA + (PField(99, "extra", "string"),)
    raw = encode_message({"order_number": "x", "extra": "future-field"}, wide)
    with pytest.raises(UnknownFieldError):
        decode_message(raw, TEST_SCHEMA, fail_on_unknown=True)
    assert decode_message(raw, TEST_SCHEMA, fail_on_unknown=False) == {"order_number": "x"}


def test_unknown_field_policy_applies_to_nested_messages():
    """RowMapper.java:44-49 via recursive getMappings — a schema-drifted
    NESTED record fails under fail_on_unknown exactly like a top-level one."""
    from tests.fixtures import ITEM_FIELDS

    wide_item = ITEM_FIELDS + (PField(99, "extra", "string"),)
    wide = tuple(
        PField(12, "shipping", "message", fields=wide_item) if f.number == 12 else f
        for f in TEST_SCHEMA
    )
    raw = encode_message(
        {"order_number": "x", "shipping": {"item_id": 1, "extra": "drifted"}}, wide
    )
    with pytest.raises(UnknownFieldError):
        decode_message(raw, TEST_SCHEMA, fail_on_unknown=True)
    lax = decode_message(raw, TEST_SCHEMA, fail_on_unknown=False)
    assert lax["shipping"] == {"item_id": 1}


def test_unknown_field_policy_applies_to_repeated_nested():
    wide_kv = (PField(1, "key", "string"), PField(2, "value", "string"), PField(9, "x", "int64"))
    wide = tuple(
        PField(17, "current_state", "message", repeated=True, fields=wide_kv)
        if f.number == 17
        else f
        for f in TEST_SCHEMA
    )
    raw = encode_message({"current_state": [{"key": "k", "x": 5}]}, wide)
    with pytest.raises(UnknownFieldError):
        decode_message(raw, TEST_SCHEMA, fail_on_unknown=True)
    assert decode_message(raw, TEST_SCHEMA, fail_on_unknown=False) == {
        "current_state": [{"key": "k"}]
    }


def test_unknown_enum_number_falls_back_to_string():
    """EnumField.java:15-25 — unknown enum numbers stringify."""
    schema = (PField(1, "status", "enum", enum_names=((0, "A"), (1, "B"))),)
    raw = encode_message({"status": 7}, schema)
    assert decode_message(raw, schema) == {"status": "7"}


def test_packed_repeated_scalars():
    # hand-build a packed encoding: field 14 (counts), wire type 2
    payload = bytes([0x01, 0x02, 0x03])
    raw = bytes([(14 << 3) | 2, len(payload)]) + payload
    assert decode_message(raw, TEST_SCHEMA)["counts"] == [1, 2, 3]


def test_truncated_message_raises():
    raw = encode_message({"order_number": "hello"}, TEST_SCHEMA)
    with pytest.raises(ValueError):
        decode_message(raw[:-2], TEST_SCHEMA)


def test_struct_json_nested():
    raw = encode_message(
        {"properties": json.dumps({"a": [1.0, "x", None], "b": {"c": True}})}, TEST_SCHEMA
    )
    out = json.loads(decode_message(raw, TEST_SCHEMA)["properties"])
    assert out == {"a": [1.0, "x", None], "b": {"c": True}}
