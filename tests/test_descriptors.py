"""Descriptor-set generation (the spark-protobuf production path) and the
proto3 default-elision expression that aligns JVM-decode output with the
Python codec / reference semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from beast_spark.plans.descriptors import (
    descriptor_set_bytes,
    full_message_name,
    jvm_decode_supported,
)
from beast_spark.plans.protowire import PField, decode_message, encode_message
from beast_spark.plans.schema import spark_schema_for
from beast_spark.streaming.ingest import decode_expr_available, elide_defaults

SCHEMA = (
    PField(1, "event_id", "int64"),
    PField(2, "ts", "timestamp"),
    PField(3, "name", "string"),
    PField(4, "score", "double"),
    PField(5, "flags", "int32", repeated=True),
    PField(6, "status", "enum", enum_names=((0, "UNKNOWN"), (1, "DONE"), (2, "FAILED"))),
    PField(7, "meta", "message", fields=(PField(1, "k", "string"), PField(2, "v", "int64"))),
    PField(8, "blob", "bytes"),
)

# Meta-schema twin of descriptors._SET for structural verification.
_FIELD = (
    PField(1, "name", "string"),
    PField(3, "number", "int32"),
    PField(4, "label", "int32"),
    PField(5, "type", "int32"),
    PField(6, "type_name", "string"),
)
_MESSAGE = (
    PField(1, "name", "string"),
    PField(2, "field", "message", repeated=True, fields=_FIELD),
)
_ENUM_VALUE = (PField(1, "name", "string"), PField(2, "number", "int32"))
_ENUM = (
    PField(1, "name", "string"),
    PField(2, "value", "message", repeated=True, fields=_ENUM_VALUE),
)
_FILE = (
    PField(1, "name", "string"),
    PField(2, "package", "string"),
    PField(3, "dependency", "string", repeated=True),
    PField(4, "message_type", "message", repeated=True, fields=_MESSAGE),
    PField(5, "enum_type", "message", repeated=True, fields=_ENUM),
    PField(12, "syntax", "string"),
)
_SET = (PField(1, "file", "message", repeated=True, fields=_FILE),)


def test_descriptor_set_structure_roundtrips():
    """The emitted FileDescriptorSet decodes (with our own codec) back to
    the expected files/messages/fields — names, numbers, type codes."""
    blob = descriptor_set_bytes(SCHEMA)
    decoded = decode_message(blob, _SET)
    files = {f["name"]: f for f in decoded["file"]}
    assert "google/protobuf/timestamp.proto" in files  # ts dependency included
    main = files["beast/event.proto"]
    assert main["package"] == "beast"
    assert main["syntax"] == "proto3"
    assert main["dependency"] == ["google/protobuf/timestamp.proto"]

    msgs = {m["name"]: m for m in main["message_type"]}
    assert set(msgs) == {"Event", "Event_meta"}
    fields = {f["name"]: f for f in msgs["Event"]["field"]}
    assert fields["event_id"] == {"name": "event_id", "number": 1, "label": 1, "type": 3}
    assert fields["ts"]["type"] == 11
    assert fields["ts"]["type_name"] == ".google.protobuf.Timestamp"
    assert fields["flags"] == {"name": "flags", "number": 5, "label": 3, "type": 5}
    assert fields["status"]["type"] == 14
    assert fields["status"]["type_name"] == ".beast.Event_status_E"
    assert fields["meta"]["type_name"] == ".beast.Event_meta"
    enums = {e["name"]: e for e in main["enum_type"]}
    assert [(v["name"], v.get("number", 0)) for v in enums["Event_status_E"]["value"]] == [
        ("UNKNOWN", 0),
        ("DONE", 1),
        ("FAILED", 2),
    ]


def test_jvm_decode_supported_gating():
    assert jvm_decode_supported(SCHEMA)
    assert not jvm_decode_supported((PField(1, "d", "duration"),))
    assert not jvm_decode_supported((PField(1, "s", "struct"),))
    nested_bad = (PField(1, "m", "message", fields=(PField(1, "s", "struct"),)),)
    assert not jvm_decode_supported(nested_bad)


def test_elide_defaults_matches_python_codec(spark):
    """Feed the elision expression a struct containing materialized proto3
    defaults (what from_protobuf would produce) and assert it lands on
    exactly what the Python codec emits for the same wire bytes."""
    import pyspark.sql.functions as F

    rows = [
        {
            "event_id": 7,
            "ts": dt.datetime(2024, 1, 2, 3, 4, 5, 123456),
            "name": "héllo",
            "score": -2.5,
            "flags": [1, 0, -5],
            "status": "FAILED",
            "meta": {"k": "x", "v": 42},
            "blob": b"\x00\xffraw",
        },
        # every scalar at its proto3 default -> absent on the wire
        {"event_id": 0, "name": "", "score": 0.0, "status": "UNKNOWN", "flags": []},
        # nested defaults inside a present message
        {"event_id": 5, "meta": {"k": "", "v": 0}},
    ]
    wire = [encode_message(r, SCHEMA) for r in rows]

    # what the JVM connector would materialize: defaults filled in
    materialized = []
    for raw in wire:
        d = decode_message(raw, SCHEMA)
        full = {
            "event_id": d.get("event_id", 0),
            "ts": d.get("ts"),
            "name": d.get("name", ""),
            "score": d.get("score", 0.0),
            "flags": d.get("flags", []),
            "status": d.get("status", "UNKNOWN"),
            "meta": (
                {"k": d["meta"].get("k", ""), "v": d["meta"].get("v", 0)}
                if "meta" in d
                else None
            ),
            "blob": d.get("blob", b""),
        }
        materialized.append((full,))

    struct_type = spark_schema_for(SCHEMA)
    df = spark.createDataFrame(materialized, schema=f"p {struct_type.simpleString()}")
    elided = df.select(elide_defaults(F.col("p"), SCHEMA).alias("p")).collect()

    expected = []
    for raw in wire:
        d = decode_message(raw, SCHEMA)
        expected.append(d)

    for got_row, want in zip(elided, expected):
        got = got_row.p.asDict(recursive=True)
        assert got["event_id"] == want.get("event_id")
        assert got["name"] == want.get("name")
        assert got["score"] == want.get("score")
        assert got["status"] == want.get("status")
        assert got["flags"] == want.get("flags")
        assert got["blob"] == (bytearray(want["blob"]) if "blob" in want else None)
        if "meta" in want:
            assert got["meta"] == {
                "k": want["meta"].get("k"),
                "v": want["meta"].get("v"),
            }
        else:
            assert got["meta"] is None


def test_from_protobuf_integration(spark):
    """End-to-end JVM decode — runs only where spark-protobuf is on the
    classpath (not in this container; exercised on a real cluster)."""
    if not decode_expr_available(spark):
        pytest.skip("spark-protobuf connector not on classpath")
    from pyspark.sql.protobuf.functions import from_protobuf

    wire = [encode_message({"event_id": 1, "name": "x"}, SCHEMA)]
    df = spark.createDataFrame([(w,) for w in wire], "value binary")
    out = df.select(
        from_protobuf(
            "value",
            full_message_name(),
            binaryDescriptorSet=descriptor_set_bytes(SCHEMA),
            options={"mode": "PERMISSIVE"},
        ).alias("p")
    ).collect()
    assert out[0].p.event_id == 1 and out[0].p.name == "x"
