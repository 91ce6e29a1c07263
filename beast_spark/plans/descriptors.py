"""Generate a binary ``FileDescriptorSet`` from a ``PField`` schema.

The reference fetches compiled descriptors from a Stencil registry and
decodes with ``DynamicMessage``
(``protomapping/ProtoUpdateListener.java:157-168``). Spark's production
path is the JVM spark-protobuf connector:
``from_protobuf(value, messageName, binaryDescriptorSet=...)`` — fully
codegen'd, no Python in the decode. The connector needs the descriptor
set as serialized bytes of ``google.protobuf.FileDescriptorSet``; that
message's own shape (descriptor.proto) is public and stable, so we can
emit it with the engine's wire codec — no protoc, no python-protobuf
dependency.

Supported field types for the JVM path: scalars, enum, bytes, timestamp,
nested messages, and repeated forms thereof. ``duration`` (mapped to
DayTimeIntervalType by the connector, but struct{seconds,nanos} by this
engine) and ``struct`` (needs the Struct/Value WKT graph) stay on the
Python codec — ``jvm_decode_supported`` reports which.
"""

from __future__ import annotations

from beast_spark.plans.protowire import PField, encode_message

__all__ = ["descriptor_set_bytes", "jvm_decode_supported", "DEFAULT_MESSAGE", "DEFAULT_PACKAGE"]

DEFAULT_MESSAGE = "Event"
DEFAULT_PACKAGE = "beast"

# --- meta-schema: the (public) shape of descriptor.proto itself ----------
_ENUM_VALUE = (PField(1, "name", "string"), PField(2, "number", "int32"))
_ENUM = (
    PField(1, "name", "string"),
    PField(2, "value", "message", repeated=True, fields=_ENUM_VALUE),
)
_FIELD = (
    PField(1, "name", "string"),
    PField(3, "number", "int32"),
    PField(4, "label", "int32"),  # 1=optional, 3=repeated
    PField(5, "type", "int32"),
    PField(6, "type_name", "string"),
)
_MESSAGE = (
    PField(1, "name", "string"),
    PField(2, "field", "message", repeated=True, fields=_FIELD),
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

# FieldDescriptorProto.Type numbers (public)
_TYPE_NUM = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "uint64": 4,
    "int32": 5,
    "fixed64": 6,
    "fixed32": 7,
    "bool": 8,
    "string": 9,
    "message": 11,
    "bytes": 12,
    "uint32": 13,
    "enum": 14,
    "sfixed32": 15,
    "sfixed64": 16,
    "sint32": 17,
    "sint64": 18,
}

_TIMESTAMP_FILE = {
    "name": "google/protobuf/timestamp.proto",
    "package": "google.protobuf",
    "message_type": [
        {
            "name": "Timestamp",
            "field": [
                {"name": "seconds", "number": 1, "label": 1, "type": 3},
                {"name": "nanos", "number": 2, "label": 1, "type": 5},
            ],
        }
    ],
    "syntax": "proto3",
}


def jvm_decode_supported(schema: tuple[PField, ...]) -> bool:
    """True when every field (recursively) maps identically under the JVM
    connector and the Python codec."""
    for f in schema:
        if f.type in ("struct", "duration"):
            return False
        if f.type == "message" and not jvm_decode_supported(f.fields):
            return False
    return True


def _field_entry(f: PField, scope: str, messages: list, enums: list) -> dict:
    entry = {"name": f.name, "number": f.number, "label": 3 if f.repeated else 1}
    if f.type == "timestamp":
        entry["type"] = 11
        entry["type_name"] = ".google.protobuf.Timestamp"
    elif f.type == "message":
        nested_name = f"{scope}_{f.name}"
        messages.append(_message_entry(nested_name, f.fields, messages, enums))
        entry["type"] = 11
        entry["type_name"] = f".{DEFAULT_PACKAGE}.{nested_name}"
    elif f.type == "enum":
        enum_name = f"{scope}_{f.name}_E"
        values = list(f.enum_names)
        if not any(num == 0 for num, _ in values):
            values.insert(0, (0, f"{enum_name}_UNSPECIFIED"))
        enums.append(
            {"name": enum_name, "value": [{"name": n, "number": num} for num, n in values]}
        )
        entry["type"] = 14
        entry["type_name"] = f".{DEFAULT_PACKAGE}.{enum_name}"
    else:
        entry["type"] = _TYPE_NUM[f.type]
    return entry


def _message_entry(name: str, schema: tuple[PField, ...], messages: list, enums: list) -> dict:
    return {
        "name": name,
        "field": [_field_entry(f, name, messages, enums) for f in schema],
    }


def descriptor_set_bytes(
    schema: tuple[PField, ...],
    message_name: str = DEFAULT_MESSAGE,
    package: str = DEFAULT_PACKAGE,
) -> bytes:
    """Serialized FileDescriptorSet for ``schema``; nested messages and
    enums are hoisted to top-level with scope-qualified names."""
    messages: list = []
    enums: list = []
    root = _message_entry(message_name, schema, messages, enums)

    def _uses_timestamp(fields: tuple[PField, ...]) -> bool:
        return any(
            f.type == "timestamp" or (f.type == "message" and _uses_timestamp(f.fields))
            for f in fields
        )

    uses_timestamp = _uses_timestamp(schema)
    main_file = {
        "name": f"{package}/{message_name.lower()}.proto",
        "package": package,
        "message_type": messages + [root],
        "enum_type": enums,
        "syntax": "proto3",
    }
    files = []
    if uses_timestamp:
        main_file["dependency"] = ["google/protobuf/timestamp.proto"]
        files.append(_TIMESTAMP_FILE)
    files.append(main_file)
    return encode_message({"file": files}, _SET)


def full_message_name(message_name: str = DEFAULT_MESSAGE, package: str = DEFAULT_PACKAGE) -> str:
    return f"{package}.{message_name}"
