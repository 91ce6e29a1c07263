"""Property-based tests for the proto wire codec (hypothesis).

The reference's fixture tests assert hand-picked values
(``RowMapperTest.java:56-80``); these go further: for arbitrary typed
values, encode→decode is the identity modulo proto3 default elision, and
arbitrary garbage bytes can only ever raise ``ProtoDecodeError``.
"""

from __future__ import annotations

import datetime as dt
import struct as _struct

from hypothesis import given, settings, strategies as st

from beast_spark.plans.protowire import (
    PField,
    ProtoDecodeError,
    decode_message,
    encode_message,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
U64 = st.integers(min_value=0, max_value=2**64 - 1)
U32 = st.integers(min_value=0, max_value=2**32 - 1)
F64 = st.floats(allow_nan=False)  # NaN != NaN breaks identity by definition
TEXT = st.text(max_size=80)
BYTES = st.binary(max_size=80)
TS = st.datetimes(
    min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2200, 1, 1)
)

SCHEMA = (
    PField(1, "a_i64", "int64"),
    PField(2, "a_i32", "int32"),
    PField(3, "a_s64", "sint64"),
    PField(4, "a_s32", "sint32"),
    PField(5, "a_u64", "uint64"),
    PField(6, "a_u32", "uint32"),
    PField(7, "a_f64x", "fixed64"),
    PField(8, "a_sf32", "sfixed32"),
    PField(9, "a_dbl", "double"),
    PField(10, "a_flt", "float"),
    PField(11, "a_bool", "bool"),
    PField(12, "a_str", "string"),
    PField(13, "a_bytes", "bytes"),
    PField(14, "a_ts", "timestamp"),
    PField(15, "a_rep", "int64", repeated=True),
    PField(16, "a_msg", "message", fields=(PField(1, "x", "int64"), PField(2, "y", "string"))),
    PField(
        17, "a_enum", "enum", enum_names=((0, "ZERO"), (1, "ONE"), (2, "TWO"))
    ),
)


def _f32(v: float) -> float:
    return _struct.unpack("<f", _struct.pack("<f", v))[0]


VALUES = st.fixed_dictionaries(
    {},
    optional={
        "a_i64": I64,
        "a_i32": I32,
        "a_s64": I64,
        "a_s32": I32,
        "a_u64": U64,
        "a_u32": U32,
        "a_f64x": U64,
        "a_sf32": I32,
        "a_dbl": F64,
        "a_flt": st.floats(allow_nan=False, allow_infinity=False, width=32).map(_f32),
        "a_bool": st.booleans(),
        "a_str": TEXT,
        "a_bytes": BYTES,
        "a_ts": TS,
        "a_rep": st.lists(I64, max_size=8),
        "a_msg": st.fixed_dictionaries({}, optional={"x": I64, "y": TEXT}),
        "a_enum": st.sampled_from(["ZERO", "ONE", "TWO"]),
    },
)


def _expected(data: dict, schema: tuple[PField, ...] = SCHEMA) -> dict:
    """Model of encode∘decode: proto3 elides values equal to the default;
    repeated fields keep every element (absent ⇒ missing key)."""
    by_name = {f.name: f for f in schema}
    out = {}
    for name, v in data.items():
        f = by_name[name]
        if f.repeated:
            if v:
                out[name] = list(v)
            continue
        if f.type == "message":
            inner = _expected(v, f.fields)
            # a message whose fields are all defaults still encodes as an
            # empty-but-present submessage → decodes to {}
            out[name] = inner
            continue
        if f.type == "timestamp":
            micros = v.replace(tzinfo=dt.timezone.utc)
            if int(micros.timestamp()) == 0 and v.microsecond == 0:
                # zero Timestamp encodes as empty submessage → epoch back out
                out[name] = dt.datetime(1970, 1, 1)
                continue
            out[name] = v
            continue
        default = {
            "bool": False,
            "string": "",
            "bytes": b"",
            "enum": "ZERO",
        }.get(f.type, 0)
        if v == default:
            # NB: proto3 elides -0.0 as well (the `!= 0` check) — a known
            # lossy quirk of the real encoders, reproduced faithfully.
            continue
        out[name] = v
    return out


@settings(max_examples=200, deadline=None)
@given(VALUES)
def test_roundtrip_identity_modulo_elision(data):
    wire = encode_message(data, SCHEMA)
    got = decode_message(wire, SCHEMA, fail_on_unknown=True)
    want = _expected(data)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(VALUES)
def test_compiled_decoder_equivalent_to_generic(data):
    """compile_decoder (hot ingest path) must agree with decode_message
    bit-for-bit on every valid message, in both unknown-field modes."""
    from beast_spark.plans.protowire import compile_decoder

    wire = encode_message(data, SCHEMA)
    assert compile_decoder(SCHEMA, True)(wire) == decode_message(
        wire, SCHEMA, fail_on_unknown=True
    )
    assert compile_decoder(SCHEMA, False)(wire) == decode_message(wire, SCHEMA)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_bytes_never_raise_uncontrolled(buf):
    from beast_spark.plans.protowire import compile_decoder

    compiled = compile_decoder(SCHEMA, False)
    for attempt in (lambda: decode_message(buf, SCHEMA, fail_on_unknown=False), lambda: compiled(buf)):
        try:
            attempt()
        except ProtoDecodeError:
            pass  # the one allowed failure mode (A9 DESERIALIZE)


def test_recursion_blowup_raises_proto_decode_error_on_both_paths():
    """Pathological nesting depth must raise ProtoDecodeError from BOTH
    decode paths, not a bare RecursionError from the compiled one
    (ADVICE r2: the two 'equivalent' paths disagreed on exception type)."""
    import sys

    from beast_spark.plans.protowire import PField, compile_decoder, encode_message

    depth = 60
    schema = (PField(1, "leaf", "int64"),)
    for _ in range(depth):
        schema = (PField(1, "child", "message", fields=schema),)
    msg = {"leaf": 7}
    for _ in range(depth):
        msg = {"child": msg}
    wire = encode_message(msg, schema)
    compiled = compile_decoder(schema, False)
    assert compiled(wire) == decode_message(wire, schema) == msg

    limit = sys.getrecursionlimit()
    try:
        sys.setrecursionlimit(90)  # decode needs ~several frames per level
        for attempt in (lambda: compiled(wire), lambda: decode_message(wire, schema)):
            try:
                attempt()
            except ProtoDecodeError:
                pass  # RecursionError must arrive wrapped (or not at all)
    finally:
        sys.setrecursionlimit(limit)


@settings(max_examples=100, deadline=None)
@given(VALUES, st.binary(min_size=1, max_size=30))
def test_trailing_garbage_is_detected_or_decoded(data, junk):
    """Appending junk to a valid message must either decode (junk parsed
    as fields/skippable) or raise ProtoDecodeError — never anything else."""
    wire = encode_message(data, SCHEMA) + junk
    try:
        decode_message(wire, SCHEMA, fail_on_unknown=False)
    except ProtoDecodeError:
        pass
