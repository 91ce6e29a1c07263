"""Schema derivation, mapping compiler, schema evolution (A5, A22, A23)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from beast_spark.plans.mapping import auto_mapping, compile_mapping
from beast_spark.plans.protowire import PField
from beast_spark.plans.schema import (
    MAX_NESTING,
    alter_table_sql,
    schema_diff,
    spark_schema_for,
    spark_type_for,
)
from tests.fixtures import TEST_SCHEMA


def test_spark_schema_types():
    s = spark_schema_for(TEST_SCHEMA)
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["order_number"] == T.StringType()
    assert by_name["status"] == T.StringType()  # enum → name
    assert by_name["discount"] == T.LongType()
    assert by_name["price"] == T.DoubleType()
    assert by_name["weight"] == T.FloatType()
    assert by_name["blob"] == T.BinaryType()
    assert by_name["created_at"] == T.TimestampType()
    assert by_name["properties"] == T.StringType()  # Struct → JSON
    assert by_name["took"].fieldNames() == ["seconds", "nanos"]  # Duration → struct
    assert isinstance(by_name["items"], T.ArrayType)
    assert isinstance(by_name["items"].elementType, T.StructType)
    assert isinstance(by_name["current_state"], T.ArrayType)  # map → array<kv>


def test_recursion_cap():
    """Parser.java:14-18 — recursive protos truncate at 15 levels."""
    leaf = PField(1, "child", "message", fields=())
    node = leaf
    for _ in range(40):
        node = PField(1, "child", "message", fields=(node,))
    t = spark_type_for(node)
    depth = 0
    while isinstance(t, T.StructType) and t.fields:
        t = t.fields[0].dataType
        depth += 1
    assert depth <= MAX_NESTING


def test_metadata_collision_detection():
    clashing = (PField(1, "load_time", "string"),)
    with pytest.raises(ValueError, match="collide"):
        spark_schema_for(clashing, with_metadata=True)
    # namespacing resolves the collision (BQField.java:74-89)
    s = spark_schema_for(clashing, with_metadata=True, metadata_namespace="__kafka")
    assert "__kafka" in s.fieldNames()


def test_auto_mapping_roundtrip(spark):
    # spark fixture needed: compile_mapping's Column lambdas require the JVM
    m = auto_mapping(TEST_SCHEMA)
    assert m["1"] == "order_number"
    assert m["11"]["record_name"] == "items"
    assert m["11"]["1"] == "item_id"
    cols = compile_mapping(m, TEST_SCHEMA)
    assert len(cols) == len(TEST_SCHEMA)


def test_compile_mapping_rename_and_nested(spark):
    import tests.fixtures as fx
    from beast_spark.plans.protowire import decode_message

    rows = [(decode_message(fx.encoded_order(i), TEST_SCHEMA),) for i in range(1, 4)]
    df = spark.createDataFrame(rows, T.StructType([T.StructField("payload", spark_schema_for(TEST_SCHEMA))]))
    mapping = {
        "1": "order_id",
        "8": "total_price",
        "12": {"record_name": "ship_to", "1": "sku", "3": "label"},
        "11": {"record_name": "cart_items", "1": "sku", "2": "qty"},
    }
    out = df.select(*compile_mapping(mapping, TEST_SCHEMA, source_prefix="payload."))
    assert set(out.columns) == {"order_id", "total_price", "ship_to", "cart_items"}
    row = out.orderBy("order_id").first()
    assert row.order_id == "order-1"
    assert row.ship_to.sku == 1 and row.ship_to.label == "box"
    assert [i.qty for i in row.cart_items] == [2, 1]


def test_compile_mapping_unknown_field():
    with pytest.raises(KeyError):
        compile_mapping({"42": "nope"}, TEST_SCHEMA)


def test_schema_diff_additive_and_incompatible():
    old = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("nested", T.StructType([T.StructField("x", T.StringType())])),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField(
                "nested",
                T.StructType(
                    [T.StructField("x", T.StringType()), T.StructField("y", T.DoubleType())]
                ),
            ),
        ]
    )
    added = schema_diff(old, new)
    assert [p for p, _ in added] == ["b", "nested.y"]
    sql = alter_table_sql("warehouse.orders", added)
    assert sql == "ALTER TABLE warehouse.orders ADD COLUMNS (b string)"

    bad = T.StructType([T.StructField("a", T.StringType())])
    with pytest.raises(ValueError, match="incompatible"):
        schema_diff(old, bad)
