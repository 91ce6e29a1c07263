"""Column-mapping compiler: proto field index → output column name.

The reference configures a JSON mapping
``{"1": "order_number", "2": {"record_name": "cart", "1": "item_id"}}``
(``config/ProtoIndexToFieldMapConverter.java:20-43``; nested RECORDs named
by the ``record_name`` key, ``config/Constants.java:17``) and applies it
row-by-row in ``converter/RowMapper.java:33-88``. Here the same JSON
compiles ONCE into a Spark ``select`` projection over the decoded struct —
Catalyst then prunes unprojected columns all the way into the scan, which
the reference's per-row Java loop could never do.

``auto_mapping`` regenerates the 1:1 mapping from a schema, mirroring
``protomapping/Converter.generateColumnMappings``
(``protomapping/Converter.java:24-45``).
"""

from __future__ import annotations

import json
from typing import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from beast_spark.plans.protowire import PField

RECORD_NAME_KEY = "record_name"  # config/Constants.java:17


def auto_mapping(schema: tuple[PField, ...]) -> dict:
    """1:1 mapping {field_number: field_name} incl. nested records."""
    out: dict = {}
    for f in schema:
        if f.type == "message" and f.fields:
            nested = auto_mapping(f.fields)
            nested[RECORD_NAME_KEY] = f.name
            out[str(f.number)] = nested
        else:
            out[str(f.number)] = f.name
    return out


def compile_mapping(
    mapping: Mapping | str,
    schema: tuple[PField, ...],
    source_prefix: str = "",
) -> list[Column]:
    """Compile a column-mapping JSON into select expressions.

    ``source_prefix`` qualifies the decoded payload location (e.g.
    ``"payload."`` when the decoded message sits in a struct column).
    Unknown field numbers raise, matching the reference's behavior of
    failing the converter build rather than silently dropping columns.
    """
    if isinstance(mapping, str):
        mapping = json.loads(mapping)
    by_number = {f.number: f for f in schema}
    cols: list[Column] = []
    for key, target in mapping.items():
        if key == RECORD_NAME_KEY:
            continue
        number = int(key)
        f = by_number.get(number)
        if f is None:
            raise KeyError(f"column mapping references unknown field number {number}")
        src = f"{source_prefix}{f.name}"
        if isinstance(target, Mapping):
            record_name = target.get(RECORD_NAME_KEY)
            if not record_name:
                raise ValueError(f"nested mapping for field {number} lacks '{RECORD_NAME_KEY}'")
            if f.type != "message":
                raise ValueError(f"nested mapping for non-message field {f.name!r}")
            if f.repeated:
                # element-wise projection of array<struct>
                inner = _struct_projector(target, f.fields)
                cols.append(F.transform(F.col(src), inner).alias(record_name))
            else:
                nested_cols = compile_mapping(target, f.fields, source_prefix=f"{src}.")
                cols.append(F.struct(*nested_cols).alias(record_name))
        else:
            cols.append(F.col(src).alias(str(target)))
    return cols


def _struct_projector(mapping: Mapping, schema: tuple[PField, ...]):
    """Lambda for transform(): project each array element's struct fields."""
    by_number = {f.number: f for f in schema}

    def project(elem: Column) -> Column:
        parts = []
        for key, target in mapping.items():
            if key == RECORD_NAME_KEY:
                continue
            f = by_number[int(key)]
            if isinstance(target, Mapping):
                record_name = target[RECORD_NAME_KEY]
                inner = _struct_projector(target, f.fields)
                if f.repeated:
                    parts.append(F.transform(elem.getField(f.name), inner).alias(record_name))
                else:
                    parts.append(inner(elem.getField(f.name)).alias(record_name))
            else:
                parts.append(elem.getField(f.name).alias(str(target)))
        return F.struct(*parts)

    return project
