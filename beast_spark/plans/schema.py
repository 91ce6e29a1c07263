"""Proto schema → Spark StructType derivation + additive schema evolution.

Mirrors the reference's type layer (``models/BQField.java:23-100``,
``protomapping/Parser.java:20-46``, ``protomapping/Converter.java:24-61``)
with BigQuery types replaced by Spark types (SURVEY.md §1.2 table):

  string→String, enum→String(name), double/float→Double/Float,
  bool→Boolean, all int/fixed/sint→Long, bytes→Binary,
  message→Struct (recursive, 15-level cap per Parser.java:14-18),
  Timestamp→Timestamp, Struct→String(JSON), Duration→Struct{seconds,nanos},
  repeated→Array.

Schema evolution (``protomapping/ProtoUpdateListener.java:101-126``,
``sink/bq/BQClient.java:38-114``) becomes a StructType diff + generated
``ALTER TABLE … ADD COLUMNS`` DDL: additive-only, nested adds supported,
type changes rejected (the reference's BQ patch would likewise fail).
"""

from __future__ import annotations

from pyspark.sql import types as T

from beast_spark.plans.protowire import PField

MAX_NESTING = 15  # protomapping/Parser.java:14-18 (BigQuery nesting limit)

# Kafka-consumer metadata columns added to every row
# (converter/ConsumerRecordConverter.java:80-93, config/Constants.java:6-10).
METADATA_FIELDS = (
    ("message_partition", T.IntegerType()),
    ("message_offset", T.LongType()),
    ("message_topic", T.StringType()),
    ("message_timestamp", T.TimestampType()),
    ("load_time", T.TimestampType()),
)

_SCALAR_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "enum": T.StringType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "bool": T.BooleanType(),
    "int64": T.LongType(),
    "uint64": T.LongType(),
    "int32": T.LongType(),
    "uint32": T.LongType(),
    "sint64": T.LongType(),
    "sint32": T.LongType(),
    "fixed64": T.LongType(),
    "fixed32": T.LongType(),
    "sfixed64": T.LongType(),
    "sfixed32": T.LongType(),
    "bytes": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "struct": T.StringType(),  # google.protobuf.Struct → JSON string
}


def spark_type_for(f: PField, depth: int = 1) -> T.DataType:
    if f.type == "message":
        if depth >= MAX_NESTING:
            # recursion cap: truncate like Parser.java:36-40
            inner: T.DataType = T.StructType([])
        else:
            inner = T.StructType(
                [T.StructField(c.name, spark_type_for(c, depth + 1), True) for c in f.fields]
            )
        base: T.DataType = inner
    elif f.type == "duration":
        base = T.StructType(
            [T.StructField("seconds", T.LongType(), True), T.StructField("nanos", T.LongType(), True)]
        )
    else:
        base = _SCALAR_TYPES[f.type]
    return T.ArrayType(base, True) if f.repeated else base


def spark_schema_for(
    schema: tuple[PField, ...], with_metadata: bool = False, metadata_namespace: str | None = None
) -> T.StructType:
    """StructType for a decoded message (+ optional metadata columns).

    ``metadata_namespace`` nests the five metadata columns in one struct
    (BQ_METADATA_NAMESPACE behavior, ``models/BQField.java:74-89``); a
    namespace or metadata name colliding with a payload field is an error
    (``protomapping/ProtoUpdateListener.java:137-141``).
    """
    fields = [T.StructField(f.name, spark_type_for(f), True) for f in schema]
    if with_metadata:
        payload_names = {f.name for f in fields}
        if metadata_namespace:
            if metadata_namespace in payload_names:
                raise ValueError(
                    f"metadata namespace {metadata_namespace!r} collides with a payload field"
                )
            fields.append(
                T.StructField(
                    metadata_namespace,
                    T.StructType([T.StructField(n, t, True) for n, t in METADATA_FIELDS]),
                    True,
                )
            )
        else:
            collisions = payload_names & {n for n, _ in METADATA_FIELDS}
            if collisions:
                raise ValueError(f"metadata columns collide with payload fields: {sorted(collisions)}")
            fields.extend(T.StructField(n, t, True) for n, t in METADATA_FIELDS)
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Schema evolution
# ---------------------------------------------------------------------------

def schema_diff(old: T.StructType, new: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    """Additive diff: columns (incl. nested, dotted paths) present in ``new``
    but not ``old``. A changed type for an existing column raises — the
    reference's BQ schema patch would equally reject it.
    """
    added: list[tuple[str, T.DataType]] = []
    old_by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        path = f"{prefix}{f.name}"
        if f.name not in old_by_name:
            added.append((path, f.dataType))
            continue
        old_f = old_by_name[f.name]
        if isinstance(f.dataType, T.StructType) and isinstance(old_f.dataType, T.StructType):
            added.extend(schema_diff(old_f.dataType, f.dataType, prefix=f"{path}."))
        elif f.dataType != old_f.dataType:
            raise ValueError(
                f"incompatible type change for {path}: {old_f.dataType} -> {f.dataType}"
            )
    return added


def alter_table_sql(table: str, added: list[tuple[str, T.DataType]]) -> str | None:
    """``ALTER TABLE … ADD COLUMNS`` DDL for top-level additions.

    Nested (dotted) additions are handled by Delta/Iceberg-style
    mergeSchema on write rather than DDL; they are excluded here.
    """
    top = [(p, t) for p, t in added if "." not in p]
    if not top:
        return None
    cols = ", ".join(f"{name} {dtype.simpleString()}" for name, dtype in top)
    return f"ALTER TABLE {table} ADD COLUMNS ({cols})"


EXPIRY_PROP = "beast.partition.expiry.ms"
LABEL_PREFIX = "label."


def table_properties_ddl(
    table: str,
    current: dict[str, str],
    labels: dict[str, str] | None = None,
    partition_expiry_ms: int | None = None,
) -> list[str]:
    """Label + partition-expiry sync DDL — ``BQClient.java:66-114`` +
    ``BQTableDefinition.java:45-59`` parity on Spark catalog tables.

    The reference updates the table when its labels differ or the
    day-partition ``expirationMs`` differs (0 / unset both meaning
    "never", ``shouldChangePartitionExpiryForStandardTable``). Spark has
    no native partition TTL, so expiry is recorded as the table property
    ``beast.partition.expiry.ms`` (enforced by the retention job that
    drops ``dt=`` partitions past the TTL) and labels as ``label.<k>``
    properties. Emits only the statements a real diff requires — no DDL
    when nothing changed (the reference's "Skipping bigquery table
    update" branch).
    """
    desired = {f"{LABEL_PREFIX}{k}": v for k, v in (labels or {}).items()}
    if partition_expiry_ms and partition_expiry_ms > 0:
        desired[EXPIRY_PROP] = str(partition_expiry_ms)
    managed = lambda k: k == EXPIRY_PROP or k.startswith(LABEL_PREFIX)  # noqa: E731
    changed = {k: v for k, v in desired.items() if current.get(k) != v}
    dropped = [k for k in current if managed(k) and k not in desired]
    ddls: list[str] = []
    # SQL-literal escaping: a label value holding a quote or backslash must
    # not produce malformed (or injectable) DDL. Backslashes double first —
    # with the default escapedStringLiterals=false a trailing '\' would
    # otherwise escape the closing quote.
    esc = lambda s: str(s).replace("\\", "\\\\").replace("'", "''")  # noqa: E731
    if changed:
        props = ", ".join(f"'{esc(k)}'='{esc(v)}'" for k, v in sorted(changed.items()))
        ddls.append(f"ALTER TABLE {table} SET TBLPROPERTIES ({props})")
    if dropped:
        props = ", ".join(f"'{esc(k)}'" for k in sorted(dropped))
        ddls.append(f"ALTER TABLE {table} UNSET TBLPROPERTIES ({props})")
    return ddls
