from beast_spark.plans.protowire import PField, decode_message, encode_message  # noqa: F401
from beast_spark.plans.schema import spark_schema_for, schema_diff  # noqa: F401
from beast_spark.plans.mapping import compile_mapping, auto_mapping  # noqa: F401
