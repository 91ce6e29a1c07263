from beast_spark.operators import dedup, similarity  # noqa: F401
