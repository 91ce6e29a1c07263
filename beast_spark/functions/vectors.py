"""Vector (embedding) column expressions — pure Column, JVM-side.

Embeddings are ``array<float>`` columns; arithmetic folds run with
``zip_with``/``aggregate`` inside codegen, so similarity math never
leaves the JVM. For very wide vectors or batched matrix math, a
pandas-UDF path would be the alternative; at 64–1024 dims the
expression path is faster than Arrow round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))
