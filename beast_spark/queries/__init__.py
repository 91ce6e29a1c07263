"""Query registry: every declared operator from SURVEY.md §2 becomes a
named query with (a) a Spark DataFrame implementation and (b), where
SQL-expressible, an ANSI-SQL oracle that DuckDB runs on the same parquet
tables. The driver compares the two at sf0.01 (row count + schema +
order-insensitive value hash) — see ``__spark_entry__.py``.

Conventions that keep the Spark/DuckDB comparison stable:

* every computed column is aliased identically on both sides;
* floating-point aggregates are ``round()``-ed (both engines sum doubles
  in different orders; rounding removes the ~1e-12 associativity noise);
* DuckDB's integer ``sum()`` widens to HUGEINT — oracles cast back to
  BIGINT to match Spark's LongType;
* results that use LIMIT/top-k always carry a deterministic total order
  (rank column + unique-key tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""
    bench: bool = field(default=True)  # include in bench.py headline set
    bench_reason: str = ""  # why bench=False; printed by bench.py ("no silent caps")


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", bench: bool = True, bench_reason: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if not bench and not bench_reason:
            raise ValueError(f"{name!r}: bench=False requires a bench_reason")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, bench_reason=bench_reason
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import registers; keep lazy to avoid import cycles.
    import beast_spark.queries.advanced  # noqa: F401
    import beast_spark.queries.analytic  # noqa: F401
    import beast_spark.queries.curation  # noqa: F401
    import beast_spark.queries.datapipe  # noqa: F401
    import beast_spark.queries.events  # noqa: F401
    import beast_spark.queries.relational  # noqa: F401

    return dict(_REGISTRY)
