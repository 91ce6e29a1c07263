"""Schema-evolution driver (A23/A24) + exactly-once batch idempotence (A12).

The reference's control plane (``protomapping/ProtoUpdateListener.java:
101-126`` → ``sink/bq/BQClient.java:38-114``) reacts to a descriptor-
registry refresh by regenerating the schema, upserting the BigQuery
table, and swapping the converter in place. Structured Streaming pins the
schema at query start, so the Spark translation is an explicit
stop→evolve→restart sequence:

1. derive the new StructType from the new descriptor set (A22);
2. ``schema_diff`` old vs new — additive only, type changes raise
   (``BQTableUpdateFailure`` analog kills the run);
3. apply DDL: for catalog tables ``ALTER TABLE ADD COLUMNS``; for path
   tables parquet/Delta handle addition via mergeSchema-on-read;
4. restart the streaming query from the same checkpoint — offsets are
   preserved, the new columns backfill as NULL for old rows.

Exactly-once: the reference relies on BQ ``insertId`` dedup
(``BQRowWithInsertId.java:9-12``). For file/warehouse sinks the engine
uses a **batch-id ledger**: ``foreachBatch`` skips batch ids it has
already committed, making micro-batch replays (the at-least-once case
after a crash between write and checkpoint-commit) idempotent.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from beast_spark.plans.protowire import PField
from beast_spark.plans.schema import (
    alter_table_sql,
    schema_diff,
    spark_schema_for,
    table_properties_ddl,
)

__all__ = ["SchemaEvolver", "BatchLedger", "idempotent"]


@dataclass
class SchemaEvolver:
    """Stop→diff→DDL→restart orchestration for one sink table."""

    table: str | None = None  # catalog table name (DDL path); None → path table
    labels: dict[str, str] | None = None  # BQConfig table labels analog
    partition_expiry_ms: int | None = None  # expirationMs analog (0/None = never)

    def plan(self, old: T.StructType, new: T.StructType) -> dict:
        """Dry-run: what would change. Raises on incompatible changes."""
        added = schema_diff(old, new)
        return {
            "added": [(p, t.simpleString()) for p, t in added],
            "ddl": alter_table_sql(self.table, added) if self.table else None,
            "restart_required": bool(added),
        }

    def evolve(
        self,
        spark: SparkSession,
        old_schema: tuple[PField, ...],
        new_schema: tuple[PField, ...],
        restart: Callable[[], object] | None = None,
    ) -> dict:
        """Execute the evolution sequence; returns the applied plan."""
        plan = self.plan(spark_schema_for(old_schema), spark_schema_for(new_schema))
        if plan["ddl"]:
            spark.sql(plan["ddl"])
        if self.table:
            plan["property_ddl"] = self.sync_properties(spark)
        if plan["restart_required"] and restart is not None:
            restart()
        return plan

    def current_properties(self, spark: SparkSession) -> dict[str, str]:
        rows = spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        return {r.key: r.value for r in rows}

    def sync_properties(self, spark: SparkSession) -> list[str]:
        """Diff + apply label / partition-expiry properties
        (``BQClient.shouldUpdateTable``'s label/expiry clauses). Returns
        the DDL executed — empty when nothing differed."""
        ddls = table_properties_ddl(
            self.table,
            self.current_properties(spark),
            labels=self.labels,
            partition_expiry_ms=self.partition_expiry_ms,
        )
        for ddl in ddls:
            spark.sql(ddl)
        return ddls


class BatchLedger:
    """Tiny committed-batch log for idempotent ``foreachBatch`` writes.

    One empty marker file per committed (query, batch) — commit happens
    AFTER the write succeeds, so a crash in between leaves the batch
    uncommitted and the replay re-writes it (at-least-once → exactly-once
    for idempotent/overwrite writes, effectively-once for appends keyed
    by insert_id, same contract as the reference)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"batch-{batch_id}.committed")

    def seen(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def commit(self, batch_id: int, meta: dict | None = None) -> None:
        with open(self._marker(batch_id), "w") as fh:
            json.dump(meta or {}, fh)


def idempotent(ledger: BatchLedger, write: Callable[[DataFrame, int], None]):
    """Wrap a foreachBatch function with replay protection."""

    def guarded(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(batch_id):
            return
        write(batch_df, batch_id)
        ledger.commit(batch_id)

    return guarded
