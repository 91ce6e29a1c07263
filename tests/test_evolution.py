"""Schema evolution driver + exactly-once batch ledger (A12, A23)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from beast_spark.plans.protowire import PField
from beast_spark.streaming.evolution import BatchLedger, SchemaEvolver, idempotent

OLD = (PField(1, "id", "int64"), PField(2, "name", "string"))
NEW = OLD + (PField(3, "score", "double"),)
BAD = (PField(1, "id", "string"), PField(2, "name", "string"))


def test_evolution_plan_additive(spark):
    ev = SchemaEvolver(table=None)
    from beast_spark.plans.schema import spark_schema_for

    plan = ev.plan(spark_schema_for(OLD), spark_schema_for(NEW))
    assert plan["added"] == [("score", "double")]
    assert plan["restart_required"]


def test_evolution_ddl_and_restart(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS evo_test")
    spark.sql("DROP TABLE IF EXISTS evo_test.t")
    spark.sql("CREATE TABLE evo_test.t (id bigint, name string) USING parquet "
              f"LOCATION '{tmp_path}/t'")
    restarts = []
    ev = SchemaEvolver(table="evo_test.t")
    plan = ev.evolve(spark, OLD, NEW, restart=lambda: restarts.append(1))
    assert plan["ddl"] == "ALTER TABLE evo_test.t ADD COLUMNS (score double)"
    assert restarts == [1]
    assert "score" in spark.table("evo_test.t").columns
    # no-op evolution: same schema → no DDL, no restart
    plan2 = ev.evolve(spark, NEW, NEW, restart=lambda: restarts.append(2))
    assert plan2["ddl"] is None and restarts == [1]
    spark.sql("DROP TABLE evo_test.t")


def test_evolution_rejects_type_change(spark):
    ev = SchemaEvolver()
    from beast_spark.plans.schema import spark_schema_for

    with pytest.raises(ValueError, match="incompatible"):
        ev.plan(spark_schema_for(OLD), spark_schema_for(BAD))


def test_parquet_schema_merge_on_read(spark, tmp_path):
    """Path-table evolution: old files lack the new column → NULL backfill."""
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode("append").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double").write.mode(
        "append"
    ).parquet(p)
    out = spark.read.option("mergeSchema", True).parquet(p)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_label_and_expiry_property_sync(spark, tmp_path):
    """BQClient.java:66-114 + BQTableDefinition.java:45-59 parity: labels
    and partition expiry diff into TBLPROPERTIES DDL; no-op when equal;
    expiry removal (back to 'never') unsets the property."""
    spark.sql("CREATE DATABASE IF NOT EXISTS evo_test")
    spark.sql("DROP TABLE IF EXISTS evo_test.p")
    spark.sql(
        f"CREATE TABLE evo_test.p (id bigint) USING parquet LOCATION '{tmp_path}/p'"
    )
    ev = SchemaEvolver(
        table="evo_test.p", labels={"team": "data", "env": "prod"},
        partition_expiry_ms=86400000,
    )
    ddls = ev.sync_properties(spark)
    assert ddls == [
        "ALTER TABLE evo_test.p SET TBLPROPERTIES ("
        "'beast.partition.expiry.ms'='86400000', 'label.env'='prod', 'label.team'='data')"
    ]
    props = ev.current_properties(spark)
    assert props["label.team"] == "data"
    assert props["beast.partition.expiry.ms"] == "86400000"
    # second sync: nothing changed -> no DDL (the "Skipping" branch)
    assert ev.sync_properties(spark) == []
    # label change + expiry back to never (0) -> SET + UNSET
    ev.labels = {"team": "ml"}
    ev.partition_expiry_ms = 0
    ddls = ev.sync_properties(spark)
    assert ddls == [
        "ALTER TABLE evo_test.p SET TBLPROPERTIES ('label.team'='ml')",
        "ALTER TABLE evo_test.p UNSET TBLPROPERTIES "
        "('beast.partition.expiry.ms', 'label.env')",
    ]
    props = ev.current_properties(spark)
    assert props["label.team"] == "ml"
    assert "label.env" not in props and "beast.partition.expiry.ms" not in props
    spark.sql("DROP TABLE evo_test.p")


def test_property_values_with_quotes_escape_cleanly(spark, tmp_path):
    """A label value containing a single quote must produce valid DDL
    (escaped '' ) and round-trip through the catalog, not malformed /
    injectable SQL (ADVICE r2)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS evo_test")
    spark.sql("DROP TABLE IF EXISTS evo_test.esc")
    spark.sql(
        f"CREATE TABLE evo_test.esc (id bigint) USING parquet LOCATION '{tmp_path}/esc'"
    )
    ev = SchemaEvolver(table="evo_test.esc", labels={"desc": "o'brien's table"})
    ddls = ev.sync_properties(spark)
    assert ddls == [
        "ALTER TABLE evo_test.esc SET TBLPROPERTIES ('label.desc'='o''brien''s table')"
    ]
    assert ev.current_properties(spark)["label.desc"] == "o'brien's table"
    assert ev.sync_properties(spark) == []  # diff compares unescaped values
    spark.sql("DROP TABLE evo_test.esc")


def test_property_values_with_backslashes_escape_cleanly(spark, tmp_path):
    """With escapedStringLiterals=false a value ending in '\\' would
    escape the closing quote — backslashes must double before quote
    doubling and still round-trip unescaped (ADVICE r3)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS evo_test")
    spark.sql("DROP TABLE IF EXISTS evo_test.bs")
    spark.sql(
        f"CREATE TABLE evo_test.bs (id bigint) USING parquet LOCATION '{tmp_path}/bs'"
    )
    value = "C:\\data\\"  # trailing backslash: the malformed-DDL trigger
    ev = SchemaEvolver(table="evo_test.bs", labels={"path": value})
    ddls = ev.sync_properties(spark)
    assert ddls == [
        "ALTER TABLE evo_test.bs SET TBLPROPERTIES ('label.path'='C:\\\\data\\\\')"
    ]
    assert ev.current_properties(spark)["label.path"] == value
    assert ev.sync_properties(spark) == []  # diff compares unescaped values
    spark.sql("DROP TABLE evo_test.bs")


def test_evolve_applies_property_sync_with_ddl(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS evo_test")
    spark.sql("DROP TABLE IF EXISTS evo_test.q")
    spark.sql(
        "CREATE TABLE evo_test.q (id bigint, name string) USING parquet "
        f"LOCATION '{tmp_path}/q'"
    )
    ev = SchemaEvolver(table="evo_test.q", labels={"owner": "beast"})
    plan = ev.evolve(spark, OLD, NEW)
    assert plan["added"] == [("score", "double")]
    assert plan["property_ddl"] == [
        "ALTER TABLE evo_test.q SET TBLPROPERTIES ('label.owner'='beast')"
    ]
    assert "score" in spark.table("evo_test.q").columns
    spark.sql("DROP TABLE evo_test.q")


def test_batch_ledger_idempotence(spark, tmp_path):
    ledger = BatchLedger(str(tmp_path / "ledger"))
    out_dir = str(tmp_path / "out")
    df = spark.createDataFrame([(1,), (2,)], "id long")

    writes = []

    def write(batch_df, batch_id):
        writes.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    guarded = idempotent(ledger, write)
    guarded(df, 0)
    guarded(df, 0)  # replay of the same micro-batch → skipped
    guarded(df, 1)
    assert writes == [0, 1]
    assert spark.read.parquet(out_dir).count() == 4


def test_ledger_commit_after_write(spark, tmp_path):
    """Crash between write and commit ⇒ batch not marked ⇒ replay rewrites."""
    ledger = BatchLedger(str(tmp_path / "ledger"))

    def exploding(batch_df, batch_id):
        raise IOError("crash mid-write")

    guarded = idempotent(ledger, exploding)
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(IOError):
        guarded(df, 7)
    assert not ledger.seen(7)
