"""Registry-refresh watcher (A23 initiator) — ProtoUpdateListener parity:
descriptor change → stop → DDL → restart from checkpoint → parser swap;
failures (metadata collision, type change) leave the old parser live."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from beast_spark.config import IngestSettings
from beast_spark.plans.protowire import PField, encode_message
from beast_spark.streaming.evolution import SchemaEvolver
from beast_spark.streaming.registry import (
    HttpDescriptorFetcher,
    ProtoUpdateWatcher,
    TableUpdateFailure,
    dump_registry,
    load_registry,
)
from beast_spark.streaming.sink import WarehouseSink
from tests.fixtures import KAFKA_DDL, TEST_SCHEMA

V1 = (PField(1, "order_number", "string"), PField(6, "discount", "int64"))
V2 = V1 + (PField(20, "region", "string"),)
V2_BAD_TYPE = (PField(1, "order_number", "int64"), PField(6, "discount", "int64"))


def test_registry_roundtrip(tmp_path):
    path = str(tmp_path / "reg.json")
    dump_registry(path, TEST_SCHEMA)  # full surface: nested/repeated/enum/map
    assert load_registry(path) == TEST_SCHEMA


def _kafka_row(i: int, schema, extra: dict | None = None) -> tuple:
    msg = {"order_number": f"order-{i}", "discount": i * 10, **(extra or {})}
    return (
        f"k{i}".encode(),
        encode_message(msg, schema),
        "orders",
        0,
        100 + i,
        dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(seconds=i),
    )


def test_watcher_end_to_end_evolves_stream(spark, tmp_path):
    """Descriptor file replaced → stream output gains the new column, old
    rows read back NULL for it, and offsets are preserved (no re-ingest):
    ProtoUpdateListener.java:101-126 behavior on the Spark runtime."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    spark.createDataFrame([_kafka_row(i, V1) for i in range(3)], KAFKA_DDL).write.parquet(
        str(src_dir / "b0")
    )

    in_schema = spark.createDataFrame([], KAFKA_DDL).schema
    sink = WarehouseSink(table_path=str(tmp_path / "wh"), dlq_path=str(tmp_path / "dlq"))
    live = {}

    def run_stream(ingest):
        stream = spark.readStream.schema(in_schema).format("parquet").load(str(src_dir) + "/*")
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch_writer(ingest.apply))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    watcher = ProtoUpdateWatcher(
        reg,
        spark,
        SchemaEvolver(table=None),  # path table: parquet merges added columns
        settings=IngestSettings(),
        stop=lambda: live.setdefault("stopped", True),
        restart=lambda: run_stream(watcher.ingest),
        on_swap=lambda ing: live.update(ingest=ing),
    )
    run_stream(watcher.ingest)
    assert spark.read.parquet(str(tmp_path / "wh")).count() == 3

    assert watcher.poll() is None  # unchanged registry → no-op

    # registry refresh: wider schema + new data arriving under it
    dump_registry(reg, V2)
    spark.createDataFrame(
        [_kafka_row(i, V2, {"region": "emea"}) for i in range(3, 5)], KAFKA_DDL
    ).write.parquet(str(src_dir / "b1"))
    plan = watcher.poll()

    assert plan["added"] == [("region", "string")]
    assert live["stopped"] and live["ingest"].schema == V2
    out = spark.read.option("mergeSchema", True).parquet(str(tmp_path / "wh"))
    rows = {r.message_offset: r for r in out.collect()}
    assert len(rows) == 5  # offsets preserved: batch b0 NOT re-ingested
    assert rows[100].region is None  # old rows NULL-backfill the new column
    assert rows[104].region == "emea"


def test_watcher_rejects_type_change_and_keeps_old_parser(spark, tmp_path):
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table=None))
    dump_registry(reg, V2_BAD_TYPE)
    with pytest.raises(TableUpdateFailure, match="registry refresh"):
        watcher.poll()
    assert watcher.schema == V1  # old parser stays live
    # and the same failed update keeps failing (digest NOT advanced)
    with pytest.raises(TableUpdateFailure):
        watcher.poll()


def test_watcher_rejects_metadata_collision(spark, tmp_path):
    """ProtoUpdateListener's collision failure: a refreshed schema whose
    column collides with a metadata column must fail the update."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table=None))
    colliding = V1 + (PField(21, "message_offset", "int64"),)
    dump_registry(reg, colliding)
    with pytest.raises(TableUpdateFailure, match="registry refresh"):
        watcher.poll()
    assert watcher.schema == V1


def test_watch_loop_polls_and_applies(spark, tmp_path, monkeypatch):
    """watch() drives poll() on an interval; a registry change mid-loop
    is picked up without external calls."""
    import beast_spark.streaming.registry as reg_mod

    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table=None))
    polls = []
    # Patch the module's injection point, NOT time.sleep itself: the global
    # patch races with background threads (py4j, sink backoff) that sleep.
    monkeypatch.setattr(reg_mod, "_sleep", lambda s: polls.append(s))
    dump_registry(reg, V2)
    watcher.watch(interval_s=0.01, max_polls=3)
    assert polls == [0.01] * 3
    assert watcher.schema == V2  # change applied from inside the loop


def test_failed_evolution_after_stop_restarts_old_query(spark, tmp_path):
    """DDL failure AFTER the query stopped must restart the OLD query:
    the 'previous parser stays live' contract holds end-to-end, not just
    for pre-stop validation failures (ProtoUpdateListener.java:101-126
    catches its BQTableUpdateFailure without killing the consumer)."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    calls = []
    watcher = ProtoUpdateWatcher(
        reg,
        spark,
        # V2 validates fine, but the ALTER TABLE targets a missing table →
        # evolve() raises strictly after stop() ran.
        SchemaEvolver(table="no_such_db.no_such_table"),
        stop=lambda: calls.append("stop"),
        restart=lambda: calls.append("restart"),
        on_swap=lambda ing: calls.append("swap"),
    )
    dump_registry(reg, V2)
    with pytest.raises(TableUpdateFailure, match="registry refresh"):
        watcher.poll()
    assert calls == ["stop", "restart"]  # resumed; parser never swapped
    assert watcher.schema == V1

    # watch() must survive the same rejection and keep polling
    import beast_spark.streaming.registry as reg_mod

    old_sleep = reg_mod._sleep
    reg_mod._sleep = lambda s: None
    try:
        watcher.watch(interval_s=0.0, max_polls=2)
    finally:
        reg_mod._sleep = old_sleep
    assert calls == ["stop", "restart"] * 3  # one retry per poll, loop alive
    assert watcher.schema == V1


def test_rejected_mapping_never_stops_query(spark, tmp_path):
    """Validation failures (type change) happen BEFORE stop(): the stream
    is never interrupted for an update that cannot apply."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    calls = []
    watcher = ProtoUpdateWatcher(
        reg,
        spark,
        SchemaEvolver(table=None),
        stop=lambda: calls.append("stop"),
        restart=lambda: calls.append("restart"),
    )
    dump_registry(reg, V2_BAD_TYPE)
    with pytest.raises(TableUpdateFailure):
        watcher.poll()
    assert calls == []  # query untouched
    assert watcher.schema == V1


class _RegistryServer:
    """Minimal Stencil-registry stand-in: serves a mutable JSON payload."""

    def __init__(self):
        import http.server
        import json as _json
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                server.hits += 1
                body = server.body
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.hits = 0
        self.body = b"[]"
        self._json = _json
        self.httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/descriptors"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve(self, schema):
        import beast_spark.streaming.registry as reg_mod

        self.body = self._json.dumps(
            [reg_mod._field_to_dict(f) for f in schema]
        ).encode()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_http_fetcher_end_to_end_evolves_stream(spark, tmp_path):
    """The full A23 loop with a REAL HTTP registry in it: descriptors are
    fetched over HTTP (ProtoUpdateListener.java:85-99), materialized to
    the watched file, and a served-schema change mid-stream evolves the
    pipeline; a registry outage keeps the old parser serving."""
    server = _RegistryServer()
    try:
        server.serve(V1)
        reg = str(tmp_path / "reg.json")
        src_dir = tmp_path / "incoming"
        os.makedirs(src_dir)
        spark.createDataFrame([_kafka_row(i, V1) for i in range(3)], KAFKA_DDL).write.parquet(
            str(src_dir / "b0")
        )

        in_schema = spark.createDataFrame([], KAFKA_DDL).schema
        sink = WarehouseSink(table_path=str(tmp_path / "wh"), dlq_path=str(tmp_path / "dlq"))

        def run_stream(ingest):
            stream = spark.readStream.schema(in_schema).format("parquet").load(str(src_dir) + "/*")
            q = (
                stream.writeStream.foreachBatch(sink.foreach_batch_writer(ingest.apply))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # no registry file on disk: the eager first fetch materializes it
        watcher = ProtoUpdateWatcher(
            reg,
            spark,
            SchemaEvolver(table=None),
            stop=lambda: None,
            restart=lambda: run_stream(watcher.ingest),
            fetcher=HttpDescriptorFetcher(server.url, reg),
        )
        assert watcher.schema == V1 and server.hits == 1
        run_stream(watcher.ingest)
        assert watcher.poll() is None  # served registry unchanged → no-op

        server.serve(V2)
        spark.createDataFrame(
            [_kafka_row(i, V2, {"region": "apac"}) for i in range(3, 5)], KAFKA_DDL
        ).write.parquet(str(src_dir / "b1"))
        plan = watcher.poll()
        assert plan["added"] == [("region", "string")]
        out = spark.read.option("mergeSchema", True).parquet(str(tmp_path / "wh"))
        rows = {r.message_offset: r for r in out.collect()}
        assert len(rows) == 5 and rows[104].region == "apac"

        # registry outage: cached descriptors keep serving, poll is a no-op
        server.close()
        assert watcher.poll() is None
        assert watcher.schema == V2
    finally:
        try:
            server.close()
        except Exception:
            pass


def test_http_fetcher_rejects_non_json_payload(tmp_path):
    import pytest as _pytest

    server = _RegistryServer()
    try:
        server.body = b"<html>registry down</html>"
        dest = str(tmp_path / "reg.json")
        with _pytest.raises(Exception):
            HttpDescriptorFetcher(server.url, dest)()
        assert not os.path.exists(dest)  # half-written file never lands
    finally:
        server.close()


def test_malformed_shape_push_survives_watch_loop(spark, tmp_path):
    """A push that is valid JSON but the wrong SHAPE (missing 'number' →
    KeyError inside load_registry) must be wrapped as TableUpdateFailure
    so watch() survives it — the sidecar must outlive a bad registry push
    (ADVICE r3: load_registry was outside the validation try)."""
    import json

    import beast_spark.streaming.registry as reg_mod

    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table=None))
    with open(reg, "w") as fh:
        json.dump([{"name": "order_number", "type": "string"}], fh)  # no 'number'
    with pytest.raises(TableUpdateFailure, match="registry refresh"):
        watcher.poll()
    assert watcher.schema == V1  # old parser stays live

    old_sleep = reg_mod._sleep
    reg_mod._sleep = lambda s: None
    try:
        watcher.watch(interval_s=0.0, max_polls=2)  # must not raise
    finally:
        reg_mod._sleep = old_sleep
    assert watcher.schema == V1


def test_eager_fetch_outage_falls_back_to_cached_file(spark, tmp_path):
    """A registry outage at watcher STARTUP must fall back to a previously
    materialized registry file, like poll()'s cache-on-error (ADVICE r3);
    with no cached file the failure is fatal."""

    def dead_fetcher():
        raise OSError("registry unreachable")

    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)  # previously materialized cache
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table=None), fetcher=dead_fetcher)
    assert watcher.schema == V1  # constructed from the cache

    with pytest.raises(OSError, match="unreachable"):
        ProtoUpdateWatcher(
            str(tmp_path / "absent.json"), spark, SchemaEvolver(table=None), fetcher=dead_fetcher
        )


def test_watcher_applies_ddl_for_catalog_tables(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS reg_test")
    spark.sql("DROP TABLE IF EXISTS reg_test.t")
    spark.sql(
        "CREATE TABLE reg_test.t (order_number string, discount bigint) USING parquet "
        f"LOCATION '{tmp_path}/t'"
    )
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, V1)
    watcher = ProtoUpdateWatcher(reg, spark, SchemaEvolver(table="reg_test.t"))
    dump_registry(reg, V2)
    plan = watcher.poll()
    assert plan["ddl"] == "ALTER TABLE reg_test.t ADD COLUMNS (region string)"
    assert "region" in spark.table("reg_test.t").columns
    spark.sql("DROP TABLE reg_test.t")


# -- nested-RECORD evolution + reorder (SURVEY §7.4's remaining legs) ----

_SHIP_V1 = (
    PField(1, "item_id", "int64"),
    PField(2, "quantity", "int32"),
    PField(3, "name", "string"),
)
# V2 adds a field INSIDE the nested RECORD *and* reorders every level —
# field numbers (the wire identity) are unchanged, so V1-encoded bytes
# must keep decoding identically under the V2 descriptor.
_SHIP_V2 = (
    PField(3, "name", "string"),
    PField(1, "item_id", "int64"),
    PField(2, "quantity", "int32"),
    PField(4, "warehouse", "string"),
)
NESTED_V1 = (
    PField(1, "order_number", "string"),
    PField(6, "discount", "int64"),
    PField(12, "shipping", "message", fields=_SHIP_V1),
)
NESTED_V2 = (
    PField(12, "shipping", "message", fields=_SHIP_V2),
    PField(6, "discount", "int64"),
    PField(1, "order_number", "string"),
)
NESTED_V1_REORDERED = tuple(reversed(NESTED_V1))


def _nested_row(i: int, schema, ship: dict) -> tuple:
    msg = {"order_number": f"order-{i}", "discount": i * 10, "shipping": ship}
    return (
        f"k{i}".encode(),
        encode_message(msg, schema),
        "orders",
        0,
        100 + i,
        dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(seconds=i),
    )


def test_watcher_evolves_field_added_inside_nested_record(spark, tmp_path):
    """The evolution-matrix leg the proto world actually exercises
    (ProtoUpdateListener.java:101-126 evolves whole descriptor TREES):
    a field added INSIDE a nested RECORD, with every level reordered in
    the same push. The running stream evolves through stop→swap→restart,
    old rows NULL-backfill the NESTED column, and the reorder neither
    re-ingests nor mis-decodes (wire identity is the field number)."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, NESTED_V1)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    spark.createDataFrame(
        [
            _nested_row(i, NESTED_V1, {"item_id": i, "quantity": 2, "name": "widget"})
            for i in range(3)
        ],
        KAFKA_DDL,
    ).write.parquet(str(src_dir / "b0"))

    in_schema = spark.createDataFrame([], KAFKA_DDL).schema
    sink = WarehouseSink(table_path=str(tmp_path / "wh"), dlq_path=str(tmp_path / "dlq"))
    live = {}

    def run_stream(ingest):
        stream = spark.readStream.schema(in_schema).format("parquet").load(str(src_dir) + "/*")
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch_writer(ingest.apply))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    watcher = ProtoUpdateWatcher(
        reg,
        spark,
        SchemaEvolver(table=None),
        settings=IngestSettings(),
        stop=lambda: live.setdefault("stopped", True),
        restart=lambda: run_stream(watcher.ingest),
        on_swap=lambda ing: live.update(ingest=ing),
    )
    run_stream(watcher.ingest)
    assert spark.read.parquet(str(tmp_path / "wh")).count() == 3

    dump_registry(reg, NESTED_V2)
    spark.createDataFrame(
        [
            _nested_row(
                i,
                NESTED_V2,
                {"item_id": i, "quantity": 5, "name": "gadget", "warehouse": f"w-{i}"},
            )
            for i in range(3, 5)
        ],
        KAFKA_DDL,
    ).write.parquet(str(src_dir / "b1"))
    plan = watcher.poll()

    # the diff is the nested addition ONLY — the reorders are invisible
    assert plan["added"] == [("shipping.warehouse", "string")]
    assert live["stopped"] and live["ingest"].schema == NESTED_V2
    out = spark.read.option("mergeSchema", True).parquet(str(tmp_path / "wh"))
    rows = {r.message_offset: r for r in out.collect()}
    assert len(rows) == 5  # offsets preserved: b0 NOT re-ingested
    # NULL backfill INSIDE the nested RECORD; sibling fields intact
    # (row 102, not 100: proto zero-defaults — item_id=0 — are absent on
    # the wire and decode as NULL regardless of evolution)
    assert rows[100].shipping.warehouse is None
    assert rows[102].shipping.warehouse is None
    assert rows[102].shipping.item_id == 2 and rows[102].shipping.name == "widget"
    # new rows decode the added nested field; the reordered descriptor
    # still routes wire field numbers to the right names
    assert rows[104].shipping.warehouse == "w-4"
    assert rows[104].shipping.item_id == 4 and rows[104].shipping.quantity == 5
    assert rows[104].order_number == "order-4" and rows[104].discount == 40


def test_pure_reorder_push_restarts_the_stopped_stream(spark, tmp_path):
    """A registry push that ONLY reorders fields (names/numbers/types
    unchanged) is an empty additive diff — but the watcher has already
    stopped the query by the time it knows that, so it must restart it
    anyway: parser swapped, no DDL, stream alive, nothing re-ingested."""
    reg = str(tmp_path / "reg.json")
    dump_registry(reg, NESTED_V1)
    src_dir = tmp_path / "incoming"
    os.makedirs(src_dir)
    spark.createDataFrame(
        [
            _nested_row(i, NESTED_V1, {"item_id": i, "quantity": 2, "name": "widget"})
            for i in range(2)
        ],
        KAFKA_DDL,
    ).write.parquet(str(src_dir / "b0"))

    in_schema = spark.createDataFrame([], KAFKA_DDL).schema
    sink = WarehouseSink(table_path=str(tmp_path / "wh"), dlq_path=str(tmp_path / "dlq"))
    live = {"restarts": 0}

    def run_stream(ingest):
        stream = spark.readStream.schema(in_schema).format("parquet").load(str(src_dir) + "/*")
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch_writer(ingest.apply))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def restart():
        live["restarts"] += 1
        run_stream(watcher.ingest)

    watcher = ProtoUpdateWatcher(
        reg,
        spark,
        SchemaEvolver(table=None),
        settings=IngestSettings(),
        stop=lambda: live.update(stopped=True),
        restart=restart,
        on_swap=lambda ing: live.update(ingest=ing),
    )
    run_stream(watcher.ingest)

    dump_registry(reg, NESTED_V1_REORDERED)
    spark.createDataFrame(
        [_nested_row(2, NESTED_V1_REORDERED, {"item_id": 2, "quantity": 9, "name": "late"})],
        KAFKA_DDL,
    ).write.parquet(str(src_dir / "b1"))
    plan = watcher.poll()

    assert plan["added"] == [] and plan["ddl"] is None
    assert live["stopped"]
    assert live["restarts"] == 1  # stopped ⟹ restarted, even with no DDL
    assert live["ingest"].schema == NESTED_V1_REORDERED
    rows = {r.message_offset: r for r in spark.read.parquet(str(tmp_path / "wh")).collect()}
    assert len(rows) == 3  # b1 ingested by the restarted query; b0 not re-run
    assert rows[102].shipping.quantity == 9 and rows[102].shipping.name == "late"
