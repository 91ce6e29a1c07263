"""StatsD wire emission (A25) — datagram format, default tags, sink/
listener integration. Captures real UDP datagrams from a loopback socket
(the reference's StatsTest mocks the client; the wire is the contract
here, so we assert actual bytes)."""

from __future__ import annotations

import socket
import time

import pytest

from beast_spark.streaming.stats import StatsDClient, default_tags


@pytest.fixture()
def udp_server():
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(2.0)
    yield srv
    srv.close()


def recv_all(srv, n):
    out = []
    for _ in range(n):
        data, _addr = srv.recvfrom(4096)
        out.append(data.decode("utf-8"))
    return out


def test_default_tags_mirror_reference_env_mapping():
    env = {"NODE_NAME": "n1", "POD_NAME": "p1", "KAFKA_CONSUMER_GROUP_ID": "g1"}
    assert default_tags(env) == ",node=n1,pod=p1,consumer=g1"
    assert default_tags({"NODE_NAME": "n1"}) == ",node=n1"
    assert default_tags({}) == ""  # all empty -> no trailing comma garbage


def test_count_gauge_time_wire_format(udp_server):
    port = udp_server.getsockname()[1]
    c = StatsDClient(host="127.0.0.1", port=port, prefix="beast", env={"NODE_NAME": "n1"})
    c.count("sink.push.records,table=t1", 42)
    c.gauge("queue.depth", 7)
    c.increment("batch.done")
    c.time_it("sink.push.time", time.monotonic() - 0.05)
    grams = sorted(recv_all(udp_server, 4))
    assert "beast.batch.done,node=n1:1|c" in grams
    assert "beast.queue.depth,node=n1:7|g" in grams
    assert "beast.sink.push.records,table=t1,node=n1:42|c" in grams
    timer = [g for g in grams if "push.time" in g][0]
    assert timer.startswith("beast.sink.push.time,node=n1:") and timer.endswith("|ms")
    ms = int(timer.split(":")[1].split("|")[0])
    assert 30 <= ms < 2000


def test_disabled_client_is_noop(udp_server):
    port = udp_server.getsockname()[1]
    c = StatsDClient(host="127.0.0.1", port=port, enabled=False)
    c.count("x", 1)
    with pytest.raises(socket.timeout):
        udp_server.settimeout(0.2)
        udp_server.recvfrom(4096)


def test_send_errors_never_raise():
    class Boom:
        def sendto(self, *_a):
            raise OSError("network down")

    c = StatsDClient(env={}, sock=Boom())
    c.count("x", 1)  # must not raise (fire-and-forget contract)


def test_warehouse_sink_emits_push_metrics(spark, tmp_path, udp_server):
    from pyspark.sql import functions as F  # noqa: F401

    from beast_spark.streaming.sink import WarehouseSink

    port = udp_server.getsockname()[1]
    sink = WarehouseSink(
        table_path=str(tmp_path / "wh"),
        statsd=StatsDClient(host="127.0.0.1", port=port, env={}),
    )
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    sink.push(df)
    grams = sorted(recv_all(udp_server, 2))
    assert grams[0].startswith("beast.sink.push.records,table=") and grams[0].endswith(":3|c")
    assert "sink.push.time,table=" in grams[1] and grams[1].endswith("|ms")


def test_emit_batch_adapter(udp_server):
    from beast_spark.streaming.windows import BatchMetrics

    port = udp_server.getsockname()[1]
    c = StatsDClient(host="127.0.0.1", port=port, env={})
    m = BatchMetrics(
        batch_id=1,
        num_input_rows=100,
        input_rows_per_second=50.0,
        process_rows_per_second=75.0,
        sink_description="wh",
    )
    c.emit_batch(m, table="orders")
    grams = sorted(recv_all(udp_server, 3))
    assert "beast.sink.input.rows.per.second,table=orders:50|g" in grams
    assert "beast.sink.process.rows.per.second,table=orders:75|g" in grams
    assert "beast.sink.push.records,table=orders:100|c" in grams
