"""StatsD wire emission for pipeline metrics (A25).

Faithful port of the reference's stats surface (``stats/Stats.java:16-84``):

* plain-UDP statsd datagrams (``<prefix>.<metric><tags>:<value>|<type>``),
  tags appended to the metric NAME comma-separated — the same InfluxDB-
  style convention the reference's client emits;
* default tags resolved once from the environment (``NODE_NAME`` → node,
  ``POD_NAME`` → pod, ``KAFKA_CONSUMER_GROUP_ID`` → consumer), empty
  entries dropped (``Stats.java getDefaultTags``);
* table tags (``table=…,project=…``) appended per-call by the sink, the
  analog of ``Stats.getBqTags``;
* disabled mode = no-op (``NoOpStatsDClient`` analog) so hot paths never
  pay for sockets they don't use;
* fire-and-forget: UDP send errors are swallowed — metrics must never
  fail a batch (the non-blocking client contract).

Spark collects the underlying numbers for free (query-progress events +
``observe()`` on the write — see ``windows.MetricsListener`` and
``sink.WarehouseSink._write_valid``); this module only puts them on the
wire.
"""

from __future__ import annotations

import os
import socket
import time
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from beast_spark.streaming.windows import BatchMetrics

__all__ = ["StatsDClient", "default_tags"]

_ENV_TAGS = (("NODE_NAME", "node"), ("POD_NAME", "pod"), ("KAFKA_CONSUMER_GROUP_ID", "consumer"))


def default_tags(env: dict[str, str] | None = None) -> str:
    """``",node=…,pod=…,consumer=…"`` from the environment; empty entries
    dropped — mirrors ``Stats.java getDefaultTags`` exactly."""
    env = os.environ if env is None else env
    tags = [f"{tag}={env[var]}" for var, tag in _ENV_TAGS if env.get(var)]
    return ("," + ",".join(tags)) if tags else ""


class StatsDClient:
    """Minimal non-blocking statsd emitter over UDP.

    ``enabled=False`` turns every call into a no-op. Pass an explicit
    ``sock`` for tests (any object with ``sendto``).
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8125,
        prefix: str = "beast",
        enabled: bool = True,
        env: dict[str, str] | None = None,
        sock=None,
    ) -> None:
        self.enabled = enabled
        self.prefix = prefix
        self.addr = (host, port)
        self.tags = default_tags(env)
        self._sock = sock
        if enabled and sock is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._sock.setblocking(False)

    # -- wire format ---------------------------------------------------
    def _send(self, metric: str, value, kind: str) -> None:
        if not self.enabled:
            return
        datagram = f"{self.prefix}.{metric}{self.tags}:{value}|{kind}"
        try:
            self._sock.sendto(datagram.encode("utf-8"), self.addr)
        except OSError:  # fire-and-forget: metrics never fail the batch
            pass

    # -- Stats.java surface --------------------------------------------
    def count(self, metric: str, delta: int) -> None:
        self._send(metric, delta, "c")

    def increment(self, metric: str) -> None:
        self._send(metric, 1, "c")

    def gauge(self, metric: str, value: int) -> None:
        self._send(metric, value, "g")

    def time_it(self, metric: str, start: float) -> None:
        """Execution time in ms since ``start`` (``time.monotonic()``)."""
        self._send(metric, int((time.monotonic() - start) * 1000), "ms")

    # -- adapters ------------------------------------------------------
    def table_tags(self, table: str, project: str = "") -> str:
        tags = f"table={table}"
        return tags + (f",project={project}" if project else "")

    def emit_batch(self, m: "BatchMetrics", table: str = "") -> None:
        """Push one micro-batch's progress metrics, tagged by table —
        the query-progress analog of the reference's per-push counters."""
        suffix = f",{self.table_tags(table)}" if table else ""
        self.count(f"sink.push.records{suffix}", m.num_input_rows)
        self.gauge(f"sink.input.rows.per.second{suffix}", int(m.input_rows_per_second))
        self.gauge(f"sink.process.rows.per.second{suffix}", int(m.process_rows_per_second))

    def close(self) -> None:
        if self._sock is not None and hasattr(self._sock, "close"):
            self._sock.close()
