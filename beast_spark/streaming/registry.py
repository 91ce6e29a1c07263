"""Descriptor-registry watcher — the A23 control loop's *initiator*.

The reference registers a callback with its schema registry client; a
descriptor refresh triggers ``ProtoUpdateListener.onProtoUpdate``
(``protomapping/ProtoUpdateListener.java:101-126``): re-parse the proto
mapping, upsert the warehouse table, and ONLY THEN swap the live parser
("First get latest protomapping, update bq schema, and if all goes fine
then only update beast's proto mapping config"). A failure — including a
metadata-column collision — raises the ``BQTableUpdateFailure`` analog
and leaves the old parser serving.

Spark has no registry push channel, so the watcher POLLS a descriptor
file (any registry client can materialize to it) and drives the same
sequence through :class:`~beast_spark.streaming.evolution.SchemaEvolver`:

    change detected → build new ingest (collision check) → stop query
    → ALTER TABLE ADD COLUMNS → restart from the SAME checkpoint.

Offsets live in the checkpoint WAL, so the restart resumes exactly where
the old query stopped; old warehouse rows backfill the new columns as
NULL (parquet mergeSchema / additive DDL).

Registry file format: JSON list of PField trees — the Python-codec
analog of a compiled descriptor set (the JVM path's binary descriptor
sets are produced by ``plans/descriptors.py`` from the same PField
source of truth).
"""

from __future__ import annotations

import hashlib
import json
import logging
import time
from typing import Callable

from pyspark.sql import SparkSession

from beast_spark.config import IngestSettings
from beast_spark.plans.protowire import PField
from beast_spark.plans.schema import spark_schema_for
from beast_spark.streaming.evolution import SchemaEvolver
from beast_spark.streaming.ingest import ProtoIngest

__all__ = [
    "TableUpdateFailure",
    "ProtoUpdateWatcher",
    "HttpDescriptorFetcher",
    "dump_registry",
    "load_registry",
]


_log = logging.getLogger(__name__)

# Injection point for tests: patching the stdlib ``time.sleep`` globally
# races with background threads (py4j callbacks, sink retry backoff) that
# also sleep during a test run.
_sleep = time.sleep


class TableUpdateFailure(RuntimeError):
    """Update-callback failure (``BQTableUpdateFailure`` analog): the DDL
    or the new mapping was rejected; the previous parser stays live."""


# -- PField <-> JSON (registry file format) ------------------------------


def _field_to_dict(f: PField) -> dict:
    d: dict = {"number": f.number, "name": f.name, "type": f.type}
    if f.repeated:
        d["repeated"] = True
    if f.fields:
        d["fields"] = [_field_to_dict(c) for c in f.fields]
    if f.enum_names:
        d["enum_names"] = [[n, s] for n, s in f.enum_names]
    return d


def _field_from_dict(d: dict) -> PField:
    return PField(
        number=d["number"],
        name=d["name"],
        type=d["type"],
        repeated=d.get("repeated", False),
        fields=tuple(_field_from_dict(c) for c in d.get("fields", ())),
        enum_names=tuple((n, s) for n, s in d.get("enum_names", ())),
    )


def dump_registry(path: str, schema: tuple[PField, ...]) -> None:
    with open(path, "w") as fh:
        json.dump([_field_to_dict(f) for f in schema], fh, indent=1)


def load_registry(path: str) -> tuple[PField, ...]:
    with open(path) as fh:
        return tuple(_field_from_dict(d) for d in json.load(fh))


# -- registry clients ----------------------------------------------------


class HttpDescriptorFetcher:
    """Stencil-client analog: pull descriptors over HTTP and materialize
    them to the watched registry file.

    The reference's update listener fetches refreshed descriptors from a
    Stencil registry URL (``protomapping/ProtoUpdateListener.java:85-99``,
    ``createStencilClient``'s ``STENCIL_URL`` config). The watcher's
    contract is file-based, so any registry client plugs in by writing
    the file; this one GETs ``url`` each poll and replaces the file
    atomically (tmp + rename — a half-written registry must never be
    loadable). A fetch failure keeps the cached file — and therefore the
    old parser — serving, exactly like the Stencil client's cache-on-error
    behavior.
    """

    def __init__(self, url: str, dest_path: str, timeout_s: float = 10.0) -> None:
        self.url = url
        self.dest_path = dest_path
        self.timeout_s = timeout_s

    def __call__(self) -> None:
        import os
        import urllib.request

        with urllib.request.urlopen(self.url, timeout=self.timeout_s) as resp:
            body = resp.read()
        json.loads(body)  # reject non-JSON payloads before touching the file
        tmp = self.dest_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(body)
        os.replace(tmp, self.dest_path)


# -- the watcher ---------------------------------------------------------


class ProtoUpdateWatcher:
    """Poll a registry file; on change run stop→evolve→restart→swap.

    ``stop`` / ``restart`` are callables owning the streaming query
    lifecycle (stop gracefully; start a new query from the same
    checkpoint). ``on_swap(new_ingest)`` receives the validated new
    :class:`ProtoIngest` — the converter-swap analog of
    ``setProtoParser`` — so the restart closure can decode with it.
    """

    def __init__(
        self,
        registry_path: str,
        spark: SparkSession,
        evolver: SchemaEvolver,
        settings: IngestSettings | None = None,
        stop: Callable[[], None] | None = None,
        restart: Callable[[], object] | None = None,
        on_swap: Callable[[ProtoIngest], None] | None = None,
        fetcher: Callable[[], None] | None = None,
    ) -> None:
        self.registry_path = registry_path
        self.spark = spark
        self.evolver = evolver
        self.settings = settings or IngestSettings()
        self.stop = stop
        self.restart = restart
        self.on_swap = on_swap
        # Optional registry client (e.g. HttpDescriptorFetcher) invoked at
        # the top of every poll to refresh the watched file from upstream.
        self.fetcher = fetcher
        if fetcher is not None:
            # Eager first fetch (createStencilClient parity) — but with the
            # same cache-on-error behavior as poll(): a registry outage at
            # watcher startup falls back to a previously materialized file
            # instead of preventing construction. Only when no cached
            # registry exists is the fetch failure fatal.
            import os

            try:
                fetcher()
            except Exception:
                if not os.path.exists(registry_path):
                    raise
                _log.warning(
                    "eager registry fetch failed; starting from cached descriptors"
                )
        # Startup mirrors createStencilClient's eager first update: load
        # the current descriptors and build the live parser immediately.
        self.schema = load_registry(registry_path)
        self.ingest = self._validated_ingest(self.schema)
        self._digest = self._file_digest()

    def _file_digest(self) -> str:
        with open(self.registry_path, "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()

    def _validated_ingest(self, schema: tuple[PField, ...]) -> ProtoIngest:
        ingest = ProtoIngest(schema, settings=self.settings)
        ingest._metadata_columns()  # force the A8 collision check now
        return ingest

    def poll(self) -> dict | None:
        """One poll: returns the applied evolution plan on change, None
        when the registry is unchanged. Raises TableUpdateFailure (old
        parser stays live) when the update cannot be applied."""
        if self.fetcher is not None:
            try:
                self.fetcher()
            except Exception:
                # Stencil cache-on-error: an unreachable registry keeps the
                # materialized file — and the old parser — serving.
                _log.warning("registry fetch failed; serving cached descriptors")
        digest = self._file_digest()
        if digest == self._digest:
            return None
        # Validate BEFORE touching the query: a mapping rejection
        # (metadata collision) or an incompatible diff (type change —
        # plan() dry-runs schema_diff without executing DDL) must leave
        # the stream running. load_registry is INSIDE the try: a push that
        # is valid JSON but the wrong shape (missing 'number' → KeyError)
        # must surface as TableUpdateFailure so watch() survives it.
        try:
            new_schema = load_registry(self.registry_path)
            new_ingest = self._validated_ingest(new_schema)
            self.evolver.plan(spark_schema_for(self.schema), spark_schema_for(new_schema))
        except TableUpdateFailure:
            raise
        except Exception as exc:
            raise TableUpdateFailure(
                f"error while updating table on registry refresh: {exc}"
            ) from exc
        stopped = False
        try:
            if self.stop is not None:
                self.stop()
                stopped = True
            plan = self.evolver.evolve(self.spark, self.schema, new_schema)
        except Exception as exc:
            # DDL failed after the query stopped: resume the OLD query
            # (self.ingest is still the previous parser) so the documented
            # "previous parser stays live" contract holds end-to-end.
            if stopped and self.restart is not None:
                self.restart()
            if isinstance(exc, TableUpdateFailure):
                raise
            raise TableUpdateFailure(
                f"error while updating table on registry refresh: {exc}"
            ) from exc
        # DDL succeeded → swap the live parser (setProtoParser analog)
        # BEFORE the restart, so the restarted query decodes with the new
        # schema from its first micro-batch.
        self.schema = new_schema
        self.ingest = new_ingest
        self._digest = digest
        if self.on_swap is not None:
            self.on_swap(new_ingest)
        # Restart whenever WE stopped the query, not only when the diff
        # added columns: a registry push that merely REORDERS fields
        # (same names/numbers/types — the §7.4 matrix's third leg)
        # yields an empty additive diff, but the query was already
        # stopped above and would otherwise stay dead with a freshly
        # swapped parser serving nothing.
        if (stopped or plan["restart_required"]) and self.restart is not None:
            self.restart()
        return plan

    def watch(self, interval_s: float = 60.0, max_polls: int | None = None) -> None:
        """Blocking poll loop (driver-side sidecar thread at deployment;
        ``max_polls`` bounds it for tests). A rejected update is logged and
        the loop keeps polling with the old parser live — the sidecar must
        outlive a bad registry push (ProtoUpdateListener catches its
        BQTableUpdateFailure the same way)."""
        polls = 0
        while max_polls is None or polls < max_polls:
            try:
                self.poll()
            except TableUpdateFailure:
                _log.exception("registry refresh rejected; old parser stays live")
            polls += 1
            _sleep(interval_s)
