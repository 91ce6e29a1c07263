"""Versioned local tables: snapshot isolation + time travel on parquet.

The reference writes to BigQuery and inherits its snapshot semantics;
this engine's locally materialized tables (maintained rollups, SCD2
histories, compaction outputs) need the same guarantees without a
warehouse. This is the manifest-pointer design every modern table
format (Delta/Iceberg-class) uses, reduced to its core:

* each commit writes a COMPLETE new version directory ``v<N>/`` and
  then atomically replaces ``_manifest.json`` (``os.replace`` — POSIX
  atomic) to point at it. Readers resolve the manifest first, so they
  always see exactly one complete version — there is NO brief-absence
  window, an improvement over the two-rename swap in
  ``streaming/swap.py`` (kept there for drop-in directory compat).
* a crash after the version directory but before the manifest leaves
  an ORPHAN directory that no reader can observe; ``vacuum()`` removes
  it along with versions beyond the retention count.
* old versions stay readable until vacuumed: ``read(spark, version=N)``
  is time travel, ``read(spark)`` is the current snapshot.

At warehouse scale the version directory holds file MANIFESTS rather
than the files themselves; the commit protocol — complete artifact
first, one atomic pointer flip second — is identical.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"

__all__ = ["VersionedTable"]


class VersionedTable:
    """Owns one versioned parquet table rooted at ``root``."""

    def __init__(self, root: str, keep_versions: int = 3) -> None:
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.root = root
        self.keep_versions = keep_versions

    @property
    def path(self) -> str:
        """Alias for ``root`` — the commit backends (SwapCommittedTable
        stores ``path``, this class ``root``) expose the same attribute
        name so backend-generic code like ``_Scd2Logic.history_path``
        works against either."""
        return self.root

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path()):
            return {"current": None, "versions": []}
        with open(self._manifest_path()) as fh:
            return json.load(fh)

    def current_version(self) -> int | None:
        return self._read_manifest()["current"]

    def versions(self) -> list[int]:
        """Committed, still-readable versions (oldest first)."""
        return list(self._read_manifest()["versions"])

    def applied_batches(self) -> set[int]:
        """Batch ids recorded by ``commit(..., batch_id=)`` — the
        exactly-once ledger for streaming maintainers. Stored IN the
        manifest, so the ledger and the version pointer flip in ONE
        atomic replace (strictly stronger than the swap protocol's
        ledger-inside-directory + rename pair)."""
        return set(self._read_manifest().get("applied_batches", []))

    # -- commit -----------------------------------------------------------

    def commit(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Write ``df`` as the next version; returns its number.

        The version directory is complete before the manifest flips, so
        a crash at ANY point leaves the table readable at the previous
        version (the incomplete/orphan directory is invisible). Passing
        ``batch_id`` records it in the same atomic manifest flip.
        """
        m = self._read_manifest()
        version = (m["current"] or 0) + 1
        vdir = os.path.join(self.root, f"v{version}")
        if os.path.exists(vdir):  # orphan from a crashed commit: discard
            shutil.rmtree(vdir)
        df.write.parquet(vdir)
        batches = sorted(
            set(m.get("applied_batches", []))
            | ({batch_id} if batch_id is not None else set())
        )
        m = {
            "current": version,
            "versions": m["versions"] + [version],
            "applied_batches": batches,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._manifest_path())  # <- the commit point
        return version

    # -- read -------------------------------------------------------------

    def read_table(self, spark: SparkSession) -> DataFrame | None:
        """Current snapshot, or None before the first commit — the
        maintainer-protocol twin of :meth:`read` (shared with
        ``streaming/swap.py::SwapCommittedTable``)."""
        if self.current_version() is None:
            return None
        return self.read(spark)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to a retained ``version``."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v is None:
            raise FileNotFoundError(f"{self.root}: no committed version")
        if v not in m["versions"]:
            raise ValueError(
                f"version {v} not available (have {m['versions']}); vacuumed?"
            )
        return spark.read.parquet(os.path.join(self.root, f"v{v}"))

    # -- maintenance ------------------------------------------------------

    def vacuum(self) -> list[int]:
        """Drop versions beyond the retention count (never the current)
        and any orphan directories from crashed commits. Returns the
        removed version numbers.

        Concurrency/crash contract (tested in ``tests/test_versioned.py``):

        * an in-flight time-travel read of a version INSIDE the
          retention window never breaks — vacuum deletes only aged-out
          versions, and the manifest pointer flips atomically BEFORE any
          deletion, so a concurrent reader sees either the old manifest
          (files still present) or the new one (version rejected at plan
          time with a clean ``ValueError``);
        * an in-flight read of a version that AGES OUT between plan and
          execution fails cleanly at execution (missing files), never
          returns partial/wrong data — the standard retention-window
          contract of the real table formats;
        * a crash between the manifest flip and the directory deletions
          leaves only orphan directories (invisible to every read path,
          which resolves versions through the manifest) and the next
          vacuum removes them.
        """
        m = self._read_manifest()
        keep = m["versions"][-self.keep_versions :]
        dropped = [v for v in m["versions"] if v not in keep]
        # pointer flips BEFORE deletion: a reader holding the old
        # manifest can race a vacuum, same contract as real formats'
        # retention windows.
        new_m = {
            "current": m["current"],
            "versions": keep,
            "applied_batches": m.get("applied_batches", []),
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(new_m, fh)
        os.replace(tmp, self._manifest_path())
        for v in dropped:
            vdir = os.path.join(self.root, f"v{v}")
            if os.path.exists(vdir):
                shutil.rmtree(vdir)
        if os.path.exists(self.root):
            live = {_MANIFEST, _MANIFEST + ".tmp"} | {f"v{v}" for v in keep}
            for name in os.listdir(self.root):
                if name not in live:  # orphans from crashed commits
                    path = os.path.join(self.root, name)
                    if os.path.isdir(path):
                        shutil.rmtree(path)
        return dropped
