"""Swap-committed table directories: the commit protocol shared by the
streaming maintenance jobs (SCD2 dimensions, aggregate rollups).

The reference achieves effectively-once warehouse writes with per-row
insert ids (``BQRowWithInsertId.java:9-12``); maintenance jobs that
REWRITE a derived table need a whole-table analogue. Protocol:

* the applied-batch ledger is written INSIDE the new table directory
  BEFORE the swap, so the swap (a rename) is the single commit point —
  a replayed batch after any crash either sees the old directory
  (ledger lacks the batch → re-apply) or the new one (ledger has it →
  skip). There is no window where a batch is half-applied, because
  nothing mutates the live directory in place.
* the two-rename swap has the same brief-absence window as partition
  compaction and reuses the same ``.replaced`` recovery rule
  (``streaming/maintenance.py``): live dir missing + ``.replaced``
  present → restore on next access.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LEDGER = "_applied_batches.json"

__all__ = [
    "SwapCommittedTable",
    "artifact_fingerprint",
    "write_json_meta",
    "check_json_meta",
]


def artifact_fingerprint(path: str) -> str:
    """Deterministic fingerprint of a FROZEN on-disk artifact (a train
    corpus, a centroid table, a codebook): md5 over the sorted
    (relative path, size, mtime_ns) of every data file under ``path``.

    Cheap — pure directory metadata, no data scan — and strict in the
    fail-safe direction: an in-place rewrite changes size or mtime and
    validation rejects it with an explicit error instead of silently
    reading state derived from the old bytes; a touched-but-unchanged
    file also rejects, which costs an explicit rebuild, never a silent
    wrong answer. RAISES for a path that has no walkable data files
    (missing dir, or a non-local URI ``os.walk`` cannot see) — a
    constant fingerprint there would leave every guard built on this
    helper silently inert."""
    import hashlib

    entries = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith(("_", ".")):
                continue  # _SUCCESS markers / CRCs churn without content
            full = os.path.join(root, name)
            st = os.stat(full)
            entries.append(
                (os.path.relpath(full, path), st.st_size, st.st_mtime_ns)
            )
    if not entries:
        raise ValueError(
            f"artifact_fingerprint: no data files under {path!r} — not a "
            "local artifact directory (remote URIs need a storage-native "
            "fingerprint; pass one explicitly instead of relying on a "
            "guard that would never fire)."
        )
    return hashlib.md5(repr(sorted(entries)).encode()).hexdigest()


def write_json_meta(meta_file: str, meta: dict) -> None:
    """Write the frozen-artifact marker a maintainer validates against
    (see :func:`check_json_meta`)."""
    import json

    with open(meta_file, "w") as fh:
        json.dump(meta, fh)


def check_json_meta(meta_file: str, meta: dict, what: str, hint: str) -> None:
    """Raise unless the stored marker equals ``meta``.

    The guard every maintainer with frozen inputs shares: derived state
    is only valid against the exact artifact bytes + config it was
    built under, so a changed artifact (or a missing marker) must be an
    explicit error, never a silent wrong answer. ``what`` names the
    maintainer for the message; ``hint`` says how to recover.
    ``meta`` is normalized through a JSON roundtrip before comparing —
    the stored side already went through one, and without it a
    tuple-valued config (JSON reads back as a list) would spuriously
    reject every batch after the first."""
    import json

    meta = json.loads(json.dumps(meta))
    if os.path.exists(meta_file):
        with open(meta_file) as fh:
            stored = json.load(fh)
    else:
        stored = None
    if stored != meta:
        raise ValueError(
            f"{what}: existing state was built with {stored}, this "
            f"maintainer wants {meta} — {hint}"
        )


class SwapCommittedTable:
    """Owns one locally materialized table directory committed by swap."""

    def __init__(self, path: str) -> None:
        self.path = path

    # -- recovery ---------------------------------------------------------

    def _recover(self) -> None:
        """Heal a crash inside the two-rename swap: live dir missing but
        ``.replaced`` present → restore it."""
        replaced = self.path + ".replaced"
        if not os.path.exists(self.path) and os.path.exists(replaced):
            os.rename(replaced, self.path)

    def applied_batches(self) -> set[int]:
        self._recover()
        ledger = os.path.join(self.path, _LEDGER)
        if not os.path.exists(ledger):
            return set()
        with open(ledger) as fh:
            return set(json.load(fh))

    def read_table(self, spark: SparkSession) -> DataFrame | None:
        self._recover()
        if not os.path.exists(self.path):
            return None
        return spark.read.parquet(self.path)

    def _read_sub(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Read one sub-table of a multi-table state dir (None before
        the first commit) — shared by every commit_frames maintainer."""
        self._recover()
        sub = os.path.join(self.path, name)
        if not os.path.exists(sub):
            return None
        return spark.read.parquet(sub)

    # -- commit -----------------------------------------------------------

    def _swap_in(self, tmp: str) -> None:
        replaced = self.path + ".replaced"
        if os.path.exists(replaced):
            shutil.rmtree(replaced)
        if os.path.exists(self.path):
            os.rename(self.path, replaced)
        os.rename(tmp, self.path)  # <- the commit point
        if os.path.exists(replaced):
            shutil.rmtree(replaced)

    def commit(self, updated: DataFrame, batch_id: int) -> None:
        """Materialize ``updated`` with ``batch_id`` recorded in its
        ledger, then swap it live atomically."""
        tmp = self.path + ".applying"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        updated.write.parquet(tmp)
        with open(os.path.join(tmp, _LEDGER), "w") as fh:
            json.dump(sorted(self.applied_batches() | {batch_id}), fh)
        self._swap_in(tmp)

    def commit_frames(self, frames: dict[str, DataFrame], batch_id: int) -> None:
        """Multi-sub-table form of :meth:`commit`: write every frame as a
        sub-directory under one tmp dir, record ``batch_id`` in the
        ledger, then the single swap rename commits all of them together
        — the protocol every multi-table maintainer (near-dup, corpus
        v2/v3, decontam) shares."""
        tmp = self.path + ".applying"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        for name, df in frames.items():
            df.write.parquet(os.path.join(tmp, name))
        with open(os.path.join(tmp, _LEDGER), "w") as fh:
            json.dump(sorted(self.applied_batches() | {batch_id}), fh)
        self._swap_in(tmp)
