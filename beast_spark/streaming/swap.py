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

__all__ = ["SwapCommittedTable"]


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
