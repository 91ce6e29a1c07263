"""Process-scoped scratch-cache registry.

A few operators pin an intermediate frame by default so two aggregation
passes ride one computed distribution (``capped_bucket_pairs``'
materialized postings, ``incremental_minhash_pairs``' tagged banding).
The cache must outlive the call — the returned DataFrames are lazy and
the caller's action is what consumes it — so the operator cannot
unpersist before returning. Bench/sweep harnesses ``clearCache()``
between queries; a long-lived LIBRARY caller had no handle at all
(round-11 ADVICE: every call pinned another frame until LRU eviction).

This registry is that handle: operators register their default-on
persists here, and a long-lived process calls
:func:`release_scratch_caches` at its own batch boundaries (after the
actions that consume the returned frames). Unpersist is safe mid-plan —
Spark recomputes evicted blocks — so a late release costs recompute,
never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin_scratch", "release_scratch_caches"]

_SCRATCH: list[DataFrame] = []


def pin_scratch(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for a later
    :func:`release_scratch_caches`."""
    df.persist()
    _SCRATCH.append(df)
    return df


def release_scratch_caches() -> int:
    """Unpersist every registered scratch frame; returns how many were
    released. Call after the actions consuming operator results — e.g.
    once per ingest batch, or per query in a serving loop. A frame
    whose unpersist fails TRANSIENTLY stays registered for the next
    call (dropping its only handle would reinstate the unbounded-cache
    leak this registry exists to fix); a stopped session drops
    everything — the JVM-side cache died with it."""
    released, kept = 0, []
    for df in _SCRATCH:
        try:
            df.unpersist()
            released += 1
        except Exception:
            try:
                stopped = df.sparkSession._sc._jsc is None
            except Exception:
                stopped = True
            if not stopped:
                kept.append(df)  # transient failure: retry next call
    _SCRATCH[:] = kept
    return released
