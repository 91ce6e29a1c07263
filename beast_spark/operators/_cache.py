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

import threading

from pyspark.sql import DataFrame

__all__ = ["pin_scratch", "release_scratch_caches"]

_SCRATCH: list[DataFrame] = []
#: Serializes registry mutation: a pin from a concurrent thread
#: (parallel queries, a streaming foreachBatch) racing the
#: ``_SCRATCH[:] = kept`` rebuild in release_scratch_caches would
#: otherwise be silently discarded — reinstating the unbounded-cache
#: leak this registry exists to fix (round-12 ADVICE).
_LOCK = threading.Lock()


def pin_scratch(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for a later
    :func:`release_scratch_caches`."""
    df.persist()
    with _LOCK:
        _SCRATCH.append(df)
    return df


def _session_stopped(df: DataFrame) -> bool:
    """Best-effort "is this frame's session gone" probe, used only to
    decide whether a failed unpersist is terminal. Classic sessions
    expose the JavaSparkContext handle; identifiable stop markers in
    the error text cover Spark Connect (no ``_sc``) and torn-down
    JVMs. Unknown failure modes classify as NOT stopped, so the
    handle is retried next call rather than leaked (round-12 ADVICE:
    defaulting stopped=True dropped handles on any transient probe
    failure)."""
    try:
        sc = getattr(df.sparkSession, "_sc", None)
        if sc is not None:
            return getattr(sc, "_jsc", None) is None
    except Exception as exc:  # probe itself failed: inspect the error
        return _looks_stopped(exc)
    return False


def _looks_stopped(exc: BaseException) -> bool:
    # only markers that NAME a stopped context/session qualify — a bare
    # connection error can be a transient gateway/LB blip and dropping
    # the handle on it would leak the server-side cache (review finding)
    msg = str(exc).lower()
    return any(
        marker in msg
        for marker in (
            "sparkcontext has been stopped",
            "sparkcontext was shut down",
            "session is stopped",
            "session was stopped",
            "cannot call methods on a stopped",
            "java gateway process exited",
        )
    )


def release_scratch_caches() -> int:
    """Unpersist every registered scratch frame; returns how many were
    released. Call after the actions consuming operator results — e.g.
    once per ingest batch, or per query in a serving loop. A frame
    whose unpersist fails TRANSIENTLY stays registered for the next
    call (dropping its only handle would reinstate the unbounded-cache
    leak this registry exists to fix); only an identifiably stopped
    session drops the handle — the JVM-side cache died with it."""
    with _LOCK:
        snapshot = list(_SCRATCH)
        _SCRATCH.clear()
    released, kept, done = 0, [], 0
    try:
        for df in snapshot:
            try:
                df.unpersist()
                released += 1
            except Exception as exc:
                if not (_looks_stopped(exc) or _session_stopped(df)):
                    kept.append(df)  # transient failure: retry next call
            done += 1
    finally:
        # re-register the retry set AND any snapshot tail an interrupt
        # (KeyboardInterrupt mid-unpersist — done has not advanced past
        # the in-flight frame) left unprocessed — dropping either would
        # leak their caches (review finding); frames pinned concurrently
        # were appended to the cleared live list and are preserved
        # untouched. Prepend so ordering stays oldest-first.
        restore = kept + snapshot[done:]
        if restore:
            with _LOCK:
                _SCRATCH[:0] = restore
    return released
