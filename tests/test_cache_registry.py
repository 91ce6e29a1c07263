"""Unit tests for the process-scoped scratch-cache registry
(operators/_cache.py) — the handle long-lived callers use to release
the default-on persists of capped_bucket_pairs /
incremental_minhash_pairs (round-11 ADVICE), hardened round-13:

* registry mutation is lock-guarded, so a pin racing a concurrent
  release is never silently discarded (round-12 ADVICE #1);
* a failed unpersist drops the handle only on an IDENTIFIABLE
  stopped-session error — unknown failures are retried next call
  instead of leaking the cache (round-12 ADVICE #2).

The registry never inspects its entries beyond .persist/.unpersist/
.sparkSession, so these tests drive it with stubs — deterministic
re-entrancy beats a sleep-based race.
"""

from __future__ import annotations

import threading

import pytest

from beast_spark.operators import _cache
from beast_spark.operators._cache import pin_scratch, release_scratch_caches


class _Stub:
    """DataFrame stand-in: records persist/unpersist calls; unpersist
    raises ``fail_with`` (once, or forever with ``always=True``)."""

    def __init__(self, fail_with: Exception | None = None, always: bool = False):
        self.persisted = 0
        self.unpersisted = 0
        self._fail_with = fail_with
        self._always = always
        self.sparkSession = None  # no _sc attr: probe falls to error text

    def persist(self):
        self.persisted += 1
        return self

    def unpersist(self):
        if self._fail_with is not None:
            exc = self._fail_with
            if not self._always:
                self._fail_with = None
            raise exc
        self.unpersisted += 1
        return self


@pytest.fixture(autouse=True)
def _clean_registry():
    with _cache._LOCK:
        saved = list(_cache._SCRATCH)
        _cache._SCRATCH.clear()
    yield
    with _cache._LOCK:
        _cache._SCRATCH[:] = saved


def test_pin_persists_and_release_unpersists_all():
    a, b = _Stub(), _Stub()
    assert pin_scratch(a) is a and a.persisted == 1
    pin_scratch(b)
    assert release_scratch_caches() == 2
    assert a.unpersisted == b.unpersisted == 1
    assert _cache._SCRATCH == []
    assert release_scratch_caches() == 0  # idempotent on empty


def test_transient_unpersist_failure_keeps_handle_for_retry():
    flaky = _Stub(fail_with=RuntimeError("connection reset mid-RPC"))
    ok = _Stub()
    pin_scratch(flaky)
    pin_scratch(ok)
    assert release_scratch_caches() == 1  # ok released, flaky kept
    assert _cache._SCRATCH == [flaky]
    assert release_scratch_caches() == 1  # retry succeeds next call
    assert flaky.unpersisted == 1 and _cache._SCRATCH == []


def test_identifiable_stopped_session_drops_handle():
    dead = _Stub(
        fail_with=RuntimeError(
            "Cannot call methods on a stopped SparkContext"
        ),
        always=True,
    )
    pin_scratch(dead)
    assert release_scratch_caches() == 0
    assert _cache._SCRATCH == []  # terminal: JVM cache died with session


def test_unknown_probe_failure_is_not_classified_as_stopped():
    """Spark Connect sessions have no _sc; a transient unpersist error
    there must NOT be misread as a stopped session (round-12 ADVICE:
    the old probe defaulted stopped=True on any probe failure)."""
    connectish = _Stub(fail_with=RuntimeError("GRPC deadline exceeded"))
    pin_scratch(connectish)
    assert release_scratch_caches() == 0
    assert _cache._SCRATCH == [connectish]  # retried, not dropped
    assert release_scratch_caches() == 1


def test_pin_during_release_is_never_discarded():
    """The round-12 race, made deterministic: a frame pinned WHILE
    release_scratch_caches is mid-sweep (here: from inside another
    frame's unpersist, which runs outside the lock) must survive the
    registry rebuild."""
    late = _Stub()

    class _PinsDuringUnpersist(_Stub):
        def unpersist(self):
            pin_scratch(late)  # concurrent caller lands mid-release
            return super().unpersist()

    first = _PinsDuringUnpersist()
    pin_scratch(first)
    assert release_scratch_caches() == 1  # first released
    assert _cache._SCRATCH == [late]  # late pin preserved, not lost
    assert late.persisted == 1 and late.unpersisted == 0


def test_concurrent_pins_under_thread_pressure():
    """Belt-and-braces thread test: pins from N threads interleaved
    with releases never lose a handle — every stub ends either
    unpersisted or still registered."""
    stubs = [_Stub() for _ in range(64)]

    def _pin_some(chunk):
        for s in chunk:
            pin_scratch(s)

    threads = [
        threading.Thread(target=_pin_some, args=(stubs[i::4],))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    release_scratch_caches()  # races the pinning threads
    for t in threads:
        t.join()
    release_scratch_caches()
    assert all(s.unpersisted == 1 for s in stubs)
    assert _cache._SCRATCH == []


def test_interrupt_mid_sweep_keeps_unprocessed_tail():
    """A BaseException mid-sweep (Ctrl-C during an unpersist RPC) must
    not drop the in-flight frame or the unprocessed tail — the
    registry restores both for the next call (review finding: the
    clear-up-front rewrite would otherwise leak them)."""
    a, c = _Stub(), _Stub()

    class _Interrupted(_Stub):
        def unpersist(self):
            raise KeyboardInterrupt

    b = _Interrupted()
    for s in (a, b, c):
        pin_scratch(s)
    with pytest.raises(KeyboardInterrupt):
        release_scratch_caches()
    # a was released; b (in-flight) and c (unprocessed) stay registered
    assert a.unpersisted == 1
    assert _cache._SCRATCH == [b, c]
