"""Versioned tables: snapshot isolation, time travel, retention vacuum,
and crash-orphan invisibility (sources/versioned.py)."""

from __future__ import annotations

import os

import pytest

from beast_spark.sources.versioned import VersionedTable


def _df(spark, n):
    return spark.range(n).selectExpr("id", f"{n} AS gen")


def test_commit_read_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert t.current_version() is None
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    assert t.commit(_df(spark, 1)) == 1
    assert t.commit(_df(spark, 2)) == 2
    assert t.commit(_df(spark, 3)) == 3
    assert t.current_version() == 3
    assert t.read(spark).count() == 3  # current snapshot
    for v in (1, 2, 3):  # time travel
        assert t.read(spark, version=v).count() == v
        assert t.read(spark, version=v).first().gen == v


def test_vacuum_retention_and_orphans(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"), keep_versions=2)
    for n in (1, 2, 3, 4):
        t.commit(_df(spark, n))
    # simulate a crashed commit: version dir written, manifest never flipped
    orphan = tmp_path / "t" / "v99"
    _df(spark, 9).write.parquet(str(orphan))
    assert t.versions() == [1, 2, 3, 4]

    dropped = t.vacuum()
    assert dropped == [1, 2]
    assert t.versions() == [3, 4]
    assert t.current_version() == 4
    assert t.read(spark).count() == 4
    assert t.read(spark, version=3).count() == 3
    assert not orphan.exists()  # orphan cleaned
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(spark, version=1)


def test_orphan_is_invisible_and_recommit_overwrites(spark, tmp_path):
    """A crash AFTER writing v2 but BEFORE the manifest flip must leave
    readers on v1, and the retried commit must produce a correct v2."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    # crashed commit: the artifact exists but was never published
    _df(spark, 7).write.parquet(str(tmp_path / "t" / "v2"))
    assert t.current_version() == 1
    assert t.read(spark).count() == 1
    # retry writes a fresh v2 over the orphan and publishes it
    assert t.commit(_df(spark, 2)) == 2
    assert t.read(spark).count() == 2
    assert t.read(spark).first().gen == 2


def test_vacuum_never_breaks_in_window_reads_and_crash_heals(spark, tmp_path):
    """The vacuum concurrency/crash contract (VERDICT r4 optional #8):

    * a time-travel read planned BEFORE a vacuum executes fine after it
      as long as its version stays inside the retention window;
    * a read whose version ages out between plan and execution fails
      cleanly (never partial data), and a fresh plan gets the clean
      ``ValueError``;
    * a crash between the manifest flip and the deletions (simulated by
      performing only the flip) leaves reads consistent, the dropped
      version already rejected, and the next vacuum sweeps the orphans.
    """
    import json

    t = VersionedTable(str(tmp_path / "t"), keep_versions=2)
    for n in (1, 2, 3):
        t.commit(_df(spark, n))

    # in-window concurrent read: plan v2, vacuum (drops only v1), execute
    df_v2 = t.read(spark, version=2)
    assert t.vacuum() == [1]
    assert df_v2.count() == 2  # untouched: v2 is inside the window

    # aging-out in-flight read: plan v2, push it out of retention
    df_v2_again = t.read(spark, version=2)
    t.commit(_df(spark, 4))
    assert t.vacuum() == [2]
    with pytest.raises(Exception):  # fails cleanly at execution
        df_v2_again.count()
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(spark, version=2)  # a fresh plan gets the clean rejection

    # crash mid-vacuum: flip the manifest exactly as vacuum() does, but
    # "crash" before deleting the aged-out directory
    t.commit(_df(spark, 5))  # versions now [3, 4, 5], keep 2 -> drop 3
    m = t._read_manifest()
    keep = m["versions"][-t.keep_versions:]
    with open(t._manifest_path() + ".tmp", "w") as fh:
        json.dump({"current": m["current"], "versions": keep,
                   "applied_batches": m.get("applied_batches", [])}, fh)
    os.replace(t._manifest_path() + ".tmp", t._manifest_path())
    assert (tmp_path / "t" / "v3").exists()  # the undeleted orphan

    # post-crash: reads consistent, dropped version already rejected
    assert t.read(spark).count() == 5
    assert t.read(spark, version=4).count() == 4
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(spark, version=3)

    # the next vacuum heals: orphan swept, nothing else dropped
    assert t.vacuum() == []
    assert not (tmp_path / "t" / "v3").exists()
    assert t.versions() == [4, 5]
    assert t.read(spark).count() == 5
