"""The manifest commit protocol (``streaming/swap.py::ManifestSwapTable``):
per-batch writes must be O(delta) — append fragments plus
touched-shard rewrites only, with untouched leaves byte-identical on
disk — while the single manifest flip keeps the data + ledger commit
atomic, orphans get garbage-collected, and legacy whole-swap layouts
are rejected instead of silently misread.

This is the scale contract the round-7 review named: the previous
whole-directory swap rewrote the full cumulative index every
micro-batch (write amplification proportional to corpus size)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from beast_spark.streaming.swap import ManifestSwapTable

DDL = "vec_id long, embedding array<double>"


def _files(root):
    """{relpath: (size, mtime_ns)} of every data file under ``root``,
    excluding the manifest itself (which legitimately changes)."""
    out = {}
    for dp, _dirs, fs in os.walk(root):
        for f in fs:
            if f.startswith("MANIFEST"):
                continue
            full = os.path.join(dp, f)
            st = os.stat(full)
            out[os.path.relpath(full, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _rows(n, base=0):
    return [(base + i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(n)]


def test_append_commit_writes_only_the_batch(spark, tmp_path):
    """IVF maintainer: after a large first batch, a small second batch
    must leave every first-batch file byte-identical in place and add
    only increment-sized fragments — the write-amplification fix."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(4), DDL).write.parquet(str(tmp_path / "cent"))
    m = IvfIndexMaintainer(str(tmp_path / "state"), str(tmp_path / "cent"))
    m.apply_batch(spark.createDataFrame(_rows(20000), DDL), 0)
    before = _files(str(tmp_path / "state"))
    total_before = sum(sz for sz, _ in before.values())

    m.apply_batch(spark.createDataFrame(_rows(10, base=20000), DDL), 1)
    after = _files(str(tmp_path / "state"))
    # every pre-existing file untouched: same size AND mtime (no rewrite)
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"batch-0 file rewritten: {rel}"
    # new bytes are increment-sized — fixed parquet footers (~0.5 KB ×
    # n_partitions × n_subs) dominate a 10-row fragment, so the bound is
    # loose at test scale; the byte-identical check above is the real
    # no-rewrite contract
    new_bytes = sum(sz for rel, (sz, _) in after.items() if rel not in before)
    assert new_bytes > 0
    assert new_bytes < total_before / 4, (new_bytes, total_before)
    assert m.read_vectors(spark).count() == 20010


def test_corpus_v3_rewrites_only_touched_shards(spark, tmp_path):
    """whcounts/signals are merge tables: a batch must rewrite only the
    hash shards its keys touch; at least some batch-0 shard leaves stay
    byte-identical, and the merged counts still equal a full recount."""
    from beast_spark.streaming.corpus_v3 import CorpusV3Maintainer

    DOC_DDL = "doc_id long, text string, lang string, source string, ts long"
    docs0 = [
        (i, " ".join(f"w{i}x{j}" for j in range(12)), "en", "s1", 0)
        for i in range(40)
    ]
    docs1 = [(100, " ".join(f"y{j}" for j in range(12)), "en", "s2", 0)]
    m = CorpusV3Maintainer(str(tmp_path / "state"), n_shards=8)
    m.apply_batch(spark.createDataFrame(docs0, DOC_DDL), 0)
    before = _files(str(tmp_path / "state"))
    m.apply_batch(spark.createDataFrame(docs1, DOC_DDL), 1)
    after = _files(str(tmp_path / "state"))

    surviving = [r for r in before if r in after and after[r] == before[r]]
    wh_kept = [r for r in surviving if r.startswith("whcounts/")]
    sig_kept = [r for r in surviving if r.startswith("signals/")]
    # one 12-token doc touches 5 window hashes / 1 doc_id: most of the 8
    # shards must keep their original leaves
    assert wh_kept, "every whcounts shard was rewritten for a 1-doc batch"
    assert sig_kept, "every signals shard was rewritten for a 1-doc batch"

    # merged counts == recount over everything ingested
    from beast_spark.operators.quality import window_hashes

    all_docs = spark.createDataFrame(docs0 + docs1, DOC_DDL)
    want = {
        (r.wh, r.n)
        for r in window_hashes(all_docs, m.window)
        .groupBy("wh")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    got = {(r.wh, r.n) for r in m._read_sub(spark, "whcounts").collect()}
    assert got == want


def test_orphan_fragments_are_garbage_collected(spark, tmp_path):
    """Fragments written by a crashed commit (never referenced by the
    manifest) must be invisible to readers and removed by the next
    commit's GC."""
    t = ManifestSwapTable(str(tmp_path / "state"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t.commit_delta(0, appends={"tab": df})

    orphan = tmp_path / "state" / "tab" / "g999"
    os.makedirs(orphan)
    (orphan / "junk.parquet").write_bytes(b"not really parquet")
    # reader goes through the manifest: orphan invisible
    assert t._read_sub(spark, "tab").count() == 1

    t.commit_delta(1, appends={"tab": spark.createDataFrame([(2, "b")], "id long, v string")})
    assert not orphan.exists()
    assert t._read_sub(spark, "tab").count() == 2
    assert t.applied_batches() == {0, 1}


def test_legacy_whole_swap_layout_rejected(spark, tmp_path):
    """A state dir written by the old whole-directory swap (top-level
    ledger, no manifest) must raise, never read as empty state."""
    state = tmp_path / "state"
    os.makedirs(state)
    with open(state / "_applied_batches.json", "w") as fh:
        json.dump([0], fh)
    t = ManifestSwapTable(str(state))
    with pytest.raises(ValueError, match="legacy"):
        t.applied_batches()


def test_shard_replacement_drops_emptied_shards(spark, tmp_path):
    """A touched shard whose new content is empty must drop its rows —
    the explicit touched list expresses what written leaves alone
    cannot."""
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=4)
    df0 = spark.range(20).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    ).withColumn("_shard", F.pmod(F.hash("id"), F.lit(4)))
    shards0 = sorted(r.s for r in df0.select(F.col("_shard").alias("s")).distinct().collect())
    t.commit_delta(0, shard_replacements={"tab": (df0, shards0)})
    assert t._read_sub(spark, "tab").count() == 20

    # rewrite shard of id=3 with only id=3 doubled; empty out another shard
    sh3 = df0.filter(F.col("id") == 3).select("_shard").collect()[0][0]
    other = next(s for s in shards0 if s != sh3)
    repl = (
        spark.range(3, 4)
        .select(F.col("id"), (F.col("id") * 100).alias("v"))
        .withColumn("_shard", F.pmod(F.hash("id"), F.lit(4)))
    )
    t.commit_delta(1, shard_replacements={"tab": (repl, [sh3, other])})
    rows = {(r.id, r.v) for r in t._read_sub(spark, "tab").collect()}
    assert (3, 300) in rows
    # everything that hashed to sh3 (other than id=3) or to `other` is gone
    import pyspark.sql.functions as FF

    gone = {
        r.id
        for r in spark.range(20)
        .withColumn("s", FF.pmod(FF.hash("id"), FF.lit(4)))
        .filter(FF.col("s").isin([int(sh3), int(other)]))
        .collect()
    }
    assert {i for i, _ in rows} == (set(range(20)) - gone) | {3}


def test_shard_replacement_rejects_unsharded_fragments(spark, tmp_path):
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=4)
    df = spark.range(5).withColumn("_shard", F.pmod(F.hash("id"), F.lit(4)))
    t.commit_delta(0, appends={"tab": spark.range(5)})
    with pytest.raises(ValueError, match="unsharded"):
        t.commit_delta(1, shard_replacements={"tab": (df, [0, 1, 2, 3])})


def test_compact_folds_fragments_and_enables_sharding(spark, tmp_path):
    """compact() folds N append fragments into one (content preserved),
    and with a shard column migrates the sub-table onto the
    shard-replacement path."""
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=4)
    for b in range(5):
        t.commit_delta(b, appends={"tab": spark.range(b * 10, b * 10 + 10)})
    want = set(range(50))
    assert {r.id for r in t._read_sub(spark, "tab").collect()} == want
    assert len(t.sub_leaves("tab")) == 5

    t.compact(spark, "tab", shard_col="id")
    assert {r.id for r in t._read_sub(spark, "tab").collect()} == want
    # now sharded: replacement is legal and shard-restricted reads prune
    some_shard = int(
        spark.range(1).select(F.pmod(F.hash(F.lit(7)), F.lit(4))).collect()[0][0]
    )
    restricted = t._read_sub(spark, "tab", shards=[some_shard])
    assert restricted is not None and 7 in {r.id for r in restricted.collect()}
    repl = (
        spark.range(7, 8)
        .select(F.col("id"))
        .withColumn("_shard", F.pmod(F.hash("id"), F.lit(4)))
    )
    t.commit_delta(99, shard_replacements={"tab": (repl, [some_shard])})
    got = {r.id for r in t._read_sub(spark, "tab").collect()}
    assert 7 in got and len(got) < 50
    assert t.applied_batches() == {0, 1, 2, 3, 4, 99}


def test_injected_storage_native_fingerprint(spark, tmp_path):
    """The frozen-artifact guard takes a storage-native fingerprint
    callable (object-storage etags instead of the local os.walk): the
    injected hook is what lands in the marker, and a maintainer
    validating under a DIFFERENT fingerprint function rejects instead
    of silently accepting."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    cpath = str(tmp_path / "cent")
    spark.createDataFrame(_rows(4), DDL).write.parquet(cpath)
    calls = []

    def native(path):
        calls.append(path)
        return "etag::v1::" + os.path.basename(path)

    m = IvfIndexMaintainer(str(tmp_path / "state"), cpath, fingerprint=native)
    m.apply_batch(spark.createDataFrame(_rows(10), DDL), 0)
    assert cpath in calls
    # the marker lives INSIDE the manifest — same atomic flip as the state
    assert m.user_meta()["centroids"] == "etag::v1::cent"

    # same hook: accepted
    m2 = IvfIndexMaintainer(str(tmp_path / "state"), cpath, fingerprint=native)
    m2.apply_batch(spark.createDataFrame(_rows(10, base=10), DDL), 1)

    # the default (local-walk) fingerprint disagrees with the marker:
    # rejected — a guard must never silently accept a different scheme
    m3 = IvfIndexMaintainer(str(tmp_path / "state"), cpath)
    with pytest.raises(ValueError, match="artifacts or config changed"):
        m3.apply_batch(spark.createDataFrame(_rows(10, base=20), DDL), 2)


def test_rebuild_drops_retired_tiers(spark, tmp_path):
    """A rebuild that no longer derives a tier (dropped codebook /
    pq_codebooks) must DROP that sub-table in the same manifest flip:
    leaving it would serve codes encoded under retired artifacts, and
    adc_search would pass its None guard only to crash on the null
    codebook path."""
    from beast_spark.operators.similarity import pq_codebooks
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(4), DDL).write.parquet(str(tmp_path / "c1"))
    spark.createDataFrame(_rows(4, base=4), DDL).write.parquet(str(tmp_path / "c2"))
    e = spark.createDataFrame(_rows(40), DDL)
    pq_codebooks(e, dims=8, m=2).write.parquet(str(tmp_path / "pq"))
    m = IvfIndexMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "c1"),
        pq_codebooks_path=str(tmp_path / "pq"),
        dims=8,
    )
    m.apply_batch(e, 0)
    assert m.read_pq(spark) is not None

    m.rebuild(spark, str(tmp_path / "c2"))  # retrain WITHOUT the PQ tier
    assert m.read_pq(spark) is None
    with pytest.raises(ValueError, match="pq_codebooks_path"):
        m.adc_search(spark, e.filter(F.col("vec_id") < 2))
    # and no stale leaves linger on disk
    assert not os.path.exists(str(tmp_path / "state" / "pq")), os.listdir(
        str(tmp_path / "state" / "pq")
    )


def test_compact_survives_a_crashed_prior_commit(spark, tmp_path):
    """compact() must GC orphan fragments before writing, like
    commit_delta does — an orphan occupying the next gen's fragment
    name (a commit that crashed between write and flip) would
    otherwise fail the compacting write with PATH_ALREADY_EXISTS."""
    t = ManifestSwapTable(str(tmp_path / "state"))
    t.commit_delta(0, appends={"tab": spark.range(10)})
    # simulate a crash: fragment for gen 2 written, manifest never flipped
    orphan = tmp_path / "state" / "tab" / "g2"
    spark.range(100, 105).write.parquet(str(orphan))

    t.compact(spark, "tab")
    assert {r.id for r in t._read_sub(spark, "tab").collect()} == set(range(10))
    assert len(t.sub_leaves("tab")) == 1


def test_n_shards_mismatch_rejected(spark, tmp_path):
    """The shard function is part of the on-disk layout: a maintainer
    reopened with a different n_shards would silently mis-prune
    shard-restricted reads and mis-route shard replacements — it must
    raise on the first ledger read instead."""
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=8)
    t.commit_delta(0, appends={"tab": spark.range(5)})
    t2 = ManifestSwapTable(str(tmp_path / "state"), n_shards=16)
    with pytest.raises(ValueError, match="n_shards"):
        t2.applied_batches()


def test_ivf_guard_reads_only_the_batch_id_shards(spark, tmp_path):
    """The append-only guard's already-ingested probe must read only
    the vector shards the batch's ids hash into — and still catch a
    re-sent id (which by construction hashes into a probed shard)."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(4), DDL).write.parquet(str(tmp_path / "cent"))
    # on_resend='reject' pins the fail-fast policy: the property under
    # test is the probe PRUNES yet still detects (a re-sent id hashes
    # into a probed shard by construction); the default supersede path
    # is covered by test_streaming_ivf's re-send tests
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), on_resend="reject"
    )
    m.apply_batch(spark.createDataFrame(_rows(64), DDL), 0)
    # vectors landed sharded: multiple _shard= leaves, no unsharded frag
    leaves = m.sub_leaves("vectors")
    assert len(leaves) > 1 and all("_shard=" in leaf for leaf in leaves)
    # shard-restricted read returns a strict subset
    some = m._read_sub(spark, "vectors", shards=[0])
    assert some is None or some.count() < 64

    # fresh ids pass; a re-sent id raises despite the pruned probe
    m.apply_batch(spark.createDataFrame(_rows(4, base=64), DDL), 1)
    with pytest.raises(ValueError, match="append-only"):
        m.apply_batch(spark.createDataFrame(_rows(1, base=10), DDL), 2)
    # rebuild keeps the vectors sub sharded (pruning survives retrain)
    spark.createDataFrame(_rows(4, base=100), DDL).write.parquet(
        str(tmp_path / "cent2")
    )
    m.rebuild(spark, str(tmp_path / "cent2"))
    assert all("_shard=" in leaf for leaf in m.sub_leaves("vectors"))
    with pytest.raises(ValueError, match="append-only"):
        m.apply_batch(spark.createDataFrame(_rows(1, base=10), DDL), 3)


def test_ivf_posting_read_prunes_to_probed_cell_shards(spark, tmp_path):
    """assigned fragments are cid-hash sharded and a search's posting
    read restricts to the probed cells' shards — results must equal
    the unrestricted join, and the shard-restricted read must be a
    strict subset of the index for a 1-query probe."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(16), DDL).write.parquet(str(tmp_path / "cent"))
    m = IvfIndexMaintainer(str(tmp_path / "state"), str(tmp_path / "cent"))
    m.apply_batch(spark.createDataFrame(_rows(200), DDL), 0)
    leaves = m.sub_leaves("assigned")
    assert all("_shard=" in leaf for leaf in leaves)

    qs = spark.createDataFrame(_rows(1, base=7), DDL)  # vec_id 7
    got = {
        (r.query_id, r.vec_id)
        for r in m.candidates(spark, qs, nprobe=2).collect()
    }
    # unrestricted twin: same probes joined against the FULL assigned
    from beast_spark.operators.similarity import ivf_probes

    probes = ivf_probes(qs, spark.read.parquet(str(tmp_path / "cent")), 2)
    want = {
        (r.query_id, r.vec_id)
        for r in m.read_assigned(spark)
        .join(probes, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .collect()
    }
    assert got == want and got
    # the pruned read touches fewer shards than the whole index holds
    probed = m.touched_shards(probes, "cid")
    assert len(m.sub_leaves("assigned", shards=probed)) < len(leaves)


def test_maybe_compact_amortizes_fragment_growth(spark, tmp_path):
    """maybe_compact folds only past the threshold (the log-structured
    amortization for append-only subs), preserves content, and a
    maintainer keeps answering correctly across a fold + further
    appends."""
    t = ManifestSwapTable(str(tmp_path / "t"))
    for b in range(4):
        t.commit_delta(b, appends={"tab": spark.range(b * 5, b * 5 + 5)})
    assert t.maybe_compact(spark, "tab", max_fragments=10) is False
    assert len(t.sub_leaves("tab")) == 4
    assert t.maybe_compact(spark, "tab", max_fragments=3) is True
    assert len(t.sub_leaves("tab")) == 1
    assert {r.id for r in t._read_sub(spark, "tab").collect()} == set(range(20))

    # maintainer-level: fold mid-stream, then keep appending + searching
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(4), DDL).write.parquet(str(tmp_path / "cent"))
    # on_resend='reject' pins the fail-fast policy: the property under
    # test is that the guard still DETECTS through folded fragments
    # (stamps survive compact()); the default supersede path is covered
    # by test_streaming_ivf's re-send tests
    m = IvfIndexMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), on_resend="reject"
    )
    for b in range(3):
        m.apply_batch(spark.createDataFrame(_rows(20, base=b * 20), DDL), b)
    assert m.maybe_compact(spark, "vectors", shard_col="vec_id", max_fragments=1)
    assert m.maybe_compact(spark, "assigned", shard_col="cid", max_fragments=1)
    m.apply_batch(spark.createDataFrame(_rows(20, base=60), DDL), 3)
    assert m.read_vectors(spark).count() == 80
    # dup guard still works through the folded + fresh fragments
    with pytest.raises(ValueError, match="append-only"):
        m.apply_batch(spark.createDataFrame(_rows(1, base=5), DDL), 4)
    qs = spark.createDataFrame(_rows(2), DDL)
    assert m.search(spark, qs, nprobe=2, k=5).count() > 0


from hypothesis import given, settings
from hypothesis import strategies as st

_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=0, max_size=6)),
    st.tuples(st.just("sharded_append"), st.lists(st.integers(0, 99), min_size=0, max_size=6)),
    st.tuples(st.just("replace"), st.lists(st.integers(0, 99), min_size=0, max_size=6)),
    st.tuples(st.just("crash"), st.just(None)),
    st.tuples(st.just("compact"), st.just(None)),
)


@settings(max_examples=5, deadline=None)
@given(ops=st.lists(_OP, min_size=1, max_size=7))
def test_manifest_protocol_matches_python_model(spark, tmp_path_factory, ops):
    """Model-based property test of the protocol every index maintainer
    now rides on: a random sequence of appends / sharded appends /
    shard replacements / compactions — interleaved with CRASHED commits
    (fragments written, manifest never flipped) — must leave the read
    state equal to a trivial Python model at every step. Appends append
    ids; a replacement installs new values for its ids' shards and
    KEEPS other ids in those shards; crashes are invisible."""
    import shutil

    NS = 4
    root = tmp_path_factory.mktemp("mproto")
    path = str(root / "state")
    t = ManifestSwapTable(path, n_shards=NS)
    model: dict[int, int] = {}  # id -> value
    batch = 0
    version = 0

    def spark_shard(ids):
        if not ids:
            return {}
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        return {
            r.id: r.s
            for r in df.select("id", F.pmod(F.hash("id"), F.lit(NS)).alias("s")).collect()
        }

    for op, ids in ops:
        version += 1
        if op == "crash":
            # a commit that died after writing a fragment: orphan dir
            orphan = os.path.join(path, "tab", f"g{batch + 99}")
            if not os.path.exists(orphan):
                os.makedirs(orphan)
                with open(os.path.join(orphan, "part-junk.parquet"), "wb") as fh:
                    fh.write(b"junk")
            continue
        if op == "compact":
            if t._load_manifest() is not None and t._load_manifest()["subs"].get("tab"):
                sharded = any(
                    k != "_"
                    for fr in t._load_manifest()["subs"]["tab"]
                    for k in fr
                )
                t.compact(spark, "tab", shard_col="id" if sharded else None)
        elif op == "append":
            new = {i: version for i in ids if i not in model}
            df = spark.createDataFrame(
                [(i, v) for i, v in new.items()], "id long, v long"
            )
            t.commit_delta(batch, appends={"tab": df})
            model.update(new)
            batch += 1
        elif op == "sharded_append":
            new = {i: version for i in ids if i not in model}
            df = spark.createDataFrame(
                [(i, v) for i, v in new.items()], "id long, v long"
            ).withColumn("_shard", F.pmod(F.hash("id"), F.lit(NS)))
            # mixing unsharded + sharded fragments in one sub is legal
            # for appends; replacements below guard against the mix
            t.commit_delta(batch, sharded_appends={"tab": df})
            model.update(new)
            batch += 1
        else:  # replace: new values for ids' shards, keep co-sharded rows
            frags = (t._load_manifest() or {"subs": {}})["subs"].get("tab", [])
            if any("_" in fr for fr in frags):
                continue  # replacement over unsharded fragments refuses
            shards = sorted(set(spark_shard(ids).values()))
            upd = {i: version for i in ids}
            sh = spark_shard(list(model) + list(upd))
            content = {
                i: (upd[i] if i in upd else model[i])
                for i in set(model) | set(upd)
                if sh[i] in shards
            }
            df = spark.createDataFrame(
                [(i, v) for i, v in content.items()], "id long, v long"
            ).withColumn("_shard", F.pmod(F.hash("id"), F.lit(NS)))
            t.commit_delta(batch, shard_replacements={"tab": (df, shards)})
            model.update(upd)
            batch += 1

        got_df = t._read_sub(spark, "tab")
        got = {} if got_df is None else {r.id: r.v for r in got_df.collect()}
        assert got == model, f"after {op}"
    # crashes leave no ghost rows behind even at the end
    shutil.rmtree(str(root), ignore_errors=True)


def test_shard_replacement_rejects_undeclared_shards(spark, tmp_path):
    """Round-9 ADVICE: a replacement frame whose _shard values stray
    outside the declared touched list would silently DUPLICATE those
    shards' rows (old leaf kept AND new leaf written) — must refuse."""
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=4)
    df0 = spark.range(20).withColumn("_shard", F.pmod(F.hash("id"), F.lit(4)))
    t.commit_delta(0, shard_replacements={"tab": (df0, [0, 1, 2, 3])})
    with pytest.raises(ValueError, match="outside the declared"):
        t.commit_delta(1, shard_replacements={"tab": (df0, [0])})
    # the refused commit is invisible: content + ledger unchanged, and
    # its orphan leaves are GC'd by the next successful commit
    assert t.applied_batches() == {0}
    assert t._read_sub(spark, "tab").count() == 20
    one = df0.filter(F.col("_shard") == 0)
    t.commit_delta(1, shard_replacements={"tab": (one, [0])})
    assert t._read_sub(spark, "tab").count() == one.count() + df0.filter(
        F.col("_shard") != 0
    ).count()


def test_gc_grace_retains_superseded_leaves(spark, tmp_path):
    """gc_grace_gens=N keeps superseded leaves on disk for N further
    generations — the concurrent-reader window the round-9 ADVICE
    flagged — then deletes them."""
    path = str(tmp_path / "state")
    t = ManifestSwapTable(path, n_shards=2, gc_grace_gens=1)
    df0 = spark.range(10).withColumn("_shard", F.pmod(F.hash("id"), F.lit(2)))
    t.commit_delta(0, shard_replacements={"tab": (df0, [0, 1])})
    gen1_leaves = set(t.sub_leaves("tab"))

    t.commit_delta(1, shard_replacements={"tab": (df0, [0, 1])})
    # superseded gen-1 leaves survive on disk (a reader holding the old
    # manifest can still finish its scan) and are listed as retired
    for leaf in gen1_leaves:
        assert os.path.exists(leaf), f"superseded leaf deleted inside grace: {leaf}"
    manifest = json.load(open(os.path.join(path, "MANIFEST.json")))
    retired = {p for e in manifest["retired"] for p in e["paths"]}
    assert retired  # non-empty retention list

    t.commit_delta(2, shard_replacements={"tab": (df0, [0, 1])})
    # grace lapsed: gen-1 leaves are gone, gen-2's are now the retained set
    for leaf in gen1_leaves:
        assert not os.path.exists(leaf), f"leaf outlived its grace: {leaf}"
    # content always correct regardless of retention
    assert t._read_sub(spark, "tab").count() == 10


def test_commit_without_batch_id_leaves_ledger_alone(spark, tmp_path):
    t = ManifestSwapTable(str(tmp_path / "state"))
    t.commit_delta(None, appends={"tab": spark.range(5)})
    assert t.applied_batches() == set()
    t.commit_delta(0, appends={"tab": spark.range(5)})
    assert t.applied_batches() == {0}


def test_ivf_rebuild_on_empty_ledger_does_not_swallow_batch_zero(spark, tmp_path):
    """Round-9 ADVICE: rebuild() on a never-streamed maintainer used to
    record batch id 0, so the stream's FIRST micro-batch was silently
    skipped as a replay."""
    from beast_spark.operators.similarity import ivf_assign
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    cent = str(tmp_path / "cent")
    spark.createDataFrame(_rows(4), DDL).write.parquet(cent)
    m = IvfIndexMaintainer(str(tmp_path / "state"), cent)
    # a bulk-loaded (never-streamed) state dir: vectors + assignments
    # committed out-of-band, ledger EMPTY — the scenario the advice
    # found rebuild() fabricating batch id 0 in
    vecs = spark.createDataFrame(_rows(30), DDL)
    m.commit_delta(
        None,
        sharded_appends={
            "assigned": ivf_assign(vecs, spark.read.parquet(cent))
            .select("vec_id", "cid")
            .withColumn("_shard", m.shard_of(F.col("cid"))),
            "vectors": vecs.withColumn("_shard", m.shard_of(F.col("vec_id"))),
        },
        user_meta=m._meta_for(cent, None, None),
    )
    m.rebuild(spark, cent)
    assert m.applied_batches() == set()
    m.apply_batch(spark.createDataFrame(_rows(10, base=100), DDL), 0)
    assert 0 in m.applied_batches()
    # batch 0's vectors actually landed (not skipped as a replay)
    ids = {r.vec_id for r in m.read_vectors(spark).collect()}
    assert {100 + i for i in range(10)} <= ids


def test_ivf_candidates_offline_fallback_matches_pruned_path(spark, tmp_path):
    """Round-9 ADVICE: past the max_probe_collect ceiling, candidates()
    must switch to the zero-collect broadcast-plan form and return the
    same rows."""
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    spark.createDataFrame(_rows(8), DDL).write.parquet(str(tmp_path / "cent"))
    m = IvfIndexMaintainer(str(tmp_path / "state"), str(tmp_path / "cent"))
    m.apply_batch(spark.createDataFrame(_rows(60), DDL), 0)
    qs = spark.createDataFrame(_rows(5), DDL)
    pruned = {
        (r.query_id, r.vec_id)
        for r in m.candidates(spark, qs, nprobe=2).collect()
    }
    offline = {
        (r.query_id, r.vec_id)
        for r in m.candidates(spark, qs, nprobe=2, max_probe_collect=0).collect()
    }
    assert offline == pruned and pruned


def test_time_travel_reads_retained_generations(spark, tmp_path):
    """Round-10: with gc_grace_gens > 0 every flip embeds the outgoing
    generation's fragment map (+ user_meta) in the manifest's history,
    so as-of reads serve each retained generation's exact snapshot —
    across appends, shard replacements AND a compaction — while a
    generation past the grace window (or with grace off) raises."""
    t = ManifestSwapTable(str(tmp_path / "state"), n_shards=4, gc_grace_gens=2)
    seen = {}
    for gen, batch in enumerate(range(3), start=1):
        df = spark.createDataFrame(
            [(batch * 10 + i, batch) for i in range(5)], "k long, b long"
        )
        merged_src = (
            t._read_sub(spark, "tbl")
            if t.sub_leaves("tbl")
            else None
        )
        merged = df if merged_src is None else merged_src.unionByName(df)
        t.commit_delta(
            batch,
            shard_replacements={
                "tbl": (
                    merged.withColumn("_shard", t.shard_of(F.col("k"))),
                    list(range(4)),
                )
            },
            user_meta={"upto": batch},
        )
        seen[gen] = {(r.k, r.b) for r in t._read_sub(spark, "tbl").collect()}

    # live + the two retained predecessors read back exactly
    for gen in (3, 2, 1):
        got = {(r.k, r.b) for r in t._read_sub(spark, "tbl", as_of_gen=gen).collect()}
        assert got == seen[gen], gen
        assert t.user_meta_as_of(gen) == {"upto": gen - 1}

    # compaction is a generation too: gen 4 == gen 3's content, and
    # gen 2 is still inside the (live−2) window
    t.compact(spark, "tbl", shard_col="k")
    assert {
        (r.k, r.b) for r in t._read_sub(spark, "tbl", as_of_gen=4).collect()
    } == seen[3]
    assert {
        (r.k, r.b) for r in t._read_sub(spark, "tbl", as_of_gen=3).collect()
    } == seen[3]
    assert {
        (r.k, r.b) for r in t._read_sub(spark, "tbl", as_of_gen=2).collect()
    } == seen[2]
    # gen 1 fell out of the window: explicit error, not a wrong read
    with pytest.raises(ValueError, match="not retained"):
        t.sub_leaves("tbl", as_of_gen=1)
    # grace off: no history is kept at all
    t0 = ManifestSwapTable(str(tmp_path / "state0"), n_shards=4)
    t0.commit_delta(0, appends={"a": spark.createDataFrame([(1,)], "x long")})
    t0.commit_delta(1, appends={"a": spark.createDataFrame([(2,)], "x long")})
    with pytest.raises(ValueError, match="not retained"):
        t0.sub_leaves("a", as_of_gen=1)


def test_session_time_travel_matches_prefix_rebuild(spark, tmp_path):
    """SessionStatsMaintainer.read_sessions(as_of_gen=k) == a fresh
    rebuild over the first k batches — on adversarially interleaved
    splits, so the travelled-to state contains cross-batch-stitched
    sessions."""
    import datetime as dt

    from beast_spark.streaming.eventstats import SessionStatsMaintainer

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 5, base + dt.timedelta(minutes=i * 7), "click", 1.0)
        for i in range(60)
    ]
    ddl = "event_id long, user_id long, ts timestamp, event_type string, value double"
    m = SessionStatsMaintainer(str(tmp_path / "tt"), gc_grace_gens=3)
    for b in range(3):
        m.apply_batch(
            spark.createDataFrame([r for r in rows if r[0] % 3 == b], ddl), b
        )
    for k in (1, 2, 3):
        ref = SessionStatsMaintainer(str(tmp_path / f"ref{k}"))
        for b in range(k):
            ref.apply_batch(
                spark.createDataFrame([r for r in rows if r[0] % 3 == b], ddl), b
            )
        got = sorted(map(tuple, m.read_sessions(spark, as_of_gen=k).collect()))
        want = sorted(map(tuple, ref.read_sessions(spark).collect()))
        assert got == want, k


def test_compact_resends_folds_state_and_truncates_log(spark, tmp_path):
    """The generic compact_resends protocol: superseded stamped rows
    leave both layout classes (unsharded full fold + all-shard
    replacement), stamps survive, distinct collapses the lookup side,
    the resent sub drops, and the whole fold is ONE generation flip.
    No resent sub -> False, no commit."""
    t = ManifestSwapTable(str(tmp_path / "t"), n_shards=4)
    spark_df = lambda rows, ddl: spark.createDataFrame(rows, ddl)  # noqa: E731
    # batch 0: ids 1..3; batch 1 re-sends id 2
    rows0 = [(i, i * 10, 0) for i in (1, 2, 3)]
    t.commit_delta(
        0,
        appends={"data": spark_df(rows0, "id long, v long, _b long")},
        sharded_appends={
            "look": spark_df(
                [(i, 0) for i in (1, 2, 3)], "id long, _b long"
            ).withColumn("_shard", t.shard_of(F.col("id")))
        },
    )
    assert t.compact_resends(spark, "id", {}) is False  # nothing resent yet
    t.commit_delta(
        1,
        appends={
            "data": spark_df([(2, 99, 1)], "id long, v long, _b long"),
            "resent": spark_df([(2, 1)], "id long, batch_id long"),
        },
        sharded_appends={
            "look": spark_df([(2, 1)], "id long, _b long").withColumn(
                "_shard", t.shard_of(F.col("id"))
            )
        },
    )
    wm = t.resend_watermarks(spark, "id")
    live_before = sorted(
        map(tuple, t.live_rows(t._read_sub(spark, "data"), wm, "id", ["id"]).collect())
    )
    assert live_before == [(1, 10), (2, 99), (3, 30)]
    gen_before = t._manifest()["gen"]
    assert (
        t.compact_resends(
            spark,
            "id",
            {"data": (["id"], None, False), "look": (["id"], "id", True)},
        )
        is True
    )
    m = t._manifest()
    assert m["gen"] == gen_before + 1  # one atomic flip for everything
    assert "resent" not in m["subs"]
    # data physically folded: the stale (2, 20) row is gone from disk,
    # stamps preserved, and live reads no longer need a watermark frame
    raw = sorted(map(tuple, t._read_sub(spark, "data").collect()))
    assert raw == [(1, 10, 0), (2, 99, 1), (3, 30, 0)]
    assert t.resend_watermarks(spark, "id") is None
    # the lookup side collapsed to one row per id... per distinct stamp
    # row — (2,0) superseded by the live rule, then distinct
    look = sorted(map(tuple, t._read_sub(spark, "look").collect()))
    assert look == [(1, 0), (2, 1), (3, 0)]
    # second call: nothing to fold
    assert (
        t.compact_resends(spark, "id", {"data": (["id"], None, False)}) is False
    )
    # the ledger was NOT touched by the out-of-band fold
    assert t.applied_batches() == {0, 1}


_ROP = st.one_of(
    st.tuples(
        st.just("send"),
        st.lists(st.integers(0, 19), min_size=1, max_size=5, unique=True),
    ),
    st.tuples(st.just("gc"), st.just(None)),
    st.tuples(st.just("fold"), st.just(None)),
    st.tuples(st.just("crash"), st.just(None)),
)


@settings(max_examples=5, deadline=None)
@given(ops=st.lists(_ROP, min_size=1, max_size=8))
def test_resend_contract_matches_python_model(spark, tmp_path_factory, ops):
    """Model-based property test of the CROSS-BATCH RE-SEND contract
    every maintainer shares (resend_watermarks / live_rows /
    compact_resends): random interleavings of sends (where an id seen
    before is a RE-SEND — stamped row + watermark), physical re-send
    folds, fragment folds, and crashed commits must leave the LIVE view
    equal to a trivial latest-value dict at every step — and a fold
    must truncate the watermark log without changing any read."""
    import shutil

    NS = 4
    root = tmp_path_factory.mktemp("rproto")
    path = str(root / "state")
    t = ManifestSwapTable(path, n_shards=NS)
    model: dict[int, int] = {}  # id -> latest value
    batch = 0
    version = 0
    for op, ids in ops:
        version += 1
        if op == "crash":
            orphan = os.path.join(path, "data", f"g{batch + 99}")
            if not os.path.exists(orphan):
                os.makedirs(orphan)
                with open(os.path.join(orphan, "junk.parquet"), "wb") as fh:
                    fh.write(b"junk")
            continue
        if op == "gc":
            folded = t.compact_resends(
                spark, "id", {"data": (["id"], None, False)}
            )
            if folded:
                # the log is gone AND stamps survived (contract-mode)
                assert t.resend_watermarks(spark, "id") is None
                assert "_b" in t._read_sub(spark, "data").columns
        elif op == "fold":
            if t._load_manifest() is not None:
                t.maybe_compact(spark, "data", max_fragments=1)
        else:  # send: new ids append, known ids RE-SEND with a new value
            resent = [i for i in ids if i in model]
            appends = {
                "data": spark.createDataFrame(
                    [(i, version, batch) for i in ids], "id long, v long, _b long"
                )
            }
            if resent:
                appends["resent"] = spark.createDataFrame(
                    [(i, batch) for i in resent], "id long, batch_id long"
                )
            t.commit_delta(batch, appends=appends)
            for i in ids:
                model[i] = version
            batch += 1
        wm = t.resend_watermarks(spark, "id")
        live = t.live_rows(t._read_sub(spark, "data"), wm, "id", ["id"])
        got = {} if live is None else {r.id: r.v for r in live.collect()}
        assert got == model, f"after {op}"
    shutil.rmtree(str(root), ignore_errors=True)


@settings(max_examples=5, deadline=None)
@given(ops=st.lists(_ROP, min_size=1, max_size=8))
def test_resend_pair_rule_matches_python_model(spark, tmp_path_factory, ops):
    """The TWO-ENDPOINT live rule (a pair row dies when EITHER endpoint
    is re-sent after it — neardup's read_pairs) model-checked under the
    same random schedules: each send also appends (id, partner) pair
    rows; the live pair view must equal the model's
    every-endpoint-watermark filter at every step, through physical
    folds and crashes."""
    import shutil

    NS = 4
    root = tmp_path_factory.mktemp("pproto")
    path = str(root / "state")
    t = ManifestSwapTable(path, n_shards=NS)
    sent: set[int] = set()
    wm_model: dict[int, int] = {}  # id -> latest re-send batch
    pair_rows: list[tuple[int, int, int]] = []  # (a, b, stamp)
    batch = 0
    subs = {
        "data": (["id"], None, False),
        "pairs": (["a", "b"], None, False),
    }

    def live_pairs_model():
        return sorted(
            (a, b)
            for a, b, s in pair_rows
            if s >= wm_model.get(a, -1) and s >= wm_model.get(b, -1)
        )

    for op, ids in ops:
        if op == "crash":
            orphan = os.path.join(path, "pairs", f"g{batch + 99}")
            if not os.path.exists(orphan):
                os.makedirs(orphan)
                with open(os.path.join(orphan, "junk.parquet"), "wb") as fh:
                    fh.write(b"junk")
            continue
        if op == "gc":
            folded = t.compact_resends(spark, "id", subs)
            if folded:
                assert t.resend_watermarks(spark, "id") is None
                # folding removes dead rows from the MODEL too — by the
                # PER-ROW stamp rule, not by pair-set membership: a live
                # (a, b) pair may coexist with a dead duplicate row of
                # the same endpoints at an older stamp, and a set filter
                # would resurrect the dead one (review finding, schedule
                # send([0])/send([0])/gc). After truncation every future
                # watermark is strictly greater than any retained stamp
                # (batch ids are monotone), so dropping wm_model is safe.
                pair_rows[:] = [
                    (a, b, s)
                    for a, b, s in pair_rows
                    if s >= wm_model.get(a, -1) and s >= wm_model.get(b, -1)
                ]
                wm_model.clear()
        elif op == "fold":
            if t._load_manifest() is not None:
                t.maybe_compact(spark, "pairs", max_fragments=1)
        else:  # send
            resent = [i for i in ids if i in sent]
            new_pairs = [(i, (i + 1) % 20, batch) for i in ids]
            appends = {
                "data": spark.createDataFrame(
                    [(i, batch) for i in ids], "id long, _b long"
                ),
                "pairs": spark.createDataFrame(
                    new_pairs, "a long, b long, _b long"
                ),
            }
            if resent:
                appends["resent"] = spark.createDataFrame(
                    [(i, batch) for i in resent], "id long, batch_id long"
                )
            t.commit_delta(batch, appends=appends)
            sent.update(ids)
            for i in resent:
                wm_model[i] = batch
            pair_rows.extend(new_pairs)
            batch += 1
        wm = t.resend_watermarks(spark, "id")
        live = t.live_rows(t._read_sub(spark, "pairs"), wm, "id", ["a", "b"])
        got = (
            []
            if live is None
            else sorted((r.a, r.b) for r in live.collect())
        )
        assert got == live_pairs_model(), f"after {op}"
    shutil.rmtree(str(root), ignore_errors=True)


def test_maybe_compact_resends_requires_no_arg_override(spark, tmp_path):
    """An adopter that enables threshold re-send GC without the no-arg
    compact_resends(spark) override must get a clear
    NotImplementedError naming the contract — not a TypeError from
    inside apply_batch when the threshold first trips (round-12
    ADVICE). Conforming overrides (with or without defaulted extras)
    pass the guard."""

    class _Forgot(ManifestSwapTable):
        pass  # inherits the (spark, id_col, subs) base signature

    bad = _Forgot(str(tmp_path / "bad"))
    with pytest.raises(NotImplementedError, match="compact_resends"):
        bad.maybe_compact_resends(spark, max_resent_rows=0)

    class _Conforms(ManifestSwapTable):
        def compact_resends(self, spark):
            return super().compact_resends(
                spark, "id", {"data": (["id"], None, False)}
            )

    ok = _Conforms(str(tmp_path / "ok"))
    # no resent log yet: the guard passes and the probe returns False
    assert ok.maybe_compact_resends(spark, max_resent_rows=0) is False

    class _Defaulted(ManifestSwapTable):
        def compact_resends(self, spark, dry_run=False):
            return super().compact_resends(
                spark, "id", {"data": (["id"], None, False)}
            )

    assert (
        _Defaulted(str(tmp_path / "dflt")).maybe_compact_resends(
            spark, max_resent_rows=0
        )
        is False
    )


@settings(max_examples=5, deadline=None)
@given(ops=st.lists(_ROP, min_size=1, max_size=8))
def test_as_of_reads_match_model_snapshots(spark, tmp_path_factory, ops):
    """Model-check GENERATION TIME TRAVEL under the same random
    schedules as the re-send contract test (round-13 family rollout):
    after every operation, EVERY retained generation's as-of view
    (rows + that generation's own watermark log) must equal the model
    snapshot taken when that generation was committed — later
    re-sends, physical re-send folds (which delete the live log), and
    fragment folds must never leak backwards into a travelled-to
    snapshot."""
    import shutil

    NS = 4
    root = tmp_path_factory.mktemp("tproto")
    path = str(root / "state")
    t = ManifestSwapTable(path, n_shards=NS, gc_grace_gens=50)
    model: dict[int, int] = {}  # id -> latest value
    snapshots: dict[int, dict[int, int]] = {}  # gen -> model copy
    batch = 0
    version = 0

    def _record_snapshot():
        snapshots[t._manifest()["gen"]] = dict(model)

    for op, ids in ops:
        version += 1
        if op == "crash":
            orphan = os.path.join(path, "data", f"g{batch + 99}")
            if not os.path.exists(orphan):
                os.makedirs(orphan)
                with open(os.path.join(orphan, "junk.parquet"), "wb") as fh:
                    fh.write(b"junk")
            continue
        if op == "gc":
            if t.compact_resends(
                spark, "id", {"data": (["id"], None, False)}
            ):
                _record_snapshot()  # the fold commits a generation too
        elif op == "fold":
            if t._load_manifest() is not None:
                if t.maybe_compact(spark, "data", max_fragments=1):
                    _record_snapshot()
        else:  # send / re-send
            resent = [i for i in ids if i in model]
            appends = {
                "data": spark.createDataFrame(
                    [(i, version, batch) for i in ids], "id long, v long, _b long"
                )
            }
            if resent:
                appends["resent"] = spark.createDataFrame(
                    [(i, batch) for i in resent], "id long, batch_id long"
                )
            t.commit_delta(batch, appends=appends)
            for i in ids:
                model[i] = version
            batch += 1
            _record_snapshot()
        # EVERY retained generation must still serve its own snapshot
        for gen, snap in snapshots.items():
            wm = t.resend_watermarks(spark, "id", as_of_gen=gen)
            live = t.live_rows(
                t._read_sub(spark, "data", as_of_gen=gen), wm, "id", ["id"]
            )
            got = {} if live is None else {r.id: r.v for r in live.collect()}
            assert got == snap, f"gen {gen} after {op}"
    shutil.rmtree(str(root), ignore_errors=True)
