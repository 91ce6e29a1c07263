"""Streamed curation maintainers: the DSIR importance model and the
BM25 inverted index must equal their batch builders after every prefix
of micro-batches, replays must be no-ops, frozen-config drift must
raise, and the lexical serving read must prune to the probed shards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from beast_spark.operators.importance import ngram_importance_weights
from beast_spark.operators.retrieval import bm25_scores

DOC_DDL = "doc_id long, text string, lang string"

ROWS = [
    (1, "tgt alpha beta tok", "en"),
    (2, "raw gamma delta tok", "fr"),
    (3, "tgt tgt alpha", "en"),
    (4, "gamma beta raw", "de"),
    (5, "alpha delta tgt beta", "en"),
    (6, "raw raw gamma", "fr"),
    (7, "tok tok tgt", "en"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_DDL)


def _weights_set(df):
    return {(r["doc_id"], r["n_features"], r["weight"]) for r in df.collect()}


# -------------------------------------------------- DSIR model maintainer


def test_streamed_dsir_model_equals_batch_per_prefix(spark, tmp_path):
    from beast_spark.streaming.importance import ImportanceModelMaintainer

    # xxhash64 here, md5 in the registered q222: the equivalence must
    # hold for BOTH hash families (same additive-count argument)
    m = ImportanceModelMaintainer(
        str(tmp_path / "state"),
        target_predicate="lang = 'en'",
        n_buckets=256,
        hash_family="xxhash64",
    )
    seen = []
    for b in range(3):
        batch = [r for r in ROWS if r[0] % 3 == b]
        seen += batch
        m.apply_batch(_docs(spark, batch), b)
        got = _weights_set(m.score(_docs(spark, seen)))
        want = _weights_set(
            ngram_importance_weights(
                _docs(spark, seen), F.col("lang") == "en", n_buckets=256
            )
        )
        assert got == want and got, f"prefix {b}"

    # replay of an applied batch id: no double counting
    before = _weights_set(m.score(_docs(spark, seen)))
    m.apply_batch(_docs(spark, ROWS[:2]), 2)
    assert _weights_set(m.score(_docs(spark, seen))) == before


def test_dsir_scores_documents_with_unseen_buckets(spark, tmp_path):
    """A NEW document whose n-grams hash to buckets the model fit never
    saw must still score (the smoothed zero-count ratio), with the full
    n_features count — the model is always exactly B rows."""
    from beast_spark.streaming.importance import ImportanceModelMaintainer

    m = ImportanceModelMaintainer(
        str(tmp_path / "state"),
        target_predicate="lang = 'en'",
        n_buckets=4096,  # big B: fresh tokens land in unoccupied buckets
    )
    m.apply_batch(_docs(spark, ROWS[:4]), 0)
    assert m.read_model(spark).count() == 4096
    fresh = _docs(spark, [(99, "zzqx wvyu plomk", "en")])
    got = m.score(fresh).collect()
    assert len(got) == 1
    assert got[0]["n_features"] == 5  # 3 unigrams + 2 bigrams, none dropped
    # all-unseen features share the one zero-count smoothed log-ratio, so
    # the mean equals it exactly; just pin that it is finite and negative
    # (unseen in target => ratio below the corpus-mass prior)
    assert got[0]["weight"] is not None


def test_dsir_changed_featurization_rejected(spark, tmp_path):
    from beast_spark.streaming.importance import ImportanceModelMaintainer

    m = ImportanceModelMaintainer(
        str(tmp_path / "state"), target_predicate="lang = 'en'"
    )
    m.apply_batch(_docs(spark, ROWS[:3]), 0)
    for other in (
        ImportanceModelMaintainer(
            str(tmp_path / "state"), target_predicate="lang = 'fr'"
        ),
        ImportanceModelMaintainer(
            str(tmp_path / "state"), target_predicate="lang = 'en'", n_buckets=64
        ),
    ):
        with pytest.raises(ValueError, match="featurization"):
            other.apply_batch(_docs(spark, ROWS[3:]), 1)
        with pytest.raises(ValueError, match="featurization"):
            other.score(_docs(spark, ROWS))


def test_dsir_empty_state_read_raises(spark, tmp_path):
    from beast_spark.streaming.importance import ImportanceModelMaintainer

    m = ImportanceModelMaintainer(
        str(tmp_path / "state"), target_predicate="lang = 'en'"
    )
    with pytest.raises(ValueError, match="no documents ingested"):
        m.score(_docs(spark, ROWS))


# ------------------------------------------------ lexical index maintainer


TERMS = ["tgt", "gamma"]


def _scores_set(df):
    return {(r["doc_id"], r["n_hits"], r["score"]) for r in df.collect()}


def test_streamed_bm25_equals_batch_per_prefix(spark, tmp_path):
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    seen = []
    for b in range(3):
        batch = [r for r in ROWS if r[0] % 3 == b]
        seen += batch
        m.apply_batch(_docs(spark, batch), b)
        got = _scores_set(m.bm25(spark, TERMS))
        want = _scores_set(bm25_scores(_docs(spark, seen), TERMS))
        assert got == want and got, f"prefix {b}"

    # replay: no double counting (consts, postings, doclen all stable)
    before = _scores_set(m.bm25(spark, TERMS))
    m.apply_batch(_docs(spark, ROWS[:2]), 1)
    assert _scores_set(m.bm25(spark, TERMS)) == before


def test_bm25_serving_read_prunes_to_probed_shards(spark, tmp_path):
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    for b in range(2):
        m.apply_batch(_docs(spark, [r for r in ROWS if r[0] % 2 == b]), b)

    tdf = spark.createDataFrame([(t,) for t in TERMS], "term string")
    tshards = set(m.touched_shards(tdf, "term"))
    res = m.bm25(spark, TERMS)
    hit_shards = set(
        m.touched_shards(res.select("doc_id"), "doc_id")
    )
    # every file the serving plan reads lies in a probed postings shard,
    # a hit doclen shard, or the consts sub-table (inputFiles returns
    # file:// URIs — substring-match the leaf paths, the eventstats
    # discipline)
    allowed = {
        leaf.rstrip("/")
        for leaf in (
            m.sub_leaves("postings", sorted(tshards))
            + m.sub_leaves("doclen", sorted(hit_shards))
            + m.sub_leaves("consts", [0])
        )
    }
    for f in res.inputFiles():
        assert any(a in f for a in allowed), f"unpruned read: {f}"


def test_bm25_cross_batch_resend_supersedes(spark, tmp_path):
    """The q232 contract: a doc re-sent in a LATER batch with new text
    supersedes its postings/length AND leaves the corpus constants
    (N, avgdl — the idf inputs) exactly as a batch rebuild over the
    latest texts computes them."""
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    wrong = [(1, "corrupted corrupted corrupted", "en"), (3, "corrupted", "en")]
    m.apply_batch(_docs(spark, wrong + [r for r in ROWS if r[0] in (2, 4)]), 0)
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (5, 6, 7)]), 1)
    # the corrective re-send: true texts for docs 1 and 3
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (1, 3)]), 2)
    got = _scores_set(m.bm25(spark, TERMS))
    want = _scores_set(bm25_scores(_docs(spark, ROWS), TERMS))
    assert got == want and got
    # consts corrected exactly: N == 7, total_dl == sum of latest dls
    consts = m.read_consts(spark).collect()[0]
    assert consts["n_docs"] == len(ROWS)
    assert consts["total_dl"] == sum(len(r[1].split()) for r in ROWS)
    # watermark log + replay idempotence
    assert {
        (r["doc_id"], r["batch_id"]) for r in m.read_resent(spark).collect()
    } == {(1, 2), (3, 2)}
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (1, 3)]), 2)
    assert _scores_set(m.bm25(spark, TERMS)) == got
    # an identical-payload retry is also stable
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] == 5]), 3)
    assert _scores_set(m.bm25(spark, TERMS)) == want
    consts = m.read_consts(spark).collect()[0]
    assert consts["n_docs"] == len(ROWS)
    assert consts["total_dl"] == sum(len(r[1].split()) for r in ROWS)


def test_bm25_no_hit_terms_returns_empty(spark, tmp_path):
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    m.apply_batch(_docs(spark, ROWS[:4]), 0)
    res = m.bm25(spark, ["zzz_not_in_corpus"])
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == ["doc_id", "n_hits", "score"]


def test_bm25_empty_state_and_changed_config_raise(spark, tmp_path):
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    with pytest.raises(ValueError, match="no documents ingested"):
        m.bm25(spark, TERMS)
    m.apply_batch(_docs(spark, ROWS[:4]), 0)
    other = LexicalIndexMaintainer(str(tmp_path / "state"), text_col="lang")
    with pytest.raises(ValueError, match="column "):
        other.apply_batch(_docs(spark, ROWS[4:]), 1)
    with pytest.raises(ValueError, match="column "):
        other.bm25(spark, TERMS)


# -------------------------------------------------- semantic-dedup maintainer


import math
import random


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(theta):
    return [math.cos(theta), math.sin(theta)]


def _semdedup_fixture():
    """Two well-separated direction families with planted duplicates —
    ids deliberately NOT in arrival order so cross-batch lower-id
    arrivals exercise the re-witness merge."""
    rows = []
    for i in range(24):
        base = 0.0 if i % 2 == 0 else 1.5  # two cells
        rows.append((i, _unit(base + (i % 5) * 0.02)))
    return rows


def _batch_action(spark, rows, cent_rows, tau, max_bucket=10_000):
    from beast_spark.operators.similarity import semantic_dedup

    _k, dropped, _c = semantic_dedup(
        _vecs(spark, rows), _vecs(spark, cent_rows), tau=tau, max_bucket=max_bucket
    )
    return {tuple(r) for r in dropped.select(
        "vec_id", "cid", "replaced_by", "cos_sim").collect()}


def test_streamed_semdedup_equals_batch_per_prefix(spark, tmp_path):
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    rows = _semdedup_fixture()
    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.999
    )
    rnd_ = random.Random(7)
    shuffled = rows[:]
    rnd_.shuffle(shuffled)  # arrival order != id order: re-witness leg live
    seen = []
    for b in range(3):
        batch = shuffled[b * 8 : (b + 1) * 8]
        seen += batch
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_action(spark, seen, cent, tau=0.999)
        assert got == want, f"prefix {b}"
    assert got  # non-vacuous: duplicates were actually found
    # kept = all minus dropped
    kept = {r["vec_id"] for r in m.read_kept(spark).collect()}
    assert kept == {r[0] for r in rows} - {t[0] for t in got}
    # replay: no-op
    m.apply_batch(_vecs(spark, shuffled[:8]), 1)
    assert {tuple(r) for r in m.read_dropped(spark).collect()} == got


def test_streamed_semdedup_lower_id_rewitnesses_stored_row(spark, tmp_path):
    """A later batch carrying a LOWER id must (a) drop an already-stored
    higher id and (b) improve an existing dropped row's witness."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.9
    )
    v = _unit(0.01)
    # batch 0: ids 5 and 9 — 5 witnesses 9
    m.apply_batch(_vecs(spark, [(5, v), (9, v)]), 0)
    d0 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d0 == {9: 5}
    # batch 1: id 2 arrives — drops 5 AND becomes 9's min witness
    m.apply_batch(_vecs(spark, [(2, v)]), 1)
    d1 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d1 == {9: 2, 5: 2}


def test_streamed_semdedup_cap_retracts_and_reports_once(spark, tmp_path):
    """A cell CROSSING the cap retracts the rows it mined while under it
    (the batch operator mines nothing for an over-cap cell, and
    streamed == batch is the contract), reports one accounting row per
    touching batch, and does NOT re-report on batches that leave the
    cell untouched."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.9, max_bucket=3
    )
    v = _unit(0.01)
    m.apply_batch(_vecs(spark, [(i, v) for i in range(3)]), 0)  # at cap: mines
    assert m.read_dropped(spark).count() == 2  # 1 and 2 dropped against 0
    m.apply_batch(_vecs(spark, [(i, v) for i in range(3, 6)]), 1)  # crosses
    # the crossing retracts batch 0's rows: exactly the batch operator's
    # result over all six vectors (over-cap cell mines nothing)
    assert m.read_dropped(spark).count() == 0
    assert _batch_action(
        spark, [(i, v) for i in range(6)], cent, tau=0.9, max_bucket=3
    ) == set()
    capped = m.read_capped(spark).collect()
    assert len(capped) == 1
    assert capped[0]["bucket_size"] == 6 and capped[0]["batch_id"] == 1
    # a batch touching ONLY the other cell: no re-report of cell 0
    m.apply_batch(_vecs(spark, [(10, _unit(1.5))]), 2)
    assert m.read_capped(spark).count() == 1
    # a batch touching the capped cell again: one more accounting row,
    # still no pairs
    m.apply_batch(_vecs(spark, [(11, v)]), 3)
    rows = sorted(
        (r["batch_id"], r["bucket_size"]) for r in m.read_capped(spark).collect()
    )
    assert rows == [(1, 6), (3, 7)]
    assert m.read_dropped(spark).count() == 0


def _batch_mp_action(spark, rows, cent_rows, tau, n_assign=2, max_bucket=None):
    from beast_spark.operators.similarity import semantic_dedup_multiprobe

    _k, dropped, _c = semantic_dedup_multiprobe(
        _vecs(spark, rows),
        _vecs(spark, cent_rows),
        tau=tau,
        n_assign=n_assign,
        max_bucket=max_bucket,
    )
    return {
        tuple(r)
        for r in dropped.select("vec_id", "replaced_by", "cos_sim").collect()
    }


def test_streamed_multiprobe_semdedup_equals_batch_per_prefix(spark, tmp_path):
    """The q230 contract: the multi-probe maintainer over shuffled
    batches equals semantic_dedup_multiprobe over every prefix."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    rows = _semdedup_fixture()
    # three cells so "2 nearest of" is a real choice
    cent = [(0, _unit(0.0)), (1, _unit(0.75)), (2, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.999, n_assign=2
    )
    rnd_ = random.Random(11)
    shuffled = rows[:]
    rnd_.shuffle(shuffled)
    seen = []
    for b in range(3):
        batch = shuffled[b * 8 : (b + 1) * 8]
        seen += batch
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_mp_action(spark, seen, cent, tau=0.999)
        assert got == want, f"prefix {b}"
    assert got  # non-vacuous
    kept = {r["vec_id"] for r in m.read_kept(spark).collect()}
    assert kept == {r[0] for r in rows} - {t[0] for t in got}
    # replay: no-op
    m.apply_batch(_vecs(spark, shuffled[:8]), 1)
    assert {tuple(r) for r in m.read_dropped(spark).collect()} == got
    # n_assign is part of the state marker
    other = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.999, n_assign=3
    )
    with pytest.raises(ValueError, match="must not mix"):
        other.read_dropped(spark)


def test_streamed_multiprobe_cap_crossing_recomputes_victims(spark, tmp_path):
    """A cell crossing the cap retracts exactly the rows ONLY it
    supported: a pair also sharing an under-cap cell survives, and the
    crossing batch's result equals the batch operator's (which mines
    nothing for the over-cap cell but everything for the others)."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(0.6)), (2, _unit(1.3))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "cent"),
        tau=0.75,
        n_assign=2,
        max_bucket=2,
    )
    # x posts to {c0, c1}; y posts to {c1, c2}; only shared cell is c1,
    # and cos(x, y) = cos(0.65) ~ 0.796 >= tau
    x = (1, _unit(0.15))
    y = (5, _unit(0.80))
    m.apply_batch(_vecs(spark, [x, y]), 0)
    d0 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d0 == {5: 1}  # mined via c1 while at cap
    # z posts to {c1, c2} and is near-identical to y: c1 goes to 3 > 2
    # (crosses), c2 to 2 (at cap, still mined)
    z = (7, _unit(0.82))
    m.apply_batch(_vecs(spark, [z]), 1)
    d1 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    # (5,1) was supported only by c1 -> retracted; (7,5) survives via c2
    assert d1 == {7: 5}
    assert d1 == {
        t[0]: t[1]
        for t in _batch_mp_action(
            spark, [x, y, z], cent, tau=0.75, max_bucket=2
        )
    }
    capped = m.read_capped(spark).collect()
    assert [(r["cid"], r["bucket_size"], r["batch_id"]) for r in capped] == [
        (1, 3, 1)
    ]


def test_streamed_semdedup_resend_cascade(spark, tmp_path):
    """The re-send cascade (round-11): a re-sent vector with a NEW
    payload invalidates its own row, re-witnesses or UNDROPS rows
    citing it, and the streamed state equals the batch operator over
    each id's LATEST payload after every corrective batch."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.99
    )
    rows0 = [(2, _unit(0.01)), (5, _unit(0.01)), (9, _unit(0.012))]
    m.apply_batch(_vecs(spark, rows0), 0)
    d0 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d0 == {5: 2, 9: 2}
    # batch 1: id 2 re-sent FAR AWAY (moves to the other cell) — its
    # witness citations cascade: 5 undrops (9 is not < 5), 9 re-witnesses
    # to 5, 2 has no row
    m.apply_batch(_vecs(spark, [(2, _unit(1.49))]), 1)
    d1 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d1 == {9: 5}
    latest1 = [(2, _unit(1.49)), (5, _unit(0.01)), (9, _unit(0.012))]
    assert d1 == {
        t[0]: t[2] for t in _batch_action(spark, latest1, cent, tau=0.99)
    }
    # batch 2: id 9 re-sent NEXT TO id 2's new position — 9's row flips
    # to the other cell with witness 2; 5 stays undropped
    m.apply_batch(_vecs(spark, [(9, _unit(1.488))]), 2)
    d2 = {
        r["vec_id"]: (r["cid"], r["replaced_by"])
        for r in m.read_dropped(spark).collect()
    }
    latest2 = [(2, _unit(1.49)), (5, _unit(0.01)), (9, _unit(1.488))]
    assert d2 == {
        t[0]: (t[1], t[2]) for t in _batch_action(spark, latest2, cent, tau=0.99)
    }
    assert set(d2) == {9}
    # kept = latest payloads minus dropped; occupancy == live members
    kept = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in m.read_kept(spark).collect()
    }
    assert kept == {(i, tuple(v)) for i, v in latest2 if i != 9}
    occ = {r["cid"]: r["n_exist"] for r in (
        m._read_sub(spark, "occupancy").collect()
    )}
    live = {
        r["cid"]: r["n"]
        for r in m.read_members(spark)
        .groupBy("cid")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == live
    # the watermark log + replay idempotence
    assert {
        (r["vec_id"], r["batch_id"]) for r in m._read_sub(spark, "resent").collect()
    } == {(2, 1), (9, 2)}
    m.apply_batch(_vecs(spark, [(9, _unit(1.488))]), 2)
    assert {
        r["vec_id"]: (r["cid"], r["replaced_by"])
        for r in m.read_dropped(spark).collect()
    } == d2


def test_streamed_semdedup_resend_equals_batch_per_prefix(spark, tmp_path):
    """Interleaved corrective re-sends across shuffled batches: after
    every batch the action table equals the batch operator over each
    id's LATEST payload so far."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    rows = _semdedup_fixture()
    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.999
    )
    # ids 0..7 first arrive CORRUPTED (rotated a quarter turn)
    corrupted = [(i, _unit(0.8 + (i % 5) * 0.02)) for i in range(8)]
    batches = [
        corrupted + rows[8:16],   # 0: wrong payloads + clean middle
        rows[16:24],              # 1: clean tail
        rows[:8],                 # 2: the corrective re-send
    ]
    latest: dict = {}
    for b, batch in enumerate(batches):
        for i, v in batch:
            latest[i] = v
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_action(
            spark, [(i, v) for i, v in latest.items()], cent, tau=0.999
        )
        assert got == want, f"prefix {b}"
    assert got  # non-vacuous after the corrective batch


def test_streamed_semdedup_changed_artifacts_rejected(spark, tmp_path):
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.9
    )
    m.apply_batch(_vecs(spark, [(1, _unit(0.0))]), 0)
    other = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.8
    )
    with pytest.raises(ValueError, match="must not mix"):
        other.apply_batch(_vecs(spark, [(2, _unit(0.0))]), 1)
    with pytest.raises(ValueError, match="must not mix"):
        other.read_dropped(spark)
    fresh = SemanticDedupMaintainer(
        str(tmp_path / "none"), str(tmp_path / "cent"), tau=0.9
    )
    with pytest.raises(ValueError, match="no vectors ingested"):
        fresh.read_dropped(spark)


def test_streamed_multiprobe_resend_cascade(spark, tmp_path):
    """The multi-probe re-send cascade (round-12, verdict missing #4):
    a re-sent vector with a NEW payload invalidates its own row,
    re-witnesses or UNDROPS rows citing it, decrements its old cells'
    occupancy per posting, and the streamed state equals
    semantic_dedup_multiprobe over each id's LATEST payload."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(0.75)), (2, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.99, n_assign=2
    )
    rows0 = [(2, _unit(0.01)), (5, _unit(0.01)), (9, _unit(0.012))]
    m.apply_batch(_vecs(spark, rows0), 0)
    d0 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d0 == {5: 2, 9: 2}
    # batch 1: id 2 re-sent FAR AWAY (different cells) — its witness
    # citations cascade: 5 undrops (9 is not < 5), 9 re-witnesses to 5
    m.apply_batch(_vecs(spark, [(2, _unit(1.49))]), 1)
    d1 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    assert d1 == {9: 5}
    latest1 = [(2, _unit(1.49)), (5, _unit(0.01)), (9, _unit(0.012))]
    assert d1 == {
        t[0]: t[1] for t in _batch_mp_action(spark, latest1, cent, tau=0.99)
    }
    # batch 2: id 9 re-sent NEXT TO id 2's new position
    m.apply_batch(_vecs(spark, [(9, _unit(1.488))]), 2)
    d2 = {r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()}
    latest2 = [(2, _unit(1.49)), (5, _unit(0.01)), (9, _unit(1.488))]
    assert d2 == {
        t[0]: t[1] for t in _batch_mp_action(spark, latest2, cent, tau=0.99)
    }
    assert set(d2) == {9}
    # kept = latest payloads minus dropped (one row per id, not posting)
    kept = {
        (r["vec_id"], tuple(r["embedding"])) for r in m.read_kept(spark).collect()
    }
    assert kept == {(i, tuple(v)) for i, v in latest2 if i != 9}
    # occupancy == live postings: countDistinct ids per cell over the
    # live member view (each id posts to n_assign cells)
    occ = {
        r["cid"]: r["n_exist"]
        for r in m._read_sub(spark, "occupancy").collect()
    }
    live = {
        r["cid"]: r["n"]
        for r in m.read_members(spark)
        .groupBy("cid")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == live
    # the watermark log + replay idempotence
    assert {
        (r["vec_id"], r["batch_id"])
        for r in m._read_sub(spark, "resent").collect()
    } == {(2, 1), (9, 2)}
    m.apply_batch(_vecs(spark, [(9, _unit(1.488))]), 2)
    assert {
        r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()
    } == d2


def test_streamed_multiprobe_resend_equals_batch_per_prefix(spark, tmp_path):
    """Interleaved corrective re-sends across shuffled multi-probe
    batches: after every batch the action table equals the batch
    operator over each id's LATEST payload so far (q234's contract)."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    rows = _semdedup_fixture()
    cent = [(0, _unit(0.0)), (1, _unit(0.75)), (2, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.999, n_assign=2
    )
    # ids 0..7 first arrive CORRUPTED (rotated toward the middle cell)
    corrupted = [(i, _unit(0.8 + (i % 5) * 0.02)) for i in range(8)]
    batches = [
        corrupted + rows[8:16],  # 0: wrong payloads + clean middle
        rows[16:24],             # 1: clean tail
        rows[:8],                # 2: the corrective re-send
    ]
    latest: dict = {}
    for b, batch in enumerate(batches):
        for i, v in batch:
            latest[i] = v
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_mp_action(
            spark, [(i, v) for i, v in latest.items()], cent, tau=0.999
        )
        assert got == want, f"prefix {b}"
    assert got  # non-vacuous after the corrective batch
    # occupancy stayed consistent with the live posting view throughout
    occ = {
        r["cid"]: r["n_exist"]
        for r in m._read_sub(spark, "occupancy").collect()
    }
    live = {
        r["cid"]: r["n"]
        for r in m.read_members(spark)
        .groupBy("cid")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert occ == live


def test_streamed_multiprobe_resend_with_crossing_same_batch(spark, tmp_path):
    """A batch that both re-sends an id AND pushes cells over the cap:
    the unified victim pool must handle the combination — here every
    cell ends over-cap, so the action table retracts to exactly the
    batch operator's (empty) result with the accounting rows present."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(0.6)), (2, _unit(1.3))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "cent"),
        tau=0.75,
        n_assign=2,
        max_bucket=2,
    )
    # x posts {c0, c1}; y posts {c1, c2}; cos(x, y) >= tau via c1
    x0, y = (1, _unit(0.15)), (5, _unit(0.80))
    m.apply_batch(_vecs(spark, [x0, y]), 0)
    assert {
        r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()
    } == {5: 1}
    # batch 1: re-send x NEXT TO y (now posts {c1, c2}) and add z there:
    # c1 held {x, y}, loses x, gains {x', z} -> 3 > 2 (crosses);
    # c2 held {y}, gains {x', z} -> 3 > 2 (crosses); c0 empties.
    m.apply_batch(_vecs(spark, [(1, _unit(0.80)), (7, _unit(0.82))]), 1)
    latest = [(1, _unit(0.80)), (5, _unit(0.80)), (7, _unit(0.82))]
    want = _batch_mp_action(spark, latest, cent, tau=0.75, max_bucket=2)
    assert want == set()  # every shared cell over-cap: mines nothing
    got = {tuple(r) for r in m.read_dropped(spark).collect()}
    assert got == want
    capped = sorted(
        (r["cid"], r["bucket_size"]) for r in m.read_capped(spark).collect()
    )
    assert capped == [(1, 3), (2, 3)]
    # occupancy: c0 vacated entirely, c1 and c2 at 3
    occ = {
        r["cid"]: r["n_exist"]
        for r in m._read_sub(spark, "occupancy").collect()
    }
    assert occ == {1: 3, 2: 3}


def test_bm25_compact_resends_read_equivalence(spark, tmp_path):
    """compact_resends on the lexical index (round-12, verdict #1):
    served BM25 identical before/after the fold, resent log truncated,
    shard layouts preserved for pruned reads, contract still live."""
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"))
    wrong = [(1, "corrupted corrupted corrupted", "en"), (3, "corrupted", "en")]
    m.apply_batch(_docs(spark, wrong + [r for r in ROWS if r[0] in (2, 4)]), 0)
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (5, 6, 7)]), 1)
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (1, 3)]), 2)
    before = _scores_set(m.bm25(spark, TERMS))
    assert before
    assert m.compact_resends(spark) is True
    assert _scores_set(m.bm25(spark, TERMS)) == before
    assert m.read_resent(spark) is None
    # superseded doclen rows physically gone: raw rows == live docs
    assert m._read_sub(spark, "doclen").count() == len(ROWS)
    assert "_b" in m._read_sub(spark, "doclen").columns  # stays contract-mode
    # consts untouched by the fold
    consts = m.read_consts(spark).collect()[0]
    assert consts["n_docs"] == len(ROWS)
    # no-op second call; a FURTHER re-send still supersedes
    assert m.compact_resends(spark) is False
    m.apply_batch(_docs(spark, [(1, "tgt gamma tgt", "en")]), 3)
    latest = [(1, "tgt gamma tgt", "en")] + [r for r in ROWS if r[0] != 1]
    assert _scores_set(m.bm25(spark, TERMS)) == _scores_set(
        bm25_scores(_docs(spark, latest), TERMS)
    )


def test_semdedup_compact_resends_read_equivalence(spark, tmp_path):
    """compact_resends on the SemDeDup maintainers (single + multi-
    probe): dropped/kept identical before/after, resent log truncated,
    stale member postings physically gone, contract still live."""
    from beast_spark.streaming.semdedup import (
        MultiProbeSemanticDedupMaintainer,
        SemanticDedupMaintainer,
    )

    cent = [(0, _unit(0.0)), (1, _unit(0.75)), (2, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    for cls, name in (
        (SemanticDedupMaintainer, "single"),
        (MultiProbeSemanticDedupMaintainer, "multi"),
    ):
        kwargs = {} if cls is SemanticDedupMaintainer else {"n_assign": 2}
        m = cls(
            str(tmp_path / f"state_{name}"),
            str(tmp_path / "cent"),
            tau=0.99,
            **kwargs,
        )
        rows0 = [(2, _unit(0.01)), (5, _unit(0.01)), (9, _unit(0.012))]
        m.apply_batch(_vecs(spark, rows0), 0)
        m.apply_batch(_vecs(spark, [(2, _unit(1.49))]), 1)  # re-send far away
        before_dropped = {tuple(r) for r in m.read_dropped(spark).collect()}
        before_kept = {
            (r["vec_id"], tuple(r["embedding"]))
            for r in m.read_kept(spark).collect()
        }
        assert m.compact_resends(spark) is True, name
        assert {
            tuple(r) for r in m.read_dropped(spark).collect()
        } == before_dropped, name
        assert {
            (r["vec_id"], tuple(r["embedding"]))
            for r in m.read_kept(spark).collect()
        } == before_kept, name
        assert m._read_sub(spark, "resent") is None, name
        # one live posting set per id: 3 ids × n_assign cells
        n_assign = getattr(m, "n_assign", 1)
        assert m._read_sub(spark, "members").count() == 3 * n_assign, name
        assert "_b" in m._read_sub(spark, "members").columns, name
        assert m.compact_resends(spark) is False, name
        # a FURTHER re-send after the fold still cascades
        m.apply_batch(_vecs(spark, [(9, _unit(1.488))]), 2)
        assert {
            (r["vec_id"], r["batch_id"])
            for r in m._read_sub(spark, "resent").collect()
        } == {(9, 2)}, name
        got = {
            r["vec_id"]: r["replaced_by"]
            for r in m.read_dropped(spark).collect()
        }
        assert got == {9: 2}, name


def test_streamed_semdedup_resend_recovers_capped_cell(spark, tmp_path):
    """The INVERSE cap crossing (round-12): a re-send decrement brings a
    previously-over cell back UNDER the cap — its live residents'
    retracted pairs must RE-MINE, so streamed == batch holds in both
    cap directions (the corner neardup documents out as no-backfill)."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.9, max_bucket=3
    )
    v = {i: _unit(0.01 * i) for i in (1, 2, 3, 4)}
    m.apply_batch(_vecs(spark, [(i, v[i]) for i in (1, 2, 3)]), 0)  # at cap
    assert {
        r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()
    } == {2: 1, 3: 1}
    m.apply_batch(_vecs(spark, [(4, v[4])]), 1)  # crosses: retract all
    assert m.read_dropped(spark).count() == 0
    # re-send 3 and 4 FAR AWAY: cell 0 decrements 4 -> 2 (recovered),
    # cell 1 gains the similar pair (3, 4)
    moved = [(3, _unit(1.49)), (4, _unit(1.5))]
    m.apply_batch(_vecs(spark, moved), 2)
    latest = [(1, v[1]), (2, v[2])] + moved
    want = _batch_action(spark, latest, cent, tau=0.9, max_bucket=3)
    got = {tuple(r) for r in m.read_dropped(spark).collect()}
    assert got == want
    # non-vacuous: the recovered cell's pair re-mined AND the new cell's
    assert {t[0]: t[2] for t in want} == {2: 1, 4: 3}
    # occupancy consistent with the live member view
    occ = {
        r["cid"]: r["n_exist"]
        for r in m._read_sub(spark, "occupancy").collect()
    }
    assert occ == {0: 2, 1: 2}


def test_streamed_multiprobe_resend_recovers_capped_cell(spark, tmp_path):
    """The inverse cap crossing on the multi-probe maintainer: the
    re-send moves an id's postings off the crossed cell, the cell
    recovers, and its residents' only-shared-cell pair re-mines."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(0.6)), (2, _unit(1.3)), (3, _unit(2.6))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "cent"),
        tau=0.75,
        n_assign=2,
        max_bucket=2,
    )
    # x posts {c0,c1}; y posts {c1,c2}; shared c1 at cap mines 5<-1
    m.apply_batch(_vecs(spark, [(1, _unit(0.15)), (5, _unit(0.80))]), 0)
    assert {
        r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()
    } == {5: 1}
    # z posts {c1,c2}: c1 crosses (3 > 2) -> (5<-1) retracted; c2 at cap
    # mines 7<-5
    m.apply_batch(_vecs(spark, [(7, _unit(0.82))]), 1)
    assert {
        r["vec_id"]: r["replaced_by"] for r in m.read_dropped(spark).collect()
    } == {7: 5}
    # re-send 7 far away (posts {c2,c3}): c1 decrements to 2 (recovered)
    # -> its residents re-mine and (5<-1) REAPPEARS; 7's old pair dies
    m.apply_batch(_vecs(spark, [(7, _unit(2.0))]), 2)
    latest = [(1, _unit(0.15)), (5, _unit(0.80)), (7, _unit(2.0))]
    want = _batch_mp_action(spark, latest, cent, tau=0.75, max_bucket=2)
    got = {tuple(r) for r in m.read_dropped(spark).collect()}
    assert got == want
    assert {t[0]: t[1] for t in want} == {5: 1}


def test_resend_gc_threshold_folds_automatically(spark, tmp_path):
    """resend_gc_rows makes the re-send GC self-driving: once the
    watermark log exceeds the threshold, the corrective batch itself
    triggers compact_resends — no operator maintenance call — and the
    served result is unchanged."""
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"), resend_gc_rows=0)
    wrong = [(1, "corrupted corrupted corrupted", "en")]
    m.apply_batch(_docs(spark, wrong + [r for r in ROWS if r[0] != 1]), 0)
    # the corrective batch logs 1 resent row > threshold 0 -> auto-fold
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] == 1]), 1)
    assert m.read_resent(spark) is None  # folded inside apply_batch
    assert m._read_sub(spark, "doclen").count() == len(ROWS)
    assert _scores_set(m.bm25(spark, TERMS)) == _scores_set(
        bm25_scores(_docs(spark, ROWS), TERMS)
    )
    # under the threshold: the log is kept (no per-trigger fold churn)
    m2 = LexicalIndexMaintainer(str(tmp_path / "state2"), resend_gc_rows=10)
    m2.apply_batch(_docs(spark, wrong + [r for r in ROWS if r[0] != 1]), 0)
    m2.apply_batch(_docs(spark, [r for r in ROWS if r[0] == 1]), 1)
    assert m2.read_resent(spark) is not None  # 1 row <= 10: not folded


@pytest.mark.parametrize("seed", [3, 17, 41])
def test_streamed_semdedup_randomized_resend_cap_interplay(spark, tmp_path, seed):
    """Randomized stress of the FULL contract surface on the
    single-assignment maintainer: a tight cap (3) over two cells, six
    scheduled batches mixing fresh ids, identical-payload retries, and
    payload-moving corrections — so cap crossings, decrement
    recoveries, witness re-computations and undrops interleave
    arbitrarily. After EVERY batch the action table must equal the
    batch operator over each id's latest payload (the exactness claim,
    both cap directions)."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    rnd_ = random.Random(seed)
    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.9, max_bucket=3
    )
    latest: dict = {}
    next_id = 0
    for b in range(6):
        batch, used = [], set()
        for _ in range(rnd_.randint(1, 4)):
            if latest and rnd_.random() < 0.5:
                i = rnd_.choice(sorted(set(latest) - used) or [None])
                if i is None:
                    continue
                if rnd_.random() < 0.5:
                    v = latest[i]  # identical-payload retry
                else:
                    # correction: move to the OTHER cell's family (the
                    # first component is cos(theta): >= 0.5 means the
                    # theta~0 family — review finding: the original
                    # condition was inverted and every "correction"
                    # stayed in its own cell, leaving the decrement/
                    # recovery legs unexercised)
                    cur = 0.0 if latest[i][0] >= 0.5 else 1.5
                    v = _unit((1.5 - cur) + rnd_.choice([0.0, 0.02, 0.04]))
            else:
                i = next_id
                next_id += 1
                v = _unit(rnd_.choice([0.0, 1.5]) + rnd_.choice([0.0, 0.02, 0.04]))
            if i in used:
                continue
            used.add(i)
            batch.append((i, v))
        if not batch:
            continue
        for i, v in batch:
            latest[i] = v
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_action(
            spark,
            [(i, v) for i, v in latest.items()],
            cent,
            tau=0.9,
            max_bucket=3,
        )
        assert got == want, f"seed {seed} batch {b}"
        # occupancy stays exact through every interleaving
        occ = {
            r["cid"]: r["n_exist"]
            for r in m._read_sub(spark, "occupancy").collect()
        }
        live = {
            r["cid"]: r["n"]
            for r in m.read_members(spark)
            .groupBy("cid")
            .agg(F.countDistinct("vec_id").alias("n"))
            .collect()
        }
        assert occ == live, f"seed {seed} batch {b}"


@pytest.mark.parametrize("seed", [7, 29])
def test_streamed_multiprobe_randomized_resend_cap_interplay(
    spark, tmp_path, seed
):
    """The multi-probe twin of the randomized stress: n_assign=2 over
    three cells with a tight cap, so an id's postings straddle cells
    and a correction moves BOTH; crossings, recoveries and cascades
    interleave. Streamed == semantic_dedup_multiprobe over latest
    payloads after every batch."""
    from beast_spark.streaming.semdedup import MultiProbeSemanticDedupMaintainer

    rnd_ = random.Random(seed)
    cent = [(0, _unit(0.0)), (1, _unit(0.75)), (2, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = MultiProbeSemanticDedupMaintainer(
        str(tmp_path / "state"),
        str(tmp_path / "cent"),
        tau=0.9,
        n_assign=2,
        max_bucket=4,
    )
    latest: dict = {}
    next_id = 0
    for b in range(5):
        batch, used = [], set()
        for _ in range(rnd_.randint(1, 3)):
            if latest and rnd_.random() < 0.5:
                pool = sorted(set(latest) - used)
                if not pool:
                    continue
                i = rnd_.choice(pool)
                if rnd_.random() < 0.4:
                    v = latest[i]  # identical-payload retry
                else:
                    v = _unit(
                        rnd_.choice([0.0, 0.75, 1.5])
                        + rnd_.choice([0.0, 0.03, 0.06])
                    )
            else:
                i = next_id
                next_id += 1
                v = _unit(
                    rnd_.choice([0.0, 0.75, 1.5]) + rnd_.choice([0.0, 0.03, 0.06])
                )
            if i in used:
                continue
            used.add(i)
            batch.append((i, v))
        if not batch:
            continue
        for i, v in batch:
            latest[i] = v
        m.apply_batch(_vecs(spark, batch), b)
        got = {tuple(r) for r in m.read_dropped(spark).collect()}
        want = _batch_mp_action(
            spark,
            [(i, v) for i, v in latest.items()],
            cent,
            tau=0.9,
            max_bucket=4,
        )
        assert got == want, f"seed {seed} batch {b}"
        occ = {
            r["cid"]: r["n_exist"]
            for r in m._read_sub(spark, "occupancy").collect()
        }
        live = {
            r["cid"]: r["n"]
            for r in m.read_members(spark)
            .groupBy("cid")
            .agg(F.countDistinct("vec_id").alias("n"))
            .collect()
        }
        assert occ == live, f"seed {seed} batch {b}"


def test_semdedup_read_resent_and_memoized_legacy(spark, tmp_path):
    """Round-13 API symmetry + cost fixes (round-12 ADVICE #4/#5):
    SemanticDedupMaintainer exposes the same public read_resent its
    neardup/lexical/ivf siblings do, and the legacy-dir probe (a
    schema read over every members fragment) runs at most once per
    maintainer instance — the IvfIndexMaintainer memoization rule."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.99
    )
    assert m.read_resent(spark) is None  # fresh: no log
    assert m._legacy(spark) is False  # fresh: contract from batch 0

    m.apply_batch(_vecs(spark, [(2, _unit(0.01)), (5, _unit(0.012))]), 0)
    m.apply_batch(_vecs(spark, [(2, _unit(1.49))]), 1)  # re-send
    assert {
        (r["vec_id"], r["batch_id"]) for r in m.read_resent(spark).collect()
    } == {(2, 1)}
    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None  # folded away again

    # the legacy probe is memoized: once resolved, further triggers'
    # probes must not rebuild a frame over the members fragments just
    # for .columns (apply_batch still reads members for the MERGE —
    # that read is the work, not the probe)
    reads = []
    orig = m._read_sub

    def counting(spark_, name, **kw):
        reads.append(name)
        return orig(spark_, name, **kw)

    m._read_sub = counting
    assert m._legacy(spark) is False
    assert m._legacy(spark) is False
    assert reads == []  # memoized: zero reads for repeat probes
    m._read_sub = orig

    # a pre-contract (unstamped) dir memoizes True on a FRESH instance
    legacy_members = m._read_sub(spark, "members").drop("_b")
    m2 = SemanticDedupMaintainer(
        str(tmp_path / "legacy"), str(tmp_path / "cent"), tau=0.99
    )
    m2.commit_delta(0, appends={"members": legacy_members})
    assert m2._legacy(spark) is True
    assert m2._legacy_mode is True  # cached for the life of the instance


def test_bm25_as_of_across_resend_and_fold(spark, tmp_path):
    """Generation time travel on the LEXICAL index (round-13 — the
    family-wide as_of_gen rollout): a retained generation serves the
    BM25 snapshot it saw — wrong text before the corrective re-send,
    corrected text after — and stays exactly reproducible ACROSS
    compact_resends, which physically deletes the live watermark log
    (the q241/IVF contract applied to the lexical adopter)."""
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    m = LexicalIndexMaintainer(str(tmp_path / "state"), gc_grace_gens=6)
    wrong = [(1, "corrupted corrupted corrupted", "en"), (3, "corrupted", "en")]
    m.apply_batch(_docs(spark, wrong + [r for r in ROWS if r[0] in (2, 4)]), 0)
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (5, 6, 7)]), 1)
    gen_wrong = m._manifest()["gen"]
    snap_wrong = _scores_set(m.bm25(spark, TERMS))
    m.apply_batch(_docs(spark, [r for r in ROWS if r[0] in (1, 3)]), 2)
    gen_fixed = m._manifest()["gen"]
    snap_fixed = _scores_set(m.bm25(spark, TERMS))
    assert snap_fixed == _scores_set(bm25_scores(_docs(spark, ROWS), TERMS))

    # pre-fold travel: each generation filtered with ITS OWN watermarks
    assert _scores_set(m.bm25(spark, TERMS, as_of_gen=gen_wrong)) == snap_wrong
    assert _scores_set(m.bm25(spark, TERMS, as_of_gen=gen_fixed)) == snap_fixed

    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None  # live log folded away
    # live read unchanged; travelled-to generations still exact, and
    # the travelled-to resent log is readable from the old manifest
    assert _scores_set(m.bm25(spark, TERMS)) == snap_fixed
    assert m.read_resent(spark, as_of_gen=gen_fixed) is not None
    assert _scores_set(m.bm25(spark, TERMS, as_of_gen=gen_fixed)) == snap_fixed
    assert _scores_set(m.bm25(spark, TERMS, as_of_gen=gen_wrong)) == snap_wrong


def test_semdedup_as_of_across_resend_and_fold(spark, tmp_path):
    """as_of_gen on the SemDeDup maintainer: the travelled-to dropped/
    kept views reproduce the generation's decisions — including the
    pre-correction world where the wrong payload's drop rows were live
    — across the physical fold."""
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    cent = [(0, _unit(0.0)), (1, _unit(1.5))]
    _vecs(spark, cent).write.parquet(str(tmp_path / "cent"))
    m = SemanticDedupMaintainer(
        str(tmp_path / "state"), str(tmp_path / "cent"), tau=0.99,
        gc_grace_gens=6,
    )
    # batch 0: id 2 arrives WRONG (far from 5/9's cluster: no drop)
    m.apply_batch(
        _vecs(spark, [(2, _unit(1.49)), (5, _unit(0.01)), (9, _unit(0.012))]), 0
    )
    gen_wrong = m._manifest()["gen"]
    snap_wrong = {tuple(r) for r in m.read_dropped(spark).collect()}
    kept_wrong = {r["vec_id"] for r in m.read_kept(spark).collect()}
    # batch 1: corrective re-send — id 2's new payload joins 5/9's
    # cluster, so the decision set changes (which id drops is the
    # maintainer's min-witness business; the test pins only that the
    # correction changed decisions and both snapshots stay exact)
    m.apply_batch(_vecs(spark, [(2, _unit(0.011))]), 1)
    gen_fixed = m._manifest()["gen"]
    snap_fixed = {tuple(r) for r in m.read_dropped(spark).collect()}
    assert snap_fixed != snap_wrong  # the correction changed decisions

    assert m.compact_resends(spark) is True
    assert m.read_resent(spark) is None
    assert {tuple(r) for r in m.read_dropped(spark).collect()} == snap_fixed
    assert {
        tuple(r) for r in m.read_dropped(spark, as_of_gen=gen_fixed).collect()
    } == snap_fixed
    assert {
        tuple(r) for r in m.read_dropped(spark, as_of_gen=gen_wrong).collect()
    } == snap_wrong
    assert {
        r["vec_id"] for r in m.read_kept(spark, as_of_gen=gen_wrong).collect()
    } == kept_wrong
