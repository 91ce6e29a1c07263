"""Unit tests for the curation operators: DSIR importance resampling,
SemDeDup, BM25. The registered queries (q219-q221) are additionally
hash-checked against DuckDB by test_oracle_parity / the driver gate;
these tests pin the operator semantics on hand-built corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from beast_spark.operators.importance import (
    hashed_ngram_features,
    importance_select,
    ngram_importance_weights,
)
from beast_spark.operators.retrieval import bm25_scores
from beast_spark.operators.similarity import semantic_dedup


def _rnd4(x: float) -> float:
    return math.floor(x * 10_000 + 0.5) / 10_000


# ---------------------------------------------------------------- DSIR


def test_hashed_features_multiplicity_and_orders(spark):
    d = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    # instances: u:a, u:b, u:a, b:a b, b:b a  -> 5 rows; repeated u:a twice
    feats = hashed_ngram_features(d, n_buckets=1 << 20, hash_family="md5")
    assert feats.count() == 5
    # single-token doc: one unigram, zero bigrams
    one = spark.createDataFrame([(2, "solo")], "doc_id long, text string")
    assert hashed_ngram_features(one, n_buckets=64, hash_family="md5").count() == 1


def test_importance_weights_prefer_target_like_docs(spark):
    # target docs speak "tgt"; raw-only docs speak "raw"; a candidate
    # written in target language must outscore one written in raw language
    rows = (
        [(i, "tgt tok alpha beta", True) for i in range(10)]
        + [(100 + i, "raw tok gamma delta", False) for i in range(10)]
        + [(500, "tgt alpha beta tok", False), (501, "raw gamma delta tok", False)]
    )
    d = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = ngram_importance_weights(
        d, is_target=F.col("is_t"), n_buckets=4096, hash_family="md5"
    )
    got = {r["doc_id"]: r["weight"] for r in w.collect()}
    assert got[500] > got[501]
    # n_features = tokens + bigrams = 4 + 3
    nf = {r["doc_id"]: r["n_features"] for r in w.collect()}
    assert nf[500] == 7


def test_importance_select_deterministic_tiebreak(spark):
    w = spark.createDataFrame(
        [(3, 5, 1.0), (1, 5, 1.0), (2, 5, 2.0)],
        "doc_id long, n_features long, weight double",
    )
    got = importance_select(w, 2).orderBy("sel_rank").collect()
    assert [(r["doc_id"], r["sel_rank"]) for r in got] == [(2, 1), (1, 2)]


def test_importance_weights_xxhash_family_runs(spark):
    d = spark.createDataFrame(
        [(1, "a b", True), (2, "c d", False)], "doc_id long, text string, is_t boolean"
    )
    assert (
        ngram_importance_weights(d, F.col("is_t"), n_buckets=64).count() == 2
    )


# ------------------------------------------------------------ SemDeDup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_drops_later_duplicate_keeps_witness(spark):
    # one cell (single centroid); 1 and 3 duplicate 0's direction; 2 orthogonal
    data = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.001]),
        ],
    )
    centroids = _vecs(spark, [(0, [1.0, 0.0])])
    kept, dropped, capped = semantic_dedup(data, centroids, tau=0.9)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 2]
    drops = {r["vec_id"]: r["replaced_by"] for r in dropped.collect()}
    # min-id witness: both trace to 0 even though 1 also witnesses 3
    assert drops == {1: 0, 3: 0}
    assert capped.count() == 0


def test_semantic_dedup_chain_keeps_only_first(spark):
    # a~b and b~c above tau, a~c below: the earlier-witness rule drops
    # BOTH b and c (b witnesses c regardless of b's own fate)
    a = [1.0, 0.0]
    b = [math.cos(0.35), math.sin(0.35)]
    c = [math.cos(0.70), math.sin(0.70)]
    data = _vecs(spark, [(0, a), (1, b), (2, c)])
    centroids = _vecs(spark, [(0, a)])
    tau = math.cos(0.4)  # ~0.921: one step passes, two steps fail
    kept, dropped, _ = semantic_dedup(data, centroids, tau=tau)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0]
    drops = {r["vec_id"]: r["replaced_by"] for r in dropped.collect()}
    assert drops == {1: 0, 2: 1}


def test_semantic_dedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors in DIFFERENT cells survive: SemDeDup only
    # compares within a cell (the recall/cost tradeoff the paper makes)
    data = _vecs(spark, [(0, [1.0, 0.05]), (1, [1.0, -0.05])])
    centroids = _vecs(spark, [(0, [1.0, 0.1]), (1, [1.0, -0.1])])
    kept, dropped, _ = semantic_dedup(data, centroids, tau=0.5)
    assert kept.count() == 2 and dropped.count() == 0


def test_semantic_dedup_overfull_cell_dropped_and_reported(spark):
    data = _vecs(spark, [(i, [1.0, float(i) * 1e-6]) for i in range(6)])
    centroids = _vecs(spark, [(0, [1.0, 0.0])])
    kept, dropped, capped = semantic_dedup(data, centroids, tau=0.99, max_bucket=5)
    # the only cell exceeds the cap: no pairs mined, everything kept, cap reported
    assert kept.count() == 6 and dropped.count() == 0
    rows = capped.collect()
    assert len(rows) == 1 and rows[0]["bucket_size"] == 6


# ---------------------------------------------------------------- BM25


def test_bm25_hand_computed(spark):
    d = spark.createDataFrame(
        [(1, "dup spark a"), (2, "spark spark b c"), (3, "x y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_scores(d, ["dup", "spark"]).collect()}
    assert set(got) == {1, 2}  # no-hit docs absent
    idf_dup = math.log(1 + 2.5 / 1.5)
    idf_spark = math.log(1 + 1.5 / 2.5)
    # d1: dl=3=avgdl -> each term factor is exactly 1
    assert got[1]["n_hits"] == 2
    assert got[1]["score"] == _rnd4(idf_dup + idf_spark)
    # d2: tf=2, dl=4, avgdl=3
    denom = 2 + 1.2 * (1 - 0.75 + 0.75 * 4 / 3)
    assert got[2]["n_hits"] == 1
    assert got[2]["score"] == _rnd4(idf_spark * 2 * 2.2 / denom)


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    docs = [(i, "common filler words here") for i in range(20)]
    docs += [(100, "rare filler words here"), (101, "common filler words here")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(d, ["rare", "common"]).collect()}
    assert got[100] > got[101]


# ------------------------------------------------------- Gumbel sampling


def test_gumbel_sample_deterministic_and_temperature_behavior(spark):
    from beast_spark.operators.importance import (
        gumbel_topk_sample,
        importance_select,
    )

    # weights strictly distinct: at T -> 0 the greedy equivalence must be
    # exact (tied weights would be tie-broken by the noise, not doc_id)
    rows = [(i, 10, i / 10.0 - 3.0) for i in range(200)]
    w = spark.createDataFrame(rows, "doc_id long, n_features long, weight double")
    s1 = gumbel_topk_sample(w, 20, temperature=1.0).collect()
    s2 = gumbel_topk_sample(w, 20, temperature=1.0).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]  # seeded: replayable
    assert len(s1) == 20 and [r["sel_rank"] for r in s1] == list(range(1, 21))
    # a different salt draws a different sample
    s3 = gumbel_topk_sample(w, 20, temperature=1.0, seed_salt="other:").collect()
    assert {r["doc_id"] for r in s3} != {r["doc_id"] for r in s1}
    # T -> 0 recovers the greedy top-n (noise negligible vs weight/T)
    cold = gumbel_topk_sample(w, 20, temperature=1e-9).collect()
    greedy = importance_select(w, 20).collect()
    assert {r["doc_id"] for r in cold} == {r["doc_id"] for r in greedy}
    # high T: the sample is noise-driven, not a pure weight cut
    hot = gumbel_topk_sample(w, 20, temperature=1e9).collect()
    assert {r["doc_id"] for r in hot} != {r["doc_id"] for r in greedy}


def test_semantic_dedup_multiprobe_catches_boundary_pair(spark):
    from beast_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_multiprobe,
    )

    # two centroids at ±20°; a near-dup pair straddles the boundary
    # (one vector at +2°, one at -2°): single assignment splits them
    # into different cells and misses the pair, n_assign=2 posts both
    # to both cells and catches it
    c0 = [math.cos(0.35), math.sin(0.35)]
    c1 = [math.cos(-0.35), math.sin(-0.35)]
    data = _vecs(
        spark,
        [(0, [math.cos(0.035), math.sin(0.035)]),
         (1, [math.cos(-0.035), math.sin(-0.035)])],
    )
    centroids = _vecs(spark, [(0, c0), (1, c1)])
    _k1, d1, _c1 = semantic_dedup(data, centroids, tau=0.99)
    assert d1.count() == 0  # split by the cell boundary: missed
    k2, d2, _c2 = semantic_dedup_multiprobe(
        data, centroids, tau=0.99, n_assign=2
    )
    rows = d2.collect()
    assert [(r["vec_id"], r["replaced_by"]) for r in rows] == [(1, 0)]
    assert sorted(r["vec_id"] for r in k2.collect()) == [0]


def test_semantic_dedup_multiprobe_pair_scored_once(spark):
    from beast_spark.operators.similarity import (
        capped_bucket_pairs,
        ivf_probes,
        semantic_dedup_multiprobe,
    )

    # both vectors share BOTH cells
    data = _vecs(spark, [(3, [1.0, 0.0]), (7, [1.0, 1e-4])])
    centroids = _vecs(spark, [(0, [1.0, 0.01]), (1, [1.0, -0.01])])
    # observe the PRE-aggregation candidate set the operator scores: the
    # raw per-cell expansion emits the pair once per shared cell, and
    # the distinct() the operator applies collapses it to one — the
    # pair-scored-once contract, pinned where it is visible
    post = ivf_probes(data, centroids, 2).select(
        "cid", F.col("query_id").alias("vec_id")
    )
    raw, _ = capped_bucket_pairs(post, ["cid"], "vec_id", 10_000)
    assert raw.count() == 2 and raw.distinct().count() == 1
    _k, dropped, _c = semantic_dedup_multiprobe(
        data, centroids, tau=0.99, n_assign=2
    )
    rows = dropped.collect()
    assert len(rows) == 1 and rows[0]["vec_id"] == 7 and rows[0]["replaced_by"] == 3
