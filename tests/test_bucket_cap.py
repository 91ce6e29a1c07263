"""Degenerate-bucket guard (``max_bucket``) across the embedding-LSH
pair family — the round-9 port of ``minhash_lsh_pairs``' cap
(operators/dedup.py:541) demanded by the round-8 verdict: without it, a
boilerplate-heavy crawl that funnels millions of near-identical vectors
into one (t, bucket) cell sends the candidate self-join quadratic with
no bound and no report.

The adversarial fixture everywhere below is the all-duplicates corpus:
many exact copies of ONE vector (they all share every per-table bucket
by construction) plus a handful of distinct vectors. With a cap below
the duplicate count the family must (a) never pair the duplicates,
(b) report the dropped buckets with EXACT combined sizes — no silent
caps, and (c) leave every under-cap bucket's pairs untouched; with the
cap above the corpus size it must reproduce the uncapped result
exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beast_spark.operators.similarity import (
    capped_bucket_pairs,
    embedding_lsh_index,
    embedding_multitable_postings,
    hyperplanes_md5,
    incremental_lsh_neardup_pairs_indexed,
    incremental_multitable_neardup_pairs,
    lsh_multitable_neardup_pairs,
    lsh_neardup_pairs,
    multitable_planes,
)

DIMS = 8
DDL = "vec_id long, embedding array<double>"


def _dup_vec() -> list[float]:
    return [float(d + 1) for d in range(DIMS)]


def _distinct_vec(i: int) -> list[float]:
    # varied signs/magnitudes so the distinct vectors spread over buckets
    return [float(((i * 7 + d) % 5) - 2) + 0.25 * ((d + i) % 3) for d in range(DIMS)]


def _corpus(n_dups: int, n_distinct: int):
    rows = [(i, _dup_vec()) for i in range(n_dups)]
    rows += [(100 + i, _distinct_vec(i)) for i in range(n_distinct)]
    return rows


def _pairset(df):
    return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}


def test_capped_bucket_pairs_drops_and_reports(spark):
    post = spark.createDataFrame(
        [("b1", i) for i in range(5)] + [("b2", 10), ("b2", 11), ("b3", 20)],
        "bucket string, id long",
    )
    pairs, dropped = capped_bucket_pairs(post, ["bucket"], "id", max_bucket=4)
    assert {(r.vec1, r.vec2) for r in pairs.collect()} == {(10, 11)}
    assert [(r.bucket, r.bucket_size) for r in dropped.collect()] == [("b1", 5)]


def test_lsh_neardup_pairs_all_duplicates_capped(spark):
    planes = hyperplanes_md5(DIMS, 4)
    data = spark.createDataFrame(_corpus(35, 10), DDL)
    capped, dropped = lsh_neardup_pairs(
        data, dims=DIMS, threshold=0.0, planes=planes, max_bucket=20, with_dropped=True
    )
    capped_set = _pairset(capped)
    # (a) the 35 duplicates never pair with anything — their bucket is
    # dropped, and a duplicate can only meet a partner in that bucket
    assert not any(r[0] < 100 or r[1] < 100 for r in capped_set)
    # (b) exact accounting: ONE dropped bucket holding the 35 dups plus
    # whichever distinct vectors landed with them
    drops = dropped.collect()
    assert len(drops) == 1 and drops[0].bucket_size >= 35
    uncapped = _pairset(lsh_neardup_pairs(data, dims=DIMS, threshold=0.0, planes=planes))
    # (c) capping only removes pairs of the dropped bucket
    assert capped_set < uncapped
    removed_ids = {
        r.vec_id
        for r in embedding_lsh_index(data, planes)
        .filter(F.col("bucket") == drops[0].bucket)
        .collect()
    }
    assert uncapped - capped_set == {
        p for p in uncapped if p[0] in removed_ids and p[1] in removed_ids
    }
    # (d) a cap above the corpus size is the identity
    assert (
        _pairset(
            lsh_neardup_pairs(
                data, dims=DIMS, threshold=0.0, planes=planes, max_bucket=100
            )
        )
        == uncapped
    )


def test_multitable_pairs_all_duplicates_capped(spark):
    tables = multitable_planes(DIMS, 3, 4)
    data = spark.createDataFrame(_corpus(30, 8), DDL)
    capped, dropped = lsh_multitable_neardup_pairs(
        data, dims=DIMS, threshold=0.0, tables=tables, max_bucket=20, with_dropped=True
    )
    capped_set = _pairset(capped)
    assert not any(r[0] < 100 or r[1] < 100 for r in capped_set)
    # every one of the L=4 tables holds the duplicates' bucket once
    drops = dropped.collect()
    assert len(drops) == 4
    assert sorted(r.t for r in drops) == [0, 1, 2, 3]
    assert all(r.bucket_size >= 30 for r in drops)
    uncapped = _pairset(
        lsh_multitable_neardup_pairs(data, dims=DIMS, threshold=0.0, tables=tables)
    )
    assert capped_set < uncapped
    assert (
        _pairset(
            lsh_multitable_neardup_pairs(
                data, dims=DIMS, threshold=0.0, tables=tables, max_bucket=1000
            )
        )
        == uncapped
    )


def test_incremental_indexed_combined_occupancy_cap(spark):
    """The incremental form drops on COMBINED (increment + probed index)
    occupancy — the bucket a capped batch rebuild over everything-so-far
    would drop — and reports the combined size exactly."""
    planes = hyperplanes_md5(DIMS, 4)
    old = spark.createDataFrame(_corpus(15, 6), DDL)
    inc_rows = [(50 + i, _dup_vec()) for i in range(10)]
    inc = spark.createDataFrame(inc_rows, DDL)
    index = embedding_lsh_index(old, planes)

    # 15 existing + 10 new duplicates = 25 (+ any distinct co-bucketed)
    # > cap 20 → dropped, reported with the combined size
    _, pairs, dropped = incremental_lsh_neardup_pairs_indexed(
        index, inc, dims=DIMS, threshold=0.0, planes=planes,
        max_bucket=20, with_dropped=True,
    )
    pair_ids = {r.vec1 for r in pairs.collect()} | {r.vec2 for r in pairs.collect()}
    assert not any(i < 100 for i in pair_ids)  # no duplicate ever pairs
    drops = dropped.collect()
    assert len(drops) == 1 and drops[0].bucket_size >= 25
    dup_bucket = drops[0].bucket
    exact = (
        index.filter(F.col("bucket") == dup_bucket).count()
        + embedding_lsh_index(inc, planes).filter(F.col("bucket") == dup_bucket).count()
    )
    assert drops[0].bucket_size == exact

    # cap above the combined size → identical to the unguarded run
    _, unguarded = incremental_lsh_neardup_pairs_indexed(
        index, inc, dims=DIMS, threshold=0.0, planes=planes
    )
    _, wide, wide_drop = incremental_lsh_neardup_pairs_indexed(
        index, inc, dims=DIMS, threshold=0.0, planes=planes,
        max_bucket=1000, with_dropped=True,
    )
    assert _pairset(wide) == _pairset(unguarded)
    assert wide_drop.count() == 0


def test_incremental_multitable_combined_occupancy_cap(spark):
    tables = multitable_planes(DIMS, 3, 3)
    old = spark.createDataFrame(_corpus(15, 6), DDL)
    inc = spark.createDataFrame([(50 + i, _dup_vec()) for i in range(10)], DDL)
    postings = embedding_multitable_postings(old, tables)
    vectors = old.select("vec_id", "embedding").withColumn(
        "nrm",
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
        ),
    )
    new_post, new_vec, pairs, dropped = incremental_multitable_neardup_pairs(
        postings, vectors, inc, dims=DIMS, threshold=0.0, tables=tables,
        max_bucket=20, with_dropped=True,
    )
    try:
        pair_ids = {r.vec1 for r in pairs.collect()} | {r.vec2 for r in pairs.collect()}
        assert not any(i < 100 for i in pair_ids)
        drops = dropped.collect()
        # the duplicates' bucket is over-cap in EVERY table: 15+10 = 25
        assert sorted(r.t for r in drops) == [0, 1, 2]
        assert all(r.bucket_size >= 25 for r in drops)
    finally:
        new_post.unpersist()
        new_vec.unpersist()


def test_maintainer_records_capped_buckets(spark, tmp_path):
    """EmbeddingNearDupMaintainer threads the cap through and commits
    the accounting rows atomically with the (capped) pair set; a
    healthy stream never grows a 'capped' sub-table."""
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    m = EmbeddingNearDupMaintainer(
        str(tmp_path / "state"), dims=DIMS, threshold=0.0,
        n_planes=3, n_tables=2, max_bucket=15,
    )
    # healthy: 10 dups + ≤4 co-bucketed distinct = ≤14 ≤ 15
    b0 = spark.createDataFrame(_corpus(10, 4), DDL)
    m.apply_batch(b0, 0)
    assert m.read_capped(spark) is None  # no silent caps ≠ empty-file churn
    healthy_pairs = m.read_pairs(spark).count()
    assert healthy_pairs > 0  # duplicates pair while under the cap

    # 8 more duplicates: combined ≥ 18 > 15 in both tables → capped + logged
    b1 = spark.createDataFrame([(50 + i, _dup_vec()) for i in range(8)], DDL)
    m.apply_batch(b1, 1)
    capped = m.read_capped(spark)
    assert capped is not None
    rows = capped.collect()
    assert sorted(r.t for r in rows) == [0, 1]
    assert all(r.bucket_size >= 18 and r.batch_id == 1 for r in rows)
    # batch 1's duplicates contributed no pairs, the healthy set is intact
    assert m.read_pairs(spark).count() >= healthy_pairs
    b1_id = F.col("vec1").between(50, 57) | F.col("vec2").between(50, 57)
    assert m.read_pairs(spark).filter(b1_id).count() == 0


def test_minhash_with_dropped_reports_capped_bands(spark):
    """The MinHash family's cap gains the same accounting contract
    (round-9 symmetry with the embedding family): an all-duplicates
    corpus drops one bucket PER BAND, each reported with its exact
    size; pairs among the duplicates vanish, distinct docs unaffected."""
    from beast_spark.operators.dedup import minhash_lsh_pairs

    fixed = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [(i, fixed) for i in range(30)] + [
        (100 + i, f"unique text number {i} with words w{i} x{i} y{i} z{i}")
        for i in range(5)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs, dropped = minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, threshold=0.0,
        max_bucket=20, hash_family="md5", with_dropped=True,
    )
    drops = dropped.collect()
    assert len(drops) == 8  # the duplicates' bucket in every band
    assert sorted(r.band for r in drops) == list(range(8))
    assert all(r.bucket_size == 30 for r in drops)
    pair_ids = {r.doc1 for r in pairs.collect()} | {r.doc2 for r in pairs.collect()}
    assert not any(i < 100 for i in pair_ids)
    # a cap above the corpus is the identity, and dropped is empty
    wide, wide_drop = minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, threshold=0.0,
        max_bucket=1000, hash_family="md5", with_dropped=True,
    )
    assert wide_drop.count() == 0
    assert wide.filter((F.col("doc1") < 100) & (F.col("doc2") < 100)).count() > 0


def test_simhash_pairs_all_duplicates_capped(spark):
    """SimHash joins on (band, chunk) — the same degenerate-cell hazard:
    an all-identical corpus collapses into one chunk per band. The cap
    drops and reports those cells; distinct documents are untouched."""
    from beast_spark.operators.dedup import simhash_pairs

    fixed = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, fixed) for i in range(25)] + [
        (100 + i, f"some other document {i} talking about q{i} r{i} s{i}")
        for i in range(4)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs, dropped = simhash_pairs(
        d, "doc_id", "text", max_hamming=64, hash_family="md5",
        max_bucket=20, with_dropped=True,
    )
    drops = dropped.collect()
    # identical docs share all 4 band chunks → 4 dropped cells of 25
    assert sorted(r.band for r in drops) == [0, 1, 2, 3]
    assert all(r.bucket_size == 25 for r in drops)
    pair_ids = {r.doc1 for r in pairs.collect()} | {r.doc2 for r in pairs.collect()}
    assert not any(i < 100 for i in pair_ids)
    # wide cap = identity with empty accounting
    wide, wide_drop = simhash_pairs(
        d, "doc_id", "text", max_hamming=64, hash_family="md5",
        max_bucket=1000, with_dropped=True,
    )
    assert wide_drop.count() == 0
    assert wide.filter((F.col("doc1") < 100) & (F.col("doc2") < 100)).count() > 0


def test_incremental_minhash_with_dropped_reports_union_size(spark):
    """Both incremental MinHash forms cap on the UNION bucket size;
    with_dropped must report exactly the increment-touched buckets the
    cap removed."""
    from beast_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs,
        incremental_minhash_pairs_indexed,
        minhash_signatures,
    )

    fixed = "alpha beta gamma delta epsilon zeta eta theta iota"
    old_rows = [(i, fixed) for i in range(15)] + [
        (200 + i, f"old distinct {i} doc about topic t{i} u{i} v{i}") for i in range(3)
    ]
    new_rows = [(50 + i, fixed) for i in range(10)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    old_sigs = minhash_signatures(old, "doc_id", "text", k=16, hash_family="md5")

    # union size 25 > cap 20 in every band → 8 dropped, no new pairs
    _, pairs, dropped = incremental_minhash_pairs(
        old_sigs, new, "doc_id", "text", k=16, bands=8, threshold=0.0,
        max_bucket=20, hash_family="md5", with_dropped=True,
    )
    drops = dropped.collect()
    assert sorted(r.band for r in drops) == list(range(8))
    assert all(r.bucket_size == 25 for r in drops)
    assert pairs.count() == 0  # the duplicates were the only new docs

    # the indexed form reports the same accounting from the persisted index
    index = band_signatures(old_sigs, k=16, bands=8, hash_family="md5")
    _, _, ipairs, idropped = incremental_minhash_pairs_indexed(
        index, old_sigs, new, "doc_id", "text", k=16, bands=8, threshold=0.0,
        max_bucket=20, hash_family="md5", with_dropped=True,
    )
    idrops = idropped.collect()
    assert sorted(r.band for r in idrops) == list(range(8))
    assert all(r.bucket_size == 25 for r in idrops)
    assert ipairs.count() == 0

    # wide cap: pairs appear, accounting empty — both forms
    _, wide, wd = incremental_minhash_pairs(
        old_sigs, new, "doc_id", "text", k=16, bands=8, threshold=0.0,
        max_bucket=1000, hash_family="md5", with_dropped=True,
    )
    assert wd.count() == 0 and wide.count() > 0


def test_incremental_multitable_occupancy_path_matches_recompute(spark):
    """The maintained-occupancy gate (round-10) must size buckets
    EXACTLY like the recompute gate — including the overlapping
    re-append case, where the overlap count is re-derived from the
    id-keyed vectors table instead of any pass over the postings. A
    re-sent id counts once (batch collect_set semantics)."""
    from pyspark.sql import functions as F2

    tables = multitable_planes(DIMS, 3, 3)
    old = spark.createDataFrame(_corpus(15, 6), DDL)
    # increment: 9 fresh duplicates + id 0 RE-SENT (overlap)
    inc = spark.createDataFrame(
        [(0, _dup_vec())] + [(50 + i, _dup_vec()) for i in range(9)], DDL
    )
    postings = embedding_multitable_postings(old, tables)
    vectors = old.select("vec_id", "embedding").withColumn(
        "nrm",
        F2.sqrt(F2.aggregate("embedding", F2.lit(0.0), lambda a, x: a + x * x)),
    )
    occ = postings.groupBy("t", "bucket").agg(
        F2.countDistinct("vec_id").cast("long").alias("n_exist")
    )

    def run(**kw):
        np_, nv_, pairs, dropped = incremental_multitable_neardup_pairs(
            postings, vectors, inc, dims=DIMS, threshold=0.0, tables=tables,
            max_bucket=20, with_dropped=True, **kw,
        )
        try:
            return (
                {(r.t, r.bucket, r.bucket_size) for r in dropped.collect()},
                _pairset(pairs),
            )
        finally:
            np_.unpersist()
            nv_.unpersist()

    d_occ, p_occ = run(existing_occupancy=occ)
    d_rec, p_rec = run()
    assert d_occ == d_rec and p_occ == p_rec
    # distinct union: 15 old dups + 9 fresh + re-sent id 0 counted ONCE
    # = 24 (+ any co-bucketed distinct vectors), in every table
    assert sorted(t for t, _, _ in d_occ) == [0, 1, 2]
    assert all(s >= 24 for _, _, s in d_occ)
    batch_sizes = {
        (r.t, r.bucket): r.bucket_size
        for r in embedding_multitable_postings(
            old.unionByName(inc).distinct(), tables
        )
        .groupBy("t", "bucket")
        .agg(F2.countDistinct("vec_id").alias("bucket_size"))
        .collect()
    }
    for t, b, s in d_occ:
        assert batch_sizes[(t, b)] == s  # exactly what a rebuild would see


def test_multitable_resend_emits_each_pair_once_new_vector_wins(spark):
    """Upsert semantics for a re-sent id (round-10 review finding): its
    stored rows are superseded, so each of its pairs appears EXACTLY
    once (the old posting row used to duplicate them through the
    new×existing leg)."""
    tables = multitable_planes(DIMS, 3, 3)
    old = spark.createDataFrame(
        [(0, _dup_vec()), (1, _dup_vec()), (100, _distinct_vec(1))], DDL
    )
    inc = spark.createDataFrame([(0, _dup_vec()), (51, _dup_vec())], DDL)
    postings = embedding_multitable_postings(old, tables)
    vectors = old.select("vec_id", "embedding").withColumn(
        "nrm",
        F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)),
    )
    np_, nv_, pairs = incremental_multitable_neardup_pairs(
        postings, vectors, inc, dims=DIMS, threshold=0.0, tables=tables
    )
    try:
        rows = [(r.vec1, r.vec2) for r in pairs.collect()]
    finally:
        np_.unpersist()
        nv_.unpersist()
    assert sorted(rows) == [(0, 1), (0, 51), (1, 51)]  # once each, no dups


def test_minhash_indexed_resend_scores_against_new_signature(spark):
    """A re-sent doc with CHANGED text must score against its NEW
    signature only — one row per pair, equal to a batch run over the
    UPSERTED corpus (restricted to pairs touching the increment)."""
    from beast_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs_indexed,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    tA = "alpha beta gamma delta epsilon zeta eta theta"
    tB = "alpha beta gamma delta epsilon zeta eta CHANGED"
    old = spark.createDataFrame([(7, tA), (8, tA)], "doc_id long, text string")
    inc = spark.createDataFrame([(7, tB), (9, tA)], "doc_id long, text string")
    old_sigs = minhash_signatures(old, "doc_id", "text", k=16, hash_family="md5")
    index = band_signatures(old_sigs, k=16, bands=8, hash_family="md5")
    _, _, est = incremental_minhash_pairs_indexed(
        index, old_sigs, inc, "doc_id", "text", k=16, bands=8,
        threshold=0.0, hash_family="md5",
    )
    got = sorted((r.doc1, r.doc2, r.est_jaccard) for r in est.collect())
    assert len(got) == len({(a, b) for a, b, _ in got})  # no duplicate rows
    upserted = spark.createDataFrame(
        [(7, tB), (8, tA), (9, tA)], "doc_id long, text string"
    )
    batch = minhash_lsh_pairs(
        upserted, "doc_id", "text", k=16, bands=8, threshold=0.0, hash_family="md5"
    )
    want = sorted(
        (r.doc1, r.doc2, r.est_jaccard)
        for r in batch.collect()
        if 7 in (r.doc1, r.doc2) or 9 in (r.doc1, r.doc2)
    )
    assert got == want


def test_single_table_occupancy_resend_does_not_overcount(spark):
    """Second-review regression: the occupancy-regime gate must count a
    re-sent id ONCE (on-disk distinct), not n_exist + n_inc — the
    overcount would drop a bucket sitting exactly at the cap and
    silently lose every pair the increment has there."""
    planes = hyperplanes_md5(DIMS, 4)
    old = spark.createDataFrame([(i, _dup_vec()) for i in range(20)], DDL)
    index = embedding_lsh_index(old, planes)
    occ = index.groupBy("bucket").agg(
        F.countDistinct("vec_id").cast("long").alias("n_exist")
    )
    inc = spark.createDataFrame([(0, _dup_vec())], DDL)  # pure re-send
    new_idx, pairs, dropped = incremental_lsh_neardup_pairs_indexed(
        index, inc, dims=DIMS, threshold=0.0, planes=planes,
        max_bucket=20, with_dropped=True, existing_occupancy=occ,
    )
    try:
        # 20 stored + 1 increment − 1 intersection = 20 ≤ cap: kept
        assert dropped.count() == 0
        rows = [(r.vec1, r.vec2) for r in pairs.collect()]
    finally:
        new_idx.unpersist()
    # upsert pair legs: (0, j) once each against the NEW vector — the
    # stale stored row neither duplicates nor self-pairs
    assert sorted(rows) == [(0, j) for j in range(1, 20)]


def test_multitable_occupancy_parity_changed_vector_resend(spark):
    """Occupancy is ON-DISK distinct in both regimes: a re-send with a
    CHANGED vector keeps the old row's bucket membership in the counts
    (the row physically remains in the appended postings), and the
    maintained-occupancy path must agree with the recompute path
    bucket-for-bucket."""
    from pyspark.sql import functions as F2

    tables = multitable_planes(DIMS, 3, 3)
    old = spark.createDataFrame(_corpus(15, 6), DDL)
    inc = spark.createDataFrame(
        [(0, _distinct_vec(9))] + [(50 + i, _dup_vec()) for i in range(9)], DDL
    )
    postings = embedding_multitable_postings(old, tables)
    vectors = old.select("vec_id", "embedding").withColumn(
        "nrm",
        F2.sqrt(F2.aggregate("embedding", F2.lit(0.0), lambda a, x: a + x * x)),
    )
    occ = postings.groupBy("t", "bucket").agg(
        F2.countDistinct("vec_id").cast("long").alias("n_exist")
    )

    def occ_rows(**kw):
        np_, nv_, _, dropped, occupancy = incremental_multitable_neardup_pairs(
            postings, vectors, inc, dims=DIMS, threshold=0.0, tables=tables,
            max_bucket=20, with_dropped=True, with_occupancy=True, **kw,
        )
        try:
            return {
                (r.t, r.bucket): r.bucket_size for r in occupancy.collect()
            }
        finally:
            np_.unpersist()
            nv_.unpersist()

    assert occ_rows(existing_occupancy=occ) == occ_rows()
