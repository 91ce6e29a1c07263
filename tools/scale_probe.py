#!/usr/bin/env python
"""Recorded scale probe: the ANN/near-dup/curation hot paths at ~50x the
sf0.1 corpus (100k vectors / 100k docs), verifying the plans that are
Exchange-audited at test scale also hold their wall-clock shape when the
data outgrows every broadcast/local assumption.

Since round 11 this is a PER-ROUND ARTIFACT, not an ad-hoc run (round-10
verdict #5): results print AND land in SCALE.json at the repo root,
committed each round, so a scale regression is caught by a number even
when the sf0.1 bench moves for local-only reasons. Round-over-round
deltas belong in COVERAGE.md.

The corpus is the sf0.1 embeddings replicated ``SCALE_PROBE_REPS`` (50)
times with one of 50 md5-Rademacher offset vectors added per replica
(broadcast join — no per-row hashing), so replicas are NOT exact
duplicates and pair mining keeps a realistic candidate distribution.

Run: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beast_spark.operators.similarity import (  # noqa: E402
    dequant_expr,
    codebook_arrays,
    embedding_multitable_postings,
    hyperplanes_md5,
    ivf_candidates,
    multitable_planes,
    quantization_params,
    quantize_codes,
)
from beast_spark.functions.vectors import cosine  # noqa: E402
from beast_spark.session import get_spark  # noqa: E402
from beast_spark.sources.tables import load_table  # noqa: E402

METRICS: dict = {}


def _rec(key: str, **vals) -> None:
    METRICS[key] = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in vals.items()}


def _files(root):
    return {
        os.path.relpath(os.path.join(dp, f), root): os.path.getsize(
            os.path.join(dp, f)
        )
        for dp, _dirs, fs in os.walk(root)
        for f in fs
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("SCALE_PROBE_REPS", "50"))
    spark = get_spark(app_name="scale_probe")

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n0 = e.count()
    offs = spark.createDataFrame(
        list(enumerate(hyperplanes_md5(64, reps, salt="sp|"))),
        "r long, off array<double>",
    )
    big = (
        e.crossJoin(F.broadcast(spark.range(reps).withColumnRenamed("id", "r")))
        .join(F.broadcast(offs), "r")
        .select(
            (F.col("vec_id") + F.col("r") * n0).alias("vec_id"),
            F.zip_with(
                "embedding", "off", lambda x, o: x + F.lit(0.1) * o
            ).alias("embedding"),
        )
        .repartition(64)
        .persist()
    )
    n = big.count()
    print(f"corpus: {n} vectors ({reps}x sf0.1)")
    METRICS["corpus"] = {"n_vectors": n, "reps": reps, "sf_dir": sf_dir}

    qs = big.filter(F.col("vec_id") < 20)

    # 1) IVF + int8 search (the q176 path) at 100k
    t0 = time.perf_counter()
    params = quantization_params(big)
    cb = codebook_arrays(params)
    dq = quantize_codes(big, params).select(
        "vec_id", dequant_expr("codes", *cb).alias("dqvec")
    )
    cand = ivf_candidates(big, qs, n_centroids=64, nprobe=2)
    qside = F.broadcast(
        qs.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    scored = (
        cand.join(dq, "vec_id")
        .join(qside, "query_id")
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("query_vec"), F.col("dqvec")), 6).alias("s"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("vec_id"))
    topk = scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 10)
    nres = topk.count()
    ncand = cand.count()
    t_search = time.perf_counter() - t0
    print(
        f"ivf_int8_search: {t_search:.1f}s for 20 queries, "
        f"{nres} results, candidate_frac={ncand / (20.0 * (n - 1)):.4f}"
    )
    _rec(
        "ivf_int8_search",
        seconds=t_search,
        n_queries=20,
        n_results=nres,
        candidate_frac=round(ncand / (20.0 * (n - 1)), 4),
    )

    # 2) multi-table postings build (75x8) at 100k
    tables = multitable_planes(64, 8, 75)
    t0 = time.perf_counter()
    npost = embedding_multitable_postings(big, tables).count()
    t_post = time.perf_counter() - t0
    print(f"multitable_postings: {t_post:.1f}s for {npost} postings")
    _rec("multitable_postings_build", seconds=t_post, n_postings=npost)

    # 3) incremental multi-table probe: 2k increment vs the 100k corpus
    from beast_spark.functions.vectors import norm as vnorm
    from beast_spark.operators.similarity import incremental_multitable_neardup_pairs

    old = big.filter(F.col("vec_id") >= n0)
    inc = big.filter(F.col("vec_id") < n0)
    ex_post = embedding_multitable_postings(old, tables).persist()
    ex_post.count()  # index build paid outside the probe clock
    ex_vec = old.select("vec_id", "embedding").withColumn(
        "nrm", vnorm(F.col("embedding"))
    ).persist()
    ex_vec.count()
    # the maintained occupancy sidecar, built once at index time like a
    # real maintainer (and q173) — without it the cap gate re-aggregates
    # the probed postings per call, which is NOT the production shape
    ex_occ = ex_post.groupBy("t", "bucket").agg(
        F.countDistinct("vec_id").cast("long").alias("n_exist")
    ).persist()
    ex_occ.count()
    t0 = time.perf_counter()
    new_post, new_vec, pairs = incremental_multitable_neardup_pairs(
        ex_post, ex_vec, inc, dims=64, threshold=0.8, tables=tables,
        existing_occupancy=ex_occ,
    )
    npairs = pairs.count()
    t_inc = time.perf_counter() - t0
    print(f"incremental_multitable: {t_inc:.1f}s for a {n0}-vector increment, {npairs} pairs >= 0.8")
    _rec(
        "incremental_multitable_probe",
        seconds=t_inc,
        increment=n0,
        corpus=n - n0,
        n_pairs=npairs,
    )
    ex_occ.unpersist()
    new_post.unpersist(); new_vec.unpersist()
    ex_post.unpersist(); ex_vec.unpersist()

    # 4) PQ-ADC scan (the q183 path) at 100k: codes-only memory traffic
    from beast_spark.operators.similarity import (
        pq_adc_lut,
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )

    pq_cb = pq_codebooks(big, dims=64)
    codes = pq_codes(big, pq_cb, dims=64).persist()
    t0 = time.perf_counter()
    ncodes = codes.count()  # encode cost measured separately from ADC
    t_enc = time.perf_counter() - t0
    lut = pq_adc_lut(qs, pq_cb, dims=64)
    t0 = time.perf_counter()
    nadc = pq_adc_topk(codes, lut, k=10).count()
    t_adc = time.perf_counter() - t0
    print(
        f"pq_encode: {t_enc:.1f}s for {ncodes} code rows; "
        f"pq_adc_topk: {t_adc:.1f}s for 20 queries over {n} vectors "
        f"({nadc} results) — codes-only scan, 8 B/vector"
    )
    _rec("pq_encode", seconds=t_enc, n_codes=ncodes)
    _rec("pq_adc_topk", seconds=t_adc, n_queries=20, n_results=nadc)
    codes.unpersist()

    # 5) streamed IVF maintenance: one 2k batch appended to a 98k index
    from beast_spark.streaming.ivf import IvfIndexMaintainer

    tmp = tempfile.mkdtemp(prefix="scale_ivf_")
    try:
        big.filter(F.col("vec_id") < 64).write.parquet(f"{tmp}/centroids")
        m = IvfIndexMaintainer(f"{tmp}/state", f"{tmp}/centroids")
        m.apply_batch(big.filter(F.col("vec_id") >= n0), 0)  # bulk load
        before = _files(f"{tmp}/state")
        total0 = sum(before.values())
        t0 = time.perf_counter()
        m.apply_batch(big.filter(F.col("vec_id") < n0), 1)  # the increment
        t_batch = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        new_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        rewritten = [
            rel
            for rel, sz in before.items()
            if after.get(rel) != sz and "MANIFEST" not in rel
        ]
        t0 = time.perf_counter()
        nsearch = m.search(spark, qs, nprobe=2, k=10).count()
        t_s = time.perf_counter() - t0
        print(
            f"streamed_ivf: {t_batch:.1f}s to absorb a {n0}-vector batch "
            f"into a {n - n0}-vector index; search {t_s:.1f}s "
            f"({nsearch} results)"
        )
        print(
            f"manifest_commit: {new_bytes / 1e6:.1f} MB written for the "
            f"{n0}-vector increment vs {total0 / 1e6:.1f} MB cumulative "
            f"state ({new_bytes / max(total0, 1):.1%}); pre-existing data "
            f"files rewritten: {len(rewritten)} — only the manifest flips "
            f"(the whole-swap protocol this replaced rewrote every data "
            f"file, every trigger)"
        )
        _rec(
            "streamed_ivf",
            absorb_seconds=t_batch,
            search_seconds=t_s,
            n_search_results=nsearch,
            commit_mb=round(new_bytes / 1e6, 2),
            state_mb=round(total0 / 1e6, 2),
            commit_frac=round(new_bytes / max(total0, 1), 4),
            prior_files_rewritten=len(rewritten),
        )

        # 5b) IVF re-send cascade + compaction (round-12): ~1% of the
        # corpus re-sent with a NEW payload; supersede-on-read means the
        # absorb is an ordinary append + a slim watermark log, and the
        # fold drops the per-read watermark join.
        resent = big.filter(F.col("vec_id") % 100 == 7).select(
            "vec_id", F.reverse("embedding").alias("embedding")
        )
        n_resent = resent.count()
        before = _files(f"{tmp}/state")
        t0 = time.perf_counter()
        m.apply_batch(resent, 2)
        t_rs = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        bytes_pre = sum(after.values())
        t0 = time.perf_counter()
        assert m.compact_resends(spark)
        t_c = time.perf_counter() - t0
        assert m.read_resent(spark) is None  # read tax gone
        bytes_post = sum(_files(f"{tmp}/state").values())
        t0 = time.perf_counter()
        nsearch2 = m.search(spark, qs, nprobe=2, k=10).count()
        t_s2 = time.perf_counter() - t0
        print(
            f"ivf_resend: {t_rs:.1f}s to absorb {n_resent} re-sent "
            f"vectors ({rs_bytes / 1e6:.1f} MB commit); compact_resends "
            f"{t_c:.1f}s, state {bytes_pre / 1e6:.1f} -> "
            f"{bytes_post / 1e6:.1f} MB; post-fold search {t_s2:.1f}s "
            f"({nsearch2} results, no watermark join)"
        )
        _rec(
            "streamed_ivf_resend",
            n_resent=n_resent,
            cascade_absorb_seconds=t_rs,
            cascade_commit_mb=round(rs_bytes / 1e6, 2),
            compact_seconds=t_c,
            state_mb_before=round(bytes_pre / 1e6, 2),
            state_mb_after=round(bytes_post / 1e6, 2),
            postfold_search_seconds=t_s2,
            n_search_results=nsearch2,
            watermark_join_after_fold=False,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 6) streamed lexical (BM25) index: one 2%-of-corpus document batch
    # appended to the full-corpus inverted index, then a term-pruned
    # serving read — the delta-commit + pruned-read contract at the
    # biggest local corpus
    from beast_spark.streaming.lexical import LexicalIndexMaintainer

    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nd0 = d0.count()
    docs = (
        d0.crossJoin(F.broadcast(spark.range(reps).withColumnRenamed("id", "r")))
        .select((F.col("doc_id") + F.col("r") * nd0).alias("doc_id"), "text")
    )
    nd = nd0 * reps
    cut = int(nd * 0.98)
    tmp = tempfile.mkdtemp(prefix="scale_lex_")
    try:
        m = LexicalIndexMaintainer(f"{tmp}/state")
        m.apply_batch(docs.filter(F.col("doc_id") < cut), 0)  # bulk load
        before = _files(f"{tmp}/state")
        total0 = sum(before.values())
        t0 = time.perf_counter()
        m.apply_batch(docs.filter(F.col("doc_id") >= cut), 1)
        t_batch = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        new_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        t0 = time.perf_counter()
        res = m.bm25(spark, ["dup", "spark", "window"])
        nres = res.count()
        t_s = time.perf_counter() - t0
        n_read = len(res.inputFiles())
        n_all = len(
            m.sub_leaves("postings") + m.sub_leaves("doclen") + m.sub_leaves("consts")
        )
        print(
            f"streamed_lexical: {t_batch:.1f}s to absorb {nd - cut} docs "
            f"into a {cut}-doc inverted index; bm25 serve {t_s:.1f}s "
            f"({nres} scored docs), read from {n_read} files across "
            f"{n_all} live leaves (term+hit-doc shard pruning)"
        )
        print(
            f"lexical_commit: {new_bytes / 1e6:.1f} MB written for the "
            f"{nd - cut}-doc increment vs {total0 / 1e6:.1f} MB cumulative "
            f"state ({new_bytes / max(total0, 1):.1%})"
        )
        _rec(
            "streamed_lexical",
            absorb_seconds=t_batch,
            serve_seconds=t_s,
            n_scored=nres,
            files_read=n_read,
            live_leaves=n_all,
            commit_mb=round(new_bytes / 1e6, 2),
            state_mb=round(total0 / 1e6, 2),
            commit_frac=round(new_bytes / max(total0, 1), 4),
        )

        # 6b) re-send cascade + compaction at scale (round-11 verdict
        # #5/#1): ~1% of the corpus re-sent with NEW text — detection is
        # an id-sharded doclen lookup, the consts correct in the same
        # commit, so absorb cost must be O(victims), not O(corpus) —
        # then compact_resends folds the superseded rows and the
        # watermark log out, and the fold's byte/leaf reduction is the
        # recorded evidence the read tax is gone.
        resent = docs.filter(F.col("doc_id") % 100 == 7).select(
            "doc_id", F.concat(F.lit("resent "), F.col("text")).alias("text")
        )
        n_resent = resent.count()
        before = _files(f"{tmp}/state")
        t0 = time.perf_counter()
        m.apply_batch(resent, 2)
        t_rs = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        bytes_pre = sum(after.values())
        leaves_pre = sum(
            len(m.sub_leaves(s)) for s in ("postings", "doclen", "resent")
        )
        t0 = time.perf_counter()
        assert m.compact_resends(spark)
        t_c = time.perf_counter() - t0
        assert m.read_resent(spark) is None  # the read tax is GONE
        bytes_post = sum(_files(f"{tmp}/state").values())
        leaves_post = sum(
            len(m.sub_leaves(s)) for s in ("postings", "doclen", "resent")
        )
        t0 = time.perf_counter()
        nres2 = m.bm25(spark, ["dup", "spark", "window"]).count()
        t_s2 = time.perf_counter() - t0
        print(
            f"lexical_resend: {t_rs:.1f}s to cascade {n_resent} re-sent "
            f"docs ({rs_bytes / 1e6:.1f} MB commit); compact_resends "
            f"{t_c:.1f}s, state {bytes_pre / 1e6:.1f} -> "
            f"{bytes_post / 1e6:.1f} MB, leaves {leaves_pre} -> "
            f"{leaves_post}; post-fold serve {t_s2:.1f}s ({nres2} docs, "
            f"no watermark join)"
        )
        _rec(
            "streamed_lexical_resend",
            n_resent=n_resent,
            cascade_absorb_seconds=t_rs,
            cascade_commit_mb=round(rs_bytes / 1e6, 2),
            compact_seconds=t_c,
            state_mb_before=round(bytes_pre / 1e6, 2),
            state_mb_after=round(bytes_post / 1e6, 2),
            leaves_before=leaves_pre,
            leaves_after=leaves_post,
            postfold_serve_seconds=t_s2,
            watermark_join_after_fold=False,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 7) streamed SemDeDup: one 2k-vector batch absorbed into a 98k-
    # member cell state (round-10 verdict #5's missing leg) — the
    # touched-cell member read + min-witness merge at 50x test scale
    from beast_spark.streaming.semdedup import SemanticDedupMaintainer

    tmp = tempfile.mkdtemp(prefix="scale_sem_")
    try:
        big.filter(F.col("vec_id") < 64).write.parquet(f"{tmp}/centroids")
        m = SemanticDedupMaintainer(
            f"{tmp}/state", f"{tmp}/centroids", tau=0.95
        )
        m.apply_batch(big.filter(F.col("vec_id") >= n0), 0)  # bulk load
        before = _files(f"{tmp}/state")
        total0 = sum(before.values())
        t0 = time.perf_counter()
        m.apply_batch(big.filter(F.col("vec_id") < n0), 1)  # the increment
        t_batch = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        new_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        ndropped = m.read_dropped(spark).count()
        print(
            f"streamed_semdedup: {t_batch:.1f}s to absorb a {n0}-vector "
            f"batch into a {n - n0}-member cell state "
            f"({ndropped} total dropped); {new_bytes / 1e6:.1f} MB "
            f"written vs {total0 / 1e6:.1f} MB state "
            f"({new_bytes / max(total0, 1):.1%})"
        )
        _rec(
            "streamed_semdedup",
            absorb_seconds=t_batch,
            n_dropped_total=ndropped,
            commit_mb=round(new_bytes / 1e6, 2),
            state_mb=round(total0 / 1e6, 2),
            commit_frac=round(new_bytes / max(total0, 1), 4),
        )

        # 7b) re-send cascade + compaction at scale: ~1% of the corpus
        # re-sent with a NEW payload (reversed vector — different cells).
        # The cascade recomputes the victims from their cells' live
        # residents; the bound is victims × their cells' occupancy, and
        # the recorded seconds/bytes pin it. Then compact_resends folds
        # the superseded member rows + watermark log out.
        resent = big.filter(F.col("vec_id") % 100 == 7).select(
            "vec_id", F.reverse("embedding").alias("embedding")
        )
        n_resent = resent.count()
        before = _files(f"{tmp}/state")
        t0 = time.perf_counter()
        m.apply_batch(resent, 2)
        t_rs = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        bytes_pre = sum(after.values())
        t0 = time.perf_counter()
        assert m.compact_resends(spark)
        t_c = time.perf_counter() - t0
        assert m.read_resent(spark) is None  # read tax gone
        bytes_post = sum(_files(f"{tmp}/state").values())
        print(
            f"semdedup_resend: {t_rs:.1f}s to cascade {n_resent} re-sent "
            f"vectors ({rs_bytes / 1e6:.1f} MB commit); compact_resends "
            f"{t_c:.1f}s, state {bytes_pre / 1e6:.1f} -> "
            f"{bytes_post / 1e6:.1f} MB"
        )
        _rec(
            "streamed_semdedup_resend",
            n_resent=n_resent,
            cascade_absorb_seconds=t_rs,
            cascade_commit_mb=round(rs_bytes / 1e6, 2),
            compact_seconds=t_c,
            state_mb_before=round(bytes_pre / 1e6, 2),
            state_mb_after=round(bytes_post / 1e6, 2),
            watermark_join_after_fold=False,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 8) streamed DSIR importance model: a 2%-doc increment absorbed
    # into the B-bucket additive model, then a scoring serve (round-10
    # verdict #6) — state is B rows regardless of corpus size, so the
    # commit bytes pin the additive-model claim with a number
    from beast_spark.streaming.importance import ImportanceModelMaintainer

    tmp = tempfile.mkdtemp(prefix="scale_imp_")
    try:
        m = ImportanceModelMaintainer(
            f"{tmp}/state", target_predicate="length(text) > 200"
        )
        m.apply_batch(docs.filter(F.col("doc_id") < cut), 0)  # bulk load
        before = _files(f"{tmp}/state")
        total0 = sum(before.values())
        t0 = time.perf_counter()
        m.apply_batch(docs.filter(F.col("doc_id") >= cut), 1)
        t_batch = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        new_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        t0 = time.perf_counter()
        nscored = m.score(docs.filter(F.col("doc_id") >= cut)).count()
        t_s = time.perf_counter() - t0
        print(
            f"streamed_importance: {t_batch:.1f}s to absorb {nd - cut} "
            f"docs into the {m.n_buckets}-bucket model; score serve "
            f"{t_s:.1f}s ({nscored} docs); {new_bytes / 1e3:.0f} KB "
            f"written vs {total0 / 1e3:.0f} KB state"
        )
        _rec(
            "streamed_importance",
            absorb_seconds=t_batch,
            serve_seconds=t_s,
            n_scored=nscored,
            commit_kb=round(new_bytes / 1e3, 1),
            state_kb=round(total0 / 1e3, 1),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 9) streamed near-dup re-send cascade at 100k: bulk-load the full
    # corpus through the maintainer, re-send ~1% with a perturbed
    # payload, record cascade absorb seconds + commit bytes (the bound
    # is O(victims + touched buckets), never O(corpus)), then fold the
    # superseded rows out with compact_resends. A slimmer 8×8 table
    # config keeps the probe's wall bounded — the leg measures the
    # CASCADE's cost shape, not recall (leg 3 measures the production
    # 75×8 probe).
    from beast_spark.streaming.neardup import EmbeddingNearDupMaintainer

    tmp = tempfile.mkdtemp(prefix="scale_nd_")
    try:
        m = EmbeddingNearDupMaintainer(
            f"{tmp}/state", dims=64, threshold=0.8, n_planes=8, n_tables=8
        )
        t0 = time.perf_counter()
        m.apply_batch(big, 0)  # bulk load
        t_bulk = time.perf_counter() - t0
        before = _files(f"{tmp}/state")
        total0 = sum(before.values())
        resent = big.filter(F.col("vec_id") % 100 == 7).select(
            "vec_id", F.reverse("embedding").alias("embedding")
        )
        n_resent = resent.count()
        t0 = time.perf_counter()
        m.apply_batch(resent, 1)
        t_rs = time.perf_counter() - t0
        after = _files(f"{tmp}/state")
        rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
        bytes_pre = sum(after.values())
        t0 = time.perf_counter()
        assert m.compact_resends(spark)
        t_c = time.perf_counter() - t0
        assert m.read_resent(spark) is None  # read tax gone
        bytes_post = sum(_files(f"{tmp}/state").values())
        t0 = time.perf_counter()
        npairs = m.read_pairs(spark).count()
        t_read = time.perf_counter() - t0
        print(
            f"neardup_resend: bulk {t_bulk:.1f}s for {n} vectors (8x8); "
            f"{t_rs:.1f}s to cascade {n_resent} re-sent vectors "
            f"({rs_bytes / 1e6:.1f} MB commit vs {total0 / 1e6:.1f} MB "
            f"state); compact_resends {t_c:.1f}s, state "
            f"{bytes_pre / 1e6:.1f} -> {bytes_post / 1e6:.1f} MB; "
            f"post-fold pair read {t_read:.1f}s ({npairs} live pairs, "
            f"no watermark join)"
        )
        _rec(
            "streamed_neardup_resend",
            bulk_seconds=t_bulk,
            n_resent=n_resent,
            cascade_absorb_seconds=t_rs,
            cascade_commit_mb=round(rs_bytes / 1e6, 2),
            cascade_commit_frac=round(rs_bytes / max(total0, 1), 4),
            compact_seconds=t_c,
            state_mb_before=round(bytes_pre / 1e6, 2),
            state_mb_after=round(bytes_post / 1e6, 2),
            postfold_pair_read_seconds=t_read,
            n_live_pairs=npairs,
            watermark_join_after_fold=False,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 10) the 1M leg (round-12 verdict #5): the re-send cascade + fold
    # claims are O(victims)/O(live) — constants that look fine at 100k
    # can hide a linear term that only shows an order of magnitude up.
    # One slim-config semdedup cascade leg at 1M VECTORS and one
    # lexical fold leg at 1M DOCS pin them. Disable with
    # SCALE_PROBE_XL=0 if a round needs a fast probe; the recorded
    # numbers then carry over unchanged and COVERAGE must say so.
    if os.environ.get("SCALE_PROBE_XL", "1") != "0":
        from beast_spark.streaming.semdedup import SemanticDedupMaintainer

        reps_xl = int(os.environ.get("SCALE_PROBE_XL_REPS", "500"))
        offs_xl = spark.createDataFrame(
            list(enumerate(hyperplanes_md5(64, reps_xl, salt="spxl|"))),
            "r long, off array<double>",
        )
        big_xl = (
            e.crossJoin(
                F.broadcast(spark.range(reps_xl).withColumnRenamed("id", "r"))
            )
            .join(F.broadcast(offs_xl), "r")
            .select(
                (F.col("vec_id") + F.col("r") * n0).alias("vec_id"),
                F.zip_with(
                    "embedding", "off", lambda x, o: x + F.lit(0.1) * o
                ).alias("embedding"),
            )
            .repartition(128)
            .persist()
        )
        n_xl = big_xl.count()
        print(f"XL corpus: {n_xl} vectors ({reps_xl}x sf0.1)")
        tmp = tempfile.mkdtemp(prefix="scale_sem_xl_")
        try:
            # slim config: 256 cells keeps in-cell pair mining bounded
            # (the leg measures the CASCADE/fold cost shape, not recall)
            big_xl.filter(F.col("vec_id") < 256).write.parquet(
                f"{tmp}/centroids"
            )
            m = SemanticDedupMaintainer(
                f"{tmp}/state", f"{tmp}/centroids", tau=0.95
            )
            t0 = time.perf_counter()
            m.apply_batch(big_xl, 0)  # bulk load 1M
            t_bulk = time.perf_counter() - t0
            before = _files(f"{tmp}/state")
            total0 = sum(before.values())
            resent = big_xl.filter(F.col("vec_id") % 1000 == 7).select(
                "vec_id", F.reverse("embedding").alias("embedding")
            )
            n_resent = resent.count()
            t0 = time.perf_counter()
            m.apply_batch(resent, 1)
            t_rs = time.perf_counter() - t0
            after = _files(f"{tmp}/state")
            rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
            bytes_pre = sum(after.values())
            t0 = time.perf_counter()
            assert m.compact_resends(spark)
            t_c = time.perf_counter() - t0
            assert m.read_resent(spark) is None  # read tax gone
            bytes_post = sum(_files(f"{tmp}/state").values())
            print(
                f"semdedup_resend_1m: bulk {t_bulk:.1f}s for {n_xl} "
                f"vectors; {t_rs:.1f}s to cascade {n_resent} re-sent "
                f"({rs_bytes / 1e6:.1f} MB commit vs {total0 / 1e6:.1f} "
                f"MB state, {rs_bytes / max(total0, 1):.2%}); "
                f"compact_resends {t_c:.1f}s, state "
                f"{bytes_pre / 1e6:.1f} -> {bytes_post / 1e6:.1f} MB"
            )
            _rec(
                "streamed_semdedup_resend_1m",
                n_vectors=n_xl,
                bulk_seconds=t_bulk,
                n_resent=n_resent,
                cascade_absorb_seconds=t_rs,
                cascade_commit_mb=round(rs_bytes / 1e6, 2),
                cascade_commit_frac=round(rs_bytes / max(total0, 1), 4),
                compact_seconds=t_c,
                state_mb_before=round(bytes_pre / 1e6, 2),
                state_mb_after=round(bytes_post / 1e6, 2),
                watermark_join_after_fold=False,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            big_xl.unpersist()

        # 10b) lexical fold at 1M docs
        reps_doc = max(1, 1_000_000 // nd0)
        docs_xl = (
            d0.crossJoin(
                F.broadcast(
                    spark.range(reps_doc).withColumnRenamed("id", "r")
                )
            )
            .select((F.col("doc_id") + F.col("r") * nd0).alias("doc_id"), "text")
        )
        nd_xl = nd0 * reps_doc
        tmp = tempfile.mkdtemp(prefix="scale_lex_xl_")
        try:
            m = LexicalIndexMaintainer(f"{tmp}/state")
            t0 = time.perf_counter()
            m.apply_batch(docs_xl, 0)  # bulk load 1M docs
            t_bulk = time.perf_counter() - t0
            before = _files(f"{tmp}/state")
            total0 = sum(before.values())
            resent = docs_xl.filter(F.col("doc_id") % 1000 == 7).select(
                "doc_id",
                F.concat(F.lit("resent "), F.col("text")).alias("text"),
            )
            n_resent = resent.count()
            t0 = time.perf_counter()
            m.apply_batch(resent, 1)
            t_rs = time.perf_counter() - t0
            after = _files(f"{tmp}/state")
            rs_bytes = sum(sz for rel, sz in after.items() if rel not in before)
            bytes_pre = sum(after.values())
            leaves_pre = sum(
                len(m.sub_leaves(s)) for s in ("postings", "doclen", "resent")
            )
            t0 = time.perf_counter()
            assert m.compact_resends(spark)
            t_c = time.perf_counter() - t0
            assert m.read_resent(spark) is None  # read tax gone
            bytes_post = sum(_files(f"{tmp}/state").values())
            leaves_post = sum(
                len(m.sub_leaves(s)) for s in ("postings", "doclen", "resent")
            )
            t0 = time.perf_counter()
            nres2 = m.bm25(spark, ["dup", "spark", "window"]).count()
            t_s2 = time.perf_counter() - t0
            print(
                f"lexical_resend_1m: bulk {t_bulk:.1f}s for {nd_xl} docs; "
                f"{t_rs:.1f}s to cascade {n_resent} re-sent docs "
                f"({rs_bytes / 1e6:.1f} MB commit vs {total0 / 1e6:.1f} "
                f"MB state, {rs_bytes / max(total0, 1):.2%}); "
                f"compact_resends {t_c:.1f}s, state {bytes_pre / 1e6:.1f} "
                f"-> {bytes_post / 1e6:.1f} MB, leaves {leaves_pre} -> "
                f"{leaves_post}; post-fold serve {t_s2:.1f}s "
                f"({nres2} docs, no watermark join)"
            )
            _rec(
                "streamed_lexical_resend_1m",
                n_docs=nd_xl,
                bulk_seconds=t_bulk,
                n_resent=n_resent,
                cascade_absorb_seconds=t_rs,
                cascade_commit_mb=round(rs_bytes / 1e6, 2),
                cascade_commit_frac=round(rs_bytes / max(total0, 1), 4),
                compact_seconds=t_c,
                state_mb_before=round(bytes_pre / 1e6, 2),
                state_mb_after=round(bytes_post / 1e6, 2),
                leaves_before=leaves_pre,
                leaves_after=leaves_post,
                postfold_serve_seconds=t_s2,
                watermark_join_after_fold=False,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.json"
    )
    with open(out, "w") as fh:
        json.dump(METRICS, fh, indent=1, sort_keys=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
