"""Training-data pipeline queries: dedup, text analysis, similarity search.

Operators come from ``beast_spark.operators`` / ``beast_spark.functions``;
this module binds them to the driver's ``documents`` / ``embeddings``
tables and supplies DuckDB oracles where the semantics are
SQL-expressible. MinHash/SimHash/LSH use xxhash64 (engine-specific), so
those entries are rows-only checks by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beast_spark.functions.text import (
    fingerprint,
    mean_token_length,
    token_count,
    unique_ratio,
    unique_token_count,
)
from beast_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from beast_spark.operators.similarity import brute_force_topk, lsh_topk
from beast_spark.queries import register
from beast_spark.queries._util import rnd
from beast_spark.sources.tables import load_table


@register(
    "q30_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    doc="Exact dedup: hash-groupBy on full text, canonical id = min(doc_id).",
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d, "doc_id", ["text"]).select(
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_hash"),
        F.col("canonical_id"),
        F.col("n_copies"),
    )


@register(
    "q31_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique,
           CAST(length(text) AS INT) AS text_len,
           floor((length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 100 + 0.5) / 100
             AS avg_token_len
    FROM documents
    """,
    doc="Per-doc token statistics: counts, distinct counts, mean token length.",
)
def q31_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        unique_token_count("text").alias("n_unique"),
        F.length("text").alias("text_len"),
        rnd(mean_token_length("text"), 2).alias("avg_token_len"),
    )


@register(
    "q32_quality_filter",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           floor((len(list_distinct(string_split(text, ' ')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10000 + 0.5) / 10000 AS uniq_ratio,
           (len(string_split(text, ' ')) BETWEEN 20 AND 80)
             AND (len(list_distinct(string_split(text, ' ')))
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.5) AS keep
    FROM documents
    """,
    doc="Corpus quality filter: token-length band + lexical-diversity threshold "
    "(C4/Gopher-style heuristics).",
)
def q32_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = token_count("text")
    ur = unique_ratio("text")
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        rnd(ur, 4).alias("uniq_ratio"),
        (n.between(20, 80) & (ur >= 0.5)).alias("keep"),
    )


@register(
    "q33_token_stats_by_lang",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           floor((avg(len(string_split(text, ' ')))) * 100 + 0.5) / 100 AS avg_tokens,
           floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus token accounting grouped by language × source.",
)
def q33_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg(token_count("text")), 2).alias("avg_tokens"),
        rnd(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
    )


@register(
    "q34_doc_fingerprint",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_fingerprints
    FROM documents
    GROUP BY source
    """,
    doc="Normalized-content fingerprint (md5 of canonical text) per source.",
)
def q34_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fingerprint("text")).alias("n_fingerprints"),
    )


# 3-gram Jaccard pairs at threshold 0.4 — shared by q35 (pairs) and q73
# (clusters over those pairs).
_JACCARD_PAIRS_ORACLE = """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(string_split(text,' ')) - 1),
                              i -> string_split(text,' ')[i] || ' ' ||
                                   string_split(text,' ')[i+1] || ' ' ||
                                   string_split(text,' ')[i+2])
             )) AS shingle
      FROM documents
      WHERE len(string_split(text,' ')) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc1, i.doc2,
           floor((n_common / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE)) * 10000 + 0.5) / 10000 AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    WHERE n_common / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE) >= 0.4
"""


@register(
    "q35_ngram_jaccard_pairs",
    oracle=_JACCARD_PAIRS_ORACLE,
    doc="Exact 3-gram Jaccard near-dup pairs (threshold 0.4) via shingle self-join.",
    bench=False,  # quadratic-ish; excluded from the headline bench set
)
def q35_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4)


@register(
    "q36_minhash_lsh_dedup",
    oracle=None,  # xxhash64-based — not reproducible in DuckDB; rows-only check
    doc="MinHash(16) + LSH(8 bands) near-dup candidates with estimated Jaccard.",
)
def q36_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", k=16, bands=8, threshold=0.35)


@register(
    "q37_simhash_pairs",
    oracle=None,  # xxhash64-based — rows-only check
    doc="SimHash-64 near-dup pairs within Hamming distance 8 via 16-bit band join.",
)
def q37_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=8)


@register(
    "q38_embedding_knn",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         scored AS (
           SELECT vec_id,
                  floor((list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))
                        * 1000000 + 0.5) / 1000000 AS cos_sim
           FROM e, q WHERE vec_id <> 0
         )
    SELECT vec_id, cos_sim,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    doc="Brute-force cosine top-10 neighbors of vec_id=0 (exact ANN baseline).",
)
def q38_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    res = brute_force_topk(e, e.filter(F.col("vec_id") == 0), k=10)
    return res.select("vec_id", "cos_sim", "rank")


@register(
    "q39_embedding_label_centroids",
    oracle="""
    SELECT label, CAST(t.i AS INT) AS dim,
           floor((avg(CAST(embedding[t.i + 1] AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS centroid_val
    FROM embeddings, range(4) t(i)
    GROUP BY label, t.i
    """,
    doc="Per-label embedding centroid (first 4 dims): posexplode + grouped avg.",
)
def q39_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    return (
        ex.filter(F.col("dim") < 4)
        .groupBy("label", "dim")
        .agg(rnd(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"))
    )


@register(
    "q40_lsh_ann",
    oracle=None,  # approximate by construction — rows-only check
    doc="Random-hyperplane LSH bucketed ANN (8 planes) for query vec_id=0.",
)
def q40_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") == 0), dims=64, k=10)


@register(
    "q73_dedup_clusters",
    oracle="WITH RECURSIVE pairs AS (" + _JACCARD_PAIRS_ORACLE + """),
    edges AS (
      SELECT doc1 AS src, doc2 AS dst FROM pairs
      UNION
      SELECT doc2, doc1 FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="Near-dup CLUSTERS: connected components over the exact-Jaccard "
    "pair graph via distributed min-label propagation "
    "(operators/dedup.py::dedup_clusters) — pairs alone can't drive a "
    "keep-one policy. Oracle: DuckDB recursive CTE computing min "
    "reachable id. Iterative (O(diameter) joins), excluded from the "
    "headline bench with the other quadratic-ish dedup variants.",
    bench=False,
)
def q73_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.dedup import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4)
    return dedup_clusters(pairs)


@register(
    "q74_frame_sampling",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS blen
      FROM documents
    ),
    f AS (
      SELECT media_id, CAST(t.i AS INT) AS frame_idx, hx, blen,
             greatest(blen // 4, 1) AS flen
      FROM m, range(4) t(i)
    )
    SELECT media_id, frame_idx,
           CAST(len(substring(hx, frame_idx * (blen // 4) * 2 + 1, flen * 2)) // 2
                AS INT) AS frame_len,
           substring(hx, frame_idx * (blen // 4) * 2 + 1, flen * 2) AS frame_hex
    FROM f
    """,
    doc="Multimodal frame sampling (operators/multimodal.py::sample_frames): "
    "each media blob explodes into 4 evenly-spaced byte-range frames, "
    "verified byte-for-byte against DuckDB via hex (frame boundaries are "
    "pure integer arithmetic — the real-codec swap point is the slice).",
    bench=False,
)
def q74_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    frames = sample_frames(media, n_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame_bytes").alias("frame_len"),
        F.hex("frame_bytes").alias("frame_hex"),
    )


@register(
    "q75_normalized_dedup",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_fp,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Normalization-aware exact dedup: fingerprint of lower+collapsed-"
    "whitespace text (functions/text.py::fingerprint) — catches dups that "
    "raw-byte hashing (q30) misses; both engines must agree on the md5 of "
    "the normalized form.",
)
def q75_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint("text").alias("norm_fp"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "q78_edit_distance",
    oracle="""
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           levenshtein(substring(a.text, 1, 24), substring(b.text, 1, 24)) AS lev
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
    doc="String-similarity scalar surface: levenshtein edit distance over "
    "24-char prefixes of adjacent documents (both engines implement the "
    "same Wagner-Fischer distance; JVM-side, codegen).",
)
def q78_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc1"), F.substring("text", 1, 24).alias("t1"))
    b = d.select(F.col("doc_id").alias("doc2"), F.substring("text", 1, 24).alias("t2"))
    return (
        a.join(b, b.doc2 == a.doc1 + 1)
        .select("doc1", "doc2", F.levenshtein("t1", "t2").alias("lev"))
    )


@register(
    "q80_embedding_neardup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec1, b.vec_id AS vec2,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.42
    """,
    doc="Embedding-cosine near-dup PAIRS (exact all-pairs form): broadcast "
    "self-join + JVM-side cosine, threshold 0.42 on this corpus (random "
    "embeddings top out near 0.5). This is the correctness baseline; at "
    "corpus scale run the same threshold over LSH buckets "
    "(operators/similarity.py::lsh_bucket_col) to cut the quadratic "
    "candidate volume, as q40 does for search.",
    bench=False,
)
def q80_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.functions.vectors import dot, norm

    # Norms are computed once per VECTOR before the join (N folds), not
    # once per PAIR (N² folds) — per-pair work is a single dot product.
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec1"),
        F.col("embedding").alias("v1"),
        norm(F.col("embedding")).alias("n1"),
    )
    b = e.select(
        F.col("vec_id").alias("vec2"),
        F.col("embedding").alias("v2"),
        norm(F.col("embedding")).alias("n2"),
    )
    joined = a.join(F.broadcast(b), F.col("vec1") < F.col("vec2"))
    return (
        joined.select(
            "vec1",
            "vec2",
            F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= 0.42)
    )


@register(
    "q81_winnowing_fingerprints",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
      WHERE len(string_split(text, ' ')) >= 7
    ),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 2),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
             ) AS hashes
      FROM t
    )
    SELECT doc_id,
           CAST(len(list_sort(list_distinct(
             list_transform(range(1, len(hashes) - 2), j -> list_min(hashes[j:j+3]))
           ))) AS INT) AS n_fps,
           array_to_string(list_sort(list_distinct(
             list_transform(range(1, len(hashes) - 2), j -> list_min(hashes[j:j+3]))
           )), ',') AS fps_csv
    FROM sh
    """,
    doc="Rolling-hash document fingerprints (winnowing, MOSS-style): md5 "
    "each 4-gram shingle, keep the minimum of every 4-hash sliding "
    "window — position-robust fingerprints for containment/near-dup "
    "detection, selected identically by both engines (lexicographic min "
    "over the same hex hashes).",
)
def q81_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.functions.text import shingle_hashes, tokens, winnow_from_hashes

    # Each stage's array is materialized with withColumn before the next
    # stage random-accesses it (tokens → md5 shingles → winnowed mins):
    # see shingle_hashes/winnow_from_hashes for the re-inlining hazard.
    # _fps is materialized too so size() and array_join() don't each
    # recompute the winnowing pass.
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("_toks", tokens("text"))
        .filter(F.size("_toks") >= 7)
    )
    return (
        d.withColumn("_sh", shingle_hashes(F.col("_toks"), n=4))
        .withColumn("_fps", winnow_from_hashes(F.col("_sh"), window=4))
        .select(
            "doc_id",
            F.size("_fps").alias("n_fps"),
            F.array_join("_fps", ",").alias("fps_csv"),
        )
    )


@register(
    "q82_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS nd FROM documents),
    scored AS (
      SELECT doc_id, term,
             floor(tf * ln(nd / CAST(df AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS score
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, score,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 3
    """,
    doc="TF-IDF top-3 terms per document: term frequency × ln(N/df), "
    "ranked with a term tiebreak after shared floor-rounding so the "
    "selection is engine-stable. Corpus size N stays in-plan (broadcast "
    "1-row aggregate) — no driver-side count.",
)
def q82_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            rnd(F.col("tf") * F.log(F.col("nd") / F.col("df").cast("double")), 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
    )
