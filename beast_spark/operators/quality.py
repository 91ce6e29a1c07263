"""Per-document quality signals shared by the batch quality-gate
queries (q117 repetition, q123 entropy, q124 boilerplate) and the
streaming corpus-v2 maintainer (``streaming/corpus_v2.py``).

One definition per signal: the stream and the batch capstone (q161)
must agree on the SAME rounded values, so the expressions live here and
both sides call them. All builders are pure DataFrame compositions —
explode map-side, shuffle on (doc, token-unit), per-doc merge — and
shard by doc_id, so no stage ever holds more than one document's units
together (the 100-TB shape the q117/q123/q124 docstrings describe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beast_spark.queries._util import rnd

__all__ = [
    "entropy_signals",
    "repetition_signals",
    "chunk_hashes",
    "boilerplate_stats",
    "repeated_span_stats",
    "window_hashes",
    "span_cleaned",
]


def entropy_signals(docs: DataFrame) -> DataFrame:
    """q123's token-entropy signals: (doc_id, n_tokens, n_unique,
    entropy, norm_entropy). H = ln(n) − Σ c·ln c / n over per-doc word
    counts; norm_entropy = H / ln(n_unique) (0 for single-word docs)."""
    c = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    s = c.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_unique"),
        (F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")).alias("h"),
    )
    return s.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_unique").alias("n_unique"),
        rnd(F.col("h"), 4).alias("entropy"),
        F.when(
            F.col("n_unique") > 1,
            rnd(F.col("h") / F.log(F.col("n_unique").cast("double")), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """q117's repetition signals: (doc_id, n_grams, n_unique,
    dup_trigram_frac, top_word_frac). Documents shorter than 3 tokens
    have no trigrams and are ABSENT — callers gate on an inner join."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    tri = docs.select("doc_id", toks.alias("t"), F.explode(idx).alias("i")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("t", F.col("i")),
            F.element_at("t", F.col("i") + 1),
            F.element_at("t", F.col("i") + 2),
        ).alias("g"),
    )
    gstat = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("g").alias("n_unique"),
    )
    wstat = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"), F.sum("c").alias("n_words"))
    )
    return gstat.join(wstat, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_unique",
        rnd(1.0 - F.col("n_unique").cast("double") / F.col("n_grams"), 4).alias(
            "dup_trigram_frac"
        ),
        rnd(F.col("top_word_count").cast("double") / F.col("n_words"), 4).alias(
            "top_word_frac"
        ),
    )


def chunk_hashes(docs: DataFrame, chunk_tokens: int = 8) -> DataFrame:
    """q124's chunk postings: (doc_id, chash) — md5 of each fixed
    ``chunk_tokens``-token slice. Pure map-side array slicing; only the
    fixed-size hashes shuffle downstream."""
    with_arr = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = ((F.size("t") + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens)).cast(
        "int"
    )
    return with_arr.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i")
    ).select(
        "doc_id",
        F.md5(
            F.encode(
                F.array_join(
                    F.slice(F.col("t"), F.col("i") * chunk_tokens + 1, F.lit(chunk_tokens)),
                    " ",
                ),
                "UTF-8",
            )
        ).alias("chash"),
    )


def boilerplate_stats(ch: DataFrame) -> DataFrame:
    """q124's per-doc report over chunk postings ``ch``: a chash in >= 2
    distinct docs is boilerplate; each doc reports its contaminated
    fraction. The flagged list is small by construction (repeated
    content only) → AQE-broadcast join back, unhinted."""
    fl = (
        ch.groupBy("chash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chash", F.lit(True).alias("is_boiler"))
    )
    return (
        ch.join(fl, "chash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count("is_boiler").alias("n_boiler"),
            rnd(F.count("is_boiler") / F.count(F.lit(1)).cast("double"), 4).alias(
                "boiler_frac"
            ),
        )
    )


def repeated_span_stats(
    docs: DataFrame, window: int = 8, include_text: bool = False
) -> DataFrame:
    """Exact repeated-substring removal (the Lee et al. "Deduplicating
    Training Data" operation, token-level): every ``window``-token
    sliding window whose text occurs MORE THAN ONCE anywhere in the
    corpus (across documents or repeated within one) is flagged;
    per document, overlapping flagged windows merge into maximal spans
    and the cleaned text drops the spanned tokens.

    q124's fixed-chunk rule is the cheap approximation (1/8th the hash
    volume, misses duplicates that straddle a chunk boundary); this is
    the exact form: EVERY offset hashes, so a duplicated run of >=
    ``window`` tokens is caught wherever it starts. Scale shape: the
    sliding windows explode map-side (n−w+1 hashes per doc), ONE
    shuffle groups the window hashes (the q36 shingle-join shape — the
    same ``max_df``-style guards apply if a stop-phrase floods a hash),
    and the span merge is a per-doc sort (gaps-and-islands over a
    window function) — no stage ever holds more than one document's
    windows plus the flagged-hash set.

    Returns (doc_id, n_tokens, n_spans, n_removed, cleaned_hash) for
    every document with >= ``window`` tokens; ``cleaned_hash`` is
    md5 of the surviving tokens joined by single spaces (shorter docs
    have no windows and are absent — same contract as q117).
    ``include_text=True`` adds the cleaned text itself (``cleaned_text``)
    for downstream pipeline stages (the v3 capstone re-runs the quality
    gates on it).
    """
    wins = window_hashes(docs, window)
    flagged = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("wh")
    )
    return span_cleaned(docs, flagged, window, include_text)


def window_hashes(docs: DataFrame, window: int = 8) -> DataFrame:
    """Phase 1 of :func:`repeated_span_stats`: the sliding-window
    postings (doc_id, i, wh) for every document with >= ``window``
    tokens — md5 of tokens [i, i+window). This is the persistable
    window-hash index the streaming v3 maintainer appends to."""
    t = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= window
    )
    return t.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t") - (window - 1))).alias("i"),
    ).select(
        "doc_id",
        "i",
        F.md5(
            F.encode(F.array_join(F.slice("t", F.col("i"), window), " "), "UTF-8")
        ).alias("wh"),
    )


def span_cleaned(
    docs: DataFrame,
    flagged: DataFrame,
    window: int = 8,
    include_text: bool = False,
) -> DataFrame:
    """Phase 2 of :func:`repeated_span_stats`: given the flagged window
    hashes (a (wh) frame — from a full-corpus count or a maintained
    global count table), merge each document's flagged windows into
    maximal spans and emit the cleaned form. Separated so an
    incremental maintainer can recompute ONLY affected documents
    against GLOBAL counts."""
    from pyspark.sql.window import Window as W

    t = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= window
    )
    wins = window_hashes(docs, window)
    fw = wins.join(flagged, "wh", "left_semi").select("doc_id", "i")
    prev_max_end = F.max(F.col("i") + (window - 1)).over(
        W.partitionBy("doc_id").orderBy("i").rowsBetween(W.unboundedPreceding, -1)
    )
    isl = fw.withColumn(
        "new_isl",
        F.when(
            prev_max_end.isNull() | (F.col("i") > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "g",
        F.sum("new_isl").over(
            W.partitionBy("doc_id").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    spans = isl.groupBy("doc_id", "g").agg(
        F.min("i").alias("s"), (F.max("i") + (window - 1)).alias("e")
    )
    span_arr = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_removed"),
        F.collect_list(F.struct("s", "e")).alias("sp"),
    )
    joined = t.join(span_arr, "doc_id", "left")
    keep = F.filter(
        F.transform("t", lambda x, i: F.struct((i + 1).alias("p"), x.alias("tok"))),
        lambda st: ~F.exists(
            F.coalesce("sp", F.array().cast("array<struct<s:long,e:long>>")),
            lambda span: (st["p"] >= span["s"]) & (st["p"] <= span["e"]),
        ),
    )
    cleaned = F.array_join(F.transform(keep, lambda st: st["tok"]), " ")
    cols = [
        F.col("doc_id"),
        F.size("t").cast("long").alias("n_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.md5(F.encode(cleaned, "UTF-8")).alias("cleaned_hash"),
    ]
    if include_text:
        cols.append(cleaned.alias("cleaned_text"))
    return joined.select(*cols)
