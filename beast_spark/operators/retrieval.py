"""Lexical retrieval scoring (Okapi BM25) over the document corpus.

A training-data pipeline retrieves as much as it filters: targeted
decontamination probes, seed-document expansion ("find everything that
looks like these benchmarks"), and quality-slice mining all rank a huge
corpus against a small term set. BM25 (Robertson & Zaragoza, *The
Probabilistic Relevance Framework: BM25 and Beyond*, 2009) is the
canonical lexical ranking; the IDF variant here is the non-negative
``ln(1 + (N - df + 0.5)/(df + 0.5))`` form Lucene uses.

Scale shape: term frequencies come from ONE map-side explode +
hash-aggregate restricted to the query terms (an isin filter prunes the
token stream before it shuffles — only |terms| × docs-containing rows
survive); document length and the corpus constants (N, avgdl) are a
map-side aggregate and a 2-scalar broadcast; the per-term statistics
table is |terms| rows, broadcast. Nothing grows with the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beast_spark.queries._util import rnd

__all__ = ["bm25_scores", "bm25_from_stats", "doc_term_stats"]


def doc_term_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(postings, lens) from raw documents: the full inverted-index rows
    (id, term, tf) over EVERY token, and per-doc lengths (id, dl) —
    the sufficient statistics BM25 scores from (and exactly what the
    streamed index maintainer persists; shared builder so twin and
    batch query cannot drift). One map-side explode + one hash
    aggregation on (id, term)."""
    toks = F.split(F.col(text_col), " ")
    lens = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    postings = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, lens


def bm25_from_stats(
    tf: DataFrame,
    lens: DataFrame,
    consts: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """BM25 from pre-restricted statistics frames: ``tf`` =
    (id, term, tf) for the QUERY terms only, ``lens`` = (id, dl)
    covering at least the docs in ``tf``, ``consts`` = one row
    (n_docs, total_dl) for the whole corpus. The scoring core shared
    by :func:`bm25_scores` (batch) and the streamed index maintainer's
    serving read, so the formula lives once."""
    df_stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_stats.crossJoin(F.broadcast(consts)).select(
        "term",
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        (F.col("total_dl") / F.col("n_docs")).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, id_col)
        .select(
            id_col,
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("t_score"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        rnd(F.sum("t_score"), round_digits).alias("score"),
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_hits, score): BM25 of every document that contains at
    least one query term.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))

    with idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)). Document
    length |d| counts ALL whitespace tokens (not just query terms);
    ``avgdl`` is the exact corpus mean computed from integer token
    counts (order-independent), so both factors replay bit-identically
    in an independent engine. ``score`` is deterministically rounded
    (queries/_util.rnd); rank downstream with an (score desc, id)
    tie-break.

    The batch form prunes the token stream to the query terms BEFORE
    the tf aggregation (only |terms| × containing-docs rows shuffle) —
    the streamed index maintainer persists the unrestricted statistics
    instead and prunes at serve time by shard.
    """
    toks = F.split(F.col(text_col), " ")
    lens = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    consts = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_from_stats(tf, lens, consts, id_col, k1, b, round_digits)
