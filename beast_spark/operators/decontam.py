"""Decontamination building blocks shared by the batch form (q109) and
the streaming maintainer (``streaming/decontam.py``).

Reference scope: the reference pipeline (odpf/beast) has no
decontamination stage — this is part of the LLM-training-data surface
this engine adds; semantics follow the public n-gram overlap rule
(8-token gram collision with the eval set marks a training document
contaminated) that q109 gates against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_gram_postings", "decontam_stats"]


def doc_gram_postings(docs: DataFrame, n: int = 8) -> DataFrame:
    """Distinct (doc_id, g) 8-token-gram postings of a document frame —
    pure map-side gram hashing (split/sequence/slice/md5 built-ins) plus
    one distinct. At warehouse scale write bucketed by ``g`` so eval
    probes prune to the touched buckets (the q98 discipline)."""
    from beast_spark.operators.dedup import fan_out

    toks = F.split(F.col("text"), " ")
    sz = F.size(toks)
    idx = F.when(sz >= n, F.sequence(F.lit(1), sz - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        fan_out(docs)  # single-file local inputs would explode on 1 partition
        .select("doc_id", toks.alias("t"), F.explode(idx).alias("i"))
        .select(
            "doc_id",
            F.md5(
                F.encode(F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), n)), "UTF-8")
            ).alias("g"),
        )
        .distinct()
    )


def decontam_stats(
    train_docs: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """Batch contamination stats: (train_doc_id, n_eval_docs,
    n_shared_grams) — q109's output shape for ARBITRARY train/eval
    frames (q109 itself keeps its tuned single-scan source-split plan;
    this form is the equivalence comparator the streaming maintainer is
    tested against, and the general-API entry point when train and eval
    live in separate tables). Eval side is benchmark-sized → broadcast;
    the train side shuffles only matched rows into the final aggregate.
    """
    ev = doc_gram_postings(eval_docs, n).select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    tr = doc_gram_postings(train_docs, n).select(
        F.col("doc_id").alias("train_doc_id"), "g"
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.countDistinct("g").alias("n_shared_grams"),
        )
    )
