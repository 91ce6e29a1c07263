"""Hashed n-gram importance resampling (DSIR-style data selection).

Selects the documents from a raw crawl that look most like a trusted
target corpus — the data-selection step in front of LLM pretraining
(Xie et al., *Data Selection for Language Models via Importance
Resampling*, NeurIPS 2023). The method:

1. featurize every document as a bag of hashed n-grams (unigrams +
   bigrams folded into ``n_buckets`` hash buckets — the model size is
   fixed at B regardless of vocabulary, which is what makes the fit a
   broadcast at 100 TB);
2. fit two smoothed categorical models over the buckets — ``p`` from
   the target slice, ``q`` from the full raw corpus;
3. weight each document by its mean per-feature log importance ratio
   ``ln(p[b]/q[b])``;
4. keep the top-``n`` documents by weight (the paper samples with
   Gumbel noise; the deterministic top-n variant here is exactly
   replayable by an independent engine, and the sampled variant is one
   ``rand()``-keyed order-by away).

Scale shape: the feature explode is map-side; the two models are ONE
groupBy over B buckets (map-side combinable longs); the fitted
log-ratio table is B rows — broadcast to score documents in a second
map-side pass + one per-doc aggregation. No shuffle grows with the
vocabulary, only with B (a constant) and the corpus (one hash
aggregation on doc_id).

The reference engine (odpf/beast) has no data-selection surface — this
extends the warehouse toward the training-data pipeline the survey
scopes; the hash discipline is the repo-wide md5/xxhash64 family
(functions/hashing.py): ``hash_family="md5"`` is bit-replayable by any
engine (the oracle path), xxhash64 is the cheap default at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beast_spark.functions.hashing import md5_long
from beast_spark.queries._util import rnd

__all__ = [
    "hashed_ngram_features",
    "doc_bucket_counts",
    "bucket_model_counts",
    "model_from_counts",
    "score_bucket_counts",
    "ngram_importance_weights",
    "importance_select",
    "gumbel_topk_sample",
]


def _bucket(feature: Column, n_buckets: int, hash_family: str) -> Column:
    if hash_family == "md5":
        return md5_long(feature) % n_buckets
    if hash_family == "xxhash64":
        # pmod: xxhash64 is signed; both engines' % keeps the dividend sign
        return F.pmod(F.xxhash64(feature), F.lit(n_buckets))
    raise ValueError(f"unknown hash_family {hash_family!r}")


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    hash_family: str = "xxhash64",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *carry_cols, bucket) — one row per feature INSTANCE
    (unigrams + bigrams).

    Tokens are whitespace-split; a unigram hashes as ``u:<w>``, a bigram
    as ``b:<w1> <w2>`` (tokens cannot contain the separator, so the
    namespaces cannot collide). Instance multiplicity is preserved —
    the importance weight is per-occurrence, as in the paper's bag
    model. Map-side only: explode + hash, no shuffle. ``carry_cols``
    ride along unchanged (e.g. the target flag), so consumers never
    join the feature stream back to the document table.
    """
    carry = list(carry_cols or [])
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    uni = docs.select(id_col, *carry, F.explode(toks).alias("w")).select(
        id_col, *carry, F.concat(F.lit("u:"), F.col("w")).alias("feature")
    )
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bi = docs.select(
        id_col, *carry, toks.alias("t"), F.explode(idx).alias("i")
    ).select(
        F.col(id_col),
        *carry,
        F.concat(
            F.lit("b:"),
            F.element_at("t", F.col("i")),
            F.lit(" "),
            F.element_at("t", F.col("i") + 1),
        ).alias("feature"),
    )
    return uni.unionAll(bi).select(
        id_col,
        *carry,
        _bucket(F.col("feature"), n_buckets, hash_family).alias("bucket"),
    )


def doc_bucket_counts(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, _is_target, bucket, cnt): per-document hashed-feature bucket
    histogram — the ONE aggregation of the raw feature stream that both
    the model fit and the scoring pass read (featurize once, aggregate
    early: downstream volume is distinct (doc, bucket) pairs, never raw
    instances)."""
    tagged = docs.select(
        id_col, text_col, is_target.cast("boolean").alias("_is_target")
    )
    feats = hashed_ngram_features(
        tagged, text_col, id_col, n_buckets, hash_family, carry_cols=["_is_target"]
    )
    return feats.groupBy(id_col, "_is_target", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def bucket_model_counts(doc_bucket: DataFrame) -> DataFrame:
    """(bucket, raw_c, tgt_c) from :func:`doc_bucket_counts` output —
    the additive sufficient statistics of the two bucket models (the
    streamed maintainer merges exactly these by addition)."""
    return doc_bucket.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_c"),
        F.sum(F.when(F.col("_is_target"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "tgt_c"
        ),
    )


def model_from_counts(
    counts: DataFrame, n_buckets: int, alpha: float = 1.0
) -> DataFrame:
    """(bucket, log_ratio): the fitted add-``alpha``-smoothed importance
    model — ALWAYS exactly B rows, broadcast by consumers.

    Buckets absent from ``counts`` (never seen during the fit) get the
    zero-count smoothed ratio — that is the point of the smoothing: a
    NEW document scored against a maintained model may hash to buckets
    the fit never saw, and an inner join on a counts-only model would
    silently drop those features (undercounting n_features and skewing
    the mean). The full bucket range is generated, not joined from
    data."""
    spark = counts.sparkSession
    totals = counts.agg(
        F.sum("raw_c").alias("raw_n"), F.sum("tgt_c").alias("tgt_n")
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("raw_c"), F.lit(0)).alias("raw_c"),
            F.coalesce(F.col("tgt_c"), F.lit(0)).alias("tgt_c"),
        )
    )
    return full.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tgt_c") + alpha) / (F.col("tgt_n") + alpha * n_buckets))
            - F.log((F.col("raw_c") + alpha) / (F.col("raw_n") + alpha * n_buckets))
        ).alias("log_ratio"),
    )


def score_bucket_counts(
    doc_bucket: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_features, weight): mean per-feature log importance ratio
    from a per-doc bucket histogram and a fitted model (broadcast —
    the join is map-side at any corpus size)."""
    scored = doc_bucket.join(F.broadcast(model), "bucket")
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_features"),
        rnd(
            F.sum(F.col("cnt") * F.col("log_ratio")) / F.sum("cnt"), round_digits
        ).alias("weight"),
    )


def ngram_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
    hash_family: str = "xxhash64",
    round_digits: int = 4,
) -> DataFrame:
    """Per-document importance weight: mean ``ln(p[b]/q[b])`` over the
    document's hashed-n-gram instances.

    ``is_target`` is a boolean Column over ``docs`` marking the trusted
    target slice (the raw model ``q`` is fit on ALL rows, target
    included — the paper's raw distribution is the corpus being
    selected from). Both models are add-``alpha`` smoothed over the B
    buckets, so an unseen bucket scores finitely.

    Returns (``id_col``, n_features, weight) for every document with at
    least one feature; ``weight`` is deterministically rounded
    (queries/_util.rnd) so engine summation order cannot leak into
    downstream top-n cuts.

    The per-doc bucket histogram is built ONCE and pinned — it feeds
    both the model fit and the scoring pass, and unpinned each consumer
    would replay the full explode+hash of the corpus (the q112 count-
    table discipline; the returned frame keeps reading it, so lifetime
    is caller/process-scoped like the scratch indexes).
    """
    doc_bucket = doc_bucket_counts(
        docs, is_target, text_col, id_col, n_buckets, hash_family
    ).persist()
    model = model_from_counts(bucket_model_counts(doc_bucket), n_buckets, alpha)
    return score_bucket_counts(doc_bucket, model, id_col, round_digits)


def importance_select(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``n`` documents by (weight desc, id) — the deterministic
    selection cut. Adds ``sel_rank``. TakeOrdered-shaped: the global
    sort is a top-n, never a full ordering of the corpus."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("weight").desc(), F.col(id_col))
    top = weights.orderBy(F.col("weight").desc(), F.col(id_col)).limit(n)
    return top.withColumn("sel_rank", F.row_number().over(w))


#: 2^52: the Gumbel uniform uses 13 hex chars (52 bits) so every value in
#: the map to (0, 1) is EXACTLY representable as a double — h + 0.5 at
#: magnitudes below 2^52 and the division by a power of two are both
#: exact IEEE-754 ops, so any engine reproduces u bit-identically. (15
#: chars would round near the top of the range: longs in
#: [2^60 − 128, 2^60) cast to exactly 2^60 as doubles, collapsing u to
#: 1.0 and sending ln(−ln u) to NULL in one engine but not another.)
_GUMBEL_SPAN = 1 << 52
_GUMBEL_CHARS = 13


def gumbel_topk_sample(
    weights: DataFrame,
    n: int,
    temperature: float = 1.0,
    seed_salt: str = "gumbel:",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Seeded Gumbel-top-k importance SAMPLING — the paper's actual
    resampling step (select with probability ∝ exp(weight / T)), made
    deterministic: the Gumbel noise ``g = −ln(−ln(u))`` draws its
    uniform ``u`` from the md5 hash of (salt ‖ id), so any engine
    replays the exact sample (the Efraimidis–Spirakis/Gumbel-max
    reduction of weighted sampling-without-replacement to a top-k).
    ``temperature`` interpolates between greedy top-n (T→0 recovers
    :func:`importance_select` up to noise scale) and uniform (T→∞).

    Returns the ``n`` sampled rows with ``sample_key`` (rounded
    floor-form so an engine's 1-ulp ``ln`` difference cannot flip the
    cut except on a measure-zero boundary) and ``sel_rank``.
    TakeOrdered-shaped, like the greedy cut."""
    from pyspark.sql.window import Window

    u = (
        md5_long(
            F.concat(F.lit(seed_salt), F.col(id_col).cast("string")),
            chars=_GUMBEL_CHARS,
        )
        + 0.5
    ) / float(_GUMBEL_SPAN)  # in (0, 1) exactly: both ln() calls stay finite
    keyed = weights.withColumn(
        "sample_key",
        rnd(F.col("weight") / temperature - F.log(-F.log(u)), round_digits),
    )
    w = Window.orderBy(F.col("sample_key").desc(), F.col(id_col))
    top = keyed.orderBy(F.col("sample_key").desc(), F.col(id_col)).limit(n)
    return top.withColumn("sel_rank", F.row_number().over(w))
