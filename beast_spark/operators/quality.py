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
    "gopher_signals",
    "gate_rejection_counts",
    "gate_stats_row",
    "GATE_STOPWORDS",
]

def _top_run_count(arr):
    """Max multiplicity of any element of ``arr`` (long), via a sorted
    run-length fold: O(n log n) sort + O(n) single-pass ``aggregate``,
    replacing the O(tokens x distinct) transform/filter scan the gate
    and the repetition signals used before (guide §1.2 "per-task work":
    same value — an integer count — at a fraction of the per-row cost).
    Deterministic: the fold order is the sorted order."""
    step = lambda acc, x: F.when(  # noqa: E731 — shared by run and best
        acc["prev"].isNull() | (acc["prev"] != x), F.lit(1).cast("long")
    ).otherwise(acc["run"] + F.lit(1).cast("long"))
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            step(acc, x).alias("run"),
            F.greatest(acc["best"], step(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _sum_c_ln_c(arr):
    """Σ c·ln(c) over the multiplicities c of ``arr``'s elements, via the
    same sorted run-length fold (each run closes by adding run·ln(run)).
    The fold order is fixed (sorted), so the float sum is deterministic —
    unlike the shuffle-merge order of the groupBy form it replaces."""
    nxt = lambda acc, x: F.when(  # noqa: E731
        acc["prev"].isNull() | (acc["prev"] != x), F.lit(1).cast("long")
    ).otherwise(acc["run"] + F.lit(1).cast("long"))
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("s"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            nxt(acc, x).alias("run"),
            F.when(
                acc["prev"].isNotNull() & (acc["prev"] != x),
                acc["s"] + acc["run"].cast("double") * F.log(acc["run"].cast("double")),
            ).otherwise(acc["s"]).alias("s"),
        ),
        lambda acc: acc["s"] + acc["run"].cast("double") * F.log(acc["run"].cast("double")),
    )


#: the gate's rule columns, in reporting order — shared by the batch
#: accounting (q180) and the streaming maintainer so the two cannot
#: drift (their equality is the q189 contract)
GATE_RULES = (
    "ok_word_count",
    "ok_mean_word_len",
    "ok_top_token",
    "ok_unique_ratio",
    "ok_stopwords",
)

# The small closed stopword set the rule-gate counts PRESENCE of
# (Gopher-style "contains at least two stopwords" rule). Closed and
# enumerated — each membership test is one array_contains, exactly
# replayable in any engine — unlike functions/text.py::STOPWORDS whose
# ratio feature serves scoring, not gating.
GATE_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is"]


def entropy_signals(docs: DataFrame) -> DataFrame:
    """q123's token-entropy signals: (doc_id, n_tokens, n_unique,
    entropy, norm_entropy). H = ln(n) − Σ c·ln c / n over per-doc word
    counts; norm_entropy = H / ln(n_unique) (0 for single-word docs).

    MAP-SIDE (round 13): the per-word counts live entirely inside each
    document's own token array, so Σ c·ln c folds per row over the
    sorted array (:func:`_sum_c_ln_c`) — the old explode → groupBy
    (doc, word) → regroup shape shuffled every token twice to compute a
    per-row quantity (guide §2.4: remove shuffles outright). Plan: one
    scan, zero hash Exchange; same rounded values (the fold's fixed
    sorted order is MORE deterministic than shuffle-merge float order;
    oracle-verified at all three SFs)."""
    toks = F.split(F.col("text"), " ")
    h = F.log(F.col("n").cast("double")) - F.col("_clc") / F.col("n")
    return (
        docs.select("doc_id", toks.alias("_t"))
        .select(
            "doc_id",
            F.size("_t").cast("long").alias("n"),
            F.size(F.array_distinct("_t")).cast("long").alias("n_unique"),
            _sum_c_ln_c(F.col("_t")).alias("_clc"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_unique",
            rnd(h, 4).alias("entropy"),
            F.when(
                F.col("n_unique") > 1,
                rnd(h / F.log(F.col("n_unique").cast("double")), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("norm_entropy"),
        )
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """q117's repetition signals: (doc_id, n_grams, n_unique,
    dup_trigram_frac, top_word_frac). Documents shorter than 3 tokens
    have no trigrams and are ABSENT (filtered map-side)."""
    # MAP-SIDE (round 13): every signal is a function of one document's
    # own token array — trigram multiset, distinct trigrams, top-word
    # multiplicity — so all of it computes per row: the trigram array
    # via transform, n_unique via array_distinct, the top-word count via
    # the sorted run-length fold. The old shape exploded the corpus
    # TWICE (trigrams + words) through two groupBy pipelines and joined
    # them back — 6 hash Exchanges and 2 scans for per-row quantities
    # (guide §2.4). Values are bit-identical: integer counts and the
    # same two float divisions.
    # _t is materialized BEFORE the trigram transform: a lambda over the
    # split() EXPRESSION re-splits the document once per element
    # (Catalyst inlines the subtree — the _doc_shingles O(tokens²) trap)
    toks = F.split(F.col("text"), " ")
    t = F.col("_t")
    # The when() guard makes the expression TOTAL, not just guarded by the
    # filter below: a consumer's pushed-down predicate over dup_trigram_frac
    # gets the trigram subtree inlined and subexpression-hoisted ABOVE the
    # size>=3 conjunct (q169's plan — GeneratedClass$SpecificPredicate
    # evaluates subExpr_0 eagerly), where an unguarded sequence(1, size-2)
    # DESCENDS on short docs and element_at(i+2) throws under ANSI.
    tri = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.filter(F.size(toks) >= 3)
        .select("doc_id", toks.alias("_t"))
        .select("doc_id", "_t", tri.alias("_tri"))
        .select(
            "doc_id",
            F.size("_tri").cast("long").alias("n_grams"),
            F.size(F.array_distinct("_tri")).cast("long").alias("n_unique"),
            _top_run_count(F.col("_t")).alias("_topc"),
            F.size("_t").cast("long").alias("_nw"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_unique",
            rnd(1.0 - F.col("n_unique").cast("double") / F.col("n_grams"), 4).alias(
                "dup_trigram_frac"
            ),
            rnd(F.col("_topc").cast("double") / F.col("_nw"), 4).alias(
                "top_word_frac"
            ),
        )
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
    # Pin the window postings: they feed BOTH the global flag count and
    # the per-doc flagged-window semi-join, and unpinned each consumer
    # would re-run the explode + per-window md5 — the expensive subtree
    # — from scratch (round 13; measured ~2× the hashing work in q166's
    # plan, which scanned documents twice). At warehouse scale this
    # persist is the maintained window-hash index corpus_v3 stores
    # anyway. Registered/releasable via operators._cache.
    from beast_spark.operators._cache import pin_scratch

    wins = pin_scratch(window_hashes(docs, window))
    flagged = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("wh")
    )
    return span_cleaned(docs, flagged, window, include_text, wins=wins)


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
    wins: DataFrame | None = None,
) -> DataFrame:
    """Phase 2 of :func:`repeated_span_stats`: given the flagged window
    hashes (a (wh) frame — from a full-corpus count or a maintained
    global count table), merge each document's flagged windows into
    maximal spans and emit the cleaned form. Separated so an
    incremental maintainer can recompute ONLY affected documents
    against GLOBAL counts. ``wins`` — the (doc_id, i, wh) postings for
    ``docs`` if the caller already built (or maintains) them; absent,
    they are recomputed here."""
    from pyspark.sql.window import Window as W

    t = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= window
    )
    if wins is None:
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


def gopher_signals(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_top_token_frac: float = 0.2,
    min_unique_ratio: float = 0.3,
    min_stopwords: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rule-based document gate in the MassiveText/Gopher style
    (Rae et al. 2021, "Scaling Language Models", appendix A): hard
    per-document thresholds, each exposed as its own boolean so the
    gate ACCOUNTS for what it rejects instead of silently dropping.

    Rules (defaults follow the published heuristics; tighten per
    corpus): word count within [min_words, max_words]; mean word
    length within [min_mean_word_len, max_mean_word_len]; the most
    frequent token may claim at most ``max_top_token_frac`` of the
    document (RefinedWeb-style repetition guard — complements q117's
    duplicate-trigram fraction, which catches phrase loops this
    single-token rule misses); distinct-token ratio at least
    ``min_unique_ratio``; and at least ``min_stopwords`` distinct
    members of the closed :data:`GATE_STOPWORDS` set present (pure
    symbol soup has none).

    Everything is a pure JVM column expression over the token array —
    no explode, no shuffle, no Python: one map stage at any scale, and
    every rule replays exactly in ANSI SQL (integer counts and IEEE
    divisions only). The top-token count is an O(tokens log tokens)
    sorted run-length fold — document-sized work, the same envelope as
    the other per-doc builders here.

    Returns one row per document: (doc_id, any ``keep_cols``
    passed through, n_tokens, plus one ``ok_*`` boolean per rule and
    ``pass_all``). ``keep_cols`` exist so consumers that need more of
    the document row (source, lang, ...) stay a SINGLE scan instead of
    re-joining the corpus against its own signals.
    """
    # materialize the token array once: every rule below reads _t, so
    # the split runs once per row instead of once per rule (round 13)
    toks = F.col("_t")
    n = F.size(toks)
    mean_len = F.length(F.regexp_replace(F.col(text_col), " ", "")) / n
    # top-token multiplicity via the sorted run-length fold — the same
    # integer the old O(tokens × distinct) transform/filter scan
    # produced, at O(tokens log tokens) (round 13, guide §1.2)
    top_cnt = _top_run_count(toks)
    n_stop = sum(
        F.array_contains(toks, w).cast("int") for w in GATE_STOPWORDS
    )
    return docs.select(
        "doc_id", *keep_cols, text_col, F.split(F.col(text_col), " ").alias("_t")
    ).select(
        "doc_id",
        *keep_cols,
        n.alias("n_tokens"),
        ((n >= min_words) & (n <= max_words)).alias("ok_word_count"),
        (
            (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
        ).alias("ok_mean_word_len"),
        (top_cnt / n <= max_top_token_frac).alias("ok_top_token"),
        (F.size(F.array_distinct(toks)) / n >= min_unique_ratio).alias(
            "ok_unique_ratio"
        ),
        (n_stop >= min_stopwords).alias("ok_stopwords"),
    ).withColumn(
        "pass_all",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_top_token")
        & F.col("ok_unique_ratio")
        & F.col("ok_stopwords"),
    )


def gate_rejection_counts(sig: DataFrame) -> DataFrame:
    """One row of raw gate accounting over a ``gopher_signals`` frame:
    n_docs, one fail_* count per rule, n_retained — everything a sum of
    per-document 0/1 indicators, which is what makes the streamed
    maintenance (``streaming/gatestats.py``) exactly additive."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs += [
        F.count(F.when(~F.col(r), 1)).alias(r.replace("ok_", "fail_"))
        for r in GATE_RULES
    ]
    aggs.append(F.count(F.when(F.col("pass_all"), 1)).alias("n_retained"))
    return sig.agg(*aggs)


def gate_stats_row(counts: DataFrame) -> DataFrame:
    """The reported accounting row (q180's output shape): the raw
    counts plus the derived retention fraction."""
    return counts.select(
        "n_docs",
        *[r.replace("ok_", "fail_") for r in GATE_RULES],
        "n_retained",
        rnd(F.col("n_retained") / F.col("n_docs").cast("double"), 4).alias(
            "retained_frac"
        ),
    )
