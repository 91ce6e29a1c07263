"""Text-analysis column expressions for training-data pipelines.

All pure-Column (JVM-side, whole-stage-codegen) — no Python UDFs in the
hot path. Each helper returns a Column usable in select/filter at any
scale; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny multi-language stopword list for ratio features (public knowledge).
STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that "
    "el la de que y en un los del se las por un une le les des et en du "
    "der die das und ist von zu den dem ein eine"
).split()


def tokens(col: str | Column, sep: str = " ") -> Column:
    """Whitespace tokenization (single-space separator, reference corpus style)."""
    return F.split(F.col(col) if isinstance(col, str) else col, sep)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def unique_token_count(col: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def unique_ratio(col: str | Column) -> Column:
    """Fraction of distinct tokens — low values flag degenerate/repetitive docs."""
    return unique_token_count(col) / token_count(col)


def mean_token_length(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, " ", "")) / token_count(c)


def stopword_ratio(col: str | Column) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw))  # distinct-stopword presence
    return n_stop / F.size(F.array_distinct(toks))


def quality_score(col: str | Column) -> Column:
    """Heuristic [0,1] quality score: length band + lexical diversity.

    Mirrors common pretraining-corpus filters (C4/Gopher-style rules,
    public papers): favor 20–80-token docs with diverse vocabulary.
    """
    n = token_count(col)
    len_ok = F.when((n >= 20) & (n <= 80), F.lit(1.0)).otherwise(F.lit(0.5))
    # floor-form rounding (not F.round): identical in every engine, so
    # oracle SQL can replay the score exactly.
    return F.floor(len_ok * unique_ratio(col) * 10000 + F.lit(0.5)) / 10000


def normalized_text(col: str | Column) -> Column:
    """lower + collapse whitespace + trim — canonical form for fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex)."""
    return F.md5(F.encode(normalized_text(col), "UTF-8"))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles as an array<string> column."""
    return F.array_distinct(_shingle_expr(tokens(col), n))


# BPE-ish pre-tokenization: word pieces, digit runs, single punctuation —
# the regex shape GPT-2-style byte-pair encoders use as the first split
# (public pattern family; simplified to stay identical across regex engines).
BPE_SPLIT_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_token_count(col: str | Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (proxy for LLM token
    budgeting at corpus scale; exact BPE needs a vocab file)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0))


# Marker lexicons for language identification (tiny, public stopword cores).
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is was for with that it on as at by this".split(),
    "es": "el la los las de que y en un una por con para es son del".split(),
    "fr": "le la les des une du et est que pour dans sur avec ne pas".split(),
    "de": "der die das und ist von zu den dem ein eine nicht mit auf".split(),
    "it": "il lo la gli le di che e un una per con non sono nel".split(),
}


def detect_lang(col: str | Column, profiles: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language-ID: argmax of marker-token overlap.

    Pure Column expression (JVM, codegen): per language, count how many
    distinct tokens hit the marker lexicon; pick the best-scoring
    language, 'und' (undetermined) when nothing matches. For real corpora
    swap the lexicons for char-trigram profiles — same expression shape.
    """
    profiles = profiles or LANG_MARKERS
    toks = F.array_distinct(tokens(col))
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(profiles.items())
        ]
    )
    best = F.element_at(F.reverse(F.array_sort(scored)), 1)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def _shingle_expr(toks: Column, n: int) -> Column:
    # sequence(0, size-n) is empty when size < n (sequence with negative stop
    # raises, so guard with a CASE to an empty array).
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(toks: Column, n: int = 4) -> Column:
    """md5 hex of every n-gram shingle, in document order.

    ``toks`` MUST be a materialized token-array column (``withColumn`` the
    result of :func:`tokens` first, then pass that column): the shingle
    lambda random-accesses the array per element, and Catalyst inlines a
    raw ``split()`` EXPRESSION into every access — re-splitting the
    document once per shingle, an O(tokens²) blowup.
    """
    return F.transform(_shingle_expr(toks, n), lambda s: F.md5(F.encode(s, "UTF-8")))


def winnow_from_hashes(hashes: Column, window: int = 4) -> Column:
    """Winnowing selection (MOSS-style rolling-hash fingerprints, public
    scheme) over a shingle-hash array: min of every ``window`` consecutive
    hashes, deduped + sorted — position-robust fingerprints selected
    identically by any engine (lexicographic min over the same hex).

    ``hashes`` MUST be a materialized column (withColumn the result of
    :func:`shingle_hashes` first): referencing the hash-array EXPRESSION
    here makes Catalyst recompute the whole md5 array once per window —
    an O(windows × shingles) hashing blowup (measured ~50×).
    """
    wins = F.transform(
        F.sequence(F.lit(0), F.size(hashes) - window),
        lambda j: F.array_min(F.slice(hashes, j + 1, window)),
    )
    # Guard size(hashes) < window: sequence(0, negative) would feed
    # slice() a descending index range (runtime error / wrong windows).
    return F.when(
        F.size(hashes) >= window, F.array_sort(F.array_distinct(wins))
    ).otherwise(F.array().cast("array<string>"))
