"""Byte-pair-encoding tokenizer TRAINING on Spark.

The Sennrich et al. 2016 construction ("Neural Machine Translation of
Rare Words with Subword Units"): repeatedly merge the most frequent
adjacent symbol pair. The key scale property is that training runs on
the WEIGHTED VOCABULARY, not the raw corpus — one corpus-sized
word-count aggregation up front, then every merge round touches only
the distinct-word table (thousands of rows at any corpus size, each
carrying its corpus frequency). A 100-TB corpus and a 100-GB corpus
with the same vocabulary train in the same per-round time.

Per round: adjacent symbol pairs explode from the vocab's symbol
arrays (weighted by word frequency — RAW adjacent counts, overlapping
runs included, exactly the reference ``get_stats``), one
map-side-combinable sum picks the argmax pair (ties break
lexicographically — deterministic across engines and runs), and a
pure-column left-to-right greedy fold rewrites each word's symbol
array. The driver reads ONE scalar row per round (the best pair) —
the O(rounds) scalar-probe pattern the star-contraction clustering
already uses; everything else stays on executors.

Greedy fold semantics (the reference implementations' behavior):
occurrences merge left-to-right without overlap — pair (a,a) on
[a,a,a] yields [aa, a]; a merged token never chain-merges within the
same round (the new token ``ab`` could only equal the pair's left
symbol ``a`` if ``b`` were empty). The per-round merged-occurrence
count is therefore measured AFTER the fold as the freq-weighted symbol
count delta, not inferred from the (overlap-inclusive) selection
stats.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_vocab",
    "bpe_token_accounting",
    "bpe_merge_fold",
    "bpe_train",
    "bpe_train_batched",
    "BpeMerge",
]


@dataclass(frozen=True)
class BpeMerge:
    round: int
    left: str
    right: str
    pair_count: int  # freq-weighted RAW adjacent occurrences (selection stat)
    merged: int  # freq-weighted occurrences actually merged (mass delta)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus-weighted vocabulary — the ONLY
    corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """All adjacent (l, r) symbol pairs of one word, overlap included —
    the reference selection statistic."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def pair_stats(vocab_syms: DataFrame) -> DataFrame:
    """(l, r, n): corpus-weighted adjacent-pair counts over the
    vocabulary's symbol arrays — map-side explode, one
    map-side-combinable sum; vocab-sized, never corpus-sized."""
    return (
        vocab_syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
    )


def bpe_merge_fold(sym_col: F.Column, left: str, right: str) -> F.Column:
    """Left-to-right greedy non-overlapping merge of the (left, right)
    symbol pair, as a pure column fold (aggregate over the symbol
    array): no UDF, whole-stage codegen, O(symbols) per word."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_token_accounting(docs: DataFrame, seg: DataFrame) -> DataFrame:
    """(source, n_words, n_chars, n_subwords): per-source token
    accounting of ``docs`` under a TRAINED segmentation table
    (word, n_sub) — q188's application shape (segment the distinct
    vocabulary once offline, broadcast-join it back onto the corpus
    words: a dictionary lookup per word, never a re-segmentation;
    out-of-vocabulary words drop via the inner join). Shared by the
    batch query (q188) and the streaming maintainer's per-batch
    contribution (q198) so the application spec cannot drift between
    the twin and its query."""
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> tuple[list[BpeMerge], DataFrame]:
    """Train ``n_merges`` BPE merges on the corpus.

    Returns (ordered merge table, final vocabulary frame (word, freq,
    syms)). Stops early if no adjacent pair remains (every word fully
    merged). Each round is two vocab-sized jobs (stats argmax + fold
    rewrite with its mass aggregate); the vocab frame is re-persisted
    per round so the fold lineage does not stack across rounds."""
    vocab = word_vocab(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    ).persist()
    merges: list[BpeMerge] = []
    try:
        mass_before = vocab.agg(
            F.sum(F.size("syms") * F.col("freq")).alias("m")
        ).first().m
        for r in range(1, n_merges + 1):
            best = (
                pair_stats(vocab)
                .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
                .first()
            )
            if best is None:
                break
            nxt = vocab.withColumn(
                "syms", bpe_merge_fold(F.col("syms"), best.l, best.r)
            ).persist()
            try:
                mass_after = nxt.agg(
                    F.sum(F.size("syms") * F.col("freq")).alias("m")
                ).first().m
            except Exception:
                nxt.unpersist()  # the outer handler releases `vocab`
                raise
            merges.append(
                BpeMerge(
                    round=r,
                    left=best.l,
                    right=best.r,
                    pair_count=int(best.n),
                    merged=int(mass_before - mass_after),
                )
            )
            vocab.unpersist()
            vocab = nxt
            mass_before = mass_after
        return merges, vocab
    except Exception:
        vocab.unpersist()
        raise


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int = 8,
    batch: int = 4,
    text_col: str = "text",
) -> tuple[list[BpeMerge], DataFrame]:
    """BPE training with BATCHED merge passes — the production-vocab
    form of :func:`bpe_train`.

    Sequential Sennrich training runs one vocab-sized Spark job pair
    per merge: fine for 8 merges, but a 32k-vocab tokenizer is 32k
    sequential jobs — the driver round-trip, scheduler latency, and
    lineage churn dominate long before compute does. This variant
    applies up to ``batch`` merges per PASS: one pair-stats job, then a
    driver-side greedy selection of the top pairs (by n desc, then
    (l, r) lexicographic) that are mutually SYMBOL-DISJOINT, then one
    rewrite job chaining all selected folds in rank order. Vocab-sized
    jobs per merge drop ~``batch``-fold; driver probes against the
    PERSISTED (tiny) stats frame are scalar reads.

    Disjointness rule: a pair (l2, r2) may join the pass only if
    neither symbol appears among an earlier-selected pair's {l, r,
    l||r}. Under that rule the occurrence SET of each selected pair is
    invariant under the earlier folds of the same pass — a fold
    consumes only its own l/r tokens and the token it creates sits
    between untouched neighbours, so it neither makes nor breaks an
    adjacency of symbols it does not mention. Hence every applied
    merge's selection count equals its true adjacent count at
    application time, and the per-pass stats stay honest.

    This is a DIFFERENT (documented) training order from sequential
    Sennrich: a merged token created mid-pass could, under sequential
    training, out-rank the pass's later slots (e.g. when every ``ab``
    is preceded by the same ``x``, sequential picks (x, ab) next).
    Batched training defers such derived pairs to the next pass. The
    trade is standard for distributed BPE; determinism is total (stats
    argmax + lexicographic ties + the fixed disjointness rule), so the
    whole schedule replays bit-for-bit in the DuckDB oracle (q194) and
    against the pure-Python reference (property-tested).

    Returns (ordered merge table, final vocab frame) exactly like
    :func:`bpe_train`; ``BpeMerge.round`` numbers merges globally in
    application order.
    """
    vocab = (
        word_vocab(docs, text_col)
        .withColumn("syms", F.split(F.col("word"), ""))
        .persist()
    )
    merges: list[BpeMerge] = []
    try:
        while len(merges) < n_merges:
            stats = pair_stats(vocab).persist()
            try:
                sel = []
                used: set[str] = set()
                while len(sel) < min(batch, n_merges - len(merges)):
                    cand = stats
                    if used:
                        blocked = sorted(used)
                        cand = stats.filter(
                            ~F.col("l").isin(blocked) & ~F.col("r").isin(blocked)
                        )
                    row = cand.orderBy(F.col("n").desc(), "l", "r").first()
                    if row is None:
                        break
                    sel.append(row)
                    used |= {row.l, row.r, row.l + row.r}
            finally:
                stats.unpersist()
            if not sel:
                break
            # one job computes the symbol mass after EACH fold stage (the
            # chained folds are re-evaluated per stage — O(batch^2) folds
            # over the vocab-sized frame, cheap for small batches), so the
            # per-merge merged-occurrence accounting matches bpe_train's
            folded = F.col("syms")
            mass_cols = [F.sum(F.size("syms") * F.col("freq")).alias("m0")]
            for i, row in enumerate(sel, start=1):
                folded = bpe_merge_fold(folded, row.l, row.r)
                mass_cols.append(
                    F.sum(F.size(folded) * F.col("freq")).alias(f"m{i}")
                )
            masses = vocab.agg(*mass_cols).first()
            nxt = vocab.withColumn("syms", folded).persist()
            for i, row in enumerate(sel, start=1):
                merges.append(
                    BpeMerge(
                        round=len(merges) + 1,
                        left=row.l,
                        right=row.r,
                        pair_count=int(row.n),
                        merged=int(masses[i - 1] - masses[i]),
                    )
                )
            vocab.unpersist()
            vocab = nxt
        return merges, vocab
    except Exception:
        vocab.unpersist()
        raise
