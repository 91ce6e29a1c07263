"""Streaming connected components (streaming/components.py): per-batch
quotient contraction + depth-1 alias maintenance must equal the batch
operator over all pairs so far, for ANY split of the pair set."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from beast_spark.operators.dedup import dedup_clusters
from beast_spark.streaming.components import ComponentsMaintainer

PAIRS_DDL = "doc1 long, doc2 long"


def _cc_set(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def _batch_cc(spark, pairs):
    return _cc_set(dedup_clusters(spark.createDataFrame(pairs, PAIRS_DDL)))


def test_streamed_components_match_batch_on_random_splits(spark, tmp_path):
    rng = random.Random(11)
    nodes = list(range(60))
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
            )
            if a != b
        }
    )
    # adversarial chain stitched across batches: a long path whose
    # links alternate batch membership
    pairs += [(100 + i, 101 + i) for i in range(20)]
    for trial in range(3):
        r = random.Random(trial)
        splits = [[], [], []]
        for p in pairs:
            splits[r.randrange(3)].append(p)
        m = ComponentsMaintainer(str(tmp_path / f"s{trial}"))
        seen = []
        for b, part in enumerate(splits):
            m.apply_batch(spark.createDataFrame(part, PAIRS_DDL), b)
            seen += part
            assert _cc_set(m.read_components(spark)) == _batch_cc(spark, seen), (
                trial,
                b,
            )
        # depth-1 alias invariant: no alias target is itself aliased
        aliases = m._read_sub(spark, "aliases")
        if aliases is not None:
            chained = aliases.alias("x").join(
                aliases.alias("y"), F.col("x.into") == F.col("y.comp"), "left_semi"
            )
            assert chained.count() == 0


def test_streamed_components_replay_and_empty_batch(spark, tmp_path):
    m = ComponentsMaintainer(str(tmp_path / "s"))
    b0 = spark.createDataFrame([(1, 2), (3, 4)], PAIRS_DDL)
    m.apply_batch(b0, 0)
    before = _cc_set(m.read_components(spark))
    m.apply_batch(b0, 0)  # replay: ledger no-op
    assert _cc_set(m.read_components(spark)) == before
    m.apply_batch(spark.createDataFrame([], PAIRS_DDL), 1)  # empty batch commits
    assert 1 in m.applied_batches()
    assert _cc_set(m.read_components(spark)) == before == {
        (1, 1), (2, 1), (3, 3), (4, 3),
    }
    fresh = ComponentsMaintainer(str(tmp_path / "none"))
    with pytest.raises(ValueError, match="nothing ingested"):
        fresh.read_components(spark)


def test_alias_table_holds_only_referenced_labels(spark, tmp_path):
    """Fourth-review finding: a merged FRESH node's self-label must not
    leave a dead alias row (members are written post-merge) — the
    alias table grows with merged pre-existing labels only, and an
    all-empty-batch state serves an empty read instead of raising."""
    m = ComponentsMaintainer(str(tmp_path / "s"))
    m.apply_batch(spark.createDataFrame([], PAIRS_DDL), 0)
    assert m.read_components(spark).count() == 0  # committed-but-empty
    m.apply_batch(spark.createDataFrame([(1, 2), (3, 4)], PAIRS_DDL), 1)
    # batch 1 merged only fresh labels: zero alias rows
    assert m._read_sub(spark, "aliases") is None
    # batch 2 merges the EXISTING label 3 into 1: exactly one alias row
    m.apply_batch(spark.createDataFrame([(2, 3)], PAIRS_DDL), 2)
    aliases = m._read_sub(spark, "aliases")
    assert [(r.comp, r.into) for r in aliases.collect()] == [(3, 1)]
    assert _cc_set(m.read_components(spark)) == {
        (1, 1), (2, 1), (3, 1), (4, 1),
    }
