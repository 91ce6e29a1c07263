"""Two-phase (large-star/small-star) connected components vs the
min-label oracle.

`dedup_clusters` is the production path for the whole dedup spine
(q73/q86/q94/q110/q118/q125/q157); `dedup_clusters_minlabel` is the
O(diameter) reference implementation kept as the semantics oracle.
These tests pin:

* identical (doc_id, cluster_id) sets on random graphs (hypothesis),
* identical results on the adversarial long-chain graph where the
  min-label version needs O(n) rounds,
* the O(log n) round bound of the star-contraction version on that
  same chain (<= 2*log2(n) + 2 alternation rounds),
* edge cases: empty input, single pair, disjoint components.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from beast_spark.operators.dedup import dedup_clusters, dedup_clusters_minlabel

SETTINGS = dict(max_examples=6, deadline=None)

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=40,
)


def _pairs_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "doc1 long, doc2 long")
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc1 long, doc2 long"
    )


def _labels(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _python_components(edges):
    """Driver-side union-find ground truth (min id as label)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {(n, find(n)) for n in nodes}


@given(edges=EDGES)
@settings(**SETTINGS)
def test_twophase_matches_minlabel_and_unionfind(spark, edges):
    # Self-loop-only inputs produce no components in either operator.
    pairs = _pairs_df(spark, edges)
    got = _labels(dedup_clusters(pairs))
    assert got == _python_components(edges)
    assert got == _labels(dedup_clusters_minlabel(pairs, max_iter=80))


def test_adversarial_chain_equality_and_log_rounds(spark):
    # A 64-deep path graph: min-label needs 63 rounds; star contraction
    # must converge in <= 2*log2(64) + 2 = 14 alternation rounds.
    n = 64
    chain = [(i, i + 1) for i in range(n - 1)]
    pairs = _pairs_df(spark, chain)
    stats: dict = {}
    got = _labels(dedup_clusters(pairs, stats=stats))
    assert got == {(i, 0) for i in range(n)}
    assert stats["rounds"] <= 2 * math.log2(n) + 2, stats
    assert got == _labels(dedup_clusters_minlabel(pairs, max_iter=100))


def test_reversed_chain_and_disjoint_components(spark):
    # Chain given high-to-low plus a separate triangle and an isolated pair.
    edges = [(i + 1, i) for i in range(100, 110)] + [
        (201, 202),
        (202, 203),
        (203, 201),
        (301, 300),
    ]
    got = _labels(dedup_clusters(_pairs_df(spark, edges)))
    want = {(i, 100) for i in range(100, 111)}
    want |= {(201, 201), (202, 201), (203, 201)}
    want |= {(300, 300), (301, 300)}
    assert got == want


def test_empty_and_self_loop_inputs(spark):
    assert _labels(dedup_clusters(_pairs_df(spark, []))) == set()
    assert _labels(dedup_clusters(_pairs_df(spark, [(5, 5)]))) == set()


def test_exhausted_round_budget_raises(spark):
    """Never return silently unconverged labels (the flatten_hierarchy
    discipline): an insufficient round budget raises."""
    import pytest

    chain = _pairs_df(spark, [(i, i + 1) for i in range(16)])
    with pytest.raises(ValueError, match="not converged"):
        dedup_clusters(chain, max_iter=1)
