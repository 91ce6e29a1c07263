"""Property-based tests (hypothesis) for the incremental/distributed
operators: rollup merge, global row ids, hierarchy flattening.

Each property is the operator's core contract under ARBITRARY inputs —
not the fixed SF fixtures the example tests use. Spark jobs per example
are slow, so example counts stay small; the properties themselves are
exhaustive over the generated structure (every row / every node is
checked, not a sample).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=6, deadline=None)

EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),  # day offset
    st.sampled_from(["a", "b"]),
    st.integers(min_value=-(10**6), max_value=10**6),  # value in cents
)
EVENTS = st.lists(EVENT, min_size=0, max_size=40)


def _events_df(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (t0 + dt.timedelta(days=d), et, cents / 100.0) for d, et, cents in rows
    ]
    return spark.createDataFrame(
        data, "ts timestamp, event_type string, value double"
    )


@given(rows=EVENTS, split=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_rollup_merge_equals_full_for_any_split(spark, rows, split):
    """merge(rollup(A), rollup(B)) == rollup(A ∪ B) for EVERY split of
    an arbitrary event set — the mergeable-state contract itself."""
    from beast_spark.operators.rollup import daily_rollup, merge_rollups

    args = dict(key_cols=["event_type"], ts_col="ts", value_col="value")
    full = daily_rollup(_events_df(spark, rows), **args)
    merged = merge_rollups(
        daily_rollup(_events_df(spark, rows[:split]), **args),
        daily_rollup(_events_df(spark, rows[split:]), **args),
    )

    def key(df):
        return sorted(
            (r.day, r.event_type, r.n_rows, r.sum_cents) for r in df.collect()
        )

    assert key(merged) == key(full)


@given(
    ids=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    nparts=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_row_ids_are_the_sorted_rank(spark, ids, nparts):
    """with_row_ids assigns exactly 1..N in sort order for ANY unique
    key set and ANY partition count."""
    from beast_spark.operators.rowids import with_row_ids

    df = spark.createDataFrame([(i,) for i in ids], "k long").repartition(5)
    got = {
        r.k: r.row_id
        for r in with_row_ids(df, ["k"], num_partitions=nparts).collect()
    }
    want = {k: rank + 1 for rank, k in enumerate(sorted(ids))}
    assert got == want


@given(
    parents=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=50),
)
@settings(**SETTINGS)
def test_hierarchy_depths_match_python_walk(spark, parents):
    """flatten_hierarchy agrees with a driver-side path walk on ANY
    random forest (node i's parent drawn from nodes < i → acyclic)."""
    from beast_spark.operators.hierarchy import flatten_hierarchy

    # node 0 is a root; node i>0 gets parent (parents[i] % i), or None
    # (a new root) when the draw lands on itself modulo a coin.
    rows = [(0, None)]
    for i in range(1, len(parents) + 1):
        p = parents[i - 1] % (i + 1)
        rows.append((i, None if p == i else p))

    def walk(n):
        depth, cur = 0, n
        by_id = dict(rows)
        while by_id[cur] is not None:
            cur = by_id[cur]
            depth += 1
        return cur, depth

    nodes = spark.createDataFrame(rows, "id long, parent long")
    got = {
        r.id: (r.root_id, r.depth)
        for r in flatten_hierarchy(nodes, "id", "parent").collect()
    }
    assert got == {n: walk(n) for n, _ in rows}


VEC = st.lists(
    st.integers(min_value=-100, max_value=100).map(lambda v: v / 20.0),
    min_size=6,
    max_size=6,
)
VECSET = st.lists(VEC, min_size=0, max_size=14)


@given(vecs=VECSET, split=st.integers(min_value=0, max_value=14))
@settings(**SETTINGS)
def test_multitable_increment_property_on_arbitrary_vectors(spark, vecs, split):
    """pairs(full, L tables) == pairs(existing) ∪ pairs(increment),
    disjointly, for ANY vector set and ANY split point — including the
    empty-index (first batch) and empty-increment edges the SF-fixture
    test never exercises."""
    from beast_spark.functions.vectors import norm
    from beast_spark.operators.similarity import (
        embedding_multitable_postings,
        incremental_multitable_neardup_pairs,
        lsh_multitable_neardup_pairs,
        multitable_planes,
    )

    # drop the all-zero vector (cosine undefined) and dedupe positions
    rows = [(i, v) for i, v in enumerate(vecs) if any(x != 0.0 for x in v)]
    ddl = "vec_id long, embedding array<double>"
    full_df = spark.createDataFrame(rows, ddl)
    old_df = spark.createDataFrame(rows[:split], ddl)
    new_df = spark.createDataFrame(rows[split:], ddl)
    tables = multitable_planes(6, 3, 4)
    thr = 0.2

    def pairset(df):
        return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}

    ex_post = embedding_multitable_postings(old_df, tables)
    ex_vec = old_df.select("vec_id", "embedding").withColumn(
        "nrm", norm(F.col("embedding"))
    )
    new_post, new_vec, inc = incremental_multitable_neardup_pairs(
        ex_post, ex_vec, new_df, dims=6, threshold=thr, tables=tables
    )
    inc_set = pairset(inc)
    full = pairset(
        lsh_multitable_neardup_pairs(full_df, dims=6, threshold=thr, tables=tables)
    )
    existing = pairset(
        lsh_multitable_neardup_pairs(old_df, dims=6, threshold=thr, tables=tables)
    )
    new_post.unpersist()
    new_vec.unpersist()
    assert existing | inc_set == full
    assert existing.isdisjoint(inc_set)


@given(vecs=VECSET, split=st.integers(min_value=0, max_value=14))
@settings(**SETTINGS)
def test_quantized_increment_property_on_arbitrary_vectors(spark, vecs, split):
    """pairs_q(full) == pairs_q(existing) ∪ pairs_q(increment) under a
    frozen codebook for ANY vector set and split — constant dimensions
    (mx == mn), empty sides, and single-vector corpora included."""
    from beast_spark.operators.similarity import (
        dequantize_codes,
        embedding_lsh_index_quantized,
        hyperplanes_md5,
        incremental_lsh_neardup_pairs_quantized,
        lsh_neardup_pairs,
        quantization_params,
        quantize_codes,
    )

    rows = [(i, v) for i, v in enumerate(vecs) if any(x != 0.0 for x in v)]
    ddl = "vec_id long, embedding array<double>"
    full_df = spark.createDataFrame(rows, ddl)
    if not rows:
        return  # quantization_params needs >= 1 vector
    old_df = spark.createDataFrame(rows[:split], ddl)
    new_df = spark.createDataFrame(rows[split:], ddl)
    planes = hyperplanes_md5(6, 3)
    thr = 0.2
    params = quantization_params(full_df)  # frozen over the union

    def pairset(df):
        return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}

    qindex = embedding_lsh_index_quantized(old_df, planes, params)
    new_idx, inc = incremental_lsh_neardup_pairs_quantized(
        qindex, params, new_df, dims=6, threshold=thr, planes=planes
    )
    inc_set = pairset(inc)
    new_idx.unpersist()

    def dq_pairs(src):
        dq = dequantize_codes(quantize_codes(src, params), params).select(
            "vec_id", F.col("dqvec").alias("embedding")
        )
        return pairset(lsh_neardup_pairs(dq, dims=6, threshold=thr, planes=planes))

    full = dq_pairs(full_df)
    existing = dq_pairs(old_df)
    assert existing | inc_set == full
    assert existing.isdisjoint(inc_set)


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
def test_bpe_train_matches_python_reference(spark, words, n_merges):
    """The distributed trainer must agree with a direct Python
    implementation of Sennrich's algorithm (raw adjacent stats argmax
    with lexicographic tie-break; greedy left-to-right non-overlapping
    merge) on arbitrary tiny corpora — including the adversarial
    all-'a'/'b' run-heavy cases where overlap handling matters."""
    from collections import Counter

    from beast_spark.operators.bpe import bpe_train

    def py_merge(syms, left, right):
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return out

    vocab = {w: (list(w), c) for w, c in Counter(words).items()}
    expected = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        expected.append((l, r, n))
        vocab = {w: (py_merge(s, l, r), c) for w, (s, c) in vocab.items()}

    merges, final = bpe_train(
        spark.createDataFrame([(" ".join(words),)], "text string"),
        n_merges=n_merges,
    )
    got_segs = {r.word: r.syms for r in final.collect()}
    final.unpersist()
    assert [(m.left, m.right, m.pair_count) for m in merges] == expected
    assert got_segs == {w: s for w, (s, _c) in vocab.items()}


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n_merges=st.integers(min_value=1, max_value=4),
    batch=st.integers(min_value=1, max_value=3),
)
def test_bpe_train_batched_matches_python_reference(spark, words, n_merges, batch):
    """The BATCHED trainer must agree with a direct Python
    implementation of the batched schedule: per pass, stats once, then
    greedy selection of the top pairs (n desc, lexicographic ties)
    whose symbols avoid every earlier-selected pair's {l, r, l||r},
    applied in rank order — including per-merge merged-mass accounting
    and the final segmentations. batch=1 must degenerate to plain
    sequential Sennrich (bpe_train)."""
    from collections import Counter

    from beast_spark.operators.bpe import bpe_train, bpe_train_batched

    def py_merge(syms, left, right):
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return out

    def mass(vocab):
        return sum(len(s) * c for s, c in vocab.values())

    vocab = {w: (list(w), c) for w, c in Counter(words).items()}
    expected = []
    while len(expected) < n_merges:
        stats = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        ranked = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        sel, used = [], set()
        for (pl, pr), n in ranked:
            if len(sel) == min(batch, n_merges - len(expected)):
                break
            if pl in used or pr in used:
                continue
            sel.append((pl, pr, n))
            used |= {pl, pr, pl + pr}
        if not sel:
            break
        for pl, pr, n in sel:
            m0 = mass(vocab)
            vocab = {w: (py_merge(s, pl, pr), c) for w, (s, c) in vocab.items()}
            expected.append((pl, pr, n, m0 - mass(vocab)))

    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    merges, final = bpe_train_batched(docs, n_merges=n_merges, batch=batch)
    got_segs = {r.word: r.syms for r in final.collect()}
    final.unpersist()
    assert [
        (m.left, m.right, m.pair_count, m.merged) for m in merges
    ] == expected
    assert got_segs == {w: s for w, (s, _c) in vocab.items()}

    if batch == 1:
        seq, fin = bpe_train(docs, n_merges=n_merges)
        fin.unpersist()
        assert [(m.left, m.right, m.pair_count, m.merged) for m in seq] == expected
