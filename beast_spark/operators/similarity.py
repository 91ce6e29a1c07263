"""Embedding similarity search: brute-force baseline + LSH-bucketed ANN.

Scale design:

* **Brute force** is the correctness baseline: broadcast the (small) query
  set, compute cosine JVM-side via ``zip_with``/``aggregate`` folds, rank
  with a window. Cost O(N·Q) but embarrassingly parallel — at 100 TB the
  broadcast of the query set keeps it a single map stage plus a top-k
  shuffle of only Q·k rows.
* **Random-hyperplane LSH** is the scale path: P deterministic
  hyperplanes (seeded numpy, shipped as literal arrays — tiny) → P sign
  bits → bucket id. Join on bucket (optionally multi-probe) and rank
  only within buckets; candidate volume drops ~2^P-fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.functions.vectors import dot, norm

__all__ = [
    "DEFAULT_MAX_BUCKET",
    "capped_bucket_pairs",
    "brute_force_topk",
    "hyperplanes",
    "hyperplanes_md5",
    "lsh_bucket_col",
    "lsh_neardup_pairs",
    "lsh_multitable_neardup_pairs",
    "lsh_topk",
    "multitable_planes",
    "lsh_multitable_bucket_udf",
    "lsh_multitable_candidates",
    "lsh_topk_multitable",
    "embedding_lsh_index",
    "embedding_multitable_postings",
    "incremental_lsh_neardup_pairs_indexed",
    "incremental_multitable_neardup_pairs",
    "ivf_assign",
    "ivf_candidates",
    "ivf_probes",
    "ivf_topk",
    "clustered_fixture",
    "quantization_params",
    "scalar_quantize_dequantized",
    "quantize_codes",
    "dequantize_codes",
    "codebook_arrays",
    "dequant_expr",
    "embedding_lsh_index_quantized",
    "incremental_lsh_neardup_pairs_quantized",
    "pq_codebooks",
    "pq_codes",
    "pq_adc_lut",
    "pq_adc_topk",
]


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of every query vector.

    Returns (query_id, vec_id, cos_sim, rank); excludes self-matches.
    Ranking uses the rounded similarity + id tiebreak so results are
    engine-stable (float summation order cannot reorder ties).
    """
    from beast_spark.operators.dedup import fan_out

    # norms hoisted to once per VECTOR (round 14): cosine(a,b) re-folds
    # dot(a,a) and dot(b,b) for every (query, vec) pair — a Q-fold /
    # N-fold replay of the interpreted norm folds. Same float expression
    # dot/(norm(a)·norm(b)) with identical operand values, so rounded
    # scores (and every oracle replaying them) are bit-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    # fan_out (round 13): the Q-fold exact scoring rides the data scan's
    # partitioning (1 local partition → single task); no-op at scale
    joined = fan_out(data.select(id_col, vec_col)).withColumn(
        "_dn", norm(F.col(vec_col))
    ).join(F.broadcast(q), F.col("query_id") != F.col(id_col))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(
            dot(F.col("query_vec"), F.col(vec_col)) / (F.col("_qn") * F.col("_dn")),
            round_digits,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def hyperplanes(dims: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-normal components)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dims)).tolist()


def hyperplanes_md5(dims: int, n_planes: int = 8, salt: str = "") -> list[list[float]]:
    """Rademacher (±1) hyperplanes derived from md5 — engine-replayable.

    Component (p, d) = +1 iff the first hex digit of ``md5(salt+"p:d")``
    is odd. Sign-random-projection only needs the component distribution
    to be symmetric, so ±1 entries are as valid an LSH family as
    gaussians (public SimHash/SRP results) — and any engine with
    ``md5()`` can reconstruct the planes exactly, which is how the q40
    DuckDB oracle replays the bucketing bit-for-bit. ``salt`` yields
    independent plane sets (one per table of a multi-table index).
    """
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}{p}:{d}".encode()).hexdigest()[0], 16) % 2
            else -1.0
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_col(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id: bit p = 1 iff <vec, plane_p> > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(F.col(vec_col), plane_arr) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    planes: list[list[float]] | None = None,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall < 1 by construction; raise it with fewer planes or
    ``probes`` > 1 (standard multi-probe LSH, public technique): the
    query additionally probes the ``probes − 1`` buckets at Hamming
    distance 1 from its own — the likeliest homes of near neighbors that
    landed just across one hyperplane. Candidate volume grows linearly
    with probes while staying ~``probes/2^P`` of the corpus; only the
    tiny query frame fans out, the data side is still one bucket each.
    Returns same shape as brute_force_topk. Pass ``planes`` (e.g.
    :func:`hyperplanes_md5`) to override the seeded gaussian planes.
    cos_sim rounds with the cross-engine floor form
    (floor(x·1e6 + 0.5)/1e6), never engine-native round().
    """
    if planes is None:
        planes = hyperplanes(dims, n_planes, seed)
    # norms once per vector/query (round 14, brute_force_topk's rationale):
    # same dot/(n·n) float expression as cosine(), bit-identical scores
    d = data.withColumn("bucket", lsh_bucket_col(vec_col, planes)).withColumn(
        "_dn", norm(F.col(vec_col))
    )
    q = queries.withColumn("bucket", lsh_bucket_col(vec_col, planes)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        "bucket",
        norm(F.col(vec_col)).alias("_qn"),
    )
    if probes > 1:
        flips = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(min(probes - 1, len(planes)))
        ]
        q = q.withColumn("bucket", F.explode(F.array(*flips)))
    joined = d.join(F.broadcast(q), "bucket").filter(F.col("query_id") != F.col(id_col))
    cos = dot(F.col("query_vec"), F.col(vec_col)) / (F.col("_qn") * F.col("_dn"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def multitable_planes(
    dims: int, n_planes: int = 8, n_tables: int = 75
) -> list[list[list[float]]]:
    """``n_tables`` independent md5-Rademacher plane sets (salted per
    table), the hash family of the multi-table (OR-amplified) LSH index."""
    return [hyperplanes_md5(dims, n_planes, salt=f"{t}|") for t in range(n_tables)]


def lsh_multitable_bucket_udf(tables: list[list[list[float]]]):
    """Arrow-batched pandas UDF: vec → array<long> of L per-table buckets.

    With L×P planes the per-vector work is an L·P-column matrix product —
    the case where a vectorized pandas UDF beats Column expressions: the
    plane tensor rides once in the UDF closure and each Arrow batch is
    ONE BLAS matmul (B×dims @ dims×(L·P)) + a sign reduction, instead of
    38k interpreted higher-order-function element ops per row (measured
    ~50× faster at L=75, P=8, dims=64). Bit p of table t's bucket = 1
    iff <vec, plane_tp> > 0 — the numbering the DuckDB oracles replay
    as ``1<<p``.
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(tables, dtype=np.float64)  # L x Pn x dims
    L, Pn, dims = P.shape
    M = P.reshape(L * Pn, dims).T.copy()  # dims x (L*Pn)
    weights = (1 << np.arange(Pn)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ M) > 0  # B x (L*Pn)
        buckets = (bits.reshape(len(V), L, Pn) * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return _buckets


def lsh_multitable_candidates(
    data: DataFrame,
    queries: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct (query_id, vec_id) candidate pairs of the multi-table
    index: a pair is a candidate iff the two vectors share a bucket in
    ANY of the L tables (the classic OR-amplification).

    Scale shape: the data side flattens to the slim postings frame
    (t, bucket, vec_id) — id + two longs per posting, the wide vectors
    stay out of it — and the tiny query postings broadcast onto it; the
    distinct() that dedups multi-table collisions shuffles only id
    pairs. At warehouse scale the postings frame IS the persisted index
    (write it bucketed by (t, bucket); see the q98 band-index pattern).
    """
    budf = lsh_multitable_bucket_udf(tables)
    d = data.select(F.col(id_col), F.posexplode(budf(vec_col)).alias("t", "bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), budf(vec_col).alias("_bk")).select(
        "query_id", F.posexplode("_bk").alias("t", "bucket")
    )
    return (
        d.join(F.broadcast(q), ["t", "bucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col)
        .distinct()
    )


def lsh_topk_multitable(
    data: DataFrame,
    queries: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 75,
    tables: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Multi-table LSH ANN — the production-recall configuration.

    Single-bucket LSH (q40) and Hamming-ball multi-probe (q84) hit a
    recall wall when near neighbors sit barely above the bulk (measured
    here: top-10 cosine ≈ 0.35 vs bulk p99 ≈ 0.29 on the synthetic
    embeddings — the adversarial regime for any angle-based index).
    OR-amplification is the standard fix: L independent P-plane tables,
    a pair is a candidate if it collides in ANY table, recall =
    1−(1−p^P)^L while the candidate fraction stays ≈ 1−(1−2^−P)^L of
    the corpus. The defaults (P=8, L=75) measure recall@10 = 0.84 mean
    over 20 queries at sf0.1 for ~28% candidate volume — 3.6× less
    scored work than brute force, vs the Hamming-3 ball needing ~65%
    for the same recall (measured; see q162/q163). On corpora with real
    neighbor structure the same configuration's candidate fraction
    falls sharply while recall rises — this is the floor.

    Returns (query_id, vec_id, cos_sim, rank) like
    :func:`brute_force_topk`; cross-engine floor rounding on cos_sim.
    """
    if tables is None:
        tables = multitable_planes(dims, n_planes, n_tables)
    pairs = lsh_multitable_candidates(data, queries, tables, id_col, vec_col)
    # norms once per vector/query (round 14): same dot/(n·n) float
    # expression as cosine(), bit-identical scores
    scored = (
        pairs.join(
            data.select(id_col, vec_col, norm(F.col(vec_col)).alias("_dn")), id_col
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("query_vec"),
                    norm(F.col(vec_col)).alias("_qn"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            (
                F.floor(
                    (
                        dot(F.col("query_vec"), F.col(vec_col))
                        / (F.col("_qn") * F.col("_dn"))
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


#: Default degenerate-bucket cap for the EMBEDDING LSH pair family.
#: Higher than minhash_lsh_pairs' 1000 on purpose: a MinHash band bucket
#: is a near-unique signature slice (high cardinality, small buckets), an
#: embedding bucket is one of only 2^P sign cells, so healthy occupancy
#: is ~N/2^P and the cap must sit well above it. 10k caps the per-bucket
#: pair expansion at ~5·10^7 candidate dot products — bounded work — while
#: a boilerplate-heavy crawl that funnels millions of near-identical
#: vectors into one cell is dropped AND reported instead of going
#: quadratic.
DEFAULT_MAX_BUCKET = 10_000


def capped_bucket_pairs(
    post: DataFrame,
    keys: list[str],
    id_col: str,
    max_bucket: int,
    out1: str = "vec1",
    out2: str = "vec2",
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Candidate id pairs from slim (``*keys``, id) postings with the
    degenerate-bucket guard — the embedding twin of
    ``minhash_lsh_pairs``' ``max_bucket`` filter
    (operators/dedup.py:541): one groupBy shuffle collects each
    bucket's ids, buckets over ``max_bucket`` are DROPPED before the
    quadratic pair expansion (which stays in codegen — array lambdas,
    no self-join shuffle), and — no silent caps — the dropped buckets
    come back as the second frame: (``*keys``, bucket_size), one row
    per capped bucket.

    TWO-PASS cap (round-10, closing the round-9 verdict's remaining
    memory edge): pass 1 sizes every bucket with a plain
    ``countDistinct`` — cheap map-side-combinable longs, never an
    array — and pass 2 ``collect_set``s ids only for buckets a
    broadcast anti-join has already certified ≤ ``max_bucket``. The
    previous one-pass form collected FIRST and filtered after, so the
    degenerate bucket the cap exists for (a boilerplate crawl funneling
    a quarter of the corpus into one cell) still landed its full id
    array on ONE reducer as a single aggregation buffer — GBs in one
    task at 100× — before the size filter could run. Now every
    aggregation buffer anywhere in the plan is bounded by
    ``max_bucket`` ids (plan-asserted: the anti-join gates BELOW the
    ObjectHashAggregate, tests/test_plan_quality.py). countDistinct
    sizes exactly as collect_set did (both are distinct-by-id,
    null-skipping), so the dropped accounting is unchanged.

    Cost: the cap needs two aggregations over ``post`` (count agg +
    gated collect agg) — that is inherent (Spark has no size-bounded
    collect buffer). What is NOT inherent is paying the postings
    SUBTREE and its shuffle twice, which is what the round-10 form did
    (q36 0.74→1.53s etc., round-10 verdict #2). With ``materialize=True``
    (default) the slim postings are repartitioned by ``keys`` and
    persisted, so (a) the upstream compute — shingling, banding,
    bucket hashing, probe scoring — runs exactly once, and (b) both
    aggregations ride the cached hash distribution instead of each
    paying its own Exchange. The cache is two longs + an id per row —
    at warehouse scale the equivalent is a scratch postings table,
    which is what the maintainers write anyway. Lifetime is
    process-scoped but RELEASABLE: the persist registers with
    ``operators._cache`` so a long-lived library caller frees it via
    ``release_scratch_caches()`` after consuming the pairs (bench/sweep
    sessions clearCache between queries). Pass ``materialize=False``
    when ``post`` is already pinned or read from a (bucketed) table —
    then the two passes re-read the caller's materialization.
    """
    if materialize:
        # registered scratch cache: library callers outside the
        # clearCache-between-queries harnesses release it via
        # operators._cache.release_scratch_caches (round-11 ADVICE)
        from beast_spark.operators._cache import pin_scratch

        post = pin_scratch(post.repartition(*keys))
    occupancy = post.groupBy(*keys).agg(
        F.countDistinct(id_col).alias("bucket_size")
    )
    dropped = occupancy.filter(F.col("bucket_size") > max_bucket)
    # degenerate buckets are few by construction (each holds > max_bucket
    # distinct ids, so there are < N/max_bucket of them) — broadcastable
    # at any corpus size
    gate = F.broadcast(dropped.select(*keys))
    grouped = (
        post.join(gate, keys, "left_anti")
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
    )
    kept = grouped.filter(F.size("ids") >= 2)
    pairs = kept.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda y: F.struct(x.alias(out1), y.alias(out2)),
                    ),
                )
            )
        ).alias("p")
    ).select(f"p.{out1}", f"p.{out2}")
    return pairs, dropped


def _capped_incremental_gate(
    new_side: DataFrame,
    existing_side: DataFrame,
    keys: list[str],
    max_bucket: int,
    new_id: str,
    ex_id: str,
    existing_occupancy: DataFrame | None = None,
    resent_old: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared degenerate-bucket gate for the INCREMENTAL pair forms,
    and the single home of TWO distinct rules the round-10 reviews
    teased apart:

    * **Occupancy is ON-DISK distinct**: every touched bucket is sized

          bucket_size = |ids(stored rows at b) ∪ ids(increment at b)|
                      = n_exist + n_inc − |ids(stored b) ∩ ids(inc b)|

      — exactly what a capped batch rebuild over everything appended
      so far (``capped_bucket_pairs`` sizes by countDistinct) would
      see, so capped-incremental == capped-batch stays exact, the
      committed counts agree with the postings a maintainer actually
      stores (appends are physical; a re-send does NOT delete the old
      row), and a later recompute over the same disk state reproduces
      them. The intersection term is nonzero only for re-sent ids
      posting to a bucket their old rows already occupy — zero under
      the documented append-only unique-id contract.
    * **Pair legs are UPSERT**: the returned ``gated_existing``
      additionally anti-joins out the stored rows of re-sent ids, so
      this batch's pairs score against the NEW vector/signature only
      and never duplicate through the stale row. (Cross-batch
      re-sends are the MAINTAINER's contract, not this gate's:
      ``streaming/neardup.py`` supersedes-on-read via batch stamps +
      an id-keyed resent watermark log, and hands this gate a view
      with the stale rows already removed — q231 gates it.)

    Returns (gated_new, gated_existing, dropped, occupancy): dropped
    is (``*keys``, bucket_size); occupancy is the same shape for
    EVERY touched bucket — the bucket's new on-disk count, which
    maintainers commit back as their occupancy sub-table's
    touched-key rows. Over-cap buckets are dropped from BOTH returned
    sides via a broadcast anti-join (degenerate buckets are few by
    construction), preserving the existing side's Exchange-free probe
    shape.

    Occupancy regimes:

    * ``existing_occupancy=None`` — recompute: n_exist and the
      intersection come from ONE per-bucket aggregation over the
      probed rows (a broadcast membership tag, then two
      countDistincts), riding the index table's bucketed distribution
      (zero corpus-side Exchange; never the union-with-increment
      shuffle of the round-9 form) — still a per-call re-aggregation
      of the probed volume.
    * ``existing_occupancy`` = a (``*keys``, n_exist) frame of stored
      per-bucket distinct counts (maintained sub-table, shard-pruned
      by the caller; a missing key means 0). The intersection then
      comes from ``resent_old`` — a (``*keys``, ``ex_id``) frame of
      the re-sent ids' OLD posting rows, which callers with an
      id-keyed side table derive THERE (the multitable form
      re-buckets the re-sent ids' stored vectors, the MinHash form
      re-bands their stored signatures — deterministic under the
      frozen planes/hashes) — so the gate never aggregates the
      postings side: the increment path's only postings work is the
      map-side supersede filter fused into the pair scan. Without
      ``resent_old`` the gate falls back to a broadcast-semi map-side
      pass over the probed rows (~empty output).
    """
    inc_ids = new_side.select(F.col(new_id).alias(ex_id)).distinct()
    inc = new_side.select(*keys, F.col(new_id).alias("_gid"))
    inc_occ = inc.groupBy(*keys).agg(F.countDistinct("_gid").alias("_n_inc"))
    if existing_occupancy is None:
        # ONE pass over the probed rows: tag each with (bucket, id)
        # increment membership, then count total distinct ids and
        # intersecting distinct ids per bucket together
        tagged = existing_side.select(*keys, F.col(ex_id).alias("_gid")).join(
            F.broadcast(inc.distinct().withColumn("_hit", F.lit(1))),
            [*keys, "_gid"],
            "left",
        )
        stats = tagged.groupBy(*keys).agg(
            F.countDistinct("_gid").alias("_n_ex"),
            F.countDistinct(F.when(F.col("_hit") == 1, F.col("_gid"))).alias("_n_ov"),
        )
        occupancy = inc_occ.join(F.broadcast(stats), keys, "left")
    else:
        # stored counts for the touched keys only: the semi-join keeps
        # the result broadcastable (O(touched buckets)) even when the
        # occupancy sub-table itself is corpus-sized (MinHash buckets
        # are near-unique per doc). The key set is built as
        # inc.select(keys).distinct() — canonically the SAME subtree as
        # the touched-buckets broadcast every caller probes its index
        # with — so the two broadcasts collapse into one ReusedExchange
        # (round 14: one fewer broadcast-build job on the serve chain,
        # which the q98/q164/q173 profiles show is ~pure job latency)
        n_ex = (
            existing_occupancy.join(
                F.broadcast(inc.select(*keys).distinct()), keys, "left_semi"
            )
            .select(*keys, F.col("n_exist").alias("_n_ex"))
        )
        # (no id-only pre-filter here: the (keys, id) semi below subsumes
        # it — one broadcast build instead of two)
        ov_src = (
            resent_old.select(*keys, F.col(ex_id).alias("_gid"))
            if resent_old is not None
            else existing_side.select(*keys, F.col(ex_id).alias("_gid"))
        )
        # |stored ∩ inc| per bucket: old rows of re-sent ids, kept only
        # where the increment posts the SAME id to the SAME bucket
        ov = (
            ov_src.join(F.broadcast(inc.distinct()), [*keys, "_gid"], "left_semi")
            .groupBy(*keys)
            .agg(F.countDistinct("_gid").alias("_n_ov"))
        )
        occupancy = inc_occ.join(F.broadcast(n_ex), keys, "left").join(
            F.broadcast(ov), keys, "left"
        )
    occupancy = occupancy.select(
        *keys,
        (
            F.coalesce(F.col("_n_ex"), F.lit(0))
            + F.col("_n_inc")
            - F.coalesce(F.col("_n_ov"), F.lit(0))
        )
        .cast("long")
        .alias("bucket_size"),
    )
    dropped = occupancy.filter(F.col("bucket_size") > max_bucket)
    gate = F.broadcast(dropped.select(*keys))
    # the upsert filter for the PAIR legs: map-side broadcast anti,
    # fused into whatever stage scans the probe — removes zero rows
    # under the unique-id contract
    gated_existing = existing_side.join(F.broadcast(inc_ids), ex_id, "left_anti").join(
        gate, keys, "left_anti"
    )
    return (
        new_side.join(gate, keys, "left_anti"),
        gated_existing,
        dropped,
        occupancy,
    )


def lsh_neardup_pairs(
    data: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.42,
    n_planes: int = 8,
    seed: int = 7,
    planes: list[list[float]] | None = None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_dropped: bool = False,
):
    """Embedding near-dup PAIRS over shared LSH buckets — the scale path
    for the exact all-pairs cosine form: candidate volume falls ~2^P-fold
    vs the quadratic baseline. Norms are computed once per vector, never
    per pair; per-pair work is a single dot product. Recall < 1
    single-probe (pairs split by one hyperplane are missed) — the usual
    planes/probes/threshold tradeoff.

    Scale shape: candidates come from the slim (bucket, id) postings via
    :func:`capped_bucket_pairs` — one groupBy shuffle, pair expansion in
    codegen, and buckets over ``max_bucket`` rows (a boilerplate-heavy
    crawl can funnel millions of near-identical vectors into one of the
    2^P cells) are dropped instead of going quadratic. The wide vectors
    join back once per pair SIDE afterwards. ``with_dropped=True``
    additionally returns the (bucket, bucket_size) accounting frame of
    capped buckets — no silent caps.
    """
    if planes is None:
        planes = hyperplanes(dims, n_planes, seed)
    d = (
        data.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("bucket", lsh_bucket_col("_v", planes))
        .withColumn("_n", norm(F.col("_v")))
    )
    cand, dropped = capped_bucket_pairs(
        d.select("bucket", "_id"), ["bucket"], "_id", max_bucket
    )
    v1 = d.select(F.col("_id").alias("vec1"), F.col("_v").alias("v1"), F.col("_n").alias("n1"))
    v2 = d.select(F.col("_id").alias("vec2"), F.col("_v").alias("v2"), F.col("_n").alias("n2"))
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        cand.join(v1, "vec1")
        .join(v2, "vec2")
        .select(
            "vec1",
            "vec2",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return (pairs, dropped) if with_dropped else pairs


def embedding_lsh_index(
    data: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable embedding-LSH index rows: (bucket, id, vector,
    nrm). Write with ``sources/bucketing.py::write_bucketed`` on
    ``bucket`` so increments probe it Exchange-free — the embedding twin
    of the q98 MinHash band index. The vector and its norm ride IN the
    index (storage for scan-count: candidate scoring reads one table,
    the corpus is never re-hashed or re-normed)."""
    return (
        data.select(id_col, vec_col)
        .withColumn("bucket", lsh_bucket_col(vec_col, planes))
        .withColumn("nrm", norm(F.col(vec_col)))
    )


def incremental_lsh_neardup_pairs_indexed(
    existing_index: DataFrame,
    new_df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.42,
    n_planes: int = 6,
    planes: list[list[float]] | None = None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_dropped: bool = False,
    existing_occupancy: DataFrame | None = None,
    with_occupancy: bool = False,
):
    """Embedding near-dup for an INCREMENT against the persisted LSH
    index: returns ``(new_index_rows, pairs)`` where pairs involve at
    least one new vector (new×new and new×existing; existing×existing
    pairs were found when the corpus was built).

    ``existing_occupancy`` (a (bucket, n_exist) frame of the persisted
    index's per-bucket distinct-id counts) lets the cap gate read
    stored counts instead of re-aggregating the probed index rows per
    call — see :func:`_capped_incremental_gate`; ``with_occupancy=True``
    appends the combined (bucket, bucket_size) frame for every touched
    bucket to the returned tuple (after ``dropped`` if requested), so a
    maintainer can commit it back as the new stored occupancy.

    Degenerate-bucket guard: buckets whose COMBINED occupancy
    (increment + probed index rows) exceeds ``max_bucket`` are dropped
    from BOTH the new×new and new×existing joins — the same bucket a
    batch rebuild with this cap would drop — and reported via
    ``with_dropped=True`` as a third (bucket, bucket_size) frame.
    The incremental == batch-union equivalence property holds exactly
    while no bucket crosses the cap; once one does, capping is
    inherently non-monotone (the existing×existing pairs of a bucket
    that was under the cap at corpus-build time are already in the pair
    set and are not retracted).

    The q98 discipline applied to :func:`lsh_neardup_pairs` (q85),
    which re-buckets the full corpus per run: here the corpus side is
    the bucketed index scan probed by a broadcast of the increment's
    touched buckets — never re-hashed, never re-normed, never shuffled
    (ZERO Exchange, plan-asserted in tests). Scoring joins the
    increment frame (broadcast, increment-sized) onto the filtered
    scan, so a nightly embedding append costs O(increment + touched
    buckets), not O(corpus). Append ``new_index_rows`` to the index
    table afterwards and the next increment pays the same.

    Exactness (property-tested): pairs(full corpus) == pairs(existing)
    ∪ pairs(increment), with the same canonical (vec1 < vec2, floor-
    rounded cos_sim ≥ threshold) rows q85 emits.

    The returned ``new_index_rows`` frame is persisted (it is read twice
    here and a third time by the caller's index append) — the CALLER
    must ``.unpersist()`` it once its append is committed, or a
    long-lived process (e.g. a per-micro-batch maintainer) accumulates
    cached blocks for the stream's lifetime.
    """
    if planes is None:
        planes = hyperplanes_md5(dims, n_planes)
    new_idx = embedding_lsh_index(new_df, planes, id_col, vec_col).persist()
    a = new_idx.select(
        "bucket",
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        F.col("nrm").alias("nn"),
    )
    touched = a.select("bucket").distinct()
    ex = existing_index.join(F.broadcast(touched), "bucket", "left_semi")
    # the gate owns the upsert rule (a re-sent id's stored rows are
    # superseded — anti-joined out of ex) and the post-upsert occupancy
    a, ex, dropped, occupancy = _capped_incremental_gate(
        a, ex, ["bucket"], max_bucket, "nid", id_col,
        existing_occupancy=existing_occupancy,
    )
    b = a.select(
        "bucket",
        F.col("nid").alias("vec2"),
        F.col("nv").alias("v2"),
        F.col("nn").alias("n2"),
    )
    nn_pairs = (
        a.join(b, "bucket")
        .filter(F.col("nid") < F.col("vec2"))
        .select(
            F.col("nid").alias("vec1"),
            "vec2",
            F.col("nv").alias("v1"),
            "v2",
            F.col("nn").alias("n1"),
            "n2",
        )
    )
    ne_pairs = (
        ex.join(F.broadcast(a), "bucket")
        # an id present in BOTH the index and the increment (an
        # overlapping re-append) would otherwise emit a (x, x)
        # self-pair with cos_sim 1.0
        .filter(F.col(id_col) != F.col("nid"))
        .select(
            F.least(F.col(id_col), F.col("nid")).alias("vec1"),
            F.greatest(F.col(id_col), F.col("nid")).alias("vec2"),
            F.col(vec_col).alias("v1"),
            F.col("nv").alias("v2"),
            F.col("nrm").alias("n1"),
            F.col("nn").alias("n2"),
        )
    )
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        nn_pairs.unionByName(ne_pairs)
        .select(
            "vec1",
            "vec2",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    out = (new_idx, pairs)
    if with_dropped:
        out += (dropped,)
    if with_occupancy:
        out += (occupancy,)
    return out


def ivf_assign(
    data: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.

    ``centroids`` is a small frame (cid, centroid vector) — broadcast, so
    assignment is one map stage over the data at any scale, followed by a
    map-side-combinable max aggregation (no window, no wide shuffle of the
    N×C scored rows). Ties break to the lowest centroid id via the
    (score, -cid) struct ordering. Similarities are rounded before the
    argmax so float summation order cannot flip an assignment.
    """
    from beast_spark.operators.dedup import fan_out

    # norms once per VECTOR and per CENTROID, below the C-fold join fan-out
    # (same float expression dot/(n_a·n_b) as cosine(), so rounded scores —
    # and every oracle replaying them — are bit-identical)
    c = centroids.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    # fan_out (round 13): the C-fold scoring inherits the data side's
    # partitioning — a single-file local scan serialized the N×C
    # interpreted dot products on one task; no-op at warehouse scale
    d = fan_out(data).select(id_col, vec_col, norm(F.col(vec_col)).alias("_dn"))
    scored = d.join(F.broadcast(c)).select(
        id_col,
        vec_col,
        F.col("cid"),
        F.round(
            dot(F.col(vec_col), F.col("cvec")) / (F.col("_dn") * F.col("_cn")),
            round_digits,
        ).alias("cscore"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cscore"), (-F.col("cid")).alias("ncid"))).alias("best"),
        F.first(vec_col).alias(vec_col),
    )
    return best.select(id_col, vec_col, (-F.col("best.ncid")).alias("cid"))


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, query_vec, cid): each query's ``nprobe`` nearest
    coarse cells — the shared probe-selection block of :func:`ivf_topk`
    and :func:`ivf_candidates` (one broadcast of the tiny centroid
    frame, rounded-score ranking with cid tie-break), factored out so
    the two paths cannot drift."""
    # norms once per query/centroid (round 14): same dot/(n·n) float
    # expression as cosine(), bit-identical scores
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = centroids.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q_scored = q.join(F.broadcast(c)).select(
        "query_id",
        "query_vec",
        "cid",
        F.round(
            dot(F.col("query_vec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")),
            round_digits,
        ).alias("cscore"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cscore").desc(), F.col("cid"))
    return (
        q_scored.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "query_vec", "cid")
    )


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: probe only the ``nprobe`` clusters nearest each query.

    Coarse centroids are the first ``n_centroids`` vectors by id — a
    deterministic stand-in for trained k-means centroids (swap in real
    k-means offline at production scale; the search plan is identical).
    Candidate volume drops ~(nprobe/n_centroids)-fold versus brute force;
    the final ranking within probed clusters is exact.

    Returns (query_id, vec_id, cos_sim, rank), self-matches excluded.
    """
    centroids = data.filter(F.col(id_col) < n_centroids).select(id_col, vec_col)
    assigned = ivf_assign(data, centroids, id_col, vec_col, round_digits)
    probes = ivf_probes(
        queries, centroids, nprobe, id_col, vec_col, round_digits
    )
    # norms once per vector / per probe row (round 14): same dot/(n·n)
    # float expression as cosine(), bit-identical scores
    cand = assigned.withColumn("_dn", norm(F.col(vec_col))).join(
        F.broadcast(probes.withColumn("_qn", norm(F.col("query_vec")))), "cid"
    ).filter(F.col("query_id") != F.col(id_col))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(
            dot(F.col("query_vec"), F.col(vec_col)) / (F.col("_qn") * F.col("_dn")),
            round_digits,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = DEFAULT_MAX_BUCKET,
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """SemDeDup — semantic (embedding-space) deduplication via k-means
    cells (Abbas et al., *SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication*, 2023): cluster the corpus, compare
    pairs only WITHIN a cluster, and drop every vector that duplicates
    an earlier one. Complements the LSH family above: LSH buckets catch
    near-IDENTICAL vectors (same sign pattern), SemDeDup's trained cells
    catch semantic redundancy at lower thresholds because the
    partitioning follows the data's own density, not random planes.

    Deterministic drop policy (exactly replayable by any engine): a
    vector x is dropped iff some y < x (by id) in the SAME cluster has
    ``round(cos(x, y), round_digits) >= tau`` — the earlier vector
    witnesses the drop whether or not y itself survives, i.e. the
    streaming "reject anything similar to something already seen" rule
    scanned in id order. (The paper keeps one representative per
    duplicate-graph component; min-id-witness is its single-pass,
    shuffle-free relaxation — chains longer than one hop can drop every
    member but the first, which for training-data curation errs toward
    MORE dedup, never less.)

    Scale shape: assignment is one broadcast map stage
    (:func:`ivf_assign`); within-cluster candidate pairs come from the
    slim (cid, id) postings via :func:`capped_bucket_pairs` — bounded
    aggregation buffers, pair expansion in codegen, and a cluster
    whose occupancy exceeds ``max_bucket`` (k-means collapsing on a
    boilerplate mode) is dropped AND reported instead of going
    quadratic. Wide vectors join back once per pair side.

    ``centroids`` is any small (id, vector) frame — :func:`kmeans_lite`
    output at production scale, or a deterministic stand-in (q68's
    first-k-by-id discipline) where independent replay matters.

    Returns (kept, dropped, capped): ``kept`` = surviving rows of
    ``vectors``; ``dropped`` = (id, cid, replaced_by, cos_sim) one row
    per dropped vector with its MINIMUM-id witness and the similarity
    to that witness; ``capped`` = (cid, bucket_size) accounting of
    over-cap clusters — no silent caps.
    """
    # slim (id, cid) pinned: it feeds the cap passes AND the
    # dropped-row cid join, and unpinned each consumer replays the full
    # broadcast-assignment scoring (the q112 count-table discipline;
    # two longs per row, process-scoped lifetime like the scratch
    # indexes). materialize=False: this pin IS the materialization —
    # a second cache inside the cap would hold the same rows twice.
    assigned = (
        ivf_assign(vectors, centroids, id_col, vec_col, round_digits)
        .select("cid", id_col)
        .persist()
    )
    pairs, capped = capped_bucket_pairs(
        assigned, ["cid"], id_col, max_bucket,
        out1="keep_id", out2="dup_id", materialize=False,
    )
    dup_pairs = _score_candidate_pairs(
        pairs, vectors, tau, id_col, vec_col, round_digits
    )
    dropped = (
        _min_witness(dup_pairs)
        .join(assigned.select(F.col(id_col).alias("dup_id"), "cid"), "dup_id")
        .select(
            F.col("dup_id").alias(id_col),
            "cid",
            "replaced_by",
            "cos_sim",
        )
    )
    kept = vectors.join(dropped.select(id_col), id_col, "left_anti")
    return kept, dropped, capped


def _score_candidate_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    tau: float,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """(keep_id, dup_id, cos_sim ≥ tau) from candidate id pairs — the
    ONE scoring block both semantic-dedup forms share: keep_id < dup_id
    (capped_bucket_pairs' sorted emission — the left column is always
    the earlier, witness-eligible vector), norms computed once per
    VECTOR in the side frames (lsh_neardup_pairs' discipline; per-pair
    work is a single dot product), floor-form rounding (NOT F.round:
    engine tie-breaking differs on exact .5 ulp ties)."""
    from beast_spark.operators.dedup import fan_out
    from beast_spark.queries._util import rnd

    # fan_out the vector side (round 13): the candidate pairs build a
    # broadcast, so the scoring stage inherits the STREAMED vector
    # side's partitioning — a single-file local scan (1 partition) ran
    # every pair's interpreted dot product on one task (profiled: 2.0 s
    # of q220's 2.9 s). At warehouse scale the scan is already split
    # and fan_out is a no-op.
    d = fan_out(vectors.select(id_col, vec_col)).withColumn(
        "_n", norm(F.col(vec_col))
    )
    v1 = d.select(
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("_v1"),
        F.col("_n").alias("_n1"),
    )
    v2 = d.select(
        F.col(id_col).alias("dup_id"),
        F.col(vec_col).alias("_v2"),
        F.col("_n").alias("_n2"),
    )
    cos = dot(F.col("_v1"), F.col("_v2")) / (F.col("_n1") * F.col("_n2"))
    return (
        pairs.join(v1, "keep_id")
        .join(v2, "dup_id")
        .select("keep_id", "dup_id", rnd(cos, round_digits).alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
    )


def _min_witness(dup_pairs: DataFrame) -> DataFrame:
    """(dup_id, replaced_by, cos_sim): each drop candidate's MINIMUM-id
    witness and the similarity to that witness (struct-min is
    lexicographic: min keep_id first)."""
    return (
        dup_pairs.groupBy("dup_id")
        .agg(F.min(F.struct("keep_id", "cos_sim")).alias("w"))
        .select(
            "dup_id",
            F.col("w.keep_id").alias("replaced_by"),
            F.col("w.cos_sim").alias("cos_sim"),
        )
    )


def semantic_dedup_multiprobe(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`semantic_dedup` with MULTI-ASSIGNMENT: every vector posts
    to its ``n_assign`` nearest cells, and a pair is compared when the
    two vectors share ANY cell — the multi-probe recall lever (the same
    trade ``lsh_multitable_neardup_pairs`` makes over random planes,
    here over the data's own cells): a near-dup pair split by one cell
    boundary is usually joint in the second-nearest cell. Candidate
    volume rises ~``n_assign``×; recall at a fixed cell count rises
    with it (q229 measures the operating point against q226's
    single-assignment run).

    Same deterministic earlier-witness drop rule and per-cell
    ``max_bucket`` guard. Occupancy counts the cell's POSTED vectors,
    which multi-assignment inflates ~``n_assign``-fold by design — so
    the cap DEFAULT scales with it (``n_assign × DEFAULT_MAX_BUCKET``
    when ``max_bucket`` is None): an unscaled cap would drop a cell
    here that single-assignment still mines, turning the recall lever
    into a recall loss exactly at the margin. Pairs sharing both cells
    are deduplicated before scoring (the q185 pair-dedup-before-vectors
    discipline). The action table carries no cell column — a pair's
    witness relationship is no longer unique to one cell.

    Returns (kept, dropped, capped): ``dropped`` =
    (id, replaced_by, cos_sim); ``capped`` = (cid, bucket_size).
    """
    if max_bucket is None:
        max_bucket = n_assign * DEFAULT_MAX_BUCKET
    # slim (cid, id) postings feed only the cap, whose materialize=True
    # default pins them once (repartitioned by cid) for both passes —
    # the N×C probe scoring + per-vector ranking window runs exactly
    # once, no outer persist needed
    post = ivf_probes(vectors, centroids, n_assign, id_col, vec_col, round_digits).select(
        "cid", F.col("query_id").alias(id_col)
    )
    pairs, capped = capped_bucket_pairs(
        post, ["cid"], id_col, max_bucket, out1="keep_id", out2="dup_id"
    )
    dup_pairs = _score_candidate_pairs(
        pairs.distinct(),  # a pair sharing BOTH cells scores once
        vectors, tau, id_col, vec_col, round_digits,
    )
    dropped = _min_witness(dup_pairs).withColumnRenamed("dup_id", id_col)
    kept = vectors.join(dropped.select(id_col), id_col, "left_anti")
    return kept, dropped, capped


def kmeans_lite(
    data: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic Lloyd iterations for IVF centroid training.

    Init: the first ``k`` vectors by id (deterministic seed). Each round:
    broadcast the k centroids, assign every vector to its nearest (the
    same map-side argmax as ``ivf_assign``), recompute centroids as
    per-cluster dimension means via posexplode + groupBy — two shuffles
    per round over (cluster, dim) cells, never a per-cluster value
    buffer. A fixed iteration count keeps the plan static and the result
    reproducible; convergence monotonicity is asserted in tests.

    Returns (cid, embedding array<double>) — feed to ``ivf_assign`` /
    adapt ``ivf_topk`` for the trained-centroid search path.
    """
    centroids = data.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec")
    )
    for _ in range(iters):
        assigned = ivf_assign(
            data, centroids.select(F.col("cid").alias(id_col), F.col("cvec").alias(vec_col)),
            id_col, vec_col, round_digits,
        )
        cells = assigned.select(
            "cid", F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val")
        )
        means = (
            cells.groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cid", F.transform("dm", lambda s: s.getField("m")).alias("cvec"))
        )
        centroids = means.localCheckpoint()
    return centroids


def ivf_inertia_df(
    data: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "inertia",
) -> DataFrame:
    """One-row frame of mean (1 − cosine-to-assigned-centroid) — the
    quantization error a Lloyd round must not increase. Frame-valued so
    query paths can compose it (crossJoin with other scalars) without a
    driver-side collect."""
    assigned = ivf_assign(
        data,
        centroids.select(F.col("cid").alias(id_col), F.col("cvec").alias(vec_col)),
        id_col,
        vec_col,
    )
    # centroid norms once per centroid instead of once per corpus row
    # (round 14): same dot/(n·n) float expression, bit-identical
    c = centroids.select("cid", "cvec", norm(F.col("cvec")).alias("_cn"))
    scored = assigned.join(F.broadcast(c), "cid").select(
        (
            1
            - dot(F.col(vec_col), F.col("cvec"))
            / (norm(F.col(vec_col)) * F.col("_cn"))
        ).alias("err")
    )
    return scored.agg(F.avg("err").alias(out_col))


def ivf_inertia(
    data: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Scalar convenience form of :func:`ivf_inertia_df` (driver-side
    read — test/diagnostic use, not for query paths)."""
    return ivf_inertia_df(data, centroids, id_col, vec_col).collect()[0][0]


def quantization_params(
    data: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, mn, mx) over the corpus — the scalar-quantizer
    codebook. One posexplode + a 64-row aggregate; broadcast downstream."""
    cells = data.select(
        id_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val")
    )
    return cells.groupBy("dim").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))


def scalar_quantize_dequantized(
    data: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8-style scalar quantization, returned in DEQUANTIZED form:
    (id, dqvec array<double>) where each cell snapped to its nearest of
    256 uniform levels on that dimension's [mn, mx].

    The storage path for ANN at scale: 8-bit codes cut the index 4-8×
    (store ``floor((v-mn)/scale + 0.5)`` as TINYINT; this helper returns
    the dequantized values because every quality check — reconstruction
    error, ranking agreement — is defined on them). Work is one
    posexplode + a broadcast join against the 64-row codebook + a
    per-row re-assembly; constant dimensions (mx == mn) dequantize to
    the constant. Deterministic and engine-replayable: the level
    formula is pure double arithmetic in a fixed operation order.

    MAP-SIDE (round 13): the 64-row codebook collapses to literal
    (mn, scale) arrays (:func:`codebook_arrays` — the same device
    :func:`dequantize_codes` already used) and each vector quantizes in
    place via zip_with — no posexplode, no broadcast join, no
    collect_list re-assembly shuffle (guide §2.4). Same per-cell
    arithmetic in the same operation order (scale = (mx−mn)/255.0,
    then mn + floor((v−mn)/scale + 0.5)·scale), so values are
    bit-identical; mx == mn ⇔ scale == 0 keeps the constant-dimension
    branch.
    """
    mn_arr, sc_arr = codebook_arrays(params)
    v = F.col(vec_col).cast("array<double>")
    diffs = F.zip_with(v, mn_arr, lambda x, m: x - m)
    stepped = F.zip_with(
        diffs, sc_arr, lambda d, s: F.when(s > 0, F.floor(d / s + 0.5) * s).otherwise(F.lit(0.0))
    )
    dq = F.zip_with(stepped, mn_arr, lambda t, m: m + t)
    return data.filter(v.isNotNull()).select(id_col, dq.alias("dqvec"))


def lsh_multitable_neardup_pairs(
    data: DataFrame,
    dims: int,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 75,
    tables: list[list[list[float]]] | None = None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_dropped: bool = False,
    postings: DataFrame | None = None,
):
    """Embedding near-dup PAIRS over the multi-table index — the
    OR-amplified recall upgrade of :func:`lsh_neardup_pairs`: a pair is
    a candidate if it shares a bucket in ANY of the L tables, so recall
    rises 1−(1−p^P)^L while the single-table form stops at p^P (measured
    on this corpus: q172). Same slim-postings discipline as
    :func:`lsh_multitable_candidates`: candidates come from the slim
    (t, bucket, id) rows via :func:`capped_bucket_pairs` (groupBy +
    codegen pair expansion; per-table buckets over ``max_bucket``
    dropped AND reported — no silent caps), the pair dedup shuffles
    only id pairs, and the wide vectors join back once per SIDE (norms
    precomputed per vector, never per pair). Returns (vec1, vec2,
    cos_sim) with vec1 < vec2, floor-rounded, filtered to
    ``threshold``; ``with_dropped=True`` adds the (t, bucket,
    bucket_size) accounting frame.

    ``postings`` (a :func:`embedding_multitable_postings` frame for the
    SAME data and tables) skips the internal L×P bucketing matmul — for
    callers that consume the postings themselves and materialized them
    once (scratch parquet / bucketed table).
    """
    if tables is None:
        tables = multitable_planes(dims, n_planes, n_tables)
    if postings is None:
        budf = lsh_multitable_bucket_udf(tables)
        post = data.select(
            F.col(id_col), F.posexplode(budf(vec_col)).alias("t", "bucket")
        )
    else:
        post = postings
    # caller-supplied postings are already materialized (scratch
    # parquet / bucketed table) — don't cache a second copy
    raw_cand, dropped = capped_bucket_pairs(
        post, ["t", "bucket"], id_col, max_bucket, materialize=postings is None
    )
    cand = raw_cand.distinct()
    v = data.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
    )
    j = (
        cand.join(v.select(F.col("_id").alias("vec1"), F.col("_v").alias("v1"), F.col("_n").alias("n1")), "vec1")
        .join(v.select(F.col("_id").alias("vec2"), F.col("_v").alias("v2"), F.col("_n").alias("n2")), "vec2")
    )
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        j.select(
            "vec1",
            "vec2",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return (pairs, dropped) if with_dropped else pairs


def embedding_multitable_postings(
    data: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The slim postings half of the persisted MULTI-TABLE embedding
    index: (t, bucket, id) — one row per (vector, table), no vectors.

    The single-table index (:func:`embedding_lsh_index`) carries the
    vector in every bucket row; at L=75 tables that would store the
    corpus 75×, so the multi-table index splits into postings (this
    frame — write bucketed by (t, bucket)) and one vectors table
    (id, vector, nrm — write bucketed by id), each stored once.
    """
    budf = lsh_multitable_bucket_udf(tables)
    return data.select(F.col(id_col), F.posexplode(budf(vec_col)).alias("t", "bucket"))


def incremental_multitable_neardup_pairs(
    existing_postings: DataFrame,
    existing_vectors: DataFrame,
    new_df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.42,
    n_planes: int = 8,
    n_tables: int = 75,
    tables: list[list[list[float]]] | None = None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_dropped: bool = False,
    existing_occupancy: DataFrame | None = None,
    with_occupancy: bool = False,
    new_postings: DataFrame | None = None,
    new_vectors: DataFrame | None = None,
):
    """Multi-table (OR-amplified) embedding near-dup for an INCREMENT
    against the persisted postings+vectors index — the recall upgrade of
    :func:`incremental_lsh_neardup_pairs_indexed`, whose single-table
    default the repo's own evaluation (q172) measures at ~7% pair recall
    vs ~90% for the L-table index.

    Returns ``(new_postings, new_vectors, pairs)`` where pairs involve
    at least one new vector. Scale shape:

    * the increment buckets into all L tables via ONE Arrow-batched BLAS
      matmul (:func:`lsh_multitable_bucket_udf`); only the slim
      (t, bucket, id) postings fan out L-fold, never the vectors;
    * the corpus postings are probed with a broadcast semi-join on the
      increment's touched (t, bucket) keys — bucketed storage makes that
      probe Exchange-free on the corpus side (q98 discipline);
    * candidate id pairs are ``distinct()``-ed BEFORE any vector is
      touched (a pair colliding in many tables is scored once), then
      each side joins back to its vectors exactly once — the increment
      side broadcast, the corpus side against the id-bucketed vectors
      table.

    Ids must be unique across index ∪ increment (append-only contract,
    same as the single-table form); a re-sent id cannot self-pair (the
    existing≠new guard) but WILL double-score against third vectors.
    Cross-batch re-sends are handled one level up:
    ``streaming/neardup.py::EmbeddingNearDupMaintainer`` supersedes a
    re-sent id's stored rows before this operator sees the batch
    (q231 gates it). ``new_postings``/``new_vectors`` are persisted
    (each is read multiple times here and again by the caller's index
    append); the caller must ``.unpersist()`` both once its append
    commits.

    Exactness (property-tested): pairs(full corpus, L tables) ==
    pairs(existing) ∪ pairs(increment), canonical (vec1 < vec2,
    floor-rounded cos_sim ≥ threshold) rows as
    :func:`lsh_multitable_neardup_pairs`.

    Degenerate-bucket guard: per-table buckets whose COMBINED occupancy
    (increment postings + probed index postings) exceeds ``max_bucket``
    are dropped from both join sides and reported (``with_dropped=True``
    returns a fourth (t, bucket, bucket_size) frame). The equivalence
    property above holds exactly while no bucket crosses the cap; past
    it, capping is non-monotone (see
    :func:`incremental_lsh_neardup_pairs_indexed`).

    ``existing_occupancy`` (a (t, bucket, n_exist) frame of stored
    per-bucket distinct-id counts, shard-pruned by the caller to the
    touched shards) replaces the gate's per-call re-aggregation of the
    probed postings with an O(touched buckets) read — see
    :func:`_capped_incremental_gate`; ``with_occupancy=True`` appends
    the combined (t, bucket, bucket_size) frame for every touched
    bucket (the new stored occupancy — postings append ungated) to the
    returned tuple, after ``dropped`` if requested.
    """
    if tables is None:
        tables = multitable_planes(dims, n_planes, n_tables)
    # new_postings/new_vectors (pre-materialized increment artifacts —
    # the ingest side of a nightly append buckets its batch once and
    # stores both, since it appends them to the index tables anyway)
    # skip the internal build+persist: both frames feed MANY small
    # broadcast builds (touched keys, the gate's id sets and counts,
    # the upsert anti-joins, the scoring joins), each of which executes
    # as its own job, and an in-line build re-runs the L×P bucketing
    # matmul once per job (the round-10 q173 bench regression — the
    # q98/new_sigs discipline applied to the embedding family).
    new_post = (
        embedding_multitable_postings(new_df, tables, id_col, vec_col).persist()
        if new_postings is None
        else new_postings
    )
    new_vec = (
        new_df.select(id_col, vec_col).withColumn("nrm", norm(F.col(vec_col))).persist()
        if new_vectors is None
        else new_vectors
    )

    # probe the persisted postings on touched keys only, then gate both
    # sides through the combined-occupancy degenerate-bucket cap
    touched = new_post.select("t", "bucket").distinct()
    ex = existing_postings.join(F.broadcast(touched), ["t", "bucket"], "left_semi")
    resent_old = None
    if existing_occupancy is not None:
        # Re-sent ids' OLD posting rows, re-derived from their stored
        # VECTOR rows (deterministic bucketing under the frozen tables)
        # — an id-keyed lookup on the much smaller vectors table, so
        # the gate's post-upsert occupancy term never aggregates the
        # postings: the increment path aggregates probed postings zero
        # times. ~Zero rows under the append-only unique-id contract.
        re_sent = existing_vectors.join(
            F.broadcast(new_vec.select(id_col)), id_col, "left_semi"
        )
        resent_old = embedding_multitable_postings(
            re_sent, tables, id_col, vec_col
        )
    # the gate owns the upsert rule: re-sent ids' stored rows are
    # anti-joined out of ex (their pairs come from the nn leg, scored
    # against the NEW vector) and buckets are sized post-upsert
    gated_post, ex, dropped, occupancy = _capped_incremental_gate(
        new_post, ex, ["t", "bucket"], max_bucket, id_col, id_col,
        existing_occupancy=existing_occupancy,
        resent_old=resent_old,
    )

    # new × new: self-join the increment postings per (t, bucket)
    a = gated_post.select("t", "bucket", F.col(id_col).alias("vec1"))
    b = gated_post.select("t", "bucket", F.col(id_col).alias("vec2"))
    nn_cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("vec1") < F.col("vec2"))
        .select("vec1", "vec2")
        .distinct()
    )

    ne_cand = (
        ex.join(
            F.broadcast(gated_post.select("t", "bucket", F.col(id_col).alias("_nid"))),
            ["t", "bucket"],
        )
        .filter(F.col(id_col) != F.col("_nid"))  # overlapping re-append guard
        .select(F.col(id_col).alias("_eid"), "_nid")
        .distinct()
    )

    nv1 = new_vec.select(
        F.col(id_col).alias("vec1"), F.col(vec_col).alias("v1"), F.col("nrm").alias("n1")
    )
    nv2 = new_vec.select(
        F.col(id_col).alias("vec2"), F.col(vec_col).alias("v2"), F.col("nrm").alias("n2")
    )
    nn = nn_cand.join(F.broadcast(nv1), "vec1").join(F.broadcast(nv2), "vec2")

    ev = existing_vectors.select(
        F.col(id_col).alias("_eid"), F.col(vec_col).alias("v1"), F.col("nrm").alias("n1")
    )
    ne = (
        ne_cand.join(ev, "_eid")
        .join(
            F.broadcast(
                new_vec.select(
                    F.col(id_col).alias("_nid"),
                    F.col(vec_col).alias("v2"),
                    F.col("nrm").alias("n2"),
                )
            ),
            "_nid",
        )
        .select(
            F.least(F.col("_eid"), F.col("_nid")).alias("vec1"),
            F.greatest(F.col("_eid"), F.col("_nid")).alias("vec2"),
            "v1",
            "v2",
            "n1",
            "n2",
        )
    )
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        nn.select("vec1", "vec2", "v1", "v2", "n1", "n2")
        .unionByName(ne)
        .select(
            "vec1",
            "vec2",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    out = (new_post, new_vec, pairs)
    if with_dropped:
        out += (dropped,)
    if with_occupancy:
        out += (occupancy,)
    return out


def clustered_fixture(
    data: DataFrame,
    dims: int,
    n_clusters: int = 64,
    noise_scale: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "c",
) -> DataFrame:
    """Deterministic mixture-of-clusters embeddings DERIVED from the
    corpus: vector i = center(i % n_clusters) + noise_scale · original_i.

    The synthetic embeddings tables are adversarially near-uniform (top-10
    cosine ≈ bulk p99) — the worst case for any angle-based index and
    unrepresentative of real embedding corpora, which cluster. This
    fixture manufactures that structure reproducibly in ANY engine:
    centers are md5-Rademacher ±1 vectors (norm √dims), the original
    near-uniform vector serves as the noise term (norm ≈ 1 here, so
    noise_scale=2 puts within-cluster cosine ≈ dims/(dims+scale²) ≈ 0.94
    against cross-cluster ≈ ±1/√dims) — no RNG, no generation artifact
    to ship: a DuckDB oracle rebuilds it from the same table with the
    same md5 formula and identically-ordered double arithmetic.
    """
    # Center g is exactly md5-Rademacher "plane" g of the shared
    # generator (same md5(salt+"g:d") parity formula the DuckDB oracles
    # replay) — one hash family, defined once.
    centers = list(enumerate(hyperplanes_md5(dims, n_clusters, salt=salt)))
    spark = data.sparkSession
    cdf = spark.createDataFrame(centers, "g long, cv array<double>")
    return (
        data.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
        .withColumn("g", F.col(id_col) % n_clusters)
        .join(F.broadcast(cdf), "g")
        .select(
            id_col,
            F.zip_with(
                "cv",
                vec_col,
                lambda c, x: c + F.lit(float(noise_scale)) * x,
            ).alias(vec_col),
        )
    )


def ivf_candidates(
    data: DataFrame,
    queries: DataFrame,
    n_centroids: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, vec_id) candidate pairs of the IVF index: a vector is a
    candidate iff it is assigned to one of the query's ``nprobe`` nearest
    coarse cells. The q163-style evaluation primitive — top-k and
    candidate-count both derive from it, so the measured candidate
    fraction is exactly what the search scores.

    Scale shape: assignment is one broadcast-centroid map stage over the
    corpus (``ivf_assign`` — at warehouse scale it is precomputed and
    stored WITH the corpus, this recomputes it for self-containment);
    the per-query probe list is tiny (Q × nprobe) and broadcasts onto
    the assigned corpus, so candidate generation is a map-side semi-join
    — no shuffle of the corpus, candidate volume ≈ nprobe/n_centroids
    of it. Centroids are the first ``n_centroids`` vectors by id (the
    deterministic stand-in ``ivf_topk`` documents; swap in ``kmeans_lite``
    offline for trained cells — the search plan is identical).
    """
    centroids = data.filter(F.col(id_col) < n_centroids).select(id_col, vec_col)
    assigned = ivf_assign(data, centroids, id_col, vec_col, round_digits)
    probes = ivf_probes(
        queries, centroids, nprobe, id_col, vec_col, round_digits
    ).select("query_id", "cid")
    return (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col)
    )


def quantize_codes(
    data: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8 codes for ACTUAL storage: (id, codes array<tinyint>).

    The storage half of :func:`scalar_quantize_dequantized` (which
    returns dequantized doubles because quality checks are defined on
    them): code k = clamp(floor((v−mn)/scale + 0.5), 0..255) stored as
    k−128 in a signed TINYINT — 1 byte/dim vs 8 for raw doubles, the
    4–8× index cut q167 motivates. ``params`` is the per-dim [mn, mx]
    codebook (64 rows, broadcast) and must be FROZEN when the codes
    feed an incremental index: re-deriving it over an append shifts
    mn/mx and silently re-codes the whole corpus. Values outside the
    frozen [mn, mx] (possible in later increments) clamp to the range
    edge — the standard scalar-quantizer saturation.

    MAP-SIDE (round 13): literal-codebook zip_with per row (the
    :func:`scalar_quantize_dequantized` rewrite), replacing the
    posexplode → broadcast join → collect_list shuffle; identical code
    values (same k formula, same operation order, scale == 0 ⇔
    mx == mn for the constant-dimension branch).
    """
    mn_arr, sc_arr = codebook_arrays(params)
    v = F.col(vec_col).cast("array<double>")
    diffs = F.zip_with(v, mn_arr, lambda x, m: x - m)
    k = F.zip_with(
        diffs,
        sc_arr,
        lambda d, s: F.when(
            s > 0,
            F.greatest(
                F.lit(0), F.least(F.lit(255), F.floor(d / s + 0.5).cast("int"))
            ),
        ).otherwise(F.lit(0)),
    )
    return data.filter(v.isNotNull()).select(
        id_col,
        F.transform(k, lambda c: (c - 128).cast("tinyint")).alias("codes"),
    )


def codebook_arrays(params: DataFrame) -> tuple[F.Column, F.Column]:
    """Collect the 64-row codebook ONCE into two literal array columns
    (mn, scale) — callers that dequantize several frames share one
    driver-side read instead of re-collecting (and re-executing the
    codebook plan) per call."""
    p = sorted(params.collect(), key=lambda r: r.dim)
    mn_arr = F.array(*[F.lit(float(r.mn)) for r in p])
    sc_arr = F.array(*[F.lit((float(r.mx) - float(r.mn)) / 255.0) for r in p])
    return mn_arr, sc_arr


def dequant_expr(
    codes_col: str, mn_arr: F.Column, sc_arr: F.Column
) -> F.Column:
    """dq[d] = mn[d] + (code[d]+128) · scale[d] as a pure column
    expression over literal codebook arrays — no join, map stage only."""
    stepped = F.zip_with(
        F.col(codes_col).cast("array<int>"),
        sc_arr,
        lambda c, s: (c + F.lit(128)).cast("double") * s,
    )
    return F.zip_with(stepped, mn_arr, lambda t, m: m + t)


def dequantize_codes(
    codes_df: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    out_col: str = "dqvec",
) -> DataFrame:
    """Reconstruct dequantized doubles from stored int8 codes:
    dq[d] = mn[d] + (code[d]+128) · scale[d] — bit-identical to
    :func:`scalar_quantize_dequantized` for in-range values (same k,
    same operation order), so every downstream consumer (bucketing,
    scoring, oracles) sees one canonical dequantized form. The 64-row
    codebook collapses to two literal arrays carried in the plan — no
    join, pure map stage. Dequantizing several frames against one
    codebook? Use :func:`codebook_arrays` + :func:`dequant_expr` to pay
    the codebook read once.
    """
    mn_arr, sc_arr = codebook_arrays(params)
    return codes_df.select(
        id_col, dequant_expr(codes_col, mn_arr, sc_arr).alias(out_col)
    )


def embedding_lsh_index_quantized(
    data: DataFrame,
    planes: list[list[float]],
    params: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: tuple[F.Column, F.Column] | None = None,
) -> DataFrame:
    """The int8-coded persistable embedding-LSH index: (bucket, id,
    codes, nrm) — :func:`embedding_lsh_index` with the raw vector
    replaced by its TINYINT codes (4–8× smaller on disk; measured ratio
    asserted in tests). Bucket and norm are computed on the DEQUANTIZED
    vector, so the index is self-consistent: probes and scoring operate
    entirely in the dequantized space and an increment coded with the
    same frozen ``params`` reproduces the full rebuild exactly
    (property-tested). The recall cost of quantized scoring vs the
    full-precision index is measured hash-checked in q175.
    """
    mn_arr, sc_arr = codebook if codebook is not None else codebook_arrays(params)
    return (
        quantize_codes(data, params, id_col, vec_col)
        .withColumn("dqvec", dequant_expr("codes", mn_arr, sc_arr))
        .withColumn("bucket", lsh_bucket_col("dqvec", planes))
        .withColumn("nrm", norm(F.col("dqvec")))
        .select(id_col, "codes", "bucket", "nrm")
    )


def incremental_lsh_neardup_pairs_quantized(
    existing_qindex: DataFrame,
    params: DataFrame,
    new_df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.42,
    n_planes: int = 6,
    planes: list[list[float]] | None = None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_dropped: bool = False,
    existing_occupancy: DataFrame | None = None,
    with_occupancy: bool = False,
):
    """Near-dup increment against the QUANTIZED index: the
    :func:`incremental_lsh_neardup_pairs_indexed` contract (returns
    ``(new_index_rows, pairs)``, pairs involve ≥ 1 new vector, caller
    unpersists ``new_index_rows`` after its append commits) with both
    sides scored in the dequantized space — the existing side
    reconstructs vectors from its stored codes via a literal-codebook
    map stage (no extra table touched), the increment quantizes with
    the same FROZEN ``params``. Exactness (property-tested):
    pairs_q(full) == pairs_q(existing) ∪ pairs_q(increment).

    Same combined-occupancy degenerate-bucket guard as the
    full-precision form (``max_bucket`` / ``with_dropped`` /
    ``existing_occupancy`` / ``with_occupancy``; see
    :func:`incremental_lsh_neardup_pairs_indexed`).
    """
    if planes is None:
        planes = hyperplanes_md5(dims, n_planes)
    # ONE codebook collect shared by the index build and both
    # dequantizations below — and the increment's dqvec derives from
    # its cached codes by a pure column expression, never a join or
    # recompute from raw vectors.
    cb = codebook_arrays(params)
    mn_arr, sc_arr = cb
    new_idx = embedding_lsh_index_quantized(
        new_df, planes, params, id_col, vec_col, codebook=cb
    ).persist()
    a = new_idx.select(
        "bucket",
        F.col(id_col).alias("nid"),
        dequant_expr("codes", mn_arr, sc_arr).alias("nv"),
        F.col("nrm").alias("nn"),
    )
    touched = a.select("bucket").distinct()
    ex = existing_qindex.join(F.broadcast(touched), "bucket", "left_semi")
    # the gate owns the upsert rule (re-sent ids' stored rows
    # superseded) and the post-upsert occupancy
    a, ex, dropped, occupancy = _capped_incremental_gate(
        a, ex, ["bucket"], max_bucket, "nid", id_col,
        existing_occupancy=existing_occupancy,
    )
    b = a.select(
        "bucket",
        F.col("nid").alias("vec2"),
        F.col("nv").alias("v2"),
        F.col("nn").alias("n2"),
    )
    nn_pairs = (
        a.join(b, "bucket")
        .filter(F.col("nid") < F.col("vec2"))
        .select(
            F.col("nid").alias("vec1"),
            "vec2",
            F.col("nv").alias("v1"),
            "v2",
            F.col("nn").alias("n1"),
            "n2",
        )
    )
    ex_dq = ex.select(
        id_col,
        "bucket",
        "nrm",
        dequant_expr("codes", mn_arr, sc_arr).alias("dqvec"),
    )
    ne_pairs = (
        ex_dq.join(F.broadcast(a), "bucket")
        .filter(F.col(id_col) != F.col("nid"))
        .select(
            F.least(F.col(id_col), F.col("nid")).alias("vec1"),
            F.greatest(F.col(id_col), F.col("nid")).alias("vec2"),
            F.col("dqvec").alias("v1"),
            F.col("nv").alias("v2"),
            F.col("nrm").alias("n1"),
            F.col("nn").alias("n2"),
        )
    )
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        nn_pairs.unionByName(ne_pairs)
        .select(
            "vec1",
            "vec2",
            (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    out = (new_idx, pairs)
    if with_dropped:
        out += (dropped,)
    if with_occupancy:
        out += (occupancy,)
    return out


# -- product quantization (PQ) ------------------------------------------
#
# The last rung of the index-memory ladder: raw doubles (8 B/dim) →
# int8 scalar codes (1 B/dim, q167/q175) → PQ codes (1 B per SUBSPACE:
# m bytes per vector — 64× smaller than raw for m=8 over 64 dims).
# Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search": split each vector into m subvectors, quantize each against
# its own small codebook, and score a query against N codes with an
# m-lookup table sum (ADC — asymmetric distance computation) instead of
# a d-dim dot product.
#
# Codebooks here are the subvectors of the first ``n_codes`` corpus
# vectors by id — the same deterministic offline-training stand-in the
# IVF path documents (swap in per-subspace k-means at production scale;
# the assignment/ADC plan is identical). Deterministic codebooks are
# what make the WHOLE PQ pipeline hash-replayable in the oracle:
# assignments, the lookup table, and every ADC score are exact integer
# micro-units (floor(d2 × 1e6 + 0.5) as BIGINT), so ADC ranking has no
# float-summation-order hazard at all — sums of longs are associative.


def _d2i(a, b) -> F.Column:
    """Squared L2 distance in exact integer micro-units:
    floor((|a|² + |b|² − 2·a·b) · 1e6 + 0.5) as BIGINT. The |a|²+|b|²−2ab
    expansion reuses the dot/list_dot_product machinery the cosine
    oracles already proved cross-engine-stable, and integerizing ONCE
    per pair (not per addend) keeps later sums exact."""
    d2 = dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
    return F.floor(d2 * 1e6 + F.lit(0.5)).cast("long")


def _d2i_pre(na, nb, a, b) -> F.Column:
    """:func:`_d2i` with the two self-dots HOISTED to per-vector columns
    (round 14): callers compute ``na = dot(a,a)`` / ``nb = dot(b,b)``
    once per distinct vector BELOW the pair fan-out instead of re-folding
    them per pair. Same expression shape ((na + nb) − 2·a·b, integerized
    once) over identical operand values — bit-identical to _d2i."""
    d2 = na + nb - 2.0 * dot(a, b)
    return F.floor(d2 * 1e6 + F.lit(0.5)).cast("long")


def _pq_sub(dims: int, m: int) -> int:
    """Subspace width, validating the split covers EVERY dimension — a
    dims % m remainder would silently drop the trailing dims from every
    codebook, assignment, and ADC distance."""
    if dims % m:
        raise ValueError(
            f"PQ: dims={dims} is not divisible by m={m} subspaces — "
            f"{dims % m} trailing dimensions would be silently ignored. "
            "Pad the vectors or pick m | dims."
        )
    return dims // m


def _subvectors(vec_col: F.Column, m: int, sub: int) -> F.Column:
    return F.array(*[F.slice(vec_col, s * sub + 1, sub) for s in range(m)])


def pq_codebooks(
    data: DataFrame,
    dims: int,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(s, code, cvec): per-subspace codebooks — code c in subspace s is
    the s-th subvector of corpus vector c (the first ``n_codes`` by id).
    m × n_codes rows total; always broadcast."""
    sub = _pq_sub(dims, m)
    base = data.filter(F.col(id_col) < n_codes)
    return base.select(
        F.col(id_col).cast("int").alias("code"),
        F.posexplode(_subvectors(F.col(vec_col), m, sub)).alias("s", "cvec"),
    ).select("s", "code", "cvec")


def pq_codes(
    data: DataFrame,
    codebooks: DataFrame,
    dims: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, s, code): each vector's nearest sub-centroid per subspace
    (exact-integer d², ties to the lowest code). One map stage — the
    m×n_codes codebook broadcasts — plus a map-side-combinable min-
    struct argmin; this is the PQ encode a 100-TB corpus runs once at
    ingest and stores as m TINYINT-able columns."""
    from beast_spark.operators.dedup import fan_out

    sub = _pq_sub(dims, m)
    # fan_out (round 13): the m×n_codes-way scored explode inherits the
    # data side's partitioning — a single-file local scan serialized
    # all N·m·n_codes interpreted sub-d² rows on ONE task (0.77 s of
    # q183's codes leg, measured 0.31 s fanned); no-op at scale
    rows = fan_out(data).select(
        id_col, F.posexplode(_subvectors(F.col(vec_col), m, sub)).alias("s", "sv")
    )
    # self-dots hoisted below the n_codes-fold join (round 14): the
    # subvector norm folds once per (vec, s) row and the centroid norm
    # once per codebook row, instead of 3 interpreted folds per scored
    # row; _d2i_pre keeps the distance bit-identical
    rows = rows.withColumn("_nsv", dot(F.col("sv"), F.col("sv")))
    cb = codebooks.withColumn("_ncv", dot(F.col("cvec"), F.col("cvec")))
    scored = rows.join(F.broadcast(cb), "s").select(
        id_col,
        "s",
        "code",
        _d2i_pre(
            F.col("_nsv"), F.col("_ncv"), F.col("sv"), F.col("cvec")
        ).alias("d2i"),
    )
    return (
        scored.groupBy(id_col, "s")
        .agg(F.min(F.struct("d2i", "code")).alias("b"))
        .select(id_col, "s", F.col("b.code").alias("code"))
    )


def pq_adc_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    dims: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, s, code, d2i): the ADC lookup table — exact-integer
    sub-distances from every query subvector to every sub-centroid.
    Q × m × n_codes rows; always broadcast."""
    sub = _pq_sub(dims, m)
    # self-dots hoisted below the n_codes-fold join (round 14, as in
    # pq_codes); bit-identical via _d2i_pre
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(_subvectors(F.col(vec_col), m, sub)).alias("s", "qv"),
    ).withColumn("_nqv", dot(F.col("qv"), F.col("qv")))
    cb = codebooks.withColumn("_ncv", dot(F.col("cvec"), F.col("cvec")))
    return qrows.join(F.broadcast(cb), "s").select(
        "query_id",
        "s",
        "code",
        _d2i_pre(F.col("_nqv"), F.col("_ncv"), F.col("qv"), F.col("cvec")).alias("d2i"),
    )


def pq_adc_topk(
    codes: DataFrame,
    lut: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, adc, rank): top-k by ADC distance — each
    corpus code row joins the broadcast lookup table and the m
    sub-distances SUM AS LONGS (associative: no float-order hazard),
    so the ranking is bit-deterministic; ``adc`` is micro-units / 1e6.
    Self-matches excluded. Scale shape: the corpus side streams its m
    code rows through one broadcast join and one map-side-combinable
    sum — memory traffic is m bytes per vector, the entire point of PQ."""
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.sum("d2i").alias("adci"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adci"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, (F.col("adci") / 1e6).alias("adc"), "rank"
        )
    )
