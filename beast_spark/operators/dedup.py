"""Deduplication operators for training-data pipelines.

Spark-first designs, all shuffle-aware for the 100 TB case:

* **exact**: hash-groupBy on the dedup key — one shuffle, map-side
  partial agg for the counts.
* **n-gram Jaccard**: shingle → explode → self-equi-join on shingle.
  The classic skew hazard is a stop-shingle appearing in most docs
  (quadratic bucket). ``max_df`` drops shingles present in more than
  that many docs before the join — standard document-frequency pruning
  (identical to what MinHashLSH implementations do to survive web-scale
  corpora).
* **MinHash + LSH banding**: k hash functions folded into ONE shuffle
  (k parallel min-aggregates, not k passes), then band-hash equi-join
  for candidates. ``max_bucket`` caps pathological buckets.
* **SimHash**: 64-bit signature via element-wise ±1 bit sums; near-dup
  candidates via 16-bit band join + popcount(xor) Hamming filter.

All operators are pure DataFrame compositions — no Python UDFs — so the
whole pipeline stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beast_spark.functions.hashing import md5_long
from beast_spark.functions.text import tokens

__all__ = [
    "exact_dedup_groups",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "incremental_minhash_pairs",
    "incremental_minhash_pairs_indexed",
    "simhash_signatures",
    "simhash_pairs",
    "dedup_clusters",
    "dedup_clusters_minlabel",
    "hashed_doc_vectors",
]


def exact_dedup_groups(df: DataFrame, id_col: str, key_cols: list[str]) -> DataFrame:
    """Group rows by exact key; emit canonical (min) id + copy count per group."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def fan_out(df: DataFrame) -> DataFrame:
    """Single-file local inputs arrive as one partition, serializing
    CPU-heavy per-row stages (shingling, gram hashing). Repartition ONLY
    when the input has fewer partitions than cores — at warehouse scale
    inputs are already split and this is a no-op (no shuffle added)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, parallelism // 2):
        return df.repartition(parallelism)
    return df


_fan_out = fan_out  # internal alias, predates the public name


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # Materialize the token array before the shingle transform: a lambda
    # over the split() EXPRESSION re-splits the document once per shingle
    # (Catalyst inlines the subtree per element) — on long documents that
    # is O(tokens²) splitting. With the column materialized it is O(tokens).
    from beast_spark.functions.text import _shingle_expr

    return (
        _fan_out(df)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(_shingle_expr(F.col("_toks"), n))).alias("shingle"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above ``threshold``.

    Returns (doc1, doc2, jaccard) with doc1 < doc2. ``max_df`` prunes
    shingles occurring in more than that many documents (skew guard).
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_shingles").alias("n2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT near-dup pairs: C = |A∩B| / min(|A|,|B|).

    Jaccard misses inclusion: a short document quoted verbatim inside a
    much longer one scores |A|/|B| ≈ 0 on Jaccard but 1.0 on
    containment — the quote/boilerplate-inclusion case corpus dedup
    cares about (Broder's containment measure). Returns
    (inner_doc, outer_doc, containment) where ``inner_doc`` is the
    smaller-shingle-set side (tie → smaller id; pairs are emitted once).
    Same shingle self-join shape and ``max_df`` skew guard as
    :func:`jaccard_pairs`; the q36 LSH pipeline remains the candidate
    generator at scale.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_shingles").alias("n2"))
    joined = inter.join(s1, "doc1").join(s2, "doc2")
    containment = F.col("n_common") / F.least("n1", "n2").cast("double")
    return (
        joined.filter(containment >= threshold)
        .select(
            F.when(F.col("n1") <= F.col("n2"), F.col("doc1"))
            .otherwise(F.col("doc2"))
            .alias("inner_doc"),
            F.when(F.col("n1") <= F.col("n2"), F.col("doc2"))
            .otherwise(F.col("doc1"))
            .alias("outer_doc"),
            (F.floor(containment * 10000 + F.lit(0.5)) / 10000).alias("containment"),
        )
    )


#: Mersenne prime 2³¹−1: the universal-hash modulus for the md5 MinHash
#: family. With h, aᵢ < p the affine product stays < 2⁶², inside int64 in
#: every engine — the property that makes the family cross-engine exact.
MINHASH_P = 2_147_483_647


def minhash_affine_params(k: int) -> tuple[list[int], list[int]]:
    """Deterministic (aᵢ, bᵢ) for the md5 family's k affine permutations.

    Derived from md5 of fixed labels, so any engine (the DuckDB oracle
    replays these as literals) can recompute them: aᵢ ∈ [1, p−1],
    bᵢ ∈ [0, p−1]."""
    from beast_spark.functions.hashing import md5_long_py

    a = [md5_long_py(f"minhash-a:{i}") % (MINHASH_P - 1) + 1 for i in range(k)]
    b = [md5_long_py(f"minhash-b:{i}") % MINHASH_P for i in range(k)]
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    n: int = 3,
    hash_family: str = "xxh",
) -> DataFrame:
    """k-permutation MinHash signature per doc with ZERO shuffles.

    Hash family: ONE xxhash64 over the shingle string, then k derived
    functions ``xxhash64(h, i)`` over that fixed-width base hash. The
    corpus text is hashed exactly once; each extra permutation costs a
    constant 16-byte hash instead of rehashing every character k times —
    the dominant term when shingles are long.

    A document's shingles all live in its own row, so each min is an
    ``array_min(transform(...))`` over the per-row hash array — a narrow
    map-only plan (no explode, no groupBy): nothing moves over the
    network no matter how large the corpus. Both the token and base-hash
    arrays are materialized with ``withColumn`` between projections so
    Catalyst does not re-inline their subtrees per lambda element.
    Docs with fewer than ``n`` tokens have no shingles and are dropped
    (same contract as the explode formulation). Signature =
    array<bigint> length k.

    ``hash_family``: ``"xxh"`` (default — fastest, Spark-only) or
    ``"md5"`` — ONE md5 per shingle reduced mod p = 2³¹−1, then k
    universal affine permutations ``(aᵢ·h + bᵢ) mod p`` (Carter–Wegman;
    aᵢ/bᵢ themselves md5-derived constants, see :func:`minhash_affine_params`).
    h < p and aᵢ < p keep every product inside int64, so the whole
    construction is reproducible bit-exact by any engine with ``md5()``
    and 64-bit integers (this is what the q36 DuckDB oracle replays) —
    at k× less hashing than deriving each permutation with its own md5.
    """
    from beast_spark.functions.hashing import md5_long
    from beast_spark.functions.text import _shingle_expr

    # NOTE: HOF lambdas must be strictly single-parameter — PySpark
    # arity-inspects them, and a default arg (or md5_long's chars=) makes
    # it pass the ARRAY INDEX as the second argument. Bind loop vars via
    # closure factories only.
    if hash_family == "xxh":

        def base(s):
            return F.xxhash64(s)

        def mk_perm(i):
            return lambda h: F.xxhash64(h, F.lit(i))

    elif hash_family == "md5":
        a, b = minhash_affine_params(k)

        def base(s):
            return md5_long(s) % MINHASH_P

        def mk_perm(i):
            return lambda h: (h * F.lit(a[i]) + F.lit(b[i])) % MINHASH_P

    else:
        raise ValueError(f"hash_family must be 'xxh' or 'md5', got {hash_family!r}")

    return (
        _fan_out(df)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .withColumn("_sh", F.array_distinct(_shingle_expr(F.col("_toks"), n)))
        .filter(F.size("_sh") >= 1)
        .withColumn("_h", F.transform("_sh", base))
        .select(
            "doc_id",
            F.array(
                *[F.array_min(F.transform("_h", mk_perm(i))) for i in range(k)]
            ).alias("signature"),
        )
    )


def band_signatures(
    sigs: DataFrame, k: int, bands: int, hash_family: str = "xxh"
) -> DataFrame:
    """(doc_id, band, bucket) from a (doc_id, signature) frame — the LSH
    banding step, shared by full and incremental dedup. md5 family: the
    bucket is the md5 hex of the band's signature slice (engine-
    replayable); xxh: one xxhash64 over the slice."""
    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands

    def bucket_expr(cols):
        if hash_family == "md5":
            return F.md5(
                F.encode(F.concat_ws("|", *[c.cast("string") for c in cols]), "UTF-8")
            )
        return F.xxhash64(*cols)

    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket_expr(
                            [F.col("signature")[b * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def incremental_minhash_pairs(
    existing_sigs: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.35,
    max_bucket: int = 1000,
    hash_family: str = "xxh",
    with_dropped: bool = False,
):
    """Dedup an INCREMENT against an already-deduped corpus without
    recomputing it: returns ``(new_sigs, pairs)`` — plus the (band,
    bucket, bucket_size) accounting frame of cap-dropped
    increment-touched buckets when ``with_dropped=True`` — where pairs
    involve at
    least one new document (new-vs-new and new-vs-existing; the
    existing-vs-existing pairs were found when the corpus was built).

    This is how a 100 TB corpus absorbs nightly appends: signatures are
    materialized once (``existing_sigs`` = the persisted signature
    table, (doc_id, signature)), each increment only shingles ITS OWN
    documents, and candidate generation is the same band equi-join over
    the union of bucket memberships. Union the returned ``new_sigs``
    into the signature table afterwards. Exactness: pairs(full corpus) ==
    pairs(existing) ∪ pairs(increment) for any split (tested). Caveat:
    ``max_bucket`` is evaluated on the UNION's bucket size, so a bucket
    that crosses the cap only once the increment lands is dropped here
    exactly as a full recompute would drop it — the two sides stay
    consistent, but a cap-crossing bucket's older pairs remain from the
    earlier run (dedup keeps found pairs; it never un-finds them).

    Cost note: the two-pass cap (size-gate before collect_set) needs
    two aggregations over the banding — but the banding itself is
    repartitioned and pinned so it computes ONCE per increment and
    both passes ride the cached distribution (this function still
    re-bands every existing signature per increment by design; that
    is why it exists next to the indexed form). The production path,
    :func:`incremental_minhash_pairs_indexed`, pays zero extra: its
    gate reads stored occupancy and never touches the index twice."""
    new_sigs = minhash_signatures(
        new_df, id_col, text_col, k=k, n=n, hash_family=hash_family
    ).persist()
    # upsert semantics (review finding): a re-sent doc's stored
    # signature is superseded by the increment's — without the
    # anti-join, the doc carries TWO signature rows through banding and
    # the estimate join, duplicating its pairs and scoring one copy
    # against the stale signature. No-op under the append-only
    # unique-id contract.
    all_sigs = (
        existing_sigs.select("doc_id", "signature")
        .join(F.broadcast(new_sigs.select("doc_id")), "doc_id", "left_anti")
        .unionByName(new_sigs.select("doc_id", "signature"))
    )
    banded = band_signatures(all_sigs, k=k, bands=bands, hash_family=hash_family)
    new_ids = new_sigs.select(F.col("doc_id").alias("_nid"))
    tagged = banded.join(
        F.broadcast(new_ids.withColumn("_is_new", F.lit(True))),
        banded.doc_id == F.col("_nid"),
        "left",
    ).select("doc_id", "band", "bucket", F.coalesce("_is_new", F.lit(False)).alias("is_new"))
    # Two-pass cap (the capped_bucket_pairs discipline): size every
    # bucket with cheap countDistinct longs FIRST, anti-join the
    # over-cap buckets out, and only then collect_set — so no reducer
    # ever buffers a degenerate bucket's full id array. Only buckets a
    # NEW doc touches can yield new pairs; the cap guards the same
    # degenerate buckets as the full pass, and — no silent caps —
    # dropped reports the increment-touched buckets the cap removed
    # (with_dropped=True). The tagged postings are repartitioned by
    # (band, bucket) and pinned so the corpus re-band + tag computes
    # ONCE and both passes ride the cached hash distribution
    # (capped_bucket_pairs' materialize discipline; round-10 verdict
    # #2 — without this the size pass and the collect pass each paid
    # the banding subtree and its own Exchange). Lifetime is
    # process-scoped like capped_bucket_pairs' internal cache (the
    # q112 count-table discipline) but releasable: the handle registers
    # with operators._cache (release_scratch_caches), bench/sweep
    # sessions clearCache between queries, and a long-lived caller
    # should prefer the indexed form, which never re-bands the corpus
    # at all.
    # registered scratch cache (operators._cache): long-lived callers
    # release via release_scratch_caches after consuming the pairs
    from beast_spark.operators._cache import pin_scratch

    tagged = pin_scratch(tagged.repartition("band", "bucket"))
    occ = tagged.groupBy("band", "bucket").agg(
        F.countDistinct("doc_id").alias("bucket_size"),
        F.max("is_new").alias("_any_new"),
    )
    over = occ.filter(F.col("bucket_size") > max_bucket)
    dropped = over.filter(F.col("_any_new")).select(
        "band", "bucket", "bucket_size"
    )
    grouped = (
        tagged.join(F.broadcast(over.select("band", "bucket")), ["band", "bucket"], "left_anti")
        .groupBy("band", "bucket")
        .agg(
            F.array_sort(F.collect_set("doc_id")).alias("docs"),
            F.array_sort(
                F.collect_set(F.when(F.col("is_new"), F.col("doc_id")))
            ).alias("new_docs"),
        )
    )
    buckets = grouped.filter((F.size("new_docs") >= 1) & (F.size("docs") >= 2))
    pairs = buckets.select(
        F.col("new_docs"),
        F.explode(
            F.flatten(
                F.transform(
                    "docs",
                    lambda x, i: F.transform(
                        F.slice(F.col("docs"), i + 2, F.size("docs")),
                        lambda y: F.struct(x.alias("doc1"), y.alias("doc2")),
                    ),
                )
            )
        ).alias("p"),
    ).filter(
        F.array_contains("new_docs", F.col("p.doc1"))
        | F.array_contains("new_docs", F.col("p.doc2"))
    )
    cand = pairs.select("p.doc1", "p.doc2").distinct()
    s1 = all_sigs.select(F.col("doc_id").alias("doc1"), F.col("signature").alias("sig1"))
    s2 = all_sigs.select(F.col("doc_id").alias("doc2"), F.col("signature").alias("sig2"))
    est = (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "est_jaccard",
            F.round(
                F.aggregate(
                    F.zip_with("sig1", "sig2", lambda a, b: F.when(a == b, 1).otherwise(0)),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(float(k)),
                4,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc1", "doc2", "est_jaccard")
    )
    return (new_sigs, est, dropped) if with_dropped else (new_sigs, est)


def existing_bucket_docs(existing_index: DataFrame, touched: DataFrame) -> DataFrame:
    """Existing docs per touched (band, bucket) — the probe-shape
    building block (:func:`incremental_minhash_pairs_indexed` now
    routes through the shared two-pass cap gate instead, which applies
    the same semi-join probe BEFORE any collect_set).

    ``existing_index`` is the materialized (doc_id, band, bucket) band
    table; ``touched`` the (band, bucket) set the increment lands in —
    O(increment) rows, broadcast. The semi-join filters the index scan
    without shuffling it (BroadcastHashJoin preserves the streamed
    side's partitioning), and when the index table is BUCKETED by
    (band, bucket) (``sources/bucketing.py::write_bucketed``) the groupBy
    clusters on the scan's own distribution — the whole corpus side runs
    with ZERO shuffle Exchange, test-asserted. This is the O(increment)
    vs O(corpus) difference for a nightly append at 100 TB."""
    return (
        existing_index.join(F.broadcast(touched), ["band", "bucket"], "left_semi")
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ex_docs"))
    )


def incremental_minhash_pairs_indexed(
    existing_index: DataFrame,
    existing_sigs: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.35,
    max_bucket: int = 1000,
    hash_family: str = "xxh",
    with_dropped: bool = False,
    existing_occupancy: DataFrame | None = None,
    with_occupancy: bool = False,
    new_sigs: DataFrame | None = None,
):
    """Dedup an increment against a PERSISTED band/bucket index: returns
    ``(new_sigs, new_bands, pairs)`` — plus the (band, bucket,
    bucket_size) frame of cap-dropped touched buckets (DISTINCT union
    sizes — an id present on both sides counts once, matching a capped
    batch rebuild) when ``with_dropped=True``, the family-wide
    no-silent-caps contract; plus the combined (band, bucket,
    bucket_size) occupancy frame for EVERY touched bucket when
    ``with_occupancy=True`` (appended last — a maintainer commits it
    back as the new stored occupancy, since the index appends ungated).

    ``existing_occupancy`` (a (band, bucket, n_exist) frame of the
    persisted index's per-bucket distinct-doc counts, shard-pruned by
    the caller to the touched shards) lets the cap gate read stored
    counts instead of re-aggregating the probed index rows per call —
    see ``operators/similarity.py::_capped_incremental_gate``, the
    single shared implementation of the incremental cap.

    :func:`incremental_minhash_pairs` avoids re-shingling the corpus but
    still re-bands and re-shuffles every existing signature per
    increment. This variant reads the banding from ``existing_index``
    (the (doc_id, band, bucket) table :func:`band_signatures` produced
    when each batch was absorbed — persist it bucketed by (band, bucket))
    so the corpus side is never re-hashed, never re-banded, and never
    re-shuffled: the increment's touched buckets are broadcast into a
    semi-join filter on the index scan and the per-bucket aggregation
    rides the table's own bucketing (see :func:`existing_bucket_docs`).
    Append the returned ``new_sigs`` / ``new_bands`` to their tables
    afterwards and the next increment pays the same O(increment) cost.

    Exactness: same pair set as :func:`incremental_minhash_pairs` (and
    therefore pairs(full) == pairs(existing) ∪ pairs(increment)) —
    property-tested. ``max_bucket`` is evaluated on the DISTINCT union
    bucket size, consistent with the full recompute. Pair generation is
    new×new + new×existing per bucket — never the existing×existing
    quadratic term a full-bucket expansion would pay.

    ``new_sigs`` (a :func:`minhash_signatures` frame for ``new_df``,
    typically read back from the scratch/ingest table a maintainer
    writes anyway) skips the internal shingle+persist. The increment's
    signature subtree feeds MANY small broadcast builds (touched
    buckets, the gate's id sets and counts, the upsert anti-joins,
    the estimate join), and each broadcast executes as its own job —
    with an in-line shingle that means re-scanning the raw increment
    once per broadcast (measured: ~13 scan+shingle stage replays per
    execution at sf0.1, the round-10 q98 bench regression). Reading a
    materialized signature table per subtree is O(increment-file)
    instead, exactly the 'signatures are materialized once' contract
    the nightly-append story already states."""
    from beast_spark.operators.similarity import _capped_incremental_gate

    if new_sigs is None:
        new_sigs = minhash_signatures(
            new_df, id_col, text_col, k=k, n=n, hash_family=hash_family
        ).persist()
    new_bands = band_signatures(new_sigs, k=k, bands=bands, hash_family=hash_family)
    touched = new_bands.select("band", "bucket").distinct()
    ex_post = existing_index.join(F.broadcast(touched), ["band", "bucket"], "left_semi")
    resent_old = None
    if existing_occupancy is not None:
        # Re-sent docs' OLD band rows, re-derived from the stored
        # signature table (id-keyed, scanned by the estimate join
        # anyway; banding is deterministic under the frozen hash
        # family) — so the gate's post-upsert occupancy term never
        # aggregates the band index. ~Zero rows under the append-only
        # unique-id contract.
        re_sent = existing_sigs.join(
            F.broadcast(new_sigs.select("doc_id")), "doc_id", "left_semi"
        )
        resent_old = band_signatures(
            re_sent, k=k, bands=bands, hash_family=hash_family
        )
    # Two-pass cap through the shared gate, which also owns the upsert
    # rule (a re-sent doc's stored band rows are superseded — its pairs
    # come from the new×new leg, and all_sigs below scores against the
    # NEW signature): over-cap buckets (post-upsert DISTINCT occupancy)
    # are anti-joined out of BOTH slim posting sides BEFORE any
    # collect_set, so no reducer buffers a degenerate bucket's id
    # array. The broadcast anti-joins preserve the index scan's
    # bucketed distribution, so the per-bucket aggregation below still
    # rides the table's own bucketing (zero corpus-side Exchange,
    # test-asserted).
    new_bands_g, ex_g, dropped, occupancy = _capped_incremental_gate(
        new_bands, ex_post, ["band", "bucket"], max_bucket, "doc_id", "doc_id",
        existing_occupancy=existing_occupancy,
        resent_old=resent_old,
    )
    new_buckets = new_bands_g.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_set("doc_id")).alias("new_docs")
    )
    ex = ex_g.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ex_docs")
    )
    # Both sides are O(touched buckets) now; the corpus never reaches
    # this join. ex is broadcast so the plan stays shuffle-free even
    # when new_buckets rides an earlier partitioning.
    joined = (
        new_buckets.join(F.broadcast(ex), ["band", "bucket"], "left")
        # typed empty array of the id type: a zero-length slice of new_docs
        .withColumn("ex_nn", F.coalesce("ex_docs", F.slice("new_docs", 1, 0)))
    )
    buckets = joined.filter(F.size(F.array_union("new_docs", "ex_nn")) >= 2)
    new_new = F.flatten(
        F.transform(
            "new_docs",
            lambda x, i: F.transform(
                F.slice(F.col("new_docs"), i + 2, F.size("new_docs")),
                lambda y: F.struct(x.alias("doc1"), y.alias("doc2")),
            ),
        )
    )
    new_existing = F.flatten(
        F.transform(
            "new_docs",
            lambda x: F.transform(
                "ex_nn",
                lambda y: F.struct(
                    F.least(x, y).alias("doc1"), F.greatest(x, y).alias("doc2")
                ),
            ),
        )
    )
    # the self-pair guard: an id on BOTH sides of a bucket (overlapping
    # re-append) would emit (x, x) with est_jaccard 1.0, a pair no batch
    # rebuild generates (its i<j expansion never self-pairs)
    pairs = buckets.select(
        F.explode(F.concat(new_new, new_existing)).alias("p")
    ).filter(F.col("p.doc1") != F.col("p.doc2"))
    cand = pairs.select("p.doc1", "p.doc2").distinct()
    # upsert semantics: the estimate must score a re-sent doc against
    # its NEW signature only (one sig row per doc — same rule as
    # incremental_minhash_pairs' all_sigs)
    all_sigs = (
        existing_sigs.select("doc_id", "signature")
        .join(F.broadcast(new_sigs.select("doc_id")), "doc_id", "left_anti")
        .unionByName(new_sigs.select("doc_id", "signature"))
    )
    s1 = all_sigs.select(F.col("doc_id").alias("doc1"), F.col("signature").alias("sig1"))
    s2 = all_sigs.select(F.col("doc_id").alias("doc2"), F.col("signature").alias("sig2"))
    # cand is increment-sized: broadcast it over the signature scans so
    # the signature table is read, never shuffled.
    est = (
        s1.join(F.broadcast(cand), "doc1")
        .join(s2, "doc2")
        .withColumn(
            "est_jaccard",
            F.round(
                F.aggregate(
                    F.zip_with("sig1", "sig2", lambda a, b: F.when(a == b, 1).otherwise(0)),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(float(k)),
                4,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc1", "doc2", "est_jaccard")
    )
    out = (new_sigs, new_bands, est)
    if with_dropped:
        out += (dropped,)
    if with_occupancy:
        out += (occupancy,)
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.35,
    max_bucket: int = 1000,
    hash_family: str = "xxh",
    with_dropped: bool = False,
    sigs: DataFrame | None = None,
):
    """Near-dup candidate pairs via LSH banding over MinHash signatures.

    bands × rows = k; a pair collides in ≥1 band ⟹ candidate; the
    estimated Jaccard (fraction of equal signature positions) is then
    computed exactly from the signatures and filtered by ``threshold``.
    ``max_bucket`` drops degenerate buckets (all-identical corpora)
    before the quadratic pair expansion; ``with_dropped=True``
    additionally returns the (band, bucket, bucket_size) accounting
    frame of capped buckets — no silent caps, same contract as the
    embedding family's :func:`~beast_spark.operators.similarity.capped_bucket_pairs`
    (which is also the single shared implementation of the cap).
    ``hash_family="md5"`` makes the whole pipeline engine-replayable
    (see :func:`minhash_signatures`); its band bucket is then the md5
    hex of the band's signature slice instead of an xxhash64.

    ``sigs`` (a :func:`minhash_signatures` frame) skips the internal
    signature build AND its persist — for callers that consume the
    signatures themselves and want the corpus shingled exactly once
    (they own the frame's caching/lifetime).
    """
    from beast_spark.operators.similarity import capped_bucket_pairs

    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    if sigs is None:
        # Signatures are consumed three times (banding + both estimate-
        # join sides) but are tiny (one row of k longs per doc) while
        # their subtree — shingle + hash the whole corpus — is the
        # expensive part. Persist so the corpus is shingled exactly
        # once; at warehouse scale the equivalent is materializing sigs
        # to a table.
        sigs = minhash_signatures(
            df, id_col, text_col, k=k, n=n, hash_family=hash_family
        ).persist()
    banded = band_signatures(sigs, k=k, bands=bands, hash_family=hash_family)
    # Candidate pairs straight from the bucket contents via the shared
    # capped expansion: one shuffle for the groupBy, pair expansion in
    # codegen, over-cap buckets dropped and reported — no separate
    # bucket-count join, no quadratic self-join shuffle.
    raw, dropped = capped_bucket_pairs(
        banded, ["band", "bucket"], "doc_id", max_bucket, out1="doc1", out2="doc2"
    )
    cand = raw.distinct()
    s1 = sigs.select(F.col("doc_id").alias("doc1"), F.col("signature").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("doc2"), F.col("signature").alias("sig2"))
    est = (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "est_jaccard",
            F.round(
                F.aggregate(
                    F.zip_with("sig1", "sig2", lambda a, b: F.when(a == b, 1).otherwise(0)),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(float(k)),
                4,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc1", "doc2", "est_jaccard")
    )
    return (est, dropped) if with_dropped else est


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, hash_family: str = "xxh"
) -> DataFrame:
    """64-bit SimHash per document from whitespace tokens.

    Per token: xxhash64 → ±1 vector over bit positions; per doc: sum the
    vectors (one shuffle: ``bits`` parallel sums); signature bit i = 1 iff
    sum_i > 0. Emitted as one BIGINT (bit 63 may set the sign — it is a
    bit pattern, not a number).

    ``hash_family="md5"`` uses the engine-replayable 60-bit md5 prefix
    (callers should then pass ``bits=60`` — the top 4 bits of the token
    hash are always zero, so including them would bias those signature
    bits to 0 for every doc).
    """
    if hash_family == "md5":
        from beast_spark.functions.hashing import md5_long

        token_hash = md5_long("tok")
    elif hash_family == "xxh":
        token_hash = F.xxhash64("tok")
    else:
        raise ValueError(f"hash_family must be 'xxh' or 'md5', got {hash_family!r}")
    tok = _fan_out(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("th", token_hash)
    # Per-bit ONES count + total token count; bit i of the signature is 1
    # iff 2·ones_i > n (same sign rule as summing ±1 — c − (n−c) > 0 —
    # but the plain masked sum codegens ~3× cheaper than a conditional).
    bit_cols = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftrightunsigned(F.col("th"), i).bitwiseAND(F.lit(1))).alias(f"c{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_cols)
    sig = None
    for i in range(bits):
        term = F.when(
            2 * F.col(f"c{i}") > F.col("n"), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: XOR == OR == +
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bits: int = 64,
    hash_family: str = "xxh",
    max_bucket: int = 1000,
    with_dropped: bool = False,
    sigs: DataFrame | None = None,
):
    """Near-dup pairs whose SimHashes differ in ≤ max_hamming bits.

    Candidate generation: 4 × (bits/4)-wide band join (a pair within
    Hamming distance 3 must agree on ≥1 band; wider distances may miss —
    standard SimHash banding tradeoff), then exact popcount(xor) filter.

    ``max_bucket`` is the degenerate-chunk guard (round-9 symmetry with
    the MinHash/embedding families): an all-identical corpus puts every
    document in ONE (band, chunk) cell, and the candidate expansion
    would go quadratic with no bound. Over-cap cells are dropped before
    expansion; ``with_dropped=True`` additionally returns the (band,
    chunk, bucket_size) accounting frame — no silent caps. Candidates
    expand in codegen from the capped groupBy (the former band
    self-join, one shuffle less); pairs colliding in several bands
    still dedup once.

    ``sigs`` (a :func:`simhash_signatures` frame for the same corpus)
    skips the internal signature build AND its persist — for callers
    that consume the signatures themselves and own the frame's
    caching/lifetime (the ``minhash_lsh_pairs`` contract). With
    ``sigs=None`` the signatures are persisted internally and stay
    cached for the session — a long-lived process calling this
    repeatedly should pass its own ``sigs`` and unpersist them.
    """
    from beast_spark.operators.similarity import capped_bucket_pairs

    if bits % 4 != 0:
        raise ValueError(f"bits={bits} must be divisible by the 4 bands")
    w = bits // 4
    mask = (1 << w) - 1
    if sigs is None:
        # sigs feed three subtrees (banding + both hamming-join sides) and
        # their build — explode every token, 60+ bit-sum aggregates — is the
        # expensive part; persist so it runs once (minhash discipline)
        sigs = simhash_signatures(
            df, id_col, text_col, bits=bits, hash_family=hash_family
        ).persist()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), w * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.chunk")
    cand, dropped = capped_bucket_pairs(
        banded, ["band", "chunk"], "doc_id", max_bucket, out1="doc1", out2="doc2"
    )
    s1 = sigs.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"))
    s2 = sigs.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"))
    pairs = (
        cand.distinct()
        .join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return (pairs, dropped) if with_dropped else pairs


def dedup_clusters_minlabel(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Reference connected components by min-label propagation.

    Every node starts labeled with itself; each round every node takes
    the min label among itself and its neighbors; converges in O(graph
    diameter) rounds, each round re-shuffling the FULL edge set. That is
    fine on shallow near-dup graphs but a 100-TB stall on one long
    duplication chain (boilerplate threaded through a crawl) — which is
    why :func:`dedup_clusters` (the production path) uses two-phase
    star contraction instead. Kept as the semantics oracle: the
    property tests assert both operators emit identical (doc_id,
    cluster_id) sets on random and adversarial chain graphs.
    Deterministic output: cluster_id = min doc id reachable. Docs
    without any near-dup edge are not emitted (singleton clusters are
    implicit).
    """
    edges = pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst")).filter(
        F.col("src") != F.col("dst")  # self-pairs carry no dup signal (parity w/ two-phase)
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame,
    max_iter: int = 100,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id).

    Two-phase star contraction (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14): alternate *large-star* (hook
    every neighbor larger than a node onto the minimum of its closed
    neighborhood) and *small-star* (hook every smaller neighbor, and the
    node itself, onto that minimum). Each operation is one shuffle-
    partitioned groupBy + one co-keyed join, the edge frame SHRINKS as
    stars contract, and the pair converges in O(log n) rounds — unlike
    min-label propagation (:func:`dedup_clusters_minlabel`), which needs
    O(graph diameter) rounds over the full, never-shrinking edge set and
    stalls on long duplication chains at 100-TB scale. At the fixed
    point every edge points a node directly at the minimum id of its
    component, which is exactly the deterministic cluster_id the
    min-label oracle emits, so the two operators are interchangeable
    (property-tested on random + adversarial path graphs).

    Convergence is detected by a per-round (count, bit_xor-of-hash)
    fingerprint of the canonical edge set — one cheap aggregate per
    round instead of a full frame comparison. ``localCheckpoint``
    truncates the growing lineage (at warehouse scale checkpoint to
    durable storage instead). Docs without any near-dup edge are not
    emitted (singleton clusters are implicit, same contract as the
    oracle). Pass ``stats={}`` to get ``stats["rounds"]`` back — the
    round-count bound (<= 2*log2(n) + 2) is asserted in tests on a
    64-deep chain.
    """
    # Canonical undirected edges as (u, v) with u > v; self-loops dropped.
    edges = (
        pairs.select(
            F.greatest("doc1", "doc2").alias("u"),
            F.least("doc1", "doc2").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # -- large-star: adjacency in both directions; every neighbor
        # STRICTLY LARGER than the center hooks onto min(closed nbhd).
        nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            # emitted edge (v, m): v > u >= m, so already canonical u>v
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # -- small-star: edges already keyed by the larger endpoint;
        # the center and every smaller neighbor hook onto the min.
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        fp = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        edges = small
        if prev_fp is not None and (fp["n"], fp["h"]) == (prev_fp["n"], prev_fp["h"]):
            break
        prev_fp = fp
    else:
        # Same discipline as flatten_hierarchy: never return silently
        # wrong labels. Star contraction needs O(log n) alternations, so
        # the default budget covers any graph with < 2^(max_iter/2 - 1)
        # nodes; exhaustion means something is deeply off.
        raise ValueError(
            f"dedup_clusters: not converged after {max_iter} star-contraction "
            f"rounds (O(log n) expected — raise max_iter for astronomically "
            f"large graphs)"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # Star edges: (node -> component min). Roots label themselves.
    return edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
    ).union(
        edges.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")).distinct()
    )


def hashed_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 64,
    n: int = 3,
) -> DataFrame:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009)
    document embeddings — model-free vectors that bridge the TEXT dedup
    stack into the EMBEDDING/ANN stack: each distinct n-gram shingle
    hashes to one of ``dims`` buckets with a salted ±1 sign, and the
    signed counts form a dims-dim float vector whose cosine
    approximates shingle-set overlap (a Jaccard-like signal in
    fixed-dim form). The point is the REPRESENTATION: the vectors feed
    every operator the embedding column already has — LSH near-dup
    mining, IVF/PQ search tiers, the incremental and streaming vector
    indexes — without a model; they do NOT add order-invariance (the
    n-gram features are as order-sensitive as Jaccard itself).

    md5-derived bucket and sign (``functions/hashing.py::md5_long``) so
    any engine replays the vectors bit-exactly; sums of ±1 are integer-
    valued doubles, so aggregation order cannot perturb them. Scale
    shape: shingles explode map-side, ONE shuffle on (doc, bucket), a
    per-doc map assembly — the q36 signature envelope; no stage holds
    more than one document's shingles plus a dims-sized map. Documents
    with fewer than ``n`` tokens have no shingles and are ABSENT (the
    q117 contract).

    Returns (doc_id, embedding array<double>).
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    hb = sh.select(
        "doc_id",
        (md5_long("shingle") % dims).alias("b"),
        F.when(
            md5_long(F.concat(F.lit("sgn|"), F.col("shingle"))) % 2 == 1,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("sgn"),
    )
    w = hb.groupBy("doc_id", "b").agg(F.sum("sgn").alias("w"))
    return (
        w.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "w"))).alias("_m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)).cast("array<bigint>"),
                lambda d: F.coalesce(F.element_at(F.col("_m"), d), F.lit(0.0)),
            ).alias("embedding"),
        )
    )
