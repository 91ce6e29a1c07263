"""Advanced operator queries: as-of/range/theta joins, exact percentiles,
pivot, grouping sets, token frequency, approximate sketches, multimodal.

The as-of join oracle uses DuckDB's native ``ASOF JOIN``; the Spark side
is beast_spark's union+carry-forward operator — two completely different
physical strategies that must agree row-for-row, which is exactly the
kind of cross-check the correctness gate is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.operators.asof import asof_join
from beast_spark.operators.multimodal import attach_media_meta, decode_features
from beast_spark.queries import register
from beast_spark.queries._util import rnd
from beast_spark.sources.tables import load_table, register_views


@register(
    "q28_asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id,
           floor((p.value) * 100 + 0.5) / 100 AS purchase_value,
           v.ts AS view_ts,
           floor((v.view_value) * 100 + 0.5) / 100 AS view_value
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join: each purchase matched to the user's most recent prior "
    "view. Spark side: union + last-value carry-forward (one shuffle, "
    "density-independent); oracle: DuckDB native ASOF JOIN.",
)
def q28_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["ts", "view_value"], suffix="_v",
    )
    return joined.select(
        "event_id",
        "user_id",
        rnd(F.col("value"), 2).alias("purchase_value"),
        F.col("ts_v").alias("view_ts"),
        rnd(F.col("view_value_v"), 2).alias("view_value"),
    )


@register(
    "q29_orders_range_join",
    oracle="""
    SELECT o1.o_orderkey,
           CAST(count(o2.o_orderkey) AS BIGINT) AS nearby_orders
    FROM orders o1
    LEFT JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderkey <> o1.o_orderkey
     AND o2.o_orderdate BETWEEN o1.o_orderdate - INTERVAL 30 DAY
                            AND o1.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_orderkey
    """,
    doc="Range join: per order, other orders of the same customer within "
    "±30 days (equi key + interval predicate; SMJ + filter in Spark).",
)
def q29_orders_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    cond = (
        (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
        & (F.col("o2.o_orderkey") != F.col("o1.o_orderkey"))
        & (F.col("o2.o_orderdate") >= F.col("o1.o_orderdate") - F.expr("INTERVAL 30 DAYS"))
        & (F.col("o2.o_orderdate") <= F.col("o1.o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    # Group by (custkey, orderkey), not orderkey alone: the join output is
    # already hash-partitioned on custkey, and HashPartitioning on a subset
    # of the grouping keys satisfies the aggregation's distribution — so
    # the groupBy runs in place instead of re-shuffling the joined table.
    # orderkey is unique, so the extra key changes nothing semantically.
    return (
        o1.join(o2, cond, "left")
        .groupBy(
            F.col("o1.o_custkey").alias("_custkey"),
            F.col("o1.o_orderkey").alias("o_orderkey"),
        )
        .agg(F.count(F.col("o2.o_orderkey")).alias("nearby_orders"))
        .select("o_orderkey", "nearby_orders")
    )


@register(
    "q41_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_extendedprice, 0.5)) * 100 + 0.5) / 100 AS p50_price,
           floor((quantile_cont(l_extendedprice, 0.9)) * 100 + 0.5) / 100 AS p90_price,
           floor((median(l_quantity)) * 100 + 0.5) / 100 AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact percentiles (linear interpolation): Spark percentile() vs "
    "DuckDB quantile_cont/median.",
)
def q41_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # One percentile buffer per (group, column), not per (group, percentage):
    # passing array(0.5, 0.9) shares the l_extendedprice counts-map between
    # both quantiles (2x faster than two separate aggregates — the price
    # column is near-unique, so its buffer dominates the aggregation).
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_p"),
            rnd(F.expr("percentile(l_quantity, 0.5)"), 2).alias("median_qty"),
        )
        .select(
            "l_returnflag",
            rnd(F.col("_p")[0], 2).alias("p50_price"),
            rnd(F.col("_p")[1], 2).alias("p90_price"),
            "median_qty",
        )
    )


@register(
    "q42_pivot_segments",
    oracle="""
    SELECT c_nationkey,
           CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS AUTOMOBILE,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BIGINT) AS BUILDING,
           CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS BIGINT) AS FURNITURE,
           CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS BIGINT) AS HOUSEHOLD,
           CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS BIGINT) AS MACHINERY
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Pivot: per-nation customer counts by segment (Spark .pivot with "
    "explicit values → single-pass plan; absent combos stay NULL).",
)
def q42_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    return c.groupBy("c_nationkey").pivot("c_mktsegment", segs).agg(F.count(F.lit(1)))


@register(
    "q46_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS with disjoint sets (beyond rollup/cube's lattices).",
)
def q46_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q47_theta_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           CAST(count(c.c_custkey) AS BIGINT) AS n_poorer_customers
    FROM supplier s
    LEFT JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="Theta join: equi conjunct on nation + balance inequality.",
)
def q47_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    return (
        s.join(c, cond, "left")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.col("c_custkey")).alias("n_poorer_customers"))
    )


@register(
    "q43_token_frequency",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
    doc="Vocabulary frequency: explode tokens → count → deterministic top-20.",
)
def q43_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


# shared with q210 (the dropDuplicatesWithinWatermark streamed twin in
# queries/events.py) — the streamed-twin pattern's verbatim-oracle rule
_Q44_ORACLE = """
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """


@register(
    "q44_earliest_event_dedup",
    oracle=_Q44_ORACLE,
    doc="Deterministic dropDuplicates: keep the earliest event per "
    "(user, type) via window rank (order-stable, unlike raw dropDuplicates).",
)
def q44_earliest_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "q45_map_functions",
    oracle="""
    SELECT k.key AS prop_key,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(e.props, '$.' || k.key) AS BIGINT)) AS BIGINT)
             AS total_value
    FROM events e, unnest(json_keys(e.props)) AS k(key)
    GROUP BY k.key
    """,
    doc="Map-typed columns: JSON props → map<string,long> → explode entries "
    "→ per-key aggregation (map_keys/map_entries surface).",
)
def q45_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        e.select(F.explode(m).alias("prop_key", "prop_value"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("prop_value").alias("total_value"),
        )
    )


@register(
    "q51_hash_functions",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           to_base64(CAST(p_name AS BLOB)) AS name_b64
    FROM part
    """,
    doc="Hashing/encoding scalar surface: md5, sha2-256, base64.",
)
def q51_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(F.encode(F.col("p_name"), "UTF-8")).alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.base64(F.encode(F.col("p_name"), "UTF-8")).alias("name_b64"),
    )


@register(
    "q52_array_lambdas",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT)
             AS n_long_tokens,
           upper(string_split(text, ' ')[1]) AS first_token_upper,
           coalesce(array_to_string(list_sort(list_distinct(list_transform(
             list_filter(string_split(text, ' '), t -> length(t) > 6),
             t -> upper(t)))), ','), '') AS long_tokens_csv
    FROM documents
    """,
    doc="Array lambda surface: filter/transform/sort/distinct over token arrays.",
)
def q52_array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.upper(F.element_at(toks, 1)).alias("first_token_upper"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(F.filter(toks, lambda t: F.length(t) > 6), lambda t: F.upper(t))
                )
            ),
            ",",
        ).alias("long_tokens_csv"),
    )


@register(
    "q49_approx_sketches",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           count(*) AS n_orders,
           TRUE AS hll_within_3sigma,
           TRUE AS approx_median_rank_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Sketch surface: approx_count_distinct (HLL++) + percentile_approx "
    "per order status — the at-scale substitutes for q12/q41 exact forms. "
    "Sketch outputs are engine-specific, so the oracle checks the sketch "
    "ERROR INVARIANTS instead: HLL estimate within 3σ (3 × the default "
    "rsd=0.05) of the exact distinct count; the approx median's true rank "
    "fraction in [0.4, 0.6] (default accuracy 10000 → rank error ≤ "
    "n/10000 ≪ 10% of rank). A broken sketch flips a boolean and fails "
    "the value hash. Kept as three cheap passes (sketches / exact "
    "distinct / rank probe) joined on the 3-row status frame: one "
    "combined agg would Expand the input for countDistinct UNDER exact "
    "percentile buffers (measured 27s vs <1s at sf0.1).",
)
def q49_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("_hll"),
        F.percentile_approx("o_totalprice", 0.5).alias("_ap50"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ex = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    # True rank fraction of the approx median: one more scan with the
    # 3-row sketch frame broadcast — no second wide shuffle.
    frac = (
        o.join(F.broadcast(sk.select("o_orderstatus", "_ap50")), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            (
                F.sum(F.when(F.col("o_totalprice") <= F.col("_ap50"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("_frac")
        )
    )
    return (
        ex.join(F.broadcast(sk), "o_orderstatus")
        .join(F.broadcast(frac), "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("_hll") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.15
            ).alias("hll_within_3sigma"),
            F.col("_frac").between(0.4, 0.6).alias("approx_median_rank_ok"),
        )
    )


def _q53_proto():
    from beast_spark.plans.protowire import PField

    return (
        PField(1, "event_id", "int64"),
        PField(2, "ts", "timestamp"),
        PField(3, "user_id", "int64"),
        PField(4, "event_type", "string"),
        PField(5, "value", "double"),
        PField(6, "props", "string"),
    )


Q53_PROTO = _q53_proto()


def kafka_shaped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table proto-encoded into a Kafka-shaped frame (the test
    harness's stand-in for A1's source; also used by bench.py to time the
    decode leg alone)."""
    from beast_spark.plans.protowire import encode_message
    from pyspark.sql import types as T

    proto = Q53_PROTO
    e = load_table(spark, sf_dir, "events")

    kafka_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )

    def encode_batches(batches):
        # mapInArrow (round 13): column extraction via to_pylist (one C
        # loop each — no per-row pandas boxing, no Timestamp objects),
        # offset/timestamp re-emitted zero-copy from the input batch.
        import pyarrow as pa

        for rb in batches:
            idx = rb.schema.get_field_index
            eids = rb.column(idx("event_id")).to_pylist()
            tss = rb.column(idx("ts")).to_pylist()
            uids = rb.column(idx("user_id")).to_pylist()
            etypes = rb.column(idx("event_type")).to_pylist()
            evals = rb.column(idx("value")).to_pylist()
            propss = rb.column(idx("props")).to_pylist()
            vals = [
                encode_message(
                    {
                        "event_id": eid,
                        # arrow hands back tz-aware datetimes when the batch
                        # is tz-stamped; the wire codec (like the pandas
                        # to_pydatetime() form this replaces) wants the
                        # naive UTC wall clock
                        "ts": ts.replace(tzinfo=None) if ts is not None and ts.tzinfo else ts,
                        "user_id": uid,
                        "event_type": etype,
                        "value": val,
                        "props": props,
                    },
                    proto,
                )
                for eid, ts, uid, etype, val, props in zip(
                    eids, tss, uids, etypes, evals, propss
                )
            ]
            n = len(eids)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([str(v).encode() for v in eids], type=pa.binary()),
                    pa.array(vals, type=pa.binary()),
                    pa.array(["events"] * n, type=pa.string()),
                    pa.array([u % 8 for u in uids], type=pa.int32()),
                    rb.column(idx("event_id")),
                    rb.column(idx("ts")),
                ],
                names=["key", "value", "topic", "partition", "offset", "timestamp"],
            )

    # events arrives as one parquet file → repartition so the Python
    # encode/decode stages use all cores (Arrow batches per partition).
    return e.repartition(16).mapInArrow(encode_batches, kafka_schema)


@register(
    "q53_proto_ingest_roundtrip",
    oracle="""
    SELECT event_id, event_type, user_id, ts,
           floor((value) * 100 + 0.5) / 100 AS value,
           props
    FROM events
    """,
    doc="Full ingest pipeline as a query: events rows → proto-encode "
    "(wire codec, mapInPandas) → Kafka-shaped frame → ProtoIngest decode/"
    "map/metadata → original values back out (proto3 zero-elision "
    "re-coalesced). Oracle = the source table itself: an encode/decode "
    "identity check across 10k+ rows per SF.",
)
def q53_proto_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.streaming.ingest import ProtoIngest

    valid, _ = ProtoIngest(Q53_PROTO).apply(kafka_shaped_events(spark, sf_dir))
    # proto3 elision turned zeros into NULLs (reference semantics,
    # RowMapper.java:61); re-coalesce for the identity comparison.
    return valid.select(
        F.coalesce(F.col("event_id"), F.lit(0)).alias("event_id"),
        F.coalesce(F.col("event_type"), F.lit("")).alias("event_type"),
        F.coalesce(F.col("user_id"), F.lit(0)).alias("user_id"),
        F.col("ts"),
        rnd(F.coalesce(F.col("value"), F.lit(0.0)), 2).alias("value"),
        F.coalesce(F.col("props"), F.lit("")).alias("props"),
    )


@register(
    "q56_full_outer_join",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY coalesce(c.c_nationkey, s.s_nationkey)
    """,
    doc="Full outer join preserving unmatched rows on both sides.",
)
def q56_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


@register(
    "q57_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus, CAST(count(*) AS BIGINT) AS combos
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r.r_name, s.o_orderstatus
    """,
    doc="Cross join of small deduplicated sides (cartesian plan).",
)
def q57_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("combos")
    )


@register(
    "q54_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT)
             AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
    FROM documents
    """,
    doc="BPE-ish pre-tokenizer counts vs whitespace counts (LLM token "
    "budgeting proxy).",
)
def q54_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.functions.text import bpe_token_count, token_count

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_token_count("text").alias("n_bpe_tokens"),
        token_count("text").alias("n_ws_tokens"),
    )


@register(
    "q58_grouped_pandas_udaf",
    oracle="""
    SELECT c_mktsegment,
           floor((median(c_acctbal)) * 100 + 0.5) / 100 AS median_bal,
           floor((quantile_cont(c_acctbal, 0.25)) * 100 + 0.5) / 100 AS q1_bal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="UDx surface: applyInPandas grouped-map UDAF (numpy quantiles per "
    "group) cross-checked against DuckDB's native quantile_cont — the "
    "Arrow-batched custom-aggregate escape hatch (SURVEY §2.B UDx row).",
)
def q58_grouped_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")

    def agg(pdf):
        import math

        import numpy as np
        import pandas as pd

        bal = pdf["c_acctbal"].to_numpy()
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "median_bal": [math.floor(float(np.percentile(bal, 50)) * 100 + 0.5) / 100],
                "q1_bal": [math.floor(float(np.percentile(bal, 25)) * 100 + 0.5) / 100],
                "n": [len(bal)],
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(
        agg, "c_mktsegment string, median_bal double, q1_bal double, n long"
    )


@register(
    "q59_math_functions",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS abs_diff,
           ceil(p_retailprice) AS price_ceil,
           floor(p_retailprice) AS price_floor,
           floor((sqrt(p_retailprice)) * 10000 + 0.5) / 10000 AS price_sqrt,
           floor((ln(p_retailprice)) * 10000 + 0.5) / 10000 AS price_ln,
           floor((pow(p_size, 2)) * 100 + 0.5) / 100 AS size_sq,
           CAST(p_size % 7 AS INT) AS size_mod
    FROM part
    WHERE p_retailprice > 0
    """,
    doc="Math scalar surface: abs/ceil/floor/sqrt/ln/pow/mod.",
)
def q59_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_diff"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        rnd(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        rnd(F.log("p_retailprice"), 4).alias("price_ln"),
        rnd(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "q60_conditional_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           greatest(o_totalprice, 50000.0) AS floored_price,
           least(CAST(year(o_orderdate) AS INT), 2000) AS capped_year,
           (o_orderpriority = '1-URGENT') AS is_urgent
    FROM orders
    """,
    doc="Conditional scalar surface: CASE/nullif/coalesce/greatest/least.",
)
def q60_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored_price"),
        F.least(F.year("o_orderdate"), F.lit(2000)).alias("capped_year"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )


def _lang_id_oracle() -> str:
    """DuckDB replay of detect_lang + quality_score: same marker lexicons,
    same distinct-token-intersection scoring, same (score DESC, lang DESC)
    argmax tie-break as Spark's reverse(array_sort(struct(score, lang)))."""
    from beast_spark.functions.text import LANG_MARKERS

    score_structs = ",\n          ".join(
        "{'score': len(list_intersect(toks, [%s])), 'lang': '%s'}"
        % (", ".join(f"'{w}'" for w in words), lang)
        for lang, words in sorted(LANG_MARKERS.items())
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang,
             list_distinct(string_split(text, ' ')) AS toks,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    ),
    scores AS (
      SELECT doc_id, labeled_lang, n_tokens, n_uniq,
        unnest([
          {score_structs}
        ]) AS s
      FROM t
    ),
    best AS (
      SELECT doc_id, labeled_lang, n_tokens, n_uniq, s.score, s.lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s.score DESC, s.lang DESC) AS rn
      FROM scores
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN score > 0 THEN lang ELSE 'und' END AS detected_lang,
           floor(((CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
                  * (n_uniq / CAST(n_tokens AS DOUBLE))) * 10000 + 0.5) / 10000
             AS quality
    FROM best WHERE rn = 1
    """


@register(
    "q55_language_id",
    oracle=_lang_id_oracle(),
    doc="Language identification: marker-lexicon argmax over tokens "
    "(JVM-side expression; see functions.text.detect_lang) — the heuristic "
    "is deterministic string ops, replayed exactly by the DuckDB oracle.",
)
def q55_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.functions.text import detect_lang, quality_score

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detect_lang("text").alias("detected_lang"),
        quality_score("text").alias("quality"),
    )


@register(
    "q50_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS content_len,
           sha256(text) AS content_sha,
           ('0x' || substr(sha256(hex(encode(text)) || ':0'), 1, 8))::BIGINT
             / 4294967296.0 - 0.5 AS f0,
           ('0x' || substr(sha256(hex(encode(text)) || ':7'), 1, 8))::BIGINT
             / 4294967296.0 - 0.5 AS f7
    FROM documents
    """,
    doc="Multimodal plumbing: documents' bytes as binary media column → "
    "content hash dedup key + mapInPandas feature extraction. The stub "
    "codec derives features from the content's sha256 stream (exact "
    "power-of-two arithmetic in float64), so the DuckDB oracle replays "
    "the mapInPandas output value-exactly.",
    bench=False,
    bench_reason="python-codec media path (mapInPandas); not an engine-time headline",
)
def q50_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    with_meta = attach_media_meta(media)
    feats = decode_features(with_meta, dims=8)
    return feats.select(
        "media_id",
        "content_len",
        "content_sha",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 8).alias("f7"),
    )


@register(
    "q90_bmp_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT vec_id,
             list_transform(range(1, 64),
                 i -> CAST(floor(abs(CAST(embedding[i] AS DOUBLE)) * 100) AS BIGINT) % 256) AS u8
      FROM embeddings
    )
    SELECT vec_id AS media_id,
           3.0 AS channels, 3.0 AS width, 7.0 AS height,
           list_sum(u8) / 63.0 AS px_mean,
           CAST(list_min(u8) AS DOUBLE) AS px_min,
           CAST(list_max(u8) AS DOUBLE) AS px_max,
           CAST(u8[1] AS DOUBLE) AS px_first,
           CAST(u8[63] AS DOUBLE) AS px_last
    FROM px
    """,
    doc="REAL BMP codec end-to-end (the second real image format beside "
    "netpbm): embeddings quantize to 63 RGB bytes (JVM-side), a "
    "mapInPandas stage encodes each row as a 3x7 24-bit BI_RGB BMP — "
    "bottom-up rows, BGR order, and a REAL 4-byte row pad (9-byte rows, "
    "12-byte stride) — and decode_features parses the actual file "
    "(operators/multimodal.py::decode_bmp) back to top-down RGB stats. "
    "The oracle recomputes the stats from the same quantization; any "
    "header/stride/byte-order bug breaks the hash.",
    bench=False,
    bench_reason="python-codec media path (mapInPandas); not an engine-time headline",
)
def q90_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from beast_spark.operators.multimodal import encode_bmp

    e = load_table(spark, sf_dir, "embeddings")
    u8 = e.select(
        F.col("vec_id").alias("media_id"),
        F.slice(
            F.transform(
                "embedding",
                lambda v: F.floor(F.abs(v.cast("double")) * 100).cast("int") % 256,
            ),
            1,
            63,
        ).alias("u8"),
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [encode_bmp(3, 7, bytes(list(px))) for px in pdf["u8"]],
                }
            )

    imgs = u8.mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )
    feats = decode_features(imgs, dims=8, strict=True)  # real codec MUST run
    return feats.select(
        "media_id",
        F.element_at("features", 1).alias("channels"),
        F.element_at("features", 2).alias("width"),
        F.element_at("features", 3).alias("height"),
        F.element_at("features", 4).alias("px_mean"),
        F.element_at("features", 5).alias("px_min"),
        F.element_at("features", 6).alias("px_max"),
        F.element_at("features", 7).alias("px_first"),
        F.element_at("features", 8).alias("px_last"),
    )




@register(
    "q83_ppm_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT vec_id,
             list_transform(range(1, 65),
                 i -> CAST(floor(abs(CAST(embedding[i] AS DOUBLE)) * 100) AS BIGINT) % 256) AS u8
      FROM embeddings
    )
    SELECT vec_id AS media_id,
           1.0 AS channels, 8.0 AS width, 8.0 AS height,
           list_sum(u8) / 64.0 AS px_mean,
           CAST(list_min(u8) AS DOUBLE) AS px_min,
           CAST(list_max(u8) AS DOUBLE) AS px_max,
           CAST(u8[1] AS DOUBLE) AS px_first
    FROM px
    """,
    doc="REAL image codec end-to-end: embeddings quantize to 8x8 grayscale "
    "pixels (JVM-side), a mapInPandas stage encodes each row as a binary "
    "netpbm P5 image, decode_features parses the actual image format "
    "(header + raster, operators/multimodal.py::decode_image) and emits "
    "decoded-pixel stats. The oracle recomputes the stats from the same "
    "quantization directly — any header/raster bug breaks the hash.",
    bench=False,
    bench_reason="python-codec media path (mapInPandas); not an engine-time headline",
)
def q83_ppm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from beast_spark.operators.multimodal import encode_ppm

    e = load_table(spark, sf_dir, "embeddings")
    u8 = e.select(
        F.col("vec_id").alias("media_id"),
        F.transform(
            "embedding",
            lambda v: F.floor(F.abs(v.cast("double")) * 100).cast("int") % 256,
        ).alias("u8"),
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [encode_ppm(8, 8, bytes(list(px))) for px in pdf["u8"]],
                }
            )

    imgs = u8.mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )
    feats = decode_features(imgs, dims=8, strict=True)  # real codec MUST run
    return feats.select(
        "media_id",
        F.element_at("features", 1).alias("channels"),
        F.element_at("features", 2).alias("width"),
        F.element_at("features", 3).alias("height"),
        F.element_at("features", 4).alias("px_mean"),
        F.element_at("features", 5).alias("px_min"),
        F.element_at("features", 6).alias("px_max"),
        F.element_at("features", 7).alias("px_first"),
    )


@register(
    "q91_wav_audio_stats",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(range(1, 65),
                 i -> greatest(least(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS INT),
                                     32767), -32768)) AS pcm
      FROM embeddings
    )
    SELECT vec_id AS media_id,
           1 AS channels, 8000 AS sample_rate,
           CAST(64 AS BIGINT) AS n_frames, 8.0 AS duration_ms,
           CAST(list_max(list_transform(pcm, x -> abs(x))) AS INT) AS peak,
           CAST(list_sum(list_transform(pcm, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, 64),
                    i -> (pcm[i] >= 0) != (pcm[i + 1] >= 0))) AS BIGINT) AS zero_cross,
           CAST(pcm[1] AS INT) AS first_s,
           CAST(pcm[64] AS INT) AS last_s
    FROM s
    """,
    doc="REAL audio codec end-to-end (the audio leg of the multimodal "
    "stack): embeddings quantize to 64 int16 PCM samples (JVM-side, "
    "clamped), a mapInPandas stage encodes each row as a mono 8 kHz "
    "RIFF/WAVE file, and audio_stats parses the actual container "
    "(operators/multimodal.py::decode_wav — chunk walk, fmt/data, LE "
    "int16) back to sample stats under strict mode. The oracle "
    "recomputes every stat from the same quantization — integer math "
    "plus one float64 divide, so any RIFF/fmt/byte-order bug breaks "
    "the hash.",
    bench=False,
    bench_reason="python-codec media path (mapInPandas); not an engine-time headline",
)
def q91_wav_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from beast_spark.operators.multimodal import audio_stats, encode_wav

    e = load_table(spark, sf_dir, "embeddings")
    pcm = e.select(
        F.col("vec_id").alias("media_id"),
        F.transform(
            "embedding",
            lambda v: F.greatest(
                F.least(F.floor(v.cast("double") * 1000).cast("int"), F.lit(32767)),
                F.lit(-32768),
            ),
        ).alias("pcm"),
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [encode_wav(8000, 1, list(s)) for s in pdf["pcm"]],
                }
            )

    wavs = pcm.mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )
    return audio_stats(wavs, strict=True).select(
        "media_id",
        "channels",
        "sample_rate",
        "n_frames",
        "duration_ms",
        "peak",
        "sum_sq",
        "zero_cross",
        "first_s",
        "last_s",
    )


# Shared by q102 (the history build) and q107 (the point-in-time join
# against it) — one definition so the two oracles can't drift apart.
_SCD2_ORACLE = """
    WITH ordered AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_p
      FROM orders
    ), flagged AS (
      SELECT *, CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority
                     THEN 1 ELSE 0 END AS chg
      FROM ordered
    ), islands AS (
      SELECT *, sum(chg) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    ), grouped AS (
      SELECT o_custkey, island,
             min(o_orderpriority) AS attr_value,
             min(o_orderdate) AS valid_from,
             count(*) AS n_rows
      FROM islands GROUP BY o_custkey, island
    )
    SELECT o_custkey, attr_value, valid_from,
           lead(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY valid_from, island
           ) AS valid_to,
           n_rows,
           lead(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY valid_from, island
           ) IS NULL AS is_current
    FROM grouped
"""


@register(
    "q102_scd2_priority_history",
    oracle=_SCD2_ORACLE,
    doc="SCD type-2 history build (gaps-and-islands): per customer, runs "
    "of the same o_orderpriority over order time collapse into "
    "[valid_from, valid_to) intervals with an is_current flag — the "
    "changelog->dimension-history operator a warehouse fed by this "
    "engine runs nightly. The reference maintains its one BQ table via "
    "streaming inserts only (sink/bq/BqSink.java:82-93); history "
    "maintenance is part of the engine surface it lacks. One hash "
    "exchange on o_custkey reused by all three window passes.",
)
def q102_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.scd import scd2_from_changelog

    o = load_table(spark, sf_dir, "orders")
    return scd2_from_changelog(
        o,
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    )


@register(
    "q105_merge_upsert_latest",
    oracle="""
    WITH tagged AS (
      SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
             o_orderdate, 0 AS src
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      UNION ALL
      SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
             o_orderdate, 1 AS src
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC, src DESC
             ) AS rn
      FROM tagged
    )
    SELECT o_custkey, o_orderkey, o_orderstatus,
           floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
           o_orderdate
    FROM ranked WHERE rn = 1
    """,
    doc="MERGE-style latest-wins upsert: the pre-1998 order book is the "
    "target snapshot, 1998+ orders the update feed; each customer's row "
    "is replaced by their latest order (update side wins ties). "
    "Expressed as union + one row_number window — a single shuffle on "
    "the key, vs a join-based MERGE that shuffles both sides and the "
    "result. Covers the idempotent-upsert semantics the reference "
    "delegates to BigQuery insertId dedup (BQRowWithInsertId.java:9-12).",
)
def q105_merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.scd import merge_upsert

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    target = o.filter(F.col("o_orderdate") < cutoff)
    updates = o.filter(F.col("o_orderdate") >= cutoff)
    merged = merge_upsert(
        target, updates, key_cols=["o_custkey"], order_cols=["o_orderdate", "o_orderkey"]
    )
    return merged.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        rnd(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "o_orderdate",
    )


def _morton_spread_sql(expr: str) -> str:
    """DuckDB twin of sources.layout._spread_bits (decimal mask literals)."""
    x = expr
    for shift, mask in [
        (16, 281470681808895),
        (8, 71777214294589695),
        (4, 1085102592571150095),
        (2, 3689348814741910323),
        (1, 6148914691236517205),
    ]:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def _morton_quant_sql(col: str, lo: float, hi: float) -> str:
    return (
        f"CAST(least(greatest(floor((CAST({col} AS DOUBLE) - {lo}) / "
        f"({hi} - {lo}) * 65535), 0), 65535) AS BIGINT)"
    )


_MORTON_ORACLE = f"""
    WITH q AS (
      SELECT l_orderkey, l_linenumber,
             {_morton_quant_sql('l_quantity', 1.0, 50.0)} AS qa,
             {_morton_quant_sql('l_extendedprice', 900.0, 105000.0)} AS qb
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           ({_morton_spread_sql('qa')} |
            ({_morton_spread_sql('qb')} << 1)) AS zkey
    FROM q
"""


@register(
    "q106_morton_zorder_key",
    oracle=_MORTON_ORACLE,
    doc="Morton (Z-order) interleaved sort key over (l_quantity, "
    "l_extendedprice): the key computation behind "
    "sources/layout.write_zordered, which clusters parquet row groups "
    "into small rectangles of two-column space so min/max pruning works "
    "on BOTH columns (the reference's only layout lever is single-column "
    "day partitioning, BQTableDefinition.java:18-63). Pure codegen "
    "integer expressions — mask-doubling bit spread, no UDF, no shuffle; "
    "the oracle replays the identical bit arithmetic in SQL so every "
    "spread step is value-checked.",
)
def q106_morton_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.sources.layout import morton_key, quantize

    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        morton_key(
            quantize(F.col("l_quantity"), 1.0, 50.0),
            quantize(F.col("l_extendedprice"), 900.0, 105000.0),
        ).alias("zkey"),
    )


@register(
    "q107_scd2_temporal_join",
    oracle=f"""
    WITH hist AS ({_SCD2_ORACLE})
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           h.attr_value AS active_priority, h.valid_from
    FROM orders o
    JOIN hist h
      ON o.o_custkey = h.o_custkey
     AND h.valid_from <= o.o_orderdate
     AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
    """,
    doc="Point-in-time (temporal) join: each order looked up against the "
    "SCD2 priority history (q102) via interval containment "
    "[valid_from, valid_to) — the fact-to-dimension-history lookup every "
    "SCD2 warehouse runs. Zero-width intervals (two islands starting on "
    "the same date) can never contain a date, so each order matches "
    "exactly one interval and the output has exactly one row per order. "
    "Plan: both sides hash-partition on o_custkey once; the interval "
    "predicate filters inside the sort-merge join, and per-customer "
    "interval lists are tiny, so the join never expands.",
)
def q107_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.scd import scd2_from_changelog

    o = load_table(spark, sf_dir, "orders")
    hist = scd2_from_changelog(
        o,
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    ).select(
        F.col("o_custkey").alias("h_custkey"),
        "attr_value",
        "valid_from",
        "valid_to",
    )
    cond = (
        (F.col("o_custkey") == F.col("h_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to")))
    )
    return o.join(hist, cond).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("attr_value").alias("active_priority"),
        "valid_from",
    )


@register(
    "q108_scd2_incremental",
    oracle=_SCD2_ORACLE,
    doc="Incremental SCD2 maintenance (operators/scd.py::"
    "scd2_apply_increment): history built from pre-1998 orders once, the "
    "1998+ changelog applied as an increment — untouched keys pass "
    "through a broadcast anti-join (history side never shuffles), "
    "touched keys re-collapse only their OPEN interval (as a weighted "
    "seed row) plus the new rows. Oracle is the FULL q102 history: the "
    "incremental path must reproduce the from-scratch rebuild exactly, "
    "at O(increment) cost — the nightly-append story of q98, applied to "
    "dimension maintenance.",
)
def q108_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.scd import scd2_apply_increment, scd2_from_changelog

    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    # The persisted-history stand-in: production reads the history table
    # from parquet (one cheap scan per branch); built inline here it must
    # be pinned or the three consumer branches (untouched anti, closed
    # semi, open seeds) each replay the full window build.
    history = scd2_from_changelog(
        o.filter(F.col("o_orderdate") < cutoff),
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    ).persist()
    return scd2_apply_increment(
        history,
        o.filter(F.col("o_orderdate") >= cutoff),
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    )


@register(
    "q132_table_diff_cdc",
    oracle="""
    WITH old_v AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderkey % 3 <> 0
    ), new_v AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 5 <> 0
    ), d AS (
      SELECT coalesce(o.k, n.k) AS k,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN o.price <> n.price THEN 'update'
                  ELSE 'unchanged' END AS change_type
      FROM old_v o FULL OUTER JOIN new_v n ON o.k = n.k
    )
    SELECT change_type, count(*) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY change_type
    """,
    doc="Snapshot diff / CDC derivation: two versions of a keyed table "
    "(deterministically derived from orders: rows dropped, rows added, "
    "every 7th price bumped) full-outer-joined on the primary key and "
    "classified insert/delete/update/unchanged — the changelog that "
    "feeds scd2_apply_increment (q108) or merge_rollups (q129) when "
    "the upstream system can only hand over full snapshots. Scale "
    "shape: one key-partitioned shuffle per side into a sort-merge "
    "full outer join; for wide tables compare an md5 row digest "
    "(computed map-side) instead of each column — same plan, "
    "one-column compare. Output is the count+key-checksum per change "
    "class, so the verification frame is 4 rows at any scale.",
)
def q132_table_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old_v = o.filter(k % 3 != 0).select(
        k.alias("k_old"), F.col("o_totalprice").alias("price_old")
    )
    new_v = o.filter(k % 5 != 0).select(
        k.alias("k_new"),
        F.when(k % 7 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price_new"),
    )
    d = old_v.join(new_v, old_v.k_old == new_v.k_new, "full_outer").select(
        F.coalesce("k_old", "k_new").alias("k"),
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("k_new").isNull(), "delete")
        .when(F.col("price_old") != F.col("price_new"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").alias("key_checksum"),
    )


@register(
    "q141_resize_pipeline",
    oracle="""
    WITH px AS (
      SELECT vec_id,
             list_transform(range(1, 65),
                 i -> CAST(floor(abs(CAST(embedding[i] AS DOUBLE)) * 100) AS BIGINT) % 256) AS u8
      FROM embeddings
    ), r AS (
      SELECT vec_id,
             list_transform(range(0, 16),
                 i -> u8[((i // 4) * 2) * 8 + (i % 4) * 2 + 1]) AS r4
      FROM px
    )
    SELECT vec_id AS media_id,
           1.0 AS channels, 4.0 AS width, 4.0 AS height,
           list_sum(r4) / 16.0 AS px_mean,
           CAST(list_min(r4) AS DOUBLE) AS px_min,
           CAST(list_max(r4) AS DOUBLE) AS px_max,
           CAST(r4[1] AS DOUBLE) AS px_first
    FROM r
    """,
    doc="REAL resize pipeline end-to-end (the thumbnail/downsample stage "
    "of a multimodal corpus prep): 8x8 P5 images (q83's encode) pass "
    "through operators/multimodal.py::resize_image_nearest — decode "
    "header+raster, integer nearest-neighbor grid (src = i*src//dst), "
    "re-encode — then the REAL decoder emits the 4x4 pixel stats. The "
    "oracle replays the exact index mapping on the quantized pixels in "
    "SQL, so a raster-order, stride, or rounding bug anywhere in "
    "decode->resize->encode->decode breaks the hash. Arrow-batched "
    "mapInPandas, no shuffle; the per-image work is the swap point for "
    "a real image library at production scale.",
    bench=False,
    bench_reason="python-codec media path (mapInPandas); not an engine-time headline",
)
def q141_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from beast_spark.operators.multimodal import encode_ppm, resize_image_nearest

    e = load_table(spark, sf_dir, "embeddings")
    u8 = e.select(
        F.col("vec_id").alias("media_id"),
        F.transform(
            "embedding",
            lambda v: F.floor(F.abs(v.cast("double")) * 100).cast("int") % 256,
        ).alias("u8"),
    )

    def encode_resize(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        resize_image_nearest(
                            encode_ppm(8, 8, bytes(list(px))), 4, 4
                        )
                        for px in pdf["u8"]
                    ],
                }
            )

    imgs = u8.mapInPandas(
        encode_resize,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        ),
    )
    feats = decode_features(imgs, dims=8, strict=True)  # real codec MUST run
    return feats.select(
        "media_id",
        F.element_at("features", 1).alias("channels"),
        F.element_at("features", 2).alias("width"),
        F.element_at("features", 3).alias("height"),
        F.element_at("features", 4).alias("px_mean"),
        F.element_at("features", 5).alias("px_min"),
        F.element_at("features", 6).alias("px_max"),
        F.element_at("features", 7).alias("px_first"),
    )


@register(
    "q165_unkeyed_range_join",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_shipped
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_quantity = 50
     AND l.l_shipdate BETWEEN o.o_orderdate
                          AND o.o_orderdate + INTERVAL 3 DAY
    GROUP BY o.o_orderkey
    """,
    doc="Pure range join with NO equi key — per order, max-quantity "
    "lineitems of ANY order shipped within 3 days of the order date. "
    "Spark's only native plans for this predicate are "
    "BroadcastNestedLoopJoin / CartesianProduct (O(N*M), banned "
    "registry-wide); operators/rangejoin.py::range_bucket_join "
    "manufactures an equi key from the range dimension (points bucket "
    "once, intervals replicate into <= 2 buckets at width >= interval "
    "length) so the big-big case runs as an ordinary co-partitioned "
    "shuffle join + residual filter — the portable form of the "
    "range-join bin optimization. Unmatched orders compose back via a "
    "left join of the aggregate (count 0).",
)
def q165_unkeyed_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 14: the consumer only needs a COUNT per order, so the banded
    # equi-join (range_bucket_join, r1-r13 — still the operator for
    # pair-producing range joins) is overkill: it materialized ~P*I*w/D
    # joined rows, aggregated them, and left-joined the aggregate back
    # onto a reshuffled orders scan (plan: 3 Exchange + a 300k-row
    # broadcast + LeftOuter SortMergeJoin). point_in_interval_counts
    # reduces lineitem to per-day counts map-side, prefix-sums them over
    # the dense (calendar-bounded) day dimension, and answers each order
    # with F(hi) - F(lo-1) via two tiny broadcast lookups — orders is
    # scanned ONCE and never shuffled, at any scale. Hash-exact against
    # the unchanged oracle at sf0.001/0.01/0.1 (guide §2.3/§8).
    from beast_spark.operators.rangejoin import point_in_interval_counts

    epoch = F.lit("1970-01-01").cast("date")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") == 50)
        .select(F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("ship_day"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("lo"),
        (F.datediff(F.col("o_orderdate").cast("date"), epoch) + 3).alias("hi"),
    )
    return point_in_interval_counts(l, o, "ship_day", "lo", "hi", "n_shipped").select(
        "o_orderkey", "n_shipped"
    )


@register(
    "q170_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured VARIANT path (Spark 4): parse_json() shreds the "
    "JSON props column into the binary VARIANT encoding once, "
    "variant_get() extracts a typed path WITHOUT re-parsing per "
    "expression — the engine-native alternative to q45's "
    "from_json(map<...>) which forces one schema on every row. "
    "Aggregates run on the extracted long; DuckDB replays via "
    "json_extract_string.",
)
def q170_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )
