"""Analytic SQL surface: subqueries, window distribution functions, RANGE
frames, LIMIT/OFFSET, multiset set-ops, null semantics, IVF ANN.

These widen SURVEY §2.B line by line: each query demonstrates one
Catalyst capability (subquery decorrelation, named frames, multiset ops)
with a DuckDB oracle. Cross-engine float rules from ``_util`` apply
throughout: money sums go through exact cents, round-half-up uses the
shared floor form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.queries import register
from beast_spark.queries._util import cents, rnd
from beast_spark.sources.tables import load_table


@register(
    "q61_correlated_scalar_subquery",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
            * (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) * 100
          < CAST((SELECT sum(CAST(floor(p3.p_retailprice * 100 + 0.5) AS BIGINT))
                  FROM part p3 WHERE p3.p_brand = p.p_brand) AS BIGINT) * 99
    """,
    doc="Correlated scalar subqueries (Catalyst decorrelates both into "
    "joins): parts priced below 0.99× their brand's average. The predicate "
    "is pure int64 arithmetic (cents × count × 100 < sum_cents × 99), so no "
    "float boundary can flip a row between engines.",
)
def q61_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, p.p_retailprice
        FROM part p
        WHERE CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                * (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) * 100
              < (SELECT sum(CAST(floor(p3.p_retailprice * 100 + 0.5) AS BIGINT))
                 FROM part p3 WHERE p3.p_brand = p.p_brand) * 99
        """
    )


@register(
    "q62_exists_in_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND NOT EXISTS
            (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
    doc="IN + NOT EXISTS subqueries (semi/anti-join after decorrelation): "
    "BUILDING-segment orders with no returned line.",
)
def q62_exists_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND NOT EXISTS
                (SELECT 1 FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        """
    )


@register(
    "q63_window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           floor((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS pct_rank,
           floor((cume_dist() OVER w) * 10000 + 0.5) / 10000 AS cume,
           first_value(c_custkey) OVER w AS first_key,
           nth_value(c_custkey, 2) OVER w AS second_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Window distribution functions: ntile / percent_rank / cume_dist / "
    "first_value / nth_value over a total (tie-broken) order. Default ANSI "
    "frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) on both engines.",
)
def q63_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 4).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 4).alias("cume"),
        F.first("c_custkey").over(w).alias("first_key"),
        F.nth_value("c_custkey", 2).over(w).alias("second_key"),
    )


@register(
    "q64_range_frame_rolling_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS sum_30d_cents
    FROM orders
    """,
    doc="RANGE frame over event time: per-customer rolling 30-day spend. "
    "The frame is value-based (peers by day offset), so same-day orders "
    "aggregate identically in both engines; money flows as exact cents.",
)
def q64_range_frame_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day", F.datediff("o_orderdate", F.lit("1970-01-01"))
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("sum_30d_cents"),
    )


@register(
    "q65_sort_limit_offset",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
    ORDER BY bal DESC NULLS LAST, c_custkey
    LIMIT 50 OFFSET 100
    """,
    doc="Global sort with explicit null ordering + LIMIT/OFFSET pagination "
    "(rows 101-150 of a deterministic total order).",
)
def q65_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return c.orderBy(F.col("bal").desc_nulls_last(), "c_custkey").offset(100).limit(50)


@register(
    "q66_multiset_ops",
    oracle="""
    SELECT o_custkey, 'intersect_all' AS op FROM
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT ALL
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT o_custkey, 'except_all' AS op FROM
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       EXCEPT ALL
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    doc="Multiset set-ops (INTERSECT ALL / EXCEPT ALL keep duplicate "
    "cardinalities, unlike q13's distinct forms) + unionByName fan-in.",
)
def q66_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    ia = open_keys.intersectAll(done_keys).withColumn("op", F.lit("intersect_all"))
    ea = open_keys.exceptAll(done_keys).withColumn("op", F.lit("except_all"))
    return ia.unionByName(ea)


@register(
    "q67_null_semantics",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_nonopen,
           CAST(count(DISTINCT nullif(o_orderstatus, 'O')) AS BIGINT) AS n_distinct_status,
           CAST(sum(CASE WHEN o_orderstatus = 'X' THEN 1 END) AS BIGINT) AS sum_all_null,
           min(nullif(o_orderstatus, o_orderstatus)) AS min_all_null
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="ANSI null semantics in aggregates: count(*) vs count(col) vs "
    "count(DISTINCT col) under NULLs; sum/min over all-NULL input stay "
    "NULL (not 0) in both engines.",
)
def q67_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    nonopen = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nonopen).alias("n_nonopen"),
        F.countDistinct(nonopen).alias("n_distinct_status"),
        F.sum(F.when(F.col("o_orderstatus") == "X", 1)).alias("sum_all_null"),
        F.min(F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus"))).alias("min_all_null"),
    )


@register(
    "q68_ivf_ann",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         scored AS (
           SELECT e.vec_id, e.v, c.cid,
                  round(list_dot_product(e.v, c.cv)
                        / (sqrt(list_dot_product(e.v, e.v))
                           * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cscore
           FROM e, c
         ),
         assigned AS (
           SELECT vec_id, v, cid FROM (
             SELECT vec_id, v, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cscore DESC, cid) AS rn
             FROM scored) WHERE rn = 1
         ),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         probes AS (
           SELECT cid FROM (
             SELECT c.cid,
                    row_number() OVER (
                      ORDER BY round(list_dot_product(q.qv, c.cv)
                               / (sqrt(list_dot_product(q.qv, q.qv))
                                  * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                               c.cid) AS rn
             FROM c, q) WHERE rn <= 2
         ),
         cand AS (
           SELECT a.vec_id,
                  round(list_dot_product(a.v, q.qv)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
           FROM assigned a, q
           WHERE a.cid IN (SELECT cid FROM probes) AND a.vec_id <> 0
         )
    SELECT vec_id, cos_sim,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
    FROM cand
    QUALIFY rank <= 10
    """,
    doc="IVF-style ANN (the scale path past q40's LSH): coarse-quantize "
    "every vector to its nearest of 8 centroids (broadcast + map-side "
    "argmax — one map stage at any scale), then search only the query's "
    "2 nearest clusters. Exact ranking within probed clusters.",
)
def q68_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    res = ivf_topk(e, e.filter(F.col("vec_id") == 0), n_centroids=8, nprobe=2, k=10)
    return res.select("vec_id", "cos_sim", "rank")


_Q69_ORACLE = """
    WITH w AS (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS wstart,
             value
      FROM events
    )
    SELECT wstart, wstart + INTERVAL 2 HOUR AS wend,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM w
    GROUP BY wstart
    """


@register(
    "q69_sliding_window_batch",
    oracle=_Q69_ORACLE,
    doc="Sliding event-time windows on the batch face (2h window, 1h "
    "slide — every event lands in exactly two windows; the oracle "
    "replicates Spark's epoch-aligned window assignment via unnest of "
    "the two candidate starts). Streaming twin: streaming/windows.py.",
)
def q69_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "sum_value_cents",
        )
    )


@register(
    "q70_media_integrity",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS content_len,
           sha256(text) AS content_sha
    FROM documents
    """,
    doc="Multimodal binary columns with a real oracle: text bytes as an "
    "opaque media payload; per-item byte length + sha256 content address "
    "(the dedup/integrity key for any media type) must agree with DuckDB "
    "byte-for-byte. Complements q50's rows-only feature extraction.",
)
def q70_media_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(content).alias("content_len"),
        F.sha2(content, 256).alias("content_sha"),
    )


@register(
    "q71_collect_aggregates",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',')
             AS segments_csv,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Collection aggregates: collect_set with a deterministic sort "
    "folded to CSV (collect_list/set order is engine- and "
    "partition-dependent; sorting before comparison is the only stable "
    "contract).",
)
def q71_collect_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments_csv"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "q72_percentiles_distributed",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_extendedprice, 0.5)) * 100 + 0.5) / 100 AS p50_price,
           floor((quantile_cont(l_extendedprice, 0.9)) * 100 + 0.5) / 100 AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact percentiles via the distributed counts+cumulative-window "
    "operator (operators/percentiles.py) — same numbers as q41's "
    "percentile(), but no per-group value buffer, so a hot group cannot "
    "OOM an executor at 100 TB. Excluded from the headline bench (the "
    "built-in wins locally; this is the memory-bounded scale path).",
    bench=False,
    bench_reason="memory-bounded scale twin of q41; built-in wins locally",
)
def q72_percentiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.operators.percentiles import exact_percentiles

    l = load_table(spark, sf_dir, "lineitem")
    res = exact_percentiles(
        l, ["l_returnflag"], "l_extendedprice", {"p50": 0.5, "p90": 0.9}
    )
    return res.select(
        "l_returnflag",
        rnd(F.col("p50"), 2).alias("p50_price"),
        rnd(F.col("p90"), 2).alias("p90_price"),
    )


@register(
    "q76_unpivot",
    oracle="""
    SELECT o_orderkey, metric, val
    FROM (SELECT o_orderkey,
                 o_totalprice AS total_price,
                 CAST(o_custkey AS DOUBLE) AS cust_key
          FROM orders)
    UNPIVOT (val FOR metric IN (total_price, cust_key))
    """,
    doc="Unpivot/melt (wide → long): one row per (key, metric, value) — "
    "the inverse of q42's pivot. Spark 3.4+ native unpivot; DuckDB "
    "UNPIVOT; both drop NULL cells by default.",
)
def q76_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("total_price"),
        F.col("o_custkey").cast("double").alias("cust_key"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["total_price", "cust_key"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "q77_union_by_name",
    oracle="""
    SELECT * FROM
      (SELECT c_custkey AS entity_id, c_acctbal AS balance, c_mktsegment AS segment
       FROM customer WHERE c_nationkey = 1)
    UNION ALL BY NAME
      (SELECT s_suppkey AS entity_id, s_acctbal AS balance
       FROM supplier WHERE s_nationkey = 1)
    """,
    doc="Schema-evolving union: unionByName(allowMissingColumns=True) "
    "aligns by column NAME and null-fills the absent ones (DuckDB: UNION "
    "ALL BY NAME) — positional UNION would silently mix columns here.",
)
def q77_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 1)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 1)
        .select(F.col("s_suppkey").alias("entity_id"), F.col("s_acctbal").alias("balance"))
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "q79_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m,
           CAST(floor((12 * (year(DATE '1998-01-01') - year(o_orderdate))
                 + (month(DATE '1998-01-01') - month(o_orderdate))) ) AS DOUBLE)
             AS months_to_1998,
           last_day(o_orderdate) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders
    WHERE day(o_orderdate) = 1
    """,
    doc="Date arithmetic extras: add_months / months_between (whole months "
    "from month-start rows, so both engines agree without fractional-day "
    "conventions) / last_day / weekday / weekofyear (ISO week in both). "
    "DuckDB dayofweek is 0-based Sunday; Spark's is 1-based — oracle "
    "shifts to match.",
)
def q79_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.dayofmonth("o_orderdate") == 1)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.months_between(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "months_to_1998"
        ),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
    )


@register(
    "q142_topk_per_group",
    oracle="""
    SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
    doc="Grouped top-k (top-3 orders by price per priority class) — the "
    "per-key leaderboard every dashboard runs. The rank-filter shape "
    "lets Spark plan a WindowGroupLimit BELOW the shuffle "
    "(plan-asserted): each map task keeps only its local top-3 per "
    "group before exchanging, so the shuffle carries O(groups x k) "
    "rows, not the table — the grouped analogue of q03's global "
    "TakeOrdered. Unique-key tiebreak makes the selection "
    "deterministic across engines.",
)
def q142_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    )


@register(
    "q146_generator_outer",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 6)
               AS arr
      FROM documents
    )
    SELECT d.doc_id,
           CAST(u.i - 1 AS INT) AS pos,
           d.arr[u.i] AS long_word
    FROM d LEFT JOIN LATERAL (
      SELECT unnest(range(1, len(d.arr) + 1)) AS i
    ) u ON TRUE
    """,
    doc="OUTER generator semantics (posexplode_outer / LEFT JOIN "
    "LATERAL): documents explode into their long words (> 6 chars), "
    "and a document with NO such word is KEPT as one row with NULL "
    "position/word — the row-preserving lateral the plain explode "
    "silently drops (losing rows on empty arrays is the classic "
    "flatten bug in corpus accounting). Pure map-side: higher-order "
    "list_filter then the generator, no shuffle anywhere.",
)
def q146_generator_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    arr = F.filter(F.split("text", " "), lambda x: F.length(x) > 6)
    return d.select("doc_id", arr.alias("arr")).select(
        "doc_id", F.posexplode_outer("arr").alias("pos", "long_word")
    )


@register(
    "q206_streaming_sliding_window",
    oracle=_Q69_ORACLE,
    doc="q69's sliding 2h/1h windows served from q200's MAINTAINED "
    "hourly partials — one streamed state, many window geometries: an "
    "epoch-aligned sliding window with hour-multiple width and slide "
    "is an exact sum of the maintained hourly buckets, so the read "
    "explodes each hour into its covering window starts and re-sums — "
    "no second maintainer, no re-read of the event stream. Batches "
    "split by event_id % 3 (time-interleaved); shares q69's oracle "
    "VERBATIM.",
    bench=False,
    bench_reason="maintainer composition; the window-agg plan is benched as q69's batch form",
)
def q206_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.queries._util import scratch_dir
    from beast_spark.streaming.eventstats import HourlyWindowStatsMaintainer

    e = load_table(spark, sf_dir, "events")
    m = HourlyWindowStatsMaintainer(scratch_dir("beast_q206_") + "/state")
    for batch in range(3):
        m.apply_batch(e.filter(F.col("event_id") % 3 == batch), batch)
    return m.read_sliding(spark, window_hours=2, slide_hours=1)


@register(
    "q208_streaming_sliding_window_4h2h",
    oracle="""
    WITH g AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 7200) AS BIGINT) * 7200)
                  AS TIMESTAMP) AS grid,
             value
      FROM events
    ),
    w AS (
      SELECT unnest([grid, grid - INTERVAL 2 HOUR]) AS wstart, value FROM g
    )
    SELECT wstart, wstart + INTERVAL 4 HOUR AS wend,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM w
    GROUP BY wstart
    """,
    doc="Sliding 4h/2h windows from the SAME maintained hourly state as "
    "q200/q206 — the slide>1 leg, under the gate because a round-9 "
    "review pass caught exactly this case going wrong (window starts "
    "stepped back from the raw hour instead of snapping to the "
    "epoch-aligned slide grid; every odd-hour bucket landed in "
    "misaligned windows). The oracle builds F.window's grid "
    "explicitly: snap each event's hour to the 2h epoch grid, explode "
    "into the 2 covering 4h-window starts, aggregate.",
    bench=False,
    bench_reason="maintainer composition; the window-agg plan is benched as q69's batch form",
)
def q208_streaming_sliding_window_4h2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.queries._util import scratch_dir
    from beast_spark.streaming.eventstats import HourlyWindowStatsMaintainer

    e = load_table(spark, sf_dir, "events")
    m = HourlyWindowStatsMaintainer(scratch_dir("beast_q208_") + "/state")
    for batch in range(3):
        m.apply_batch(e.filter(F.col("event_id") % 3 == batch), batch)
    return m.read_sliding(spark, window_hours=4, slide_hours=2)


@register(
    "q211_streaming_sliding_60m30m",
    oracle="""
    WITH g AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                  AS TIMESTAMP) AS grid,
             value
      FROM events
    ),
    w AS (
      SELECT unnest([grid, grid - INTERVAL 30 MINUTE]) AS wstart, value FROM g
    )
    SELECT wstart, wstart + INTERVAL 60 MINUTE AS wend,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM w
    GROUP BY wstart
    """,
    doc="SUB-hour sliding windows (60-min window, 30-min slide) served "
    "from a maintainer built at the matching 30-min partials grain "
    "(HourlyWindowStatsMaintainer(grain_minutes=30), round-10 close of "
    "the round-9 verdict's geometry gap: read_sliding previously "
    "raised on non-hour-multiple slides). The grain is meta-guarded "
    "like the session gap; a slide that is not a multiple of the "
    "maintained grain still raises — the grid is exact or it refuses. "
    "Oracle is q208's explicit-grid discipline at the 1800s grid: snap "
    "each event to the 30-min epoch grid, explode into the 2 covering "
    "60-min window starts, aggregate. Batches split by event_id % 3 "
    "(time-interleaved — the partials merge is additive and "
    "order-free).",
    bench=False,
    bench_reason="maintainer composition; the window-agg plan is benched as q69's batch form",
)
def q211_streaming_sliding_60m30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beast_spark.queries._util import scratch_dir
    from beast_spark.streaming.eventstats import HourlyWindowStatsMaintainer

    e = load_table(spark, sf_dir, "events")
    m = HourlyWindowStatsMaintainer(
        scratch_dir("beast_q211_") + "/state", grain_minutes=30
    )
    for batch in range(3):
        m.apply_batch(e.filter(F.col("event_id") % 3 == batch), batch)
    return m.read_sliding_minutes(spark, window_minutes=60, slide_minutes=30)
