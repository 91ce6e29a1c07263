"""Relational operator surface (SURVEY.md §2.B) as registered queries.

The reference (odpf/beast) implements no relational operators — its only
aggregation is a per-partition max(offset) (reference
``worker/OffsetCommitWorker.java:54-117``). This module is the engine's
native batch-query surface: projection/filter, equi/theta joins
(broadcast + shuffle), hash aggregation, rollup/cube, window functions,
set ops, top-k, scalar string/date functions — each declared through the
DataFrame API so Catalyst handles pushdown, pruning, join selection and
AQE handles runtime re-planning.

Every query has a DuckDB oracle (ANSI SQL) with identical column aliases.
Floating aggregates are rounded to kill summation-order noise; integer
sums are cast to BIGINT in the oracle (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.queries import register
from beast_spark.queries._util import exact_avg, rnd
from beast_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100                                        AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100                                   AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100                AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100  AS sum_charge,
           floor(((sum(CAST(l_quantity AS BIGINT)) / count(l_quantity))) * 100 + 0.5) / 100  AS avg_qty,
           floor(((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / count(l_extendedprice)) / 100.0) * 100 + 0.5) / 100 AS avg_price,
           floor(((sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / count(l_discount)) / 100.0) * 10000 + 0.5) / 10000 AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filtered scan + hash agg with 8 aggregates.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
        rnd(F.sum(charge), 2).alias("sum_charge"),
        rnd(F.sum(F.col("l_quantity").cast("long")) / F.count("l_quantity"), 2).alias("avg_qty"),
        exact_avg(F.col("l_extendedprice"), 2, 2).alias("avg_price"),
        exact_avg(F.col("l_discount"), 2, 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q02_revenue_by_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="4-way join chain fact→dims with broadcast of fixed-size dims, then hash agg.",
)
def q02_revenue_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q03_top_unshipped_orders",
    oracle="""
    SELECT o.o_orderkey,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective join + agg + deterministic top-10 (revenue desc, key asc).",
)
def q03_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-style: EXISTS as left-semi join with a non-equi conjunct.",
)
def q04_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style: multi-way join incl. a co-nationality equi conjunct.",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style: pure pushed-down filter + global agg (no shuffle beyond final).",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "q07_topk_customers_per_nation",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rn
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    doc="Top-k per group via row_number window (deterministic tiebreak on key).",
)
def q07_topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "c_nationkey", "c_acctbal", "rn")
    )


@register(
    "q08_order_price_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           floor((o_totalprice - lag(o_totalprice) OVER w) * 100 + 0.5) / 100 AS price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead analytics over per-customer order history.",
)
def q08_order_price_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        rnd(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("price_delta"),
    )


@register(
    "q09_running_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
             AS running_spend,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
    FROM orders
    """,
    doc="Running aggregate with an explicit ROWS frame + sequence numbering.",
)
def q09_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        rnd(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------

@register(
    "q10_rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (status → status+priority → grand total).",
)
def q10_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "q11_cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over both grouping dims (all 4 grouping sets).",
)
def q11_cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Distinct aggregation / set operations
# --------------------------------------------------------------------------

@register(
    "q12_segment_distinct_stats",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           floor(((sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / count(c_acctbal)) / 100.0) * 100 + 0.5) / 100 AS avg_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="count_distinct inside grouped agg (expand+partial-agg plan in Spark).",
)
def q12_segment_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        exact_avg(F.col("c_acctbal"), 2, 2).alias("avg_balance"),
    )


@register(
    "q13_set_ops_customers",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="INTERSECT/EXCEPT distinct-set semantics over derived key sets.",
)
def q13_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    p_cust = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("c_custkey"))
    return f_cust.intersect(o_cust).exceptAll(p_cust.distinct()).distinct()


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS promo_share,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="TPC-H Q14-style conditional aggregation over a fact-dim join.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            rnd(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_share"),
            rnd(F.sum(rev), 2).alias("total_revenue"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    doc="TPC-H Q15-style: derived revenue view + scalar-subquery max filter.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue0, s.s_suppkey == revenue0.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count_by_brand",
    oracle="""
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt,
           count(*) AS item_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_size >= 10
    GROUP BY p.p_brand, p.p_type
    """,
    doc="TPC-H Q16-style distinct-supplier counting with anti predicate.",
)
def q16_supplier_count_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter((F.col("p_brand") != "Brand#5") & (F.col("p_size") >= 10))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("item_cnt"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT floor((sum(l.l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l
    JOIN (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.half_avg_qty
    """,
    doc="TPC-H Q17-style correlated-avg filter expressed as an agg-then-join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    return (
        l.join(pa.withColumnRenamed("l_partkey", "pa_partkey"), l.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(rnd(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           floor((sum(l.l_quantity)) * 100 + 0.5) / 100 AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18-style: IN-subquery as semi join on a HAVING-filtered agg.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
              o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(rnd(F.sum("l_quantity"), 2).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# Scalar functions (string / date) — SURVEY §2.B scalar-fn row
# --------------------------------------------------------------------------

@register(
    "q19_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                         AS name_upper,
           substr(p_name, 1, 8)                  AS name_prefix,
           concat(p_brand, ':', p_type)          AS brand_type,
           CAST(length(p_name) AS INT)           AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           replace(p_type, 'O', '0')             AS type_leet
    FROM part
    """,
    doc="String scalar surface: upper/substr/concat/length/regexp_extract/replace.",
)
def q19_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.expr("replace(p_type, 'O', '0')").alias("type_leet"),
    )


@register(
    "q20_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)     AS order_year,
           CAST(month(o_orderdate) AS INT)    AS order_month,
           CAST(quarter(o_orderdate) AS INT)  AS order_quarter,
           date_trunc('month', o_orderdate)   AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch0
    FROM orders
    """,
    doc="Date scalar surface: year/month/quarter/date_trunc/datediff.",
)
def q20_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch0"
        ),
    )


# --------------------------------------------------------------------------
# Join-type coverage: outer / anti
# --------------------------------------------------------------------------

@register(
    "q21_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="NOT EXISTS as left-anti join.",
)
def q21_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q22_nation_order_fullstats",
    oracle="""
    SELECT n.n_name,
           CAST(coalesce(sum(x.n_orders), 0) AS BIGINT) AS n_orders,
           floor((coalesce(sum(x.total_spend), 0.0)) * 100 + 0.5) / 100 AS total_spend
    FROM nation n
    LEFT JOIN (
      SELECT c.c_nationkey, count(*) AS n_orders, sum(o.o_totalprice) AS total_spend
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ) x ON n.n_nationkey = x.c_nationkey
    GROUP BY n.n_name
    """,
    doc="Left outer join preserving empty dims, with coalesced aggregates.",
)
def q22_nation_order_fullstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_nation = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders_raw"), F.sum("o_totalprice").alias("spend_raw"))
    )
    return (
        n.join(per_nation, n.n_nationkey == per_nation.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.coalesce(F.sum("n_orders_raw"), F.lit(0)).cast("long").alias("n_orders"),
            rnd(F.coalesce(F.sum("spend_raw"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )
