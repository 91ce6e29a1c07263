"""Event-stream analytics over the ``events`` table.

These are the batch-expressible faces of the engine's streaming surface
(SURVEY.md §2.B streaming row): tumbling windows → ``date_trunc``
grouping, sessionization → gaps-and-islands window functions, JSON
property extraction, conditional pivots. The same logical plans run
under Structured Streaming with ``withWatermark`` (see
``beast_spark.streaming``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beast_spark.queries import register
from beast_spark.queries._util import cents, exact_avg, rnd
from beast_spark.sources.tables import load_table


@register(
    "q23_events_hourly_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           floor((sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0) * 100 + 0.5) / 100 AS total_value,
           floor(((sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / count(value)) / 100.0) * 100 + 0.5) / 100 AS avg_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling 1-hour window aggregation (batch face of a streaming window).",
)
def q23_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum(cents(F.col("value"))) / 100.0, 2).alias("total_value"),
        exact_avg(F.col("value"), 2, 2).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q24_events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                       OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min gap) via gaps-and-islands: lag + cumulative sum. "
    "Streaming equivalent: session_window(ts, '30 minutes').",
)
def q24_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.expr("unix_millis(ts)")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (ms - F.lag(ms).over(w) > 1800000) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("new_sess"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.expr("unix_millis(max(ts))") - F.expr("unix_millis(min(ts))")).alias("duration_ms"),
    )


@register(
    "q25_events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           floor((avg(CAST(json_extract_string(props, '$.k') AS INT))) * 100 + 0.5) / 100 AS avg_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON property extraction (get_json_object) + aggregation. Mirrors the "
    "reference's Struct→JSON column semantics (converter/fields/StructField.java:19-38).",
)
def q25_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        rnd(F.avg(k), 2).alias("avg_k"),
    )


@register(
    "q26_events_daily_pivot",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           floor((sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END)) * 100 + 0.5) / 100 AS purchase_value
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
    doc="Conditional pivot: per-day event-type counts in one pass (pivot-style plan).",
)
def q26_events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long").alias(f"n_{t}")

    return e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        cnt("click"),
        cnt("view"),
        cnt("signup"),
        cnt("purchase"),
        cnt("error"),
        rnd(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2
        ).alias("purchase_value"),
    )


@register(
    "q27_events_user_funnel",
    oracle="""
    SELECT u.n_types, count(*) AS n_users
    FROM (
      SELECT user_id, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    ) u
    GROUP BY u.n_types
    """,
    doc="Two-level aggregation: distinct event types per user → user histogram.",
)
def q27_events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.countDistinct("event_type").alias("n_types"))
    return per_user.groupBy("n_types").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "q127_conversion_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
      FROM s LEFT JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.signup_ts
      GROUP BY s.user_id, s.signup_ts
    )
    SELECT strftime(signup_ts, '%Y-%m-%d') AS cohort_day,
           count(*) AS n_signups,
           CAST(sum(CASE WHEN first_purchase_ts IS NOT NULL
                          AND first_purchase_ts <= signup_ts + INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           floor(sum(CASE WHEN first_purchase_ts IS NOT NULL
                           AND first_purchase_ts <= signup_ts + INTERVAL 7 DAY
                          THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS conv_rate
    FROM p GROUP BY strftime(signup_ts, '%Y-%m-%d')
    """,
    doc="Ordered temporal conversion funnel: per user, first signup -> "
    "first purchase AT OR AFTER it; cohorts by signup day report the "
    "7-day conversion rate. The ORDERED step distinguishes this from "
    "q27's unordered event-type histogram — a purchase before signup "
    "does not count. Both event slices reduce per-user before joining "
    "(the join input is one row per user per side, not per event), the "
    "equi-key is user_id so Catalyst plans a hash join with the ts "
    "range as residual — no theta explosion at any scale.",
)
def q127_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("pts")
    )
    p = (
        s.join(
            pur,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("pts") >= F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("pts").alias("first_purchase_ts"))
    )
    converted = (
        F.col("first_purchase_ts").isNotNull()
        & (
            F.col("first_purchase_ts")
            <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
        )
    ).cast("int")
    return p.groupBy(
        F.date_format("signup_ts", "yyyy-MM-dd").alias("cohort_day")
    ).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.sum(converted).cast("long").alias("n_converted"),
        rnd(F.sum(converted) / F.count(F.lit(1)).cast("double"), 4).alias(
            "conv_rate"
        ),
    )
