"""User-behavior analytics over the events table: cohort retention,
rolling time-range windows, exact per-group percentiles.

Scale shapes: retention is two hash aggregates plus one shuffle-stage
join on user_id; the rolling window partitions by user (never global)
and orders by integer microsecond epoch so the 24-hour RANGE frame is
exact integer arithmetic on both engines; group percentiles use
percentile_disc (element-selecting, no interpolation arithmetic to
disagree across engines) per low-cardinality group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table


@register(
    "retention_cohorts",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ), cohorts AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weekly GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST((w.wk - c.cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT w.user_id) AS n_users
    FROM weekly w JOIN cohorts c ON w.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen ISO week, "
    "counted per (cohort week, weeks-since-cohort). Two hash aggregates "
    "and one equi-join on user_id — the classic retention triangle with "
    "no window functions and no skew-prone global state.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"),
        )
        .distinct()
    )
    cohorts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        weekly.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "rolling_user_window",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_24h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Per-event trailing 24-hour activity (count + exact decimal sum) "
    "via a RANGE frame over integer microsecond epoch — identical frame "
    "membership on both engines (no sub-second truncation), partitioned "
    "by user so no global sort exists at any scale.",
)
def rolling_user_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86400000000, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("sum_24h"),
    )


@register(
    "group_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.9) AS p90,
           quantile_disc(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact per-group percentiles via percentile_disc: element-"
    "selecting (the returned value IS a data value — no interpolation "
    "arithmetic), grouped by a low-cardinality key so each group's "
    "ordered pass is one task; the approx-sketch twin for high-"
    "cardinality keys is quantile_sketch_contract.",
)
def group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90"),
            F.expr(
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p99"),
        )
    )


@register(
    "equidepth_histogram",
    oracle="""
    WITH bounds AS (
        SELECT quantile_disc(o_totalprice, 0.25) AS q1,
               quantile_disc(o_totalprice, 0.50) AS q2,
               quantile_disc(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT CASE WHEN o_totalprice <= q1 THEN 0
                WHEN o_totalprice <= q2 THEN 1
                WHEN o_totalprice <= q3 THEN 2
                ELSE 3 END AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders, bounds
    GROUP BY 1
    """,
    doc="Equi-depth (quartile) histogram: percentile_disc boundaries "
    "from ONE aggregate reduced to a broadcast row, then a narrow CASE "
    "bucketing scan — the optimizer-statistics shape (equi-depth beats "
    "equi-width under skew) without any corpus-wide sort or window.",
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 0)
        .when(F.col("o_totalprice") <= F.col("q2"), 1)
        .when(F.col("o_totalprice") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
