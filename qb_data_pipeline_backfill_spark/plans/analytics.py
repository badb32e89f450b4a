"""Analytical query surface: aggregations, joins, windows, grouping sets.

The reference outsourced all interactive SQL to Postgres (SURVEY.md
§3.3); the rebuilt engine answers it natively through Catalyst. These
queries are the workhorse shapes a warehouse on the raw tables needs —
each chosen so its physical plan is the scalable one (partial
aggregation before shuffle, broadcast for small dims, single shuffle
per window partition key).

Float policy: every SUM over a double is computed as an exact
DECIMAL(18,6) sum on BOTH engines (partial-aggregation order can flip
the 2nd decimal of a double sum near a .005 boundary), rounded to 2dp,
and cast back to double; averages are exact micro-unit integer
divisions truncated to 4dp (functions.numeric.decimal_avg — Spark and
DuckDB round an identical double differently on half boundaries, so no
inexact value is ever rounded on either engine). Every
DuckDB integer SUM is CAST back to BIGINT (DuckDB widens to HUGEINT,
which survives neither Arrow nor pandas conversion losslessly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.functions import decimal_avg, decimal_sum
from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table


# --- TPC-H Q1 shape: wide partial-aggregable scan ---------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
                // (100 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
                // (100 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
                // (100 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: 8 aggregates over a pushed-down scan.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity").alias("sum_qty"),
            decimal_sum("l_extendedprice").alias("sum_base_price"),
            decimal_sum(disc_price).alias("sum_disc_price"),
            decimal_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            decimal_avg("l_quantity").alias("avg_qty"),
            decimal_avg("l_extendedprice").alias("avg_price"),
            decimal_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3 shape: 3-way join, one broadcast-able side ---------------------
@register(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1996-03-15'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter → fact joins → top-N by revenue.",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1996-03-15")
    )
    # The filtered customer side (~1/5 of customers) GROWS WITH THE
    # CORPUS, so it must never carry a forced broadcast hint — at 100×
    # it is tens of GB and would OOM every executor. No hint: AQE
    # measures the side at runtime and broadcasts only when it
    # actually fits (spark.sql.autoBroadcastJoinThreshold /
    # adaptive.autoBroadcastJoinThreshold), falling back to a
    # shuffled join otherwise. The lineitem⋈orders join shuffles once
    # on orderkey either way.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --- grouping sets / ROLLUP ---------------------------------------------------
@register(
    "region_nation_rollup",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           GROUPING(r.r_name) AS g_region, GROUPING(n.n_name) AS g_nation,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP grouping sets with GROUPING() disambiguation over a snowflake join.",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"),
            "c_acctbal",
        )
        .rollup("region_name", "nation_name")
        .agg(
            F.grouping("region_name").alias("g_region"),
            F.grouping("nation_name").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            decimal_sum("c_acctbal").alias("sum_acctbal"),
        )
        .select(
            "region_name", "nation_name", "g_region", "g_nation",
            "n_customers", "sum_acctbal",
        )
    )


@register(
    "status_priority_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (all four dimension combinations in one pass, "
    "GROUPING() flags disambiguating natural NULLs) — the dashboard "
    "companion to region_nation_rollup's ROLLUP. One expand + one "
    "shuffle regardless of how many grouping sets.",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice").alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
            "n_orders", "sum_price",
        )
    )


# --- pivot ---------------------------------------------------------------------
@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot order status across priority rows (conditional-agg oracle).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --- window: top-K per group ----------------------------------------------------
@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
    doc="Top-3 orders per customer via ranked window (one shuffle on custkey).",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "rk",
        )
    )


# --- window: running total -------------------------------------------------------
@register(
    "running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Cumulative spend per customer (ordered ROWS frame).",
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


# --- event-time: tumbling window --------------------------------------------------
@register(
    "tumbling_window_events",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly tumbling-window aggregate over the event stream (batch form; "
    "the streaming module runs the same plan incrementally).",
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # F.window(...) is the streaming-native form; date_trunc is
    # hash-identical to its window.start at 1-hour granularity.
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum("value").alias("sum_value"),
    )


# --- event-time: sessionization (gaps-and-islands) --------------------------------
@register(
    "session_windows_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="30-minute-gap sessionization via lag + cumulative-sum (batch twin of "
    "streaming session_window).",
)
def session_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Both windows tie-break on event_id: ordering by ts alone makes
    # session assignment nondeterministic whenever a user has two
    # events at the same timestamp.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"), 1
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wcum))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum("value").alias("sum_value"),
    )


# --- as-of (backward temporal) join ------------------------------------------
@register(
    "asof_join_last_order",
    oracle="""
    WITH r AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
        FROM orders
        GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id,
           e.user_id,
           CAST(e.ts AS TIMESTAMP) AS ts,
           r.last_orderkey,
           r.o_orderdate AS last_order_ts,
           CAST(date_diff('day', CAST(r.o_orderdate AS DATE), CAST(e.ts AS DATE)) AS INT)
               AS days_since_order
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    doc="Point-in-time lookup: each event joined to the user's most recent "
    "order at-or-before the event (LEFT as-of). Spark side is the "
    "union+window carry-forward plan (one shuffle, no range explosion); "
    "oracle is DuckDB's native ASOF LEFT JOIN.",
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # The as-of contract needs a unique right row per (key, time):
    # collapse same-day orders to the highest orderkey.
    r = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").alias("last_order_ts"))
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    out = asof_join_backward(
        e, r, left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="last_order_ts",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "last_orderkey",
        "last_order_ts",
        F.datediff(F.to_date("ts"), F.to_date("last_order_ts")).alias(
            "days_since_order"
        ),
    )


# --- range (point-in-interval) join ------------------------------------------
@register(
    "range_join_attribution",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           CAST(e.ts AS TIMESTAMP) AS ts,
           e.event_type,
           w.anchor_id,
           w.w_start
    FROM events e
    JOIN (
        SELECT event_id AS anchor_id,
               user_id AS anchor_user,
               CAST(ts AS TIMESTAMP) AS w_start,
               CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end
        FROM events WHERE event_type = 'purchase'
    ) w
      ON e.user_id = w.anchor_user
     AND CAST(e.ts AS TIMESTAMP) > w.w_start
     AND CAST(e.ts AS TIMESTAMP) <= w.w_end
    """,
    doc="Attribution-window range join: every event that lands within the "
    "hour after a same-user purchase, paired with that purchase. Spark "
    "side is the bucketized interval join (explode intervals to 1-hour "
    "cells, equi-join on (user, cell), re-check exact bounds) — a plain "
    "distributable hash join, never a nested loop; oracle is DuckDB's "
    "native inequality join.",
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.range_join import interval_join

    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "ts", "event_type")
    w = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("anchor_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    out = interval_join(
        e,
        w,
        point_time="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=3600,
        point_key="user_id",
        interval_key="anchor_user",
        include_start=False,
        include_end=True,
    )
    return out.select("event_id", "user_id", "ts", "event_type", "anchor_id", "w_start")


# --- hypertable rollup (continuous aggregate) --------------------------------
@register(
    "hypertable_rollup_daily",
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
                // (100 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Continuous-aggregate rollup: hourly algebraic partials (count, "
    "decimal sum, min, max) re-aggregated to daily WITHOUT re-reading raw "
    "events. The oracle is DuckDB's DIRECT daily aggregate, so the hash "
    "match proves the two-level rollup is exactly equivalent — the "
    "property that lets 100 TB dashboards serve every grain from one "
    "fine-grain materialization.",
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.rollup import (
        continuous_aggregate,
        finalize,
        rollup,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    hourly = continuous_aggregate(ev, "ts", ["event_type"], ["value"], 3600)
    daily = rollup(hourly, ["event_type"], ["value"], 86400)
    return finalize(daily, ["event_type"], ["value"]).select(
        F.to_date("bucket").alias("day"),
        "event_type",
        F.col("n_rows").alias("n_events"),
        F.col("sum_value"),
        F.col("avg_value"),
        F.col("min_value"),
        F.col("max_value"),
    )


@register(
    "hypertable_ohlc_bars",
    # open/close pick SINGLE stored values (no arithmetic), so exact
    # cross-engine equality needs only a deterministic pick: first/last
    # in (ts, event_id) order within the hour, via mirrored windows.
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS rn_open,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn_close
        FROM events
    )
    SELECT event_type, bar,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM ranked
    GROUP BY event_type, bar
    """,
    doc="OHLC bars (the canonical finance hypertable rollup): per "
    "(series, hour) open/high/low/close/tick-count, with open and close "
    "picked deterministically by (ts, event_id) order so ties cannot "
    "flip values between engines. Spark side uses min_by/max_by over a "
    "(ts, event_id) struct — one map-side-combinable aggregate, no "
    "window, no second shuffle; at 100 TB each bar is an algebraic "
    "partial exactly like the continuous-aggregate rollup family.",
)
def hypertable_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar")
        ).agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "hypertable_time_weighted",
    # Exactness: weights are integer second gaps, values are DECIMAL —
    # the weighted sum is an exact decimal aggregate (order-insensitive)
    # and numerator/denominator are emitted SEPARATELY so no float
    # division can round differently between engines. Seconds are
    # FLOORED from microseconds on both sides: Spark's unix_timestamp
    # truncates while DuckDB's epoch()::BIGINT rounds, which silently
    # shifts gaps by one second on sub-second timestamps.
    oracle="""
    WITH ticks AS (
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar,
               CAST(value AS DECIMAL(18,6)) AS v,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
               LEAD(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) OVER (
                   PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS next_sec
        FROM events
    )
    SELECT event_type, bar,
           CAST(SUM(v * (next_sec - sec)) AS DOUBLE) AS weighted_sum,
           CAST(SUM(next_sec - sec) AS BIGINT) AS covered_secs,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM ticks
    WHERE next_sec IS NOT NULL
    GROUP BY event_type, bar
    """,
    doc="Time-weighted aggregate (the LOCF integral behind TimescaleDB's "
    "time_weighted_average): each tick's value is weighted by the seconds "
    "until the next tick in the same (series, hour); the last tick of a "
    "bar carries no weight. Weights are integer second gaps and values "
    "DECIMAL, so the weighted sum is exact and order-insensitive — "
    "numerator and covered-duration are emitted separately, division is "
    "the caller's one float op. One window + one aggregate.",
)
def hypertable_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    bar = F.date_trunc("hour", "ts")
    w = Window.partitionBy("event_type", bar).orderBy("ts", "event_id")
    ticks = ev.select(
        "event_type",
        bar.alias("bar"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        F.lead(F.expr("unix_micros(ts) div 1000000")).over(w).alias("next_sec"),
    ).filter(F.col("next_sec").isNotNull())
    gap = F.col("next_sec") - F.col("sec")
    return ticks.groupBy("event_type", "bar").agg(
        F.sum(F.col("v") * gap).cast("double").alias("weighted_sum"),
        F.sum(gap).cast("bigint").alias("covered_secs"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "incremental_rollup_merge",
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Incremental-view maintenance: daily partials computed over two "
    "DISJOINT event slices (the materialized state and a late-arriving "
    "delta batch), merged by re-aggregating the algebraic partials — "
    "never re-reading the already-aggregated slice. The oracle is the "
    "direct aggregate over ALL events, so the hash match proves partial "
    "merge is exact — the property that lets a 100 TB rollup absorb a "
    "delta batch at delta cost instead of full-scan cost.",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.rollup import (
        continuous_aggregate,
        finalize,
        rollup,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    base = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) < 2)
    delta = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == 2)
    p_base = continuous_aggregate(base, "ts", ["event_type"], ["value"], 86400)
    p_delta = continuous_aggregate(delta, "ts", ["event_type"], ["value"], 86400)
    merged = rollup(
        p_base.unionByName(p_delta), ["event_type"], ["value"], 86400
    )
    return finalize(merged, ["event_type"], ["value"]).select(
        F.to_date("bucket").alias("day"),
        "event_type",
        F.col("n_rows").alias("n_events"),
        "sum_value",
        "min_value",
        "max_value",
    )


@register(
    "value_histogram",
    oracle="""
    SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT), 0), 19)
               AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width 20-bucket histogram of order totals (clamped "
    "overflow bucket): one map-side-combined aggregate over a narrow "
    "bucket expression — the distribution profile a curation pipeline "
    "computes per score column before choosing filter thresholds.",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.least(
        F.greatest(
            F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long"), F.lit(0)
        ),
        F.lit(19),
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# --- time-series regularization: resample + gap-fill -------------------------
@register(
    "timeseries_gap_fill",
    oracle="""
    WITH b AS (
        SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1),
    grid AS (
        SELECT spans.user_id, g.bucket
        FROM spans, LATERAL unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(bucket)
    ),
    j AS (
        SELECT grid.user_id, grid.bucket, b.n_events, b.sum_value
        FROM grid LEFT JOIN b ON b.user_id = grid.user_id AND b.bucket = grid.bucket
    )
    SELECT user_id, bucket,
           COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events,
           n_events IS NULL AS is_gap,
           sum_value,
           LAST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM j
    """,
    doc="Per-user hourly series regularized over each user's observed span: "
    "missing buckets materialized (is_gap, zero counts) and the bucket "
    "aggregate carried forward (LOCF) — the step that turns an irregular "
    "event stream into model-ready features. Grid size is bounded by "
    "span/step per key, independent of event count.",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.timeseries import (
        resample_gap_fill,
    )

    return resample_gap_fill(load_table(spark, sf_dir, "events"))


# --- z-order (Morton) clustering key -----------------------------------------
def _zorder_oracle() -> str:
    from qb_data_pipeline_backfill_spark.operators.zorder import zorder_sql

    return (
        "SELECT l_orderkey, l_linenumber, "
        + zorder_sql(["l_partkey", "l_suppkey"], bits=21)
        + " AS zkey FROM lineitem"
    )


@register(
    "zorder_clustering_key",
    oracle=_zorder_oracle(),
    doc="Morton (z-order) clustering key over (l_partkey, l_suppkey): the "
    "bit-interleave expression behind multi-dimensional file clustering "
    "(OPTIMIZE ZORDER BY without a table format). Pure shift/AND/OR "
    "expression tree — whole-stage codegen, no UDF; the oracle replays "
    "the identical arithmetic rendered by the same generator "
    "(operators/zorder.py:zorder_sql), proving bit parity. The layout "
    "effect itself (every partition bounding every dimension) is "
    "asserted in test_zorder.py.",
)
def zorder_clustering_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.zorder import zvalue

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zvalue(["l_partkey", "l_suppkey"], bits=21).alias("zkey"),
    )


# --- declarative constraint validation ---------------------------------------
@register(
    "constraint_report",
    oracle="""
    WITH r AS (
        SELECT 'quantity_range' AS rule, CAST(COUNT(*) AS BIGINT) AS n_checked,
               CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)) AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'price_positive', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_extendedprice > 0, FALSE)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'discount_policy', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_discount <= 0.05, FALSE)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'shipdate_present', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'returnflag_enum', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orderkey_exists', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
        FROM lineitem
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed FROM r
    """,
    doc="Declarative data-quality gate: named row rules (range, positivity, "
    "policy threshold, not-null, enum) evaluated in ONE scan as "
    "conditional-count aggregates, plus a broadcast anti-join referential "
    "rule — the contract check an ingestion pipeline runs before "
    "accepting a batch. The discount_policy rule has real violations, "
    "proving the counting path, not just the all-pass path.",
)
def constraint_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.validate import (
        constraint_report,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    report = constraint_report(
        li,
        rules={
            "quantity_range": F.col("l_quantity").between(1, 50),
            "price_positive": F.col("l_extendedprice") > 0,
            "discount_policy": F.col("l_discount") <= 0.05,
            "shipdate_present": F.col("l_shipdate").isNotNull(),
            "returnflag_enum": F.col("l_returnflag").isin("A", "N", "R"),
        },
        ref_rules={"orderkey_exists": ("l_orderkey", orders, "o_orderkey")},
    )
    return report


# --- dataset profiling: per-column numeric statistics ------------------------
@register(
    "numeric_profile",
    oracle="""
    WITH melted AS (
        SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
        UNION ALL SELECT 'l_neg_price', CAST(-l_extendedprice AS DOUBLE) FROM lineitem
    ),
    a AS (
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
                    // (100 * COUNT(value)) AS DOUBLE) / 10000.0 AS mean_value,
               CAST(COUNT(value) AS HUGEINT) AS _n,
               SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS _s1,
               SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT)
                   * CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS _s2
        FROM melted GROUP BY col_name
    )
    SELECT col_name, n_rows, n_null, n_distinct, min_value, max_value,
           sum_value, mean_value,
           CAST((_n * _s2 - _s1 * _s1) // (_n * _n * 100000000) AS DOUBLE)
               / 10000.0 AS var_pop
    FROM a
    """,
    doc="Per-column data-quality profile (counts, nulls, distinct, range, "
    "exact sum/mean, population variance) in ONE pass over the table. "
    "Variance is exact integer micro-unit arithmetic on both engines "
    "(n*S2 - S1^2 over n^2) — no float accumulation order anywhere, so "
    "the hash gate holds bit-for-bit. l_neg_price (negated price) makes "
    "the gate exercise a NEGATIVE mean — the region where the old floor "
    "division diverged from DuckDB's truncating `//`. Generalizes the "
    "reference's volumetry/integrity checks to per-column statistics.",
)
def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.profile import profile_numeric

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_neg_price", -F.col("l_extendedprice")
    )
    return profile_numeric(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_neg_price"],
    )


# --- exact z-score outlier detection ------------------------------------------
@register(
    "outlier_report",
    oracle="""
    WITH m_rows AS (
        SELECT event_id, event_type, value,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS m
        FROM events
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(m) AS s1,
               SUM(m * m) AS s2
        FROM m_rows GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value,
           (s.n * r.m - s.s1) * (s.n * r.m - s.s1)
               > 9 * (s.n * s.s2 - s.s1 * s.s1) AS is_outlier
    FROM m_rows r JOIN stats s ON r.event_type = s.event_type
    """,
    doc="Per-group 3-sigma outlier flags with an EXACT integer fence: "
    "|x-mean| > 3*sigma rewritten as (n*m - S1)^2 > 9*(n*S2 - S1^2) in "
    "micro-units, so rows near the fence cannot flip between engines "
    "(a float z-score would). One partial aggregate per group + a "
    "broadcast join back — the monitoring primitive over any measure.",
)
def outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.profile import outlier_flags

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return outlier_flags(ev, "value", ["event_type"], n_sigmas=3)


# --- distribution drift (PSI) -------------------------------------------------
@register(
    "drift_psi_report",
    oracle="""
    WITH binned AS (
        SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT),
                              0), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
        FROM events
    ),
    spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
    counts AS (
        SELECT s.bin,
               CAST(COALESCE(SUM(b.is_ref), 0) AS BIGINT) AS ref_n,
               CAST(COALESCE(SUM(1 - b.is_ref), 0) AS BIGINT) AS cur_n
        FROM spine s LEFT JOIN binned b ON s.bin = b.bin
        GROUP BY s.bin
    ),
    tot AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM counts),
    terms AS (
        SELECT bin, ref_n, cur_n,
               (ref_n + 1.0) / (rt + 10.0) AS p,
               (cur_n + 1.0) / (ct + 10.0) AS q
        FROM counts, tot
    ),
    micro AS (
        SELECT bin, ref_n, cur_n,
               ROUND(p, 6) AS p_ref, ROUND(q, 6) AS p_cur,
               CAST(ROUND((p - q) * LN(p / q) * 1000000, 0) AS BIGINT)
                   AS psi_term_micro
        FROM terms
    )
    SELECT bin, ref_n, cur_n, p_ref, p_cur, psi_term_micro,
           (SELECT SUM(psi_term_micro) FROM micro) / 1000000.0 AS psi_total
    FROM micro
    """,
    doc="Population Stability Index drift report between the first and "
    "second half of the event stream: fixed 10-bin histogram of the "
    "value measure, Laplace-smoothed shares, per-bin PSI terms "
    "quantized to integer micro-units so the grand total is an "
    "order-free integer sum. The batch-acceptance monitor a training "
    "pipeline runs before a new crawl lands next to the reference "
    "corpus. Two map-side-combinable 10-group aggregates + broadcast "
    "spine/total joins — metadata-sized all the way down at 100 TB.",
)
def drift_psi_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.profile import (
        distribution_drift,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    split = F.lit("2024-01-16").cast("timestamp")
    return distribution_drift(
        ev.filter(F.col("ts") < split),
        ev.filter(F.col("ts") >= split),
        "value",
        lo=0.0,
        hi=500.0,
        n_bins=10,
    )


# l_neg_price (negated price) forces negative sums and covariances
# through the signed-division path on both engines (r8: the gate must
# reach the negative region, not just the all-positive corpus).
_COV_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_neg_price"]


def _covariance_oracle() -> str:
    mk = "CAST(CAST({c} AS DECIMAL(18,6)) * 1000000 AS HUGEINT)"
    sums = ", ".join(f"SUM({mk.format(c=c)}) AS s_{c}" for c in _COV_COLS)
    pairs = [
        (a, b)
        for i, a in enumerate(_COV_COLS)
        for b in _COV_COLS[i + 1 :]
    ]
    prods = ", ".join(
        f"SUM({mk.format(c=a)} * {mk.format(c=b)}) AS p_{a}_{b}" for a, b in pairs
    )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"CAST((n * p_{a}_{b} - s_{a} * s_{b}) // (n * n * 100000000) AS DOUBLE)"
        f" / 10000.0 AS cov_pop FROM agg"
        for a, b in pairs
    )
    return (
        f"WITH agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, {sums}, {prods} "
        f"FROM (SELECT *, -l_extendedprice AS l_neg_price FROM lineitem)) {rows}"
    )


@register(
    "numeric_covariance",
    oracle=_covariance_oracle(),
    doc="Pairwise population covariance matrix over the lineitem measures "
    "in ONE aggregate pass — every Σm and Σm·m in exact integer "
    "micro-units, cov = (n·Σmab − Σma·Σmb)/n² truncated to 4dp by exact "
    "integer division (truncating, because covariance is signed). "
    "Companion to numeric_profile's per-column variance; no float "
    "accumulation order anywhere, so the hash gate holds bit-for-bit.",
)
def numeric_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.profile import (
        covariance_matrix,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_neg_price", -F.col("l_extendedprice")
    )
    return covariance_matrix(li, _COV_COLS)


# --- Count-Min sketch frequency contract -------------------------------------
@register(
    "cms_frequency_contract",
    oracle="""
    SELECT l_orderkey AS key,
           COUNT(*) AS true_n,
           TRUE AS never_underestimates,
           TRUE AS within_bound
    FROM lineitem
    WHERE l_orderkey % 997 = 0
    GROUP BY 1
    """,
    doc="Count-Min sketch tolerance contract: build a 5x8192 counter grid "
    "over all lineitem order keys (shuffle bounded by sketch size, not "
    "key cardinality), probe every 997th key, and assert the CMS "
    "guarantees — estimate >= exact always, and estimate <= exact + "
    "ceil((e/width)*N) — against DuckDB's exact counts. Same "
    "tolerance-contract pattern as approx_distinct_report.",
)
def cms_frequency_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.sketch import cms_estimate, cms_sketch

    depth, width = 5, 8192
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sketch = cms_sketch(li, "l_orderkey", depth=depth, width=width)
    probes = (
        li.filter(F.col("l_orderkey") % 997 == 0)
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    est = cms_estimate(
        sketch, probes.select(F.col("key")), "key", depth=depth, width=width
    )
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    bound = F.ceil(F.lit(2.718281828459045) / width * F.col("n_total"))
    return (
        probes.join(est, "key")
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "true_n",
            (F.col("estimate") >= F.col("true_n")).alias("never_underestimates"),
            (F.col("estimate") <= F.col("true_n") + bound).alias("within_bound"),
        )
    )


# --- Quantile sketch tolerance contract --------------------------------------
@register(
    "quantile_sketch_contract",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_disc(l_quantity, 0.25) AS p25,
           quantile_disc(l_quantity, 0.50) AS p50,
           quantile_disc(l_quantity, 0.90) AS p90,
           TRUE AS approx_p50_in_bound,
           TRUE AS approx_p90_in_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Quantile contract completing the sketch family (HLL=distinct, "
    "CMS=frequency, KLL-style=quantile): exact discrete quantiles per "
    "group hash-gated against DuckDB quantile_disc (both engines pick "
    "the smallest element with CDF >= p, returning a raw data value — "
    "bit-identical, no float arithmetic to diverge), plus Spark's "
    "mergeable approx_percentile sketch asserted within its rank-error "
    "guarantee (+-n/accuracy ranks), bracketed by exact disc quantiles "
    "at p +- 1/accuracy. At 100 TB the approx path is the one you run: "
    "one pass, fixed-size mergeable state, no global sort; the exact "
    "path here exists to certify it.",
)
def quantile_sketch_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    acc = 1000
    eps = 1.0 / acc

    def disc(p: float) -> str:
        return f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_quantity)"

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(disc(0.25)).alias("p25"),
        F.expr(disc(0.50)).alias("p50"),
        F.expr(disc(0.90)).alias("p90"),
        F.expr(disc(0.50 - eps)).alias("p50_lo"),
        F.expr(disc(0.50 + eps)).alias("p50_hi"),
        F.expr(disc(0.90 - eps)).alias("p90_lo"),
        F.expr(disc(0.90 + eps)).alias("p90_hi"),
        F.percentile_approx("l_quantity", 0.50, acc).alias("a50"),
        F.percentile_approx("l_quantity", 0.90, acc).alias("a90"),
    )
    return g.select(
        "l_returnflag",
        "n",
        "p25",
        "p50",
        "p90",
        F.col("a50").between(F.col("p50_lo"), F.col("p50_hi")).alias(
            "approx_p50_in_bound"
        ),
        F.col("a90").between(F.col("p90_lo"), F.col("p90_hi")).alias(
            "approx_p90_in_bound"
        ),
    )


# --- Skew-salted operators, oracle-certified ---------------------------------
@register(
    "salted_collect_stats",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Certifies functions.skew.salted_collect_list: collect_list has no "
    "partial-combine form, so a hot key funnels every value through one "
    "reducer; the salted two-phase plan collects per (key, salt) then "
    "flattens <= n_salts partial lists per key. This query projects the "
    "salted result back to scalar aggregates (size / first / last of "
    "the sorted list = COUNT / MIN / MAX of raw data values — "
    "bit-identical doubles, no float arithmetic) and hash-gates them "
    "against DuckDB's direct aggregate: the salted plan IS the plain "
    "aggregate, key by key.",
)
def salted_collect_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.functions.skew import salted_collect_list

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    lists = salted_collect_list(orders, "o_custkey", "o_totalprice", n_salts=8)
    arr = F.col("o_totalprices")
    return lists.select(
        "o_custkey",
        F.size(arr).cast("bigint").alias("n_orders"),
        F.element_at(arr, 1).alias("min_price"),
        F.element_at(arr, -1).alias("max_price"),
    )


@register(
    "salted_join_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Certifies functions.skew.salted_join: the fact side is salted "
    "deterministically (xxhash64 of row content — retried tasks re-salt "
    "identically), the dim side is replicated once per salt, and the "
    "equi-join on (key, salt) spreads any hot key over n_salts "
    "reducers. Hash-gated against DuckDB's plain join+aggregate to "
    "prove salt-replicate-join-drop changes nothing but the shuffle "
    "distribution. Revenue summed as exact DECIMAL(18,6).",
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.functions.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    joined = salted_join(orders, cust, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        decimal_sum("o_totalprice").alias("total_revenue"),
    )


# --- CDC latest-state compaction ---------------------------------------------
@register(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Last-wins changelog compaction: the events table read as a CDC "
    "stream keyed by user_id, compacted to latest state via "
    "MAX_BY(row, struct(ts, event_id)) — an algebraic aggregate whose "
    "map-side partial collapses each input partition to one candidate "
    "per key before the exchange, so the shuffle carries keys, not "
    "history (vs the oracle's ROW_NUMBER formulation, which shuffles "
    "and sorts every version). (ts, event_id) is a total order, so "
    "the result is deterministic under at-least-once replay. The "
    "append-only analog of the reference's re-extracted-entity "
    "problem (save_to_raw_customers_py.py:30-45).",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.cdc import latest_state

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    return latest_state(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# --- SCD2 validity intervals from the changelog -------------------------------
@register(
    "scd2_intervals",
    oracle="""
    SELECT user_id, event_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
           LEAD(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current,
           event_type, value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Slowly-changing-dimension type-2 build: every change event "
    "becomes a version row with a [valid_from, valid_to) interval and "
    "an is_current flag — one LEAD window over the (ts, event_id) total "
    "order per key, the standard warehouse companion to "
    "cdc_latest_state's last-wins compaction. One shuffle on the key; "
    "as-of lookups against the result are the range/as-of joins this "
    "engine already ships.",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        "event_type",
        "value",
    )


# --- sessionless funnel conversion --------------------------------------------
@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS v_ts
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.c_ts
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
    doc="Ordered funnel (view -> click -> purchase): each stage keeps users "
    "whose stage event strictly follows their FIRST event of the prior "
    "stage. Three co-partitioned aggregate+join rounds on user_id — no "
    "sort of full event history per user, no collect; the product-"
    "analytics primitive over the event stream.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        ev.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


# --- window-function breadth --------------------------------------------------
@register(
    "window_function_suite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER w,
               CAST(o_orderdate AS DATE)) AS days_since_prev,
           date_diff('day',
               CAST(o_orderdate AS DATE),
               lead(CAST(o_orderdate AS DATE)) OVER w) AS days_until_next,
           ntile(4) OVER w AS recency_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
    doc="Navigation/distribution window functions over a total order "
    "(orderdate, orderkey — ties broken, so lead/lag/ntile are "
    "deterministic): inter-order gap days, quartile bucketing, "
    "percent_rank/cume_dist (exact k/n integer-ratio doubles — "
    "bit-identical across engines, no rounding involved), and "
    "explicit-frame first/last. One shuffle on the partition key; all "
    "functions share the single sorted pass.",
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 100 == 0)
        .select("o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("od"))
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("od"), F.lag("od").over(w)).alias("days_since_prev"),
        F.datediff(F.lead("od").over(w), F.col("od")).alias("days_until_next"),
        F.ntile(4).over(w).alias("recency_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wfull).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


# --- set operations -----------------------------------------------------------
@register(
    "set_ops_report",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7000)
    SELECT 'both' AS cohort, k FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT 'rich_no_orders' AS cohort, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM with_orders)
    """,
    doc="INTERSECT / EXCEPT set algebra over two derived key sets "
    "(customers with orders x high-balance customers), labeled and "
    "unioned — the cohort-splitting shape. Both operators hash-"
    "aggregate to distinct keys before combining; no sort anywhere.",
)
def set_ops_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    with_orders = (
        load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    )
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select(F.col("c_custkey").alias("k"))
    )
    both = with_orders.intersect(rich).select(F.lit("both").alias("cohort"), "k")
    rich_only = rich.exceptAll(with_orders.select("k")).select(
        F.lit("rich_no_orders").alias("cohort"), "k"
    )
    return both.unionByName(rich_only)


# --- named grouping sets with grouping() markers ------------------------------
_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register(
    "grouping_sets_report",
    oracle=_GROUPING_SETS_SQL,
    doc="Named GROUPING SETS (detail, per-flag subtotal, grand total) "
    "with GROUPING() null-vs-subtotal markers — the multi-grain report "
    "shape between plain GROUP BY and full CUBE (status_priority_cube). "
    "One expand + one shuffle; exact decimal sums.",
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# --- unpivot / melt -----------------------------------------------------------
@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (
        SELECT l_orderkey, l_linenumber,
               'l_quantity' AS measure, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
    )
    WHERE l_orderkey % 100 = 0
    """,
    doc="UNPIVOT (DataFrame.unpivot / melt) of three measure columns to "
    "long form — the inverse of pivot_status_by_priority's shape. Narrow "
    "Expand node (3 output rows per input, no shuffle), the layout "
    "feeding per-measure profiling like numeric_profile.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.pmod(F.col("l_orderkey"), F.lit(100)) == 0
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


# --- full outer join reconciliation -------------------------------------------
@register(
    "full_outer_reconciliation",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k, COUNT(*) AS n_orders FROM orders
               WHERE o_orderkey % 7 = 0 GROUP BY 1),
         l AS (SELECT l_orderkey AS k, COUNT(*) AS n_lines FROM lineitem
               WHERE l_orderkey % 5 = 0 GROUP BY 1)
    SELECT COALESCE(o.k, l.k) AS orderkey,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_lines, 0) AS n_lines,
           o.k IS NULL AS only_lines,
           l.k IS NULL AS only_orders
    FROM o FULL OUTER JOIN l ON o.k = l.k
    """,
    doc="Reconciliation via FULL OUTER join of two pre-aggregated key "
    "sets (deliberately overlapping filters so all three match cases "
    "occur): the shape every cross-system audit uses. Aggregates reduce "
    "both sides BEFORE the join, so the shuffle moves key counts, not "
    "raw rows.",
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.pmod(F.col("o_orderkey"), F.lit(7)) == 0)
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.pmod(F.col("l_orderkey"), F.lit(5)) == 0)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    j = o.withColumnRenamed("k", "ok").join(
        li.withColumnRenamed("k", "lk"), F.col("ok") == F.col("lk"), "full_outer"
    )
    return j.select(
        F.coalesce("ok", "lk").alias("orderkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.col("ok").isNull().alias("only_lines"),
        F.col("lk").isNull().alias("only_orders"),
    )


# --- deterministic PageRank over the part co-purchase graph -------------------
def _pagerank_oracle(iters: int = 3, damping: int = 85) -> str:
    """Unrolled power iterations in the same BIGINT micro-unit spec as
    operators.graph.pagerank_exact (r DIV deg contribs, d% DIV 100)."""
    head = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ),
    deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
    r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS rank FROM deg)
    """
    body = ""
    prev = "r0"
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (
        SELECT sym.v AS node, CAST(r.rank // d.deg AS BIGINT) AS c
        FROM sym JOIN {prev} r ON sym.u = r.node JOIN deg d ON sym.u = d.u
    ),
    r{i} AS (
        SELECT n.node,
               CAST({(100 - damping) * 1000000 // 100} AS BIGINT)
               + CAST(({damping} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
        FROM (SELECT node FROM r0) n
        LEFT JOIN (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node) s
          ON n.node = s.node
    )"""
        prev = f"r{i}"
    return head + body + f"\n    SELECT node AS part, rank AS rank_micro FROM {prev}"


@register(
    "pagerank_parts",
    oracle=_pagerank_oracle(),
    doc="Deterministic PageRank (3 power iterations, exact BIGINT "
    "micro-unit arithmetic — truncating division everywhere, no float) "
    "over the part co-purchase graph (parts sharing an order). The "
    "oracle unrolls the identical iteration, so the hash gate certifies "
    "a second full iterative graph algorithm bit-for-bit across engines "
    "(alongside kmeans_codebook and the connected-components closure). "
    "Per round: one edges-to-ranks join + one map-side-combined SUM — "
    "the standard distributed power-iteration shape, linear per round.",
)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.graph import pagerank_exact

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    ranks = pagerank_exact(pairs, iters=3)
    return ranks.select(F.col("node").alias("part"), F.col("rank").alias("rank_micro"))


# --- TPC-H Q5 shape: 6-table snowflake join ----------------------------------
@register(
    "local_supplier_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-table snowflake join (region->nation-> "
    "supplier + customer->orders->lineitem, co-nation constraint) with "
    "a selective region filter and a date window. Exercises Catalyst "
    "join reordering: nation/region (fixed 25/5 rows) broadcast, the "
    "fact-scaled customer/supplier sides are left to AQE (broadcast "
    "only when they measurably fit), the two fact joins shuffle on "
    "their keys, and the region/date filters push into the scans.",
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer and supplier are fact-scaled dimensions (they grow
        # linearly with the corpus) — no forced broadcast; AQE picks
        # broadcast only while the side measurably fits. Only the
        # fixed-cardinality nation (25) / region (5) tables below are
        # legitimately always-broadcast.
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


@register(
    "triangle_counts_parts",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    t AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node AS part, COUNT(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM t)
    GROUP BY node
    """,
    doc="Per-part triangle counts on the co-purchase graph via degree-"
    "ordered compact-forward enumeration (operators/graph.py "
    "triangle_counts): orientation caps out-degree at O(sqrt(E)), "
    "bounding wedge volume at E^1.5 instead of sum-of-degrees-squared — "
    "the skew-proof exact algorithm. The oracle counts the same "
    "triangles with the naive ordered 3-way join, certifying the "
    "orientation/wedge/closing machinery end to end.",
)
def triangle_counts_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    out = triangle_counts(edges)
    return out.select(F.col("node").alias("part"), "n_triangles")


# --------------------------------------------------------------------------
# TPC-H shape suite, round 12: Q7 / Q9 / Q17 / Q18 / Q22 analogs
# --------------------------------------------------------------------------
# The remaining classic join/decorrelation shapes the surface lacked
# (partsupp-based Q2/Q11/Q16/Q20 have no source table here). Float
# policy as module docstring; threshold comparisons against derived
# aggregates are EXACT (cross-multiplied decimal integers) so no row
# can flip membership on an engine's last ULP.


@register(
    "nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by "
    "ship year. Both nation dims filter to the two names BEFORE "
    "joining (25-row fixed-cardinality broadcasts — the only hinted "
    "sides, per the broadcast policy), which makes the supplier and "
    "customer joins selective; lineitem⋈orders shuffles once on "
    "orderkey, AQE sizes the rest.",
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair = ["NATION_1", "NATION_2"]
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair)
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_nationkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_nationkey"))
        .filter(F.col("n_name") != F.col("cust_nation"))
    )
    return (
        joined.select(
            F.col("n_name").alias("supp_nation"),
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM(CAST(
               l.l_extendedprice * (1 - l.l_discount)
               - 0.5 * p.p_retailprice * l.l_quantity
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: per-nation per-year profit over a filtered "
    "part class (PROMO; cost stands in as 0.5·retail·qty — no "
    "partsupp supplycost in this schema). The p_type filter pushes "
    "into the part scan; part and supplier joins are AQE-sized (both "
    "scale with SF — never force-hinted), nation/25 broadcasts.",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(decimal_sum(profit).alias("profit"))
    )


@register(
    "small_qty_part_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
               COUNT(*) AS nq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND CAST(l.l_quantity AS DECIMAL(18,6)) * 2 * pq.nq < pq.sq
    """,
    doc="TPC-H Q17 shape (small-quantity revenue): the correlated "
    "per-part AVG(quantity) subquery DECORRELATED into one map-side-"
    "combined aggregate on partkey joined back to the brand-filtered "
    "probe (what Catalyst does to the correlated form, written "
    "explicitly). The threshold l_quantity < 0.5·avg is the EXACT "
    "cross-multiplication 2·qty·n < sum in decimals — no engine can "
    "flip a boundary row on a double ULP.",
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sq"),
        F.count(F.lit(1)).alias("nq"),
    ).withColumnRenamed("l_partkey", "pq_partkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    probe = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == F.col("pq_partkey"))
        .filter(
            F.col("l_quantity").cast("decimal(18,6)") * 2 * F.col("nq")
            < F.col("sq")
        )
    )
    return probe.agg(
        (decimal_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


@register(
    "large_qty_order_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(big.total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume orders): the IN-over-grouped-"
    "HAVING subquery as its decorrelated form — one map-side-combined "
    "aggregate on orderkey whose >300 filter reduces it to a tiny "
    "keeper set BEFORE any wide join (AQE broadcasts it), then "
    "orders/customer enrichment and TakeOrderedAndProject top-100. "
    "Quantities aggregate in exact decimals; the threshold is "
    "integer-exact.",
)
def large_qty_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("tq"))
        .filter(F.col("tq") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@register(
    "dormant_customer_balances",
    oracle="""
    WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sp, COUNT(*) AS np
        FROM customer WHERE c_acctbal > 0
    ),
    rich AS (
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        FROM customer c, pos
        WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * pos.np > pos.sp
    )
    SELECT r.c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(r.c_acctbal AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS total_bal
    FROM rich r
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = r.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-06-01'
    )
    GROUP BY r.c_nationkey
    """,
    doc="TPC-H Q22 shape (dormant high-balance customers): scalar "
    "subquery threshold (above-average POSITIVE balance, exact "
    "cross-multiplied comparison — one tiny aggregate broadcast back) "
    "+ anti-join against recent orders (the o_orderdate filter pushes "
    "into the orders scan so the anti side is months, not history) + "
    "final rollup by nation. Every customer here HAS orders, so the "
    "classic no-orders-ever form returns empty; recency dormancy is "
    "the live variant.",
)
def dormant_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(18,6)") * F.col("np") > F.col("sp")
    )
    dormant = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return dormant.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        decimal_sum("c_acctbal").alias("total_bal"),
    )


# --- TPC-H Q8 / Q14 / Q19 shapes (late round 12) -----------------------------
# Share arithmetic: per-row volumes become EXACT micro-unit integers
# (functions.numeric.micro_units) so numerator/denominator are
# order-free integer sums and the share is one exact truncated integer
# division (int_ratio) — no double ratio ever rounds near a boundary.


@register(
    "nation_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS order_year,
               n1.n_name AS supp_nation,
               CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v_micro
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN v_micro ELSE 0 END) AS BIGINT) AS num_micro,
           CAST(SUM(v_micro) AS BIGINT) AS den_micro,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN v_micro ELSE 0 END) AS HUGEINT)
                * 1000000 // SUM(v_micro) AS DOUBLE) / 1000000.0 AS share
    FROM vol GROUP BY order_year
    """,
    doc="TPC-H Q8 shape (national market share): NATION_3's share of "
    "ECONOMY-part revenue sold into ASIA customers, by order year. "
    "Seven-table join tree — part-type and region filters push into "
    "their scans, nation/region broadcast by hint (fixed "
    "cardinality), everything else AQE-sized; the share is an exact "
    "truncated micro-unit integer division (int_ratio), never a "
    "rounded double ratio.",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.functions import int_ratio
    from qb_data_pipeline_backfill_spark.functions.numeric import micro_units

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    v = micro_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", v).otherwise(F.lit(0))
    )
    den = F.sum(v)
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            num.cast("long").alias("num_micro"),
            den.cast("long").alias("den_micro"),
            int_ratio(num, den, 6).alias("share"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    WITH w AS (
        SELECT p.p_type,
               CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v_micro
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-09-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1997-10-01'
    )
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN v_micro ELSE 0 END)
                AS BIGINT) AS promo_micro,
           CAST(SUM(v_micro) AS BIGINT) AS total_micro,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN v_micro ELSE 0 END)
                AS HUGEINT) * 1000000 // SUM(v_micro) AS DOUBLE)
                / 1000000.0 AS promo_share
    FROM w
    """,
    doc="TPC-H Q14 shape (promotion revenue share): PROMO parts' share "
    "of one ship month's revenue — the date window pushes into the "
    "lineitem scan, one AQE-sized part join, one conditional "
    "aggregate; share arithmetic exact micro-unit integers.",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.functions import int_ratio
    from qb_data_pipeline_backfill_spark.functions.numeric import micro_units

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    v = micro_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    num = F.sum(F.when(F.col("p_type") == "PROMO", v).otherwise(F.lit(0)))
    den = F.sum(v)
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        num.cast("long").alias("promo_micro"),
        den.cast("long").alias("total_micro"),
        int_ratio(num, den, 6).alias("promo_share"),
    )


@register(
    "disjunctive_brand_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (disjunctive multi-attribute predicate): "
    "three OR-blocks mixing part attributes and lineitem quantity "
    "over one join. Catalyst factors the part-only disjuncts "
    "(brand/size) into the part scan and the quantity bounds into "
    "the lineitem scan (CNF conversion), so each side scans a "
    "superset filter before the join and the full disjunction "
    "evaluates post-join — the pushdown shape this query exists to "
    "exercise.",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


# --- TPC-H partsupp family: Q2 / Q11 / Q16 / Q20 (late round 12) -------------
# The source schema has no partsupp table, so one is FORMULA-BUILT
# from part x supplier (the synthesize_images / messy-URL pattern:
# deterministic fixture, real operators, formula-derived oracle):
# each part gets 4 suppliers at key (p_partkey + k*13 + 1) mod |S|
# (13 is coprime with every power-of-ten |S|, so the 4 keys are
# distinct), an integer supply cost in CENTS (no binary-inexact
# decimal ever compares), and an integer availqty. Both engines build
# it from the same columns, so the relation itself is part of what
# the gates certify.
_PARTSUPP_SQL = """
    ps AS (
        SELECT p_partkey,
               (p_partkey + k.k * 13 + 1)
                   % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
               (p_partkey * 31
                + ((p_partkey + k.k * 13 + 1)
                   % (SELECT COUNT(*) FROM supplier)) * 17) % 9000
                   + 1000 AS cost_cents,
               (p_partkey * 7
                + ((p_partkey + k.k * 13 + 1)
                   % (SELECT COUNT(*) FROM supplier)) * 3) % 1000
                   + 1 AS availqty
        FROM part, (SELECT unnest(generate_series(0, 3)) AS k) k
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_count = load_table(spark, sf_dir, "supplier").count()
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    k = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k")
    sk = F.pmod(F.col("p_partkey") + F.col("k") * 13 + 1, F.lit(s_count))
    return p.select("p_partkey", k).select(
        "p_partkey",
        sk.alias("ps_suppkey"),
        (
            F.pmod(F.col("p_partkey") * 31 + sk * 17, F.lit(9000)) + 1000
        ).alias("cost_cents"),
        (
            F.pmod(F.col("p_partkey") * 7 + sk * 3, F.lit(1000)) + 1
        ).alias("availqty"),
    )


@register(
    "min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    eu AS (
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, eu.s_name, eu.n_name, ps.cost_cents,
               MIN(ps.cost_cents) OVER (PARTITION BY p.p_partkey)
                   AS min_cost
        FROM part p
        JOIN ps ON ps.p_partkey = p.p_partkey
        JOIN eu ON eu.s_suppkey = ps.ps_suppkey
        WHERE p.p_size = 5 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, s_name, n_name, CAST(cost_cents AS BIGINT) AS cost_cents
    FROM cand WHERE cost_cents = min_cost
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): for each STANDARD "
    "size-5 part, every EUROPE supplier at the per-part MINIMUM "
    "supply cost — the correlated MIN subquery decorrelated into a "
    "per-part window over the (region-filtered) candidate set. Costs "
    "are integer cents, so the min comparison is exact; ties return "
    "all minimal suppliers (TPC-H semantics). partsupp is the "
    "formula-built relation both engines derive from part x "
    "supplier.",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    cand = (
        p.select("p_partkey")
        .join(ps, "p_partkey")
        .join(eu, ps.ps_suppkey == eu.s_suppkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.col("cost_cents").cast("long").alias("cost_cents"),
        )
    )


@register(
    "important_stock_parts",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    nat AS (
        SELECT s.s_suppkey FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
    ),
    v AS (
        SELECT ps.p_partkey,
               SUM(ps.cost_cents * ps.availqty) AS value_cents
        FROM ps JOIN nat ON nat.s_suppkey = ps.ps_suppkey
        GROUP BY ps.p_partkey
    ),
    tot AS (
        SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts FROM v
    )
    SELECT v.p_partkey, CAST(v.value_cents AS BIGINT) AS value_cents
    FROM v, tot
    WHERE v.value_cents * tot.n_parts > 2 * tot.total_cents
    """,
    doc="TPC-H Q11 shape (important stock): per-part inventory value "
    "held by NATION_7 suppliers, kept when a part's value exceeds "
    "TWICE THE AVERAGE part value — Q11's fixed fraction scales with "
    "SF (0.0001/SF in the spec), so the mean-relative form keeps the "
    "gate non-vacuous at every scale factor; the threshold is an "
    "exact integer cross-multiplication (value*n > 2*total) so no "
    "boundary part flips on a double ULP. One group aggregate + one "
    "broadcast scalar.",
)
def important_stock_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    v = (
        ps.join(nat, ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey")
        .agg(
            F.sum(F.col("cost_cents") * F.col("availqty")).alias("value_cents")
        )
    )
    tot = v.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents") * F.col("n_parts")
            > 2 * F.col("total_cents")
        )
        .select("p_partkey", F.col("value_cents").cast("long").alias("value_cents"))
    )


@register(
    "supplier_part_counts",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.p_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_suppkey % 17 = 0
      )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (supplier-part relationship counts): distinct "
    "suppliers per (brand, type, size) excluding one brand, one type, "
    "and a 'complaints' supplier set (formula stand-in s_suppkey %% 17 "
    "= 0 for the reference's LIKE filter) — the NOT IN realized as a "
    "broadcast anti-join, never a per-row subquery; COUNT(DISTINCT) "
    "over the joined postings.",
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 17 == 0
    ).select(F.col("s_suppkey").alias("__bad"))
    kept = ps.join(
        F.broadcast(bad), ps.ps_suppkey == F.col("__bad"), "left_anti"
    )
    return (
        kept.join(p, "p_partkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "excess_stock_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY 1, 2
    ),
    excess AS (
        SELECT DISTINCT ps.ps_suppkey
        FROM ps
        JOIN part p ON p.p_partkey = ps.p_partkey
        JOIN shipped sh ON sh.l_partkey = ps.p_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        WHERE p.p_brand = 'Brand#9'
          AND CAST(ps.availqty AS DECIMAL(18,6)) * 2 > sh.qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN excess e ON e.ps_suppkey = s.s_suppkey
    """,
    doc="TPC-H Q20 shape (excess-stock suppliers): suppliers holding "
    "more than half a year's shipped quantity of a Brand#9 part — "
    "nested IN-subqueries decorrelated into one (part, supp)-keyed "
    "shipped aggregate joined to the formula-built partsupp, the "
    "threshold as an exact decimal cross-multiplication "
    "(2*availqty > qty), and a distinct semi-join back to supplier.",
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#9"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty")
    )
    excess = (
        ps.join(p, "p_partkey")
        .join(
            shipped,
            (ps.p_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("availqty").cast("decimal(18,6)") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(excess, s.s_suppkey == F.col("ps_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )
