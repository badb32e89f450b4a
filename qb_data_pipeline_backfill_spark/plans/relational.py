"""The reference's relational/verification surface as Spark queries.

Each query re-expresses one or more operators from SURVEY.md §2A/§2B
(reference file:line cited per query) over the driver's synthetic
tables. All of these are single-pass, partial-aggregable plans:
Catalyst plans a map-side partial aggregate before the shuffle, so at
100 TB each reduces to one shuffle of pre-aggregated partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions import decimal_sum
from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table

# Tables with a single bigint-ish primary key — the analog of the
# reference's three raw.* entity tables for volumetry/integrity.
_KEYED = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}


# --- op #30 + #34: COUNT(*) volumetry UNION ALL report --------------------
# Reference: README.md:210-218 — per-table row counts unioned into one
# report ("SELECT 'qb_customers', COUNT(*) FROM raw.qb_customers UNION ALL …").
@register(
    "volumetry_unionall",
    oracle="""
    SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'region', COUNT(*) FROM region
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    doc="Per-table COUNT(*) union-all volumetry report (ops #30, #34).",
)
def volumetry_unionall(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name in (
        "customer",
        "orders",
        "lineitem",
        "part",
        "supplier",
        "nation",
        "region",
        "events",
        "documents",
        "embeddings",
    ):
        parts.append(
            load_table(spark, sf_dir, name).agg(
                F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("row_count")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- ops #30/#31/#32/#36: integrity report ---------------------------------
# Reference: README.md:220-225, 289-296 — COUNT(*), COUNT(DISTINCT id),
# COUNT(*) FILTER (WHERE id IS NULL), and COUNT(*)-COUNT(DISTINCT id) AS dups.
@register(
    "integrity_report",
    oracle="""
    SELECT 'customer' AS table_name,
           COUNT(*) AS total_rows,
           COUNT(DISTINCT c_custkey) AS unique_ids,
           COUNT(*) FILTER (WHERE c_custkey IS NULL) AS null_ids,
           COUNT(*) - COUNT(DISTINCT c_custkey) AS duplicados
    FROM customer
    UNION ALL
    SELECT 'orders', COUNT(*), COUNT(DISTINCT o_orderkey),
           COUNT(*) FILTER (WHERE o_orderkey IS NULL),
           COUNT(*) - COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'part', COUNT(*), COUNT(DISTINCT p_partkey),
           COUNT(*) FILTER (WHERE p_partkey IS NULL),
           COUNT(*) - COUNT(DISTINCT p_partkey)
    FROM part
    UNION ALL
    SELECT 'supplier', COUNT(*), COUNT(DISTINCT s_suppkey),
           COUNT(*) FILTER (WHERE s_suppkey IS NULL),
           COUNT(*) - COUNT(DISTINCT s_suppkey)
    FROM supplier
    """,
    doc="Count / distinct / null-id / duplicate integrity report (ops #30-#32, #36).",
)
def integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name, key in _KEYED.items():
        t = load_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("total_rows"),
                F.countDistinct(F.col(key)).alias("unique_ids"),
                F.count(F.when(F.col(key).isNull(), 1)).alias("null_ids"),
                (F.count(F.lit(1)) - F.countDistinct(F.col(key))).alias("duplicados"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- op #31 at 100 TB: approx_count_distinct with tolerance gate -----------
# SURVEY §7 risk register: exact COUNT(DISTINCT) is the correctness
# gate, but at 100 TB the engine offers the HLL++ sketch instead (one
# pass, constant memory, no dedup shuffle). The two engines' sketches
# differ, so the gate checks the TOLERANCE CONTRACT — the estimate
# must be within 5% of exact — which is oracle-expressible.
@register(
    "approx_distinct_report",
    oracle="""
    SELECT 'customer' AS table_name, COUNT(DISTINCT c_custkey) AS exact_distinct,
           TRUE AS approx_within_5pct FROM customer
    UNION ALL
    SELECT 'orders', COUNT(DISTINCT o_orderkey), TRUE FROM orders
    UNION ALL
    SELECT 'part', COUNT(DISTINCT p_partkey), TRUE FROM part
    UNION ALL
    SELECT 'supplier', COUNT(DISTINCT s_suppkey), TRUE FROM supplier
    """,
    doc="approx_count_distinct (HLL++) alongside exact COUNT(DISTINCT): the "
    "hash gate verifies the sketch honors its 5% tolerance contract.",
)
def approx_distinct_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name, key in _KEYED.items():
        t = load_table(spark, sf_dir, name)
        exact = F.countDistinct(F.col(key))
        approx = F.approx_count_distinct(key, rsd=0.02)
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                exact.alias("exact_distinct"),
                (
                    F.abs(approx - exact) / F.greatest(exact, F.lit(1)) <= 0.05
                ).alias("approx_within_5pct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- op #33: GROUP BY … HAVING COUNT(*) > 1 (duplicate detection) ----------
# Reference: README.md:180-187. lineitem has multiple lines per order, so
# the HAVING path actually returns rows here.
@register(
    "dup_detection_having",
    oracle="""
    SELECT l_orderkey AS dup_key, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) > 1
    """,
    doc="GROUP BY key HAVING COUNT(*) > 1 duplicate detection (op #33).",
)
def dup_detection_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# --- op #32: conditional / FILTER'd aggregates ------------------------------
# Reference: exporter verification SQL — "COUNT(*) FILTER (WHERE DATE(
# ingested_at_utc) = CURRENT_DATE)" — re-expressed without wall-clock
# dependence (fixed pivot date) so the oracle comparison is stable.
@register(
    "filtered_aggregates",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS total,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE CAST(o_orderdate AS DATE) = DATE '1996-06-01') AS n_pivot_day,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE) AS sum_f_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="COUNT(*)/SUM FILTER (WHERE …) conditional aggregates (ops #32, #38).",
)
def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(
            F.when(F.to_date("o_orderdate") == F.to_date(F.lit("1996-06-01")), 1)
        ).alias("n_pivot_day"),
        decimal_sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        ).alias("sum_f_price"),
    )


# --- op #35: MIN/MAX aggregates ---------------------------------------------
# Reference: exporter log SQL "MIN(ingested_at_utc) as first_ingested,
# MAX(ingested_at_utc) as last_ingested".
@register(
    "minmax_dates",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="MIN/MAX timestamp per group (op #35).",
)
def minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n"),
    )


# --- op #11: inclusive date-window predicate (the backfill filter) ---------
# Reference: data_loaders/extract_qb_customers_py.py:61-67 — keep rows with
# fecha_inicio <= d <= fecha_fin. The filter lands in the parquet scan as a
# pushed predicate (PushedFilters in .explain).
@register(
    "date_window_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-03-01' AND DATE '1996-04-30'
    """,
    doc="Inclusive BETWEEN date-window backfill filter (op #11).",
)
def date_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.to_date("o_orderdate").between(F.lit("1996-03-01"), F.lit("1996-04-30"))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("order_date"),
    )


# --- ops #9/#10: substring date-truncation + coalesce fallback key ---------
# Reference: invoices filter key = coalesce(nullif(TxnDate,''),
# substr(LastUpdatedTime,1,10)) (data_loaders/extract_qb_invoices.py:63-66);
# date truncation via [:10] (extract_qb_customers_py.py:65).
@register(
    "coalesce_filter_key",
    oracle="""
    SELECT COALESCE(NULLIF(event_type, 'view'),
                    SUBSTRING(CAST(ts AS VARCHAR), 1, 10)) AS filter_key,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="coalesce(nullif(primary,''), substr(fallback,1,10)) filter key (ops #9, #10).",
)
def coalesce_filter_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = F.coalesce(
        F.nullif(F.col("event_type"), F.lit("view")),
        F.substring(F.col("ts").cast("string"), 1, 10),
    ).alias("filter_key")
    return e.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum("value").alias("sum_value"),
    )


# --- ops #8/#41: JSON nested-field extraction -------------------------------
# Reference: customer.get('MetaData',{}).get('LastUpdatedTime','') — JSON
# path access on a semi-structured payload column
# (data_loaders/extract_qb_customers_py.py:63) + JSONB validity checks
# (README.md:193-196). events.props is the JSON-string analog.
@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           COUNT(*) FILTER (WHERE json_valid(props)) AS valid_json,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction + validity check on a payload column (ops #8, #41).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    # try_parse_json matches DuckDB json_valid for ALL JSON types —
    # null only on malformed input. (from_json(map<..>) is NOT a
    # validity proxy: it rejects valid non-object JSON like `[1]`.)
    # The oracle's integer SUM is cast back to BIGINT: DuckDB widens
    # SUM(BIGINT) to HUGEINT, which pandas/Arrow degrade lossily.
    valid = F.try_parse_json("props").isNotNull()
    return e.groupBy("event_type").agg(
        F.count(F.when(valid, 1)).alias("valid_json"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --- op #37: IN-list predicate ----------------------------------------------
# Reference: the idempotence probe builds "WHERE id IN ('1','2',…)"
# (data_exporters/save_to_raw_customers_py.py:50).
@register(
    "isin_predicate",
    oracle="""
    SELECT n_name, n_nationkey, n_regionkey
    FROM nation
    WHERE n_nationkey IN (1, 3, 5, 8, 13, 21)
    """,
    doc="IN-list predicate (op #37).",
)
def isin_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_nationkey").isin(1, 3, 5, 8, 13, 21)).select(
        "n_name", "n_nationkey", "n_regionkey"
    )


# --- op #20: semi-join probe -------------------------------------------------
# Reference: SELECT id FROM raw.t WHERE id IN (batch ids) — which is a
# semi-join of target keys against the batch. Spark: LEFT SEMI, broadcast
# when the probe side is small.
@register(
    "semi_join_probe",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    doc="Semi-join existing-key probe (op #20).",
)
def semi_join_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


# --- op #21: anti-join (idempotent-load core) -------------------------------
# Reference: df[~df['id'].isin(existing_ids)]
# (data_exporters/save_to_raw_customers_py.py:55). At scale this is the
# *only* correct shape — the reference's driver-side IN-list does not scale.
@register(
    "anti_join_idempotence",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderstatus = 'P' AND o.o_custkey = c.c_custkey
    )
    """,
    doc="Anti-join: batch keys minus already-loaded keys (op #21).",
)
def anti_join_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --- ops #16/#17: null-key filter + dedup-by-key ----------------------------
# Reference: df[df['id'].notnull()].drop_duplicates(subset=['id'])
# (data_exporters/save_to_raw_customers_py.py:19-20). First-wins dedup is
# made deterministic by ordering on l_linenumber (the reference relies on
# batch order; a distributed engine must pick an explicit order).
@register(
    "validate_dedup_first_wins",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, ROUND(l_extendedprice, 2) AS price
    FROM (
        SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
               ) AS rn
        FROM lineitem
        WHERE l_orderkey IS NOT NULL
    )
    WHERE rn = 1
    """,
    doc="NOT-NULL key filter + deterministic first-wins dedup by key (ops #16, #17).",
)
def validate_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey").isNotNull())
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )
