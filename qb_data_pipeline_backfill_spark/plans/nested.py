r"""Nested payload handling: the invoice ``Line`` tagged-union surface.

The reference's invoice payloads carry a ``Line`` ARRAY of structs
with a tagged union ``DetailType ∈ {SalesItemLineDetail,
SubTotalLineDetail, DiscountLineDetail}`` plus per-variant nested
structs (SURVEY.md §1.2; observed across the reference's 31 invoice
payloads in qb_invoices_backfill/.variables/…/data.parquet). The
pipeline must parse that JSON against a typed schema, explode the
array, and branch on the tag.

Here the synthetic ``lineitem`` rows play the sales lines: an
invoice-like JSON document is assembled per order (collect_list of
line structs + one synthetic SubTotal line — the tagged union), then
parsed back through ``from_json`` with an explicit StructType,
exploded, filtered by ``DetailType``, and aggregated. The oracle
computes the same result straight from ``lineitem`` — proving the
JSON round-trip (build → parse → explode → branch) loses nothing.

Scale shape: the build and parse are narrow per-order expressions; the
only shuffles are the collect_list groupBy and the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table

# Typed schema for the parsed invoice payload — the fixed StructType a
# schema-on-read pipeline declares over the JSONB payload column.
INVOICE_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField(
            "Line",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("DetailType", T.StringType()),
                        T.StructField("Amount", T.DoubleType()),
                        T.StructField(
                            "SalesItemLineDetail",
                            T.StructType(
                                [
                                    T.StructField("ItemRef", T.LongType()),
                                    T.StructField("Qty", T.DoubleType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def build_invoice_json(lineitem: DataFrame) -> DataFrame:
    """Assemble an invoice-like JSON payload per order: every lineitem
    becomes a SalesItemLineDetail line (sorted by line number for
    deterministic JSON), plus one SubTotalLineDetail line."""
    li = lineitem.select(
        "l_orderkey",
        F.struct(
            F.lit("SalesItemLineDetail").alias("DetailType"),
            F.round(F.col("l_extendedprice"), 2).alias("Amount"),
            F.struct(
                F.col("l_partkey").alias("ItemRef"),
                F.col("l_quantity").alias("Qty"),
            ).alias("SalesItemLineDetail"),
            F.col("l_linenumber").alias("_ord"),
        ).alias("line"),
        "l_extendedprice",
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("line")).alias("lines"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("subtotal"),
    )
    # array_sort on structs orders by field order; put _ord first via a
    # rebuild: sort by (_ord) then strip the ordering key.
    sorted_lines = F.transform(
        F.array_sort(
            F.transform(
                F.col("lines"),
                lambda x: F.struct(
                    x.getField("_ord").alias("_ord"),
                    x.getField("DetailType").alias("DetailType"),
                    x.getField("Amount").alias("Amount"),
                    x.getField("SalesItemLineDetail").alias("SalesItemLineDetail"),
                ),
            )
        ),
        lambda x: F.struct(
            x.getField("DetailType").alias("DetailType"),
            x.getField("Amount").alias("Amount"),
            x.getField("SalesItemLineDetail").alias("SalesItemLineDetail"),
        ),
    )
    subtotal_line = F.struct(
        F.lit("SubTotalLineDetail").alias("DetailType"),
        F.col("subtotal").alias("Amount"),
        F.lit(None)
        .cast("struct<ItemRef:bigint,Qty:double>")
        .alias("SalesItemLineDetail"),
    )
    return per_order.select(
        F.col("l_orderkey"),
        F.to_json(
            F.struct(
                F.col("l_orderkey").cast("string").alias("Id"),
                F.concat(sorted_lines, F.array(subtotal_line)).alias("Line"),
            )
        ).alias("payload"),
    )


@register(
    "invoice_line_explode",
    oracle="""
    SELECT l_orderkey AS order_id,
           COUNT(*) AS n_sales_lines,
           CAST(ROUND(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sales_amount,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    GROUP BY l_orderkey
    """,
    doc="Tagged-union Line array: build invoice JSON per order, from_json "
    "with a typed StructType, explode, filter DetailType = "
    "'SalesItemLineDetail', aggregate (SURVEY §1.2; missing-op #6 of "
    "VERDICT r1). Oracle computes the same numbers without the JSON "
    "round-trip.",
)
def invoice_line_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 10 == 0
    )
    invoices = build_invoice_json(li)
    parsed = invoices.select(
        F.from_json("payload", INVOICE_SCHEMA).alias("inv")
    )
    lines = parsed.select(
        F.col("inv.Id").cast("bigint").alias("order_id"),
        F.explode("inv.Line").alias("line"),
    )
    sales = lines.filter(F.col("line.DetailType") == "SalesItemLineDetail")
    return sales.groupBy("order_id").agg(
        F.count(F.lit(1)).alias("n_sales_lines"),
        F.round(
            F.sum(F.col("line.Amount").cast("decimal(18,6)")), 2
        )
        .cast("double")
        .alias("sales_amount"),
        F.round(
            F.sum(F.col("line.SalesItemLineDetail.Qty").cast("decimal(18,6)")), 2
        )
        .cast("double")
        .alias("total_qty"),
    )
