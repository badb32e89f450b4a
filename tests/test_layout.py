"""Bucketed-layout tests: a join between two same-bucketed tables must
plan WITHOUT a shuffle (no Exchange), and results must match the plain
join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.layout import (
    bucketed_join,
    write_bucketed,
)
from qb_data_pipeline_backfill_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(o, "b_orders", "l_orderkey", n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the co-partitioned sort-merge shape is visible
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe_old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = bucketed_join(spark, left, right, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "l_orderkey").agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    )
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    want = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    )
    assert got.collect() == want.collect()
