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


def test_compaction_partition_count_scales_with_input(spark, tmp_path):
    from qb_data_pipeline_backfill_spark.operators.layout import (
        compact,
        compaction_partitions,
    )

    src = str(tmp_path / "fragmented")
    # Simulate a fragmented append history: many tiny files.
    spark.range(50_000).repartition(40).write.parquet(src)
    df = spark.read.parquet(src)

    # A generous target compacts to a single file; a tiny target fans out.
    assert compaction_partitions(df, target_file_bytes=1 << 30) == 1
    small = compaction_partitions(df, target_file_bytes=64 * 1024)
    assert small > 1

    out = str(tmp_path / "compacted")
    n = compact(df, out, target_file_bytes=1 << 30)
    assert n == 1
    files = [p for p in __import__("os").listdir(out) if p.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(out).count() == 50_000


def test_compact_partitioned_writes_few_files_per_dir(spark, tmp_path):
    import os

    from qb_data_pipeline_backfill_spark.operators.layout import compact

    from pyspark.sql import functions as F

    df = (
        spark.range(10_000)
        .withColumn("day", (F.col("id") % 3).cast("string"))
        .repartition(24)  # fragmented input
    )
    out = str(tmp_path / "by_day")
    compact(df, out, target_file_bytes=1 << 30, partition_col="day")
    for d in os.listdir(out):
        if not d.startswith("day="):
            continue
        files = [p for p in os.listdir(os.path.join(out, d)) if p.endswith(".parquet")]
        # Hash-repartitioned by day first: one task owns each day, so
        # each directory holds 1 file instead of 24.
        assert len(files) == 1, (d, files)
