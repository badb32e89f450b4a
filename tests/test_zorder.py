"""Z-order layout (operators/zorder.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_sql,
    zvalue,
)


def test_zvalue_known_interleave(spark):
    df = spark.createDataFrame([(2, 1), (3, 3), (0, 0)], ["x", "y"])
    got = [
        r["z"]
        for r in df.select(zvalue(["x", "y"], bits=2).alias("z"))
        .orderBy("x")
        .collect()
    ]
    # (0,0)->0; (2,1)->x bits at even positions, y at odd: 4|2=6; (3,3)->15
    assert got == [0, 6, 15]


def test_zvalue_matches_sql_rendering(spark):
    df = spark.createDataFrame(
        [(i * 37 % 1024, i * 91 % 1024) for i in range(200)], ["a", "b"]
    )
    df.createOrReplaceTempView("zt")
    expr = zorder_sql(["a", "b"], bits=10)
    via_sql = {r["z"] for r in spark.sql(f"SELECT {expr} AS z FROM zt").collect()}
    via_col = {
        r["z"] for r in df.select(zvalue(["a", "b"], bits=10).alias("z")).collect()
    }
    assert via_sql == via_col


def test_zvalue_overflow_guard():
    with pytest.raises(ValueError, match="overflow"):
        zvalue(["a", "b", "c"], bits=21)


def test_cluster_bounds_both_dimensions(spark):
    # 32x32 grid in scrambled order -> 16 z-ordered partitions. Every
    # partition must bound BOTH dims tightly (<=16 of 32), which a
    # single-column sort cannot do (its second dim spans the full 32).
    pts = sorted(
        ((x, y) for x in range(32) for y in range(32)),
        key=lambda p: (p[0] * 997 + p[1] * 613) % 1024,
    )
    df = spark.createDataFrame(pts, ["x", "y"]).repartition(8)
    clustered = cluster_by_zorder(df, ["x", "y"], n_partitions=16, bits=5)
    stats = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(stats) == 16
    assert max(r["sx"] for r in stats) <= 16
    assert max(r["sy"] for r in stats) <= 16

    linear = (
        df.repartitionByRange(16, "x")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    assert max(r["sy"] for r in linear) == 31
