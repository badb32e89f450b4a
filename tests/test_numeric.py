"""decimal_avg / int_ratio: exact cross-engine mean semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions import decimal_avg, int_ratio


def _avg(spark, values, scale=4):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    return df.agg(decimal_avg("v", scale=scale).alias("a")).collect()[0]["a"]


def test_decimal_avg_exact_values(spark):
    assert _avg(spark, [1, 2]) == 1.5
    assert _avg(spark, [10, 10, 10]) == 10.0
    # 1/3 truncated at 4dp, not rounded
    assert _avg(spark, [0, 0, 1]) == 0.3333


def test_decimal_avg_half_boundary_truncates(spark):
    # The hypertable regression case: 307.03 / 8 = 38.378750 — rounding
    # this flips between engines (Spark rounds the shortest-decimal
    # string, DuckDB the binary double); truncation is unambiguous.
    vals = [307.03 / 8] * 8  # sums to 307.030000 exactly in DECIMAL(18,6)
    assert _avg(spark, [38.378750] * 1) == 38.3787
    assert _avg(spark, vals) == 38.3787


def test_decimal_avg_negative_mean_truncates_toward_zero(spark):
    # DuckDB's integer `//` truncates toward zero (-7 // 2 = -3); the
    # old floor division gave -0.3334 for a -1/3 mean — one ULP off
    # the oracle for every negative mean (r7 latent defect)
    assert _avg(spark, [0, 0, -1]) == -0.3333
    assert _avg(spark, [-1, -2]) == -1.5
    # duckdb: SUM=-3.7 micro=-3700000 // 300 = -12333 -> -1.2333
    assert _avg(spark, [-1.2, -1.3, -1.2]) == -1.2333


def test_decimal_avg_partition_independent(spark):
    vals = [i * 0.07 for i in range(1, 500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.agg(decimal_avg("v").alias("a")).collect()[0]["a"]
    b = df.repartition(17).agg(decimal_avg("v").alias("a")).collect()[0]["a"]
    assert a == b


def test_int_ratio_exact(spark):
    df = spark.createDataFrame([(1, 3)], "num bigint, den bigint")
    row = df.select(
        int_ratio(F.col("num"), F.col("den")).alias("r"),
        int_ratio(F.col("num") * 5, F.col("den") * 8).alias("r2"),  # 5/24
    ).collect()[0]
    assert row["r"] == 0.3333
    assert row["r2"] == 0.2083
