"""Continuous-aggregate rollup: multi-level re-aggregation must equal
the direct aggregate; partials shrink monotonically; decimal sums keep
the equivalence exact under repartitioning."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions import decimal_avg

from qb_data_pipeline_backfill_spark.operators.rollup import (
    continuous_aggregate,
    finalize,
    rollup,
    time_bucket,
)


def _events(spark, n=500, seed=7):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            base + dt.timedelta(seconds=rng.randrange(3 * 86400)),
            rng.choice(["a", "b"]),
            round(rng.uniform(-5, 50), 3),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp, kind string, value double")


def _direct_daily(df):
    return (
        df.withColumn("bucket", time_bucket("ts", 86400))
        .groupBy("bucket", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def _key(rows):
    return {
        (r.bucket, r.kind): (r.n_rows, r.sum_value, r.min_value, r.max_value)
        for r in rows
    }


def test_minute_hour_day_rollup_equals_direct(spark):
    df = _events(spark).repartition(13)  # force partial-agg reorderings
    minutely = continuous_aggregate(df, "ts", ["kind"], ["value"], 60)
    hourly = rollup(minutely, ["kind"], ["value"], 3600)
    daily = rollup(hourly, ["kind"], ["value"], 86400)
    got = finalize(daily, ["kind"], ["value"]).select(
        "bucket", "kind", "n_rows", "sum_value", "min_value", "max_value"
    )
    assert _key(got.collect()) == _key(_direct_daily(df).collect())


def test_partials_shrink_each_level(spark):
    df = _events(spark)
    minutely = continuous_aggregate(df, "ts", ["kind"], ["value"], 60)
    hourly = rollup(minutely, ["kind"], ["value"], 3600)
    daily = rollup(hourly, ["kind"], ["value"], 86400)
    n_raw, n_min, n_hour, n_day = (x.count() for x in (df, minutely, hourly, daily))
    assert n_raw > n_min > n_hour > n_day
    assert n_day <= 3 * 2  # 3 days x 2 kinds


def test_avg_finalizes_from_partials(spark):
    df = _events(spark, n=200)
    hourly = continuous_aggregate(df, "ts", ["kind"], ["value"], 3600)
    daily = finalize(rollup(hourly, ["kind"], ["value"], 86400), ["kind"], ["value"])
    expect = {
        (r.bucket, r.kind): r.avg_value
        for r in df.withColumn("bucket", time_bucket("ts", 86400))
        .groupBy("bucket", "kind")
        .agg(decimal_avg("value").alias("avg_value"))
        .collect()
    }
    got = {(r.bucket, r.kind): r.avg_value for r in daily.collect()}
    assert got == expect
