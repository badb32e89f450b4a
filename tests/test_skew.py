"""Salting helpers: salted plans must produce exactly the plain
results while spreading hot keys across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions import (
    salt_column,
    salted_collect_list,
    salted_join,
)


def _skewed(spark):
    # 90% of rows share key "hot"
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_equals_plain_join(spark):
    skewed = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")], ["k", "label"]
    )
    got = salted_join(skewed, dim, "k", n_salts=8)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    assert {tuple(r) for r in got.select("k", "v", "label").collect()} == {
        tuple(r) for r in want.select("k", "v", "label").collect()
    }


def test_salt_column_is_deterministic_and_bounded(spark):
    df = _skewed(spark)
    s1 = df.select(salt_column(df, 8).alias("s")).collect()
    s2 = df.select(salt_column(df, 8).alias("s")).collect()
    assert [r["s"] for r in s1] == [r["s"] for r in s2]
    assert all(0 <= r["s"] < 8 for r in s1)
    # the hot key's rows actually spread over multiple salts
    n_salts = (
        df.filter(F.col("k") == "hot")
        .select(salt_column(df, 8).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_collect_list_matches_sorted_plain(spark):
    df = _skewed(spark)
    got = {
        r["k"]: list(r["vs"])
        for r in salted_collect_list(df, "k", "v", n_salts=8).collect()
    }
    want = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == want
