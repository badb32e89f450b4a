"""Numeric column profiling (operators/profile.py)."""

from __future__ import annotations

from qb_data_pipeline_backfill_spark.operators.profile import profile_numeric


def test_profile_known_values_with_nulls(spark):
    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (3.0, 20.0)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["col_name"]: r for r in profile_numeric(df, ["a", "b"]).collect()}

    a = got["a"]
    assert a["n_rows"] == 4 and a["n_null"] == 0 and a["n_distinct"] == 3
    assert a["min_value"] == 1.0 and a["max_value"] == 3.0
    assert a["sum_value"] == 9.0 and a["mean_value"] == 2.25
    # pop var of [1,2,3,3] = mean 2.25 -> (1.5625+.0625+.5625+.5625)/4 = 0.6875
    assert a["var_pop"] == 0.6875

    b = got["b"]
    assert b["n_rows"] == 4 and b["n_null"] == 1 and b["n_distinct"] == 3
    assert b["sum_value"] == 60.0 and b["mean_value"] == 20.0
    # pop var of [10,30,20] = 200/3 = 66.6666... -> truncated 66.6666
    assert b["var_pop"] == 66.6666


def test_profile_constant_column_zero_variance(spark):
    df = spark.createDataFrame([(5.5,), (5.5,), (5.5,)], ["x"])
    r = profile_numeric(df, ["x"]).collect()[0]
    assert r["var_pop"] == 0.0 and r["n_distinct"] == 1
    assert r["mean_value"] == 5.5
