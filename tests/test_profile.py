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


def test_covariance_known_values_and_sign(spark):
    from qb_data_pipeline_backfill_spark.operators.profile import covariance_matrix

    # x = [1,2,3], y = [2,4,6] (perfectly correlated), z = [3,2,1] (anti)
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)], ["x", "y", "z"]
    )
    got = {
        (r["col_a"], r["col_b"]): r["cov_pop"]
        for r in covariance_matrix(df, ["x", "y", "z"]).collect()
    }
    # cov_pop(x,y) = E[xy] - E[x]E[y] = 28/3 - 8 = 4/3 -> trunc 1.3333
    assert got[("x", "y")] == 1.3333
    # cov_pop(x,z) = 10/3 - 4 = -2/3 -> trunc toward zero -0.6666
    assert got[("x", "z")] == -0.6666
    assert got[("y", "z")] == -1.3333
    assert len(got) == 3


def test_outlier_flags_exact_fence(spark):
    from qb_data_pipeline_backfill_spark.operators.profile import outlier_flags

    # group g: nine 10s and one 100 -> mean 19, var_pop 729, sigma 27.
    # |100-19| = 81 = 3*sigma EXACTLY -> strict > must NOT flag at k=3
    # but must flag at k=2. A float z-score could wobble on this fence.
    rows = [(i, "g", 10.0) for i in range(9)] + [(99, "g", 100.0)]
    df = spark.createDataFrame(rows, ["id", "grp", "value"])
    k3 = {r["id"]: r["is_outlier"] for r in outlier_flags(df, "value", ["grp"], 3).collect()}
    assert k3[99] is False and not any(k3.values())
    k2 = {r["id"]: r["is_outlier"] for r in outlier_flags(df, "value", ["grp"], 2).collect()}
    assert k2[99] is True and sum(k2.values()) == 1
