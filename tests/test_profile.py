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


def test_drift_psi_identical_distributions_is_zero(spark):
    from qb_data_pipeline_backfill_spark.operators.profile import (
        distribution_drift,
    )

    rows = [(float(i % 10) * 10.0 + 1.0,) for i in range(100)]
    ref = spark.createDataFrame(rows, ["v"])
    out = distribution_drift(
        ref, ref, "v", lo=0.0, hi=100.0, n_bins=10
    ).collect()
    assert len(out) == 10
    # identical slices: p == q in every bin -> every term and the total are 0
    assert all(r["psi_term_micro"] == 0 for r in out)
    assert out[0]["psi_total"] == 0.0
    assert all(r["ref_n"] == 10 and r["cur_n"] == 10 for r in out)


def test_drift_psi_flags_shift_and_clamps_range(spark):
    from qb_data_pipeline_backfill_spark.operators.profile import (
        distribution_drift,
    )

    # ref mass in bins 0-4; cur mass in bins 5-9, plus out-of-range
    # values that must clamp into the edge bins instead of vanishing.
    ref = spark.createDataFrame(
        [(float(i % 5) * 10.0 + 1.0,) for i in range(50)] + [(-99.0,)], ["v"]
    )
    cur = spark.createDataFrame(
        [(float(i % 5) * 10.0 + 51.0,) for i in range(50)] + [(999.0,)], ["v"]
    )
    out = {r["bin"]: r for r in distribution_drift(
        ref, cur, "v", lo=0.0, hi=100.0, n_bins=10
    ).collect()}
    assert len(out) == 10
    assert out[0]["ref_n"] == 11  # 10 in-range + 1 clamped below
    assert out[9]["cur_n"] == 11  # 10 in-range + 1 clamped above
    # totally disjoint histograms: PSI far beyond the 0.2 action fence
    assert out[0]["psi_total"] > 0.2
    # shares are Laplace-smoothed: empty bins still carry mass > 0
    assert all(r["p_ref"] > 0 and r["p_cur"] > 0 for r in out.values())
