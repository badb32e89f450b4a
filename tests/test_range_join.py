"""interval_join semantics: bound inclusivity, key matching, intervals
spanning many buckets, empty intervals, keyless mode, and the plan
guarantee (equi-join, never a nested loop)."""

from __future__ import annotations

import datetime as dt

import pytest

from qb_data_pipeline_backfill_spark.operators.range_join import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T10:00:00")),  # == start
            (2, 7, _ts("2024-01-01T10:30:00")),  # inside
            (3, 7, _ts("2024-01-01T11:00:00")),  # == end
            (4, 7, _ts("2024-01-01T12:00:00")),  # outside
            (5, 8, _ts("2024-01-01T10:30:00")),  # inside span but wrong key
        ],
        "pid int, k int, t timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, 7, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "iid int, ik int, s timestamp, e timestamp",
    )
    return points, intervals


def _pairs(df):
    return {(r.pid, r.iid) for r in df.collect()}


def test_halfopen_default_and_key_match(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, point_time="t", start_col="s", end_col="e",
        bucket_seconds=3600, point_key="k", interval_key="ik",
    )
    # [start, end): 1 and 2 in; 3 (== end) out; 4 outside; 5 wrong key
    assert _pairs(out) == {(1, 100), (2, 100)}


def test_open_start_closed_end(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, point_time="t", start_col="s", end_col="e",
        bucket_seconds=3600, point_key="k", interval_key="ik",
        include_start=False, include_end=True,
    )
    assert _pairs(out) == {(2, 100), (3, 100)}


def test_interval_spanning_many_buckets_no_duplicates(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:30"))], "pid int, t timestamp"
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2023-12-31T00:00:00"), _ts("2024-01-02T00:00:00"))],
        "iid int, s timestamp, e timestamp",
    )
    out = interval_join(
        points, intervals, point_time="t", start_col="s", end_col="e",
        bucket_seconds=60,  # interval covers ~2880 cells; point in exactly one
    )
    assert out.collect()[0].iid == 100
    assert out.count() == 1  # met in one cell only -> no dedup needed


def test_empty_and_inverted_intervals_match_nothing(spark):
    points = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], "pid int, t timestamp")
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:00:00")),  # empty [x, x)
            (2, _ts("2024-01-02T00:00:00"), _ts("2024-01-01T00:00:00")),  # inverted
        ],
        "iid int, s timestamp, e timestamp",
    )
    out = interval_join(
        points, intervals, point_time="t", start_col="s", end_col="e", bucket_seconds=3600
    )
    assert out.count() == 0


def test_keyless_mode_and_no_nested_loop_plan(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points.drop("k"), intervals.drop("ik"),
        point_time="t", start_col="s", end_col="e", bucket_seconds=3600,
    )
    assert _pairs(out) == {(1, 100), (2, 100), (5, 100)}  # key no longer filters
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_mismatched_key_args_raise(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError):
        interval_join(
            points, intervals, point_time="t", start_col="s", end_col="e",
            bucket_seconds=3600, point_key="k",
        )
