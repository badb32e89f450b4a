"""Resample + gap-fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from qb_data_pipeline_backfill_spark.operators.timeseries import resample_gap_fill


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gap_fill_materializes_holes_and_carries_values(spark):
    rows = [
        (1, _ts(0, 10), 10.0),
        (1, _ts(0, 40), 5.0),   # same bucket as above → summed
        (1, _ts(3, 5), 7.0),    # hours 1 and 2 are gaps
        (2, _ts(5, 0), 1.0),    # single-bucket user → no gaps
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r["user_id"], r["bucket"].hour): r
        for r in resample_gap_fill(df).collect()
    }
    assert len(out) == 5  # user 1: hours 0-3; user 2: hour 5
    assert out[(1, 0)]["n_events"] == 2 and out[(1, 0)]["sum_value"] == 15.0
    gap = out[(1, 1)]
    assert gap["is_gap"] and gap["n_events"] == 0 and gap["sum_value"] is None
    assert gap["locf_value"] == 15.0  # carried from hour 0
    assert out[(1, 2)]["locf_value"] == 15.0
    assert out[(1, 3)]["locf_value"] == 7.0  # new observation resets carry
    assert not out[(2, 5)]["is_gap"] and out[(2, 5)]["locf_value"] == 1.0


def test_gap_fill_spans_are_per_key(spark):
    # Key 2's span must not be stretched to key 1's range.
    rows = [(1, _ts(0), 1.0), (1, _ts(9), 1.0), (2, _ts(4), 2.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = resample_gap_fill(df)
    assert got.filter("user_id = 2").count() == 1
    assert got.filter("user_id = 1").count() == 10
