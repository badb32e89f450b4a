"""CDC latest-state compaction: correctness + map-side-combinable plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.cdc import changes_between, latest_state


def _changelog(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 100, "a"),
        (1, dt.datetime(2024, 1, 1, 12), 101, "b"),   # latest for key 1
        (2, dt.datetime(2024, 1, 1, 9), 102, "c"),    # ts tie with 103
        (2, dt.datetime(2024, 1, 1, 9), 103, "d"),    # event_id breaks it
    ]
    return spark.createDataFrame(rows, "k bigint, ts timestamp, eid bigint, v string")


def test_latest_state_last_wins_with_tiebreak(spark):
    out = {
        r["k"]: (r["eid"], r["v"])
        for r in latest_state(_changelog(spark), ["k"], ["ts", "eid"]).collect()
    }
    assert out == {1: (101, "b"), 2: (103, "d")}


def test_latest_state_partition_independent(spark):
    df = _changelog(spark)
    a = sorted(map(tuple, latest_state(df, ["k"], ["ts", "eid"]).collect()))
    b = sorted(map(tuple, latest_state(df.repartition(7), ["k"], ["ts", "eid"]).collect()))
    assert a == b


def test_latest_state_plan_is_partial_aggregate_not_window(spark):
    df = _changelog(spark)
    plan = latest_state(df, ["k"], ["ts", "eid"])._jdf.queryExecution().executedPlan().toString()
    # Not a ROW_NUMBER window over full history; a partial max_by runs
    # BEFORE the exchange (struct-ordered max_by planes as
    # SortAggregate, still with map-side partials), so the shuffle
    # carries one candidate per key per partition, not every version.
    assert "Window" not in plan
    assert "partial_max_by" in plan
    assert plan.index("partial_max_by") > plan.index("Exchange")  # partial below exchange in tree text


def test_changes_between_detects_updates(spark):
    old = latest_state(_changelog(spark), ["k"], ["ts", "eid"])
    newer = _changelog(spark).union(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 2, 8), 104, "e"), (3, dt.datetime(2024, 1, 2, 9), 105, "f")],
            "k bigint, ts timestamp, eid bigint, v string",
        )
    )
    new = latest_state(newer, ["k"], ["ts", "eid"])
    changed = {r["k"] for r in changes_between(old, new, ["k"]).collect()}
    assert changed == {1, 3}  # key 2 unchanged
