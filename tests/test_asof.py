"""as-of join semantics: inclusive boundary, NULL on no-match,
carry-forward across multiple left rows, single shuffle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.asof import asof_join_backward


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T00:00:00")),  # after both orders
            (2, 10, _ts("2024-01-02T00:00:00")),  # exactly AT an order ts
            (3, 10, _ts("2023-12-31T00:00:00")),  # before any order
            (4, 99, _ts("2024-01-05T00:00:00")),  # key with no right rows
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), 100),
            (10, _ts("2024-01-02T00:00:00"), 200),
        ],
        "k int, order_ts timestamp, orderkey int",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, left_key="user_id", right_key="k",
        left_time="ts", right_time="order_ts",
    )
    got = {r.event_id: r.orderkey for r in out.collect()}
    assert got == {
        1: 200,  # latest at-or-before
        2: 200,  # boundary is inclusive (right sorts before left on tie)
        3: None,  # left-outer: earlier than every right row
        4: None,  # left-outer: key absent from right side
    }
    assert out.count() == left.count()  # never drops or duplicates left rows


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, left_key="user_id", right_key="k",
        left_time="ts", right_time="order_ts",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the union'd window, and no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_registered_query_shape(spark):
    from qb_data_pipeline_backfill_spark import plans

    df = plans.REGISTRY["asof_join_last_order"].spark(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    matched = [r for r in rows if r.last_orderkey is not None]
    assert matched, "some events should have a prior order"
    assert all(
        r.days_since_order >= 0 for r in matched
    ), "as-of match must be at-or-before the event"
