"""Time-series regularization: resample to a fixed grid + gap-fill.

Extends the engine's event-time family (tumbling/session windows,
hypertable rollups — ``plans/analytics.py``) with the missing piece for
downstream modeling: a REGULAR series per key. Aggregating to buckets
leaves holes wherever a key had no events; training-feature and
monitoring pipelines need those holes materialized (is_gap flags,
zero counts) and value columns carried forward (LOCF).

100 TB posture: the dense grid is generated per key from that key's own
[min, max] bucket span (``sequence`` + ``explode``) — grid size is
bounded by span/step per key, independent of event count, so a hot key
with billions of events still yields one bounded sequence. The
grid↔aggregate join and the LOCF window both hash-partition on the key;
no driver-side loops, no global sort. The carry-forward is a windowed
``last(ignorenulls)`` — one shuffle shared with the join's partitioning
under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.functions.numeric import decimal_sum


def resample_gap_fill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "hour",
    step: str = "interval 1 hour",
) -> DataFrame:
    """Per-key hourly series with gaps materialized and values carried.

    Output per (key, bucket) over each key's observed span:
    ``n_events`` (0 in gaps), ``is_gap``, ``sum_value`` (null in gaps),
    ``locf_value`` (last observed bucket aggregate carried forward —
    never null, because every span starts at an observed bucket).
    """
    bucketed = df.groupBy(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum(value_col).alias("sum_value"),
    )
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.expr(step))).alias("bucket"),
    )
    joined = grid.join(bucketed, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
    )
