"""Stream-stream interval join semantics on hand-crafted timestamps:
exact pair matching, and the watermark rules governing outer-null
release (reverse-engineered by scale-diffing and pinned here so a
Spark upgrade that shifts them fails loudly)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.streaming import (
    events_stream,
    interval_attribution_join,
    interval_attribution_join_outer,
    run_available_now,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _mk_events(spark, tmp_path, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type)."""
    df = spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
            for eid, m, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stage"))
    # the streaming source globs for a file literally named events.parquet
    part = [
        f
        for f in os.listdir(os.path.join(path, "stage"))
        if f.endswith(".parquet")
    ][0]
    os.replace(
        os.path.join(path, "stage", part), os.path.join(path, "events.parquet")
    )
    return path


def test_inner_interval_join_exact_pairs(spark, tmp_path):
    # user 1: clicks at +0 and +30; purchase at +45 matches BOTH
    # (window [-60, 0] relative to the purchase); click at +120 is
    # after the purchase and must NOT match.
    # user 2: click at +0, purchase at +90 -> outside the 1h window.
    path = _mk_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "click"),
            (2, 30, 1, "click"),
            (3, 45, 1, "purchase"),
            (4, 120, 1, "click"),
            (5, 0, 2, "click"),
            (6, 90, 2, "purchase"),
        ],
    )
    ev = events_stream(spark, path)
    out = run_available_now(
        interval_attribution_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )
    pairs = {(r.purchase_id, r.click_id) for r in out.collect()}
    assert pairs == {(3, 1), (3, 2)}


def test_outer_join_releases_only_watermark_passed_rows(spark, tmp_path):
    # Unmatched purchases: one far behind the final watermark (must be
    # released with NULL click) and one inside the watermark horizon
    # (must be withheld). A late click anchors max event time; the
    # watermark is min over both sides' own maxima minus 2h.
    path = _mk_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "purchase"),        # unmatched, old -> released
            (2, 60 * 20, 2, "purchase"),  # unmatched, recent -> withheld
            (3, 60 * 21, 3, "click"),     # anchors click-side max
        ],
    )
    ev = events_stream(spark, path)
    out = run_available_now(
        interval_attribution_join_outer(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )
    rows = {(r.purchase_id, r.click_id) for r in out.collect()}
    # purchase 1 released as unmatched; purchase 2 still in state
    assert (1, None) in rows
    assert all(p != 2 for p, _ in rows)
