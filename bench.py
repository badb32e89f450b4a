"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes through the noop sink so the full physical plan
runs (scan → shuffle → agg) without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qb_data_pipeline_backfill_spark import plans
from qb_data_pipeline_backfill_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass

    spark = get_spark("bench")
    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, q in plans.REGISTRY.items():
        t0 = time.time()
        try:
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 4)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    # The round-1 query set, for like-for-like round-over-round
    # comparison (the full total grows every round as coverage grows).
    r01 = {
        "pricing_summary", "top_revenue_orders", "region_nation_rollup",
        "pivot_status_by_priority", "topk_orders_per_customer",
        "running_total_per_customer", "tumbling_window_events",
        "session_windows_events", "envelope_projection",
        "ingest_validate_dedup", "upper_median_by_segment",
        "volumetry_unionall", "integrity_report", "dup_detection_having",
        "filtered_aggregates", "minmax_dates", "date_window_filter",
        "coalesce_filter_key", "json_extract_props", "isin_predicate",
        "semi_join_probe", "anti_join_idempotence", "validate_dedup_first_wins",
    }
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(ok.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "r01_subset_sec": round(
                    sum(v for k, v in ok.items() if k in r01), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
