"""Measured probe: frequent_items (mergeable Misra-Gries) vs exact
groupBy-count top-k as key cardinality grows.

The sketch's claim is architectural — the exact plan's exchange ships
every distinct key, the sketch ships partitions x capacity counters —
but "measure, don't guess": this times both on a synthetic column of
N rows with ~N/20 hot-key mass over 10 keys and the rest unique, the
adversarial shape for exact top-k (the shuffle is all tail). Results
land in SCALING.md's frequent-items note.

Usage: python tools/hh_probe.py [rows ...]  (default 2M 8M 32M)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from qb_data_pipeline_backfill_spark.operators.sketch import (  # noqa: E402
    frequent_items,
)
from qb_data_pipeline_backfill_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000, 32_000_000]
    spark = get_spark(
        "hh-probe",
        extra_conf={
            "spark.driver.memory": "8g",
            # the probe reads per-stage shuffleWriteRecords off the UI
            # REST API (plan-object SQLMetrics don't accumulate on the
            # driver's copies)
            "spark.ui.enabled": "true",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    import urllib.request

    def total_shuffle_records() -> int:
        base = spark.sparkContext.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications")
        )
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        return sum(s.get("shuffleWriteRecords", 0) for s in stages)
    out = []
    for n in sizes:
        df = spark.range(n).select(
            F.when(F.col("id") % 20 == 0, (F.col("id") / 20) % 10)
            .otherwise(F.col("id") + 100)
            .cast("long")
            .alias("k")
        )
        df.write.format("noop").mode("overwrite").save()  # warm the source

        s0 = total_shuffle_records()
        t0 = time.time()
        exact = (
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"))
            .limit(10)
            .collect()
        )
        t_exact = time.time() - t0
        s1 = total_shuffle_records()

        t0 = time.time()
        approx = (
            frequent_items(df, "k", capacity=256)
            .orderBy(F.desc("cnt_lb"))
            .limit(10)
            .collect()
        )
        t_approx = time.time() - t0
        s2 = total_shuffle_records()
        exact_shuffled, mg_shuffled = s1 - s0, s2 - s1

        exact_top = {r["k"] for r in exact}
        approx_top = {r["item"] for r in approx}
        out.append(
            {
                "rows": n,
                "distinct_keys": n - n // 20 + 10,
                "exact_sec": round(t_exact, 3),
                "mg_sec": round(t_approx, 3),
                "exact_shuffle_records": exact_shuffled,
                "mg_shuffle_records": mg_shuffled,
                "topk_recall": len(exact_top & approx_top) / 10,
            }
        )
        print(json.dumps(out[-1]), file=sys.stderr)
    print(json.dumps({"metric": "hh_probe", "series": out}))


if __name__ == "__main__":
    main()
