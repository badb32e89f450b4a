"""Optimization-round probe: decompose a query's wall time into
plan-construction, Catalyst planning, and execution (noop sink).

For each named query (or a default top-cost list) this times, with
``--passes`` repetitions (min reported):

  build_s   fn(spark, sf_dir) — DataFrame construction (includes any
            eager driver-side work the plan does, e.g. model fits)
  plan_s    forcing queryExecution().executedPlan() — analysis +
            optimization + physical planning, no execution
  exec_s    df.write.format("noop") — codegen + run (on a SECOND
            DataFrame instance so plan_s is not double-counted)

Usage: python tools/opt_probe.py [--sf DIR] [--passes N] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TOP = [
    "dedup_incremental_image",
    "curation_pipeline",
    "triangle_counts_parts",
    "text_perplexity_buckets",
    "wordpiece_encode_stats",
    "text_fivegram_perplexity",
    "contract_incremental_minhash",
    "contract_embedding_lsh_recall",
    "dedup_image_dhash_jpeg",
    "dedup_image_dhash",
    "dedup_winnow_pairs",
    "contract_simhash_recall",
    "pagerank_parts",
    "recursive_reachability",
    "dedup_image_dhash_jpeg420",
    "dedup_image_dhash_png",
    "dedup_incremental_minhash",
    "contract_minhash_recall",
    "dedup_image_dhash_gif",
    "numeric_profile",
    "contract_image_dhash_replay",
    "dedup_image_dhash_crossformat",
    "leakage_safe_splits",
    "bpe_encode_stats",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 2
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = DEFAULT_TOP

    from qb_data_pipeline_backfill_spark import plans
    from qb_data_pipeline_backfill_spark.session import get_spark

    spark = get_spark("opt-probe", extra_conf={"spark.driver.memory": "8g"})
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {}
    for name in names:
        q = plans.REGISTRY[name]
        best = None
        for _ in range(passes):
            for t in spark.catalog.listTables():
                if t.isTemporary:
                    spark.catalog.dropTempView(t.name)
            spark.catalog.clearCache()
            t0 = time.time()
            df = q.spark(spark, sf_dir)
            t1 = time.time()
            # force full Catalyst pipeline without executing
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df2 = q.spark(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            rec = {
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round((t1 - t0) + (t3 - t2), 3),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(f"{name:36s} build={best['build_s']:7.3f} "
              f"plan={best['plan_s']:7.3f} exec={best['exec_s']:7.3f} "
              f"total={best['total_s']:7.3f}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
