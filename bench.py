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

# The round-1 query set, for like-for-like round-over-round
# comparison (the full total grows every round as coverage grows).
R01_SUBSET = (
    "pricing_summary", "top_revenue_orders", "region_nation_rollup",
    "pivot_status_by_priority", "topk_orders_per_customer",
    "running_total_per_customer", "tumbling_window_events",
    "session_windows_events", "envelope_projection",
    "ingest_validate_dedup", "upper_median_by_segment",
    "volumetry_unionall", "integrity_report", "dup_detection_having",
    "filtered_aggregates", "minmax_dates", "date_window_filter",
    "coalesce_filter_key", "json_extract_props", "isin_predicate",
    "semi_join_probe", "anti_join_idempotence", "validate_dedup_first_wins",
)

# Host-drift control set (VERDICT r8 #3, widened r11 per VERDICT r10
# #4): queries whose code is untouched, measured min-of-5 every bench
# run. Their ratio vs the pinned records IS the host-drift
# coefficient — round-over-round comparisons of every other query
# divide by it before being believed (the host shows multi-week state
# drift: r8 measured the original four at 1.37-1.63x of r7 on
# identical code). The r10 verdict found four controls too coarse:
# they spread 0.63-1.51x of their records IN THE SAME RUN, so no
# single query could be adjudicated within ~1.5x. The r11 set is
# eight controls spanning the engine's execution shapes — iterative
# numpy/Arrow (kmeans, ivfpq), Arrow-batched pandas UDF (cosine),
# metadata point lookup (bloom), scan+shuffle aggregate (pricing),
# window function (running_total), Python DataSource (rest scan),
# format sink+source round trip (orc) — and the coefficient is their
# TRIMMED MEAN (drop min and max, mean the rest), so one control
# hitting a host bad-minute OR a lucky cache can't skew it.
DRIFT_CONTROLS = {
    # name -> round-11 fresh-session min-of-5 record (sf0.1, this
    # host; epoch re-pinned r11 so all eight share one baseline —
    # the retired r7 records for the original four are in
    # SCALING.md §9 with the r7→r11 mapping)
    "kmeans_codebook": 1.7237,
    "contract_ivfpq_adc": 1.5349,
    "dedup_embedding_cosine": 1.065,
    "txn_bloom_point_lookup": 0.661,
    "pricing_summary": 1.7953,
    "running_total_per_customer": 0.3976,
    "rest_source_scan": 1.538,
    "orc_roundtrip_scan": 0.2535,
}
DRIFT_CONTROL_PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass

    # Size the driver heap for a 32-thread local run: the default 1g
    # forces collection-heavy queries into GC churn once dozens of
    # shuffles share the JVM (must be set before the JVM starts, so it
    # only applies when bench creates the session — i.e. always, since
    # bench runs in a fresh process).
    spark = get_spark("bench", extra_conf={"spark.driver.memory": "8g"})
    # Warm-up (untimed), in two parts — measured to matter a lot on
    # this harness (round-3 bisect): the identical r01 query subset
    # timed 45.8 s with a cold OS page cache vs 21.0 s warm on an idle
    # machine, while round-over-round code changes moved it < ±10%.
    # (1) JVM/codegen warmup so the first query doesn't pay JIT cost;
    # (2) read every input parquet once so per-query numbers measure
    # the engine, not cold virtio disk I/O. On a real cluster the
    # analog is OS/alluxio cache locality, not engine speed.
    spark.range(1000).selectExpr("sum(id)").collect()
    import glob

    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass

    # SPARK_GRAFT_BENCH_ONLY: comma-separated query names, or "r01" for
    # the round-1 subset — used to bisect session-level vs per-plan
    # timing drift (a filtered run in a fresh session isolates the
    # query set from the rest of the registry).
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    only = set(only_env.split(",")) if only_env else None
    if only_env == "r01":
        only = set(R01_SUBSET)

    # Execution order: registry order, but streaming queries LAST.
    # Registry order exists for the driver's correctness-gate window;
    # for timing, each streaming query leaves a materialized memory-
    # sink table + state store behind in the shared JVM, and running
    # them first taxes every later query with their GC footprint
    # (measured: dedup_minhash_lsh 25.8 s mid-session after 4 streaming
    # jobs vs 7.1 s isolated).
    items = sorted(
        plans.REGISTRY.items(), key=lambda kv: kv[0].startswith("streaming_")
    )
    # The harness host shows EPISODIC slowness: back-to-back full runs
    # measured 187 s vs 278 s with DIFFERENT queries slow each time
    # (e.g. pricing_summary 4.9 s then 15.4 s; text_repetition 11.8 s
    # then 3.8 s), while each query isolated is stable. Per-query MIN
    # across passes measures the engine, not the host's bad minutes.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    def time_queries(query_items, data_dir, n_passes, splits=None) -> dict[str, float]:
        # `splits` (optional dict) collects a build/read decomposition:
        # build_sec is the plan-construction phase — for txn-family
        # queries that's where the table-building COMMITS execute
        # eagerly — and read_sec is the returned DataFrame's execution.
        # VERDICT r6 #7: the single number conflated write-path and
        # read-path, so the CDC commit-overhead regression took a code
        # audit to localize. Components come from the min-TOTAL pass
        # (never mixed across passes).
        out: dict[str, float] = {}
        for _ in range(n_passes):
            for name, q in query_items:
                t0 = time.time()
                try:
                    df = q.spark(spark, data_dir)
                    t1 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    t2 = time.time()
                    took = round(t2 - t0, 4)
                    prev = out.get(name)
                    if prev is None or prev < 0 or took < prev:
                        out[name] = took
                        if splits is not None:
                            splits[name] = {
                                "build_sec": round(t1 - t0, 4),
                                "read_sec": round(t2 - t1, 4),
                            }
                except Exception as e:  # noqa: BLE001
                    print(f"bench error in {name}: {e}", file=sys.stderr)
                    out.setdefault(name, -1.0)
                # Drop leftover session state (memory-sink tables from
                # the streaming harness, cached plans) so one query's
                # residue never shows up in the next query's time.
                for t in spark.catalog.listTables():
                    if t.isTemporary:
                        spark.catalog.dropTempView(t.name)
                spark.catalog.clearCache()
        return out

    splits: dict[str, dict] = {}
    timings = time_queries(
        [kv for kv in items if only is None or kv[0] in only],
        sf_dir,
        passes,
        splits=splits,
    )

    # Drift-control series: the four pinned queries re-timed to a
    # min-of-5 (they already ran `passes` times above when included;
    # the extra passes tighten them to the same min-of-5 the judge's
    # arbitration uses). The coefficient is the MEDIAN ratio vs the
    # round-7 records — median, not mean, so one control hitting a
    # host bad-minute can't skew it. Two scoping rules (ADVICE r9):
    # the references are sf0.1-on-this-host records, so at any other
    # sf the series is skipped and the coefficient stays null rather
    # than recording a meaningless number; and a FILTERED run times
    # only the controls the caller listed (a bisect must stay the
    # isolated query set it asked for).
    is_baseline_sf = os.path.abspath(sf_dir) == "/root/testdata/sf0.1"
    wanted = [
        k
        for k in DRIFT_CONTROLS
        if is_baseline_sf
        and k in plans.REGISTRY
        and (only is None or k in only)
    ]
    extra = max(0, DRIFT_CONTROL_PASSES - passes)
    controls = (
        time_queries([(k, plans.REGISTRY[k]) for k in wanted], sf_dir, extra)
        if wanted and extra
        else {}
    )
    drift: dict[str, float] = {}
    for k in wanted:
        best = [v for v in (timings.get(k), controls.get(k)) if v is not None and v >= 0]
        if best:
            drift[k] = min(best)
    ratios = sorted(drift[k] / DRIFT_CONTROLS[k] for k in drift)
    drift_coeff = None
    if len(ratios) >= 5:
        # trimmed mean: drop the single best and worst control so one
        # bad-minute or lucky-cache outlier can't move the instrument
        trimmed = ratios[1:-1]
        drift_coeff = round(sum(trimmed) / len(trimmed), 4)
    elif ratios:
        # filtered runs may time fewer controls: fall back to median
        mid = len(ratios) // 2
        drift_coeff = round(
            ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2,
            4,
        )

    ok = {k: v for k, v in timings.items() if v >= 0}
    r01 = set(R01_SUBSET)
    result = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(ok.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "r01_subset_sec": round(sum(v for k, v in ok.items() if k in r01), 4),
        # contract_* certifications re-run their operator's exact
        # baseline on purpose; their wall time is reported (regression
        # visibility) and also totaled separately so the headline
        # `value` drift can be attributed.
        "contract_sec": round(
            sum(v for k, v in ok.items() if k.startswith("contract_")), 4
        ),
        # Root cause of the r02 "1.60x regression": cold-cache
        # I/O + machine variance, not plans — the r01 subset
        # measured 45.8s cold / 21.0s warm on identical code,
        # idle machine (round-3 bisect; r1-era code re-run on
        # the same day was 29.5s). Benches now warm first.
        "warmup": "jvm codegen + input page cache (untimed)",
        "passes": passes,
        "timing": "per-query min across passes (host shows "
        "episodic multi-x slowdowns; see bench.py)",
        # commit-path vs read-path decomposition for the txn family
        # (build_sec = eager table-building commits during plan
        # construction; read_sec = executing the returned DataFrame)
        "txn_split": {
            k: v
            for k, v in splits.items()
            if k.startswith(("txn_", "streaming_txn_"))
        },
        # Host-drift control (SCALING.md §9): min-of-5 on the eight
        # pinned queries, their r11-epoch references, and the trimmed-
        # mean ratio. Round-over-round comparisons divide by the
        # coefficient before calling anything a regression.
        "drift_control": drift,
        "drift_control_ref_r11": dict(DRIFT_CONTROLS),
        "drift_coefficient": drift_coeff,
    }
    # Low-noise companion series (VERDICT r5 #7): the driver-gate
    # window re-timed at sf0.01, where queries run well under the
    # host's episodic-slowdown quantum — round-over-round deltas here
    # separate plan regressions from host noise in the sf0.1 numbers.
    companion = "/root/testdata/sf0.01"
    if (
        only is None
        and os.path.isdir(companion)
        and os.path.abspath(companion) != os.path.abspath(sf_dir)
    ):
        for path in sorted(glob.glob(os.path.join(companion, "*.parquet"))):
            with open(path, "rb") as f:
                while f.read(1 << 24):
                    pass
        window = sorted(
            list(plans.REGISTRY.items())[:50],
            key=lambda kv: kv[0].startswith("streaming_"),
        )
        sf001 = time_queries(window, companion, passes)
        ok001 = {k: v for k, v in sf001.items() if v >= 0}
        result["sf001_sec"] = round(sum(ok001.values()), 4)
        result["sf001_queries"] = sf001
    line = json.dumps(result)
    # Stdout is the driver contract but its tail truncates at 2,000
    # chars in the round artifact (BENCH_r04 recovered only 55/112
    # timings from a clipped log; BENCH_r13 parsed as null) — the
    # committed file is the complete record. A FILTERED run
    # (SPARK_GRAFT_BENCH_ONLY) writes to BENCH_only.json instead: a
    # subset run must never overwrite the round's full record (the r8
    # close nearly lost the artifact this way).
    out_name = "BENCH_only.json" if only is not None else "BENCH_full.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w") as f:
        f.write(line + "\n")
    # The ONE stdout JSON line must itself fit the driver's 2,000-char
    # tail so BENCH_r{N}.json stands alone (VERDICT r13 #3): same
    # headline scalars, but `queries` carries only the 50-entry
    # driver-gate window (what CORRECTNESS_r{N} grades), rounded to
    # 0.01 s; the full 232-query dict lives in the committed file.
    gate = {kv[0] for kv in list(plans.REGISTRY.items())[:50]}
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": {
            k: round(v, 2)
            for k, v in timings.items()
            if k in gate or only is not None
        },
        "sf": sf,
        "n_queries": len(timings),
        "r01_subset_sec": result["r01_subset_sec"],
        "contract_sec": result["contract_sec"],
        "drift_coefficient": drift_coeff,
        "queries_note": "gate window only; all %d in BENCH_full.json"
        % len(timings),
    }
    if "sf001_sec" in result:
        compact["sf001_sec"] = result["sf001_sec"]
    cline = json.dumps(compact, separators=(",", ":"))
    if len(cline) > 1950:  # belt-and-braces: drop to 0.1 s rounding
        compact["queries"] = {
            k: round(v, 1) for k, v in compact["queries"].items()
        }
        cline = json.dumps(compact, separators=(",", ":"))
    if len(cline) > 1950:
        # Last resort (ADVICE r14): drop per-query timings entirely so
        # the stdout line can never truncate — the full dict is in the
        # committed BENCH_full.json either way.
        compact["queries"] = {}
        compact["queries_note"] = (
            "dropped from stdout (line-length cap); all %d in "
            "BENCH_full.json" % len(timings)
        )
        cline = json.dumps(compact, separators=(",", ":"))
    print(cline)


if __name__ == "__main__":
    main()
