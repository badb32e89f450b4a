"""Plan-hygiene audit over the ENTIRE query registry: for every
registered query, build the DataFrame (no execution) and count the
plan features that decide 100 TB behavior — exchanges, broadcast
joins, Python boundaries (ArrowEval/BatchEval/MapInPandas/
FlatMapGroupsInPandas), sort-merge joins, nested-loop joins,
TakeOrderedAndProject, and whether any parquet scan carries pushed
filters. One JSON line per query to stdout + a summary; streaming
queries are skipped (their sinks execute eagerly).

This is the measurement behind the repo's plan claims: "narrow, no
UDF" stops being prose — it is a row in PLANAUDIT.json the next
round can diff.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MARKS = {
    "exchanges": r"\bExchange\b",
    "broadcasts": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "python_stages": r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "row_udfs": r"BatchEvalPython",
    "take_ordered": r"TakeOrderedAndProject",
    "cartesian": r"CartesianProduct",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from qb_data_pipeline_backfill_spark.session import get_spark

    spark = get_spark(
        "plan-audit", extra_conf={"spark.driver.memory": "8g"}
    )
    out: dict[str, dict] = {}
    errs = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            continue
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            errs += 1
            continue
        row = {
            k: len(re.findall(p, plan)) for k, p in _MARKS.items()
        }
        row["pushed_filters"] = len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        )
        out[name] = row
    summary = {
        "n_queries": len(out),
        "errors": errs,
        "with_row_udfs": sorted(
            k for k, v in out.items() if v.get("row_udfs")
        ),
        "with_cartesian": sorted(
            k for k, v in out.items() if v.get("cartesian")
        ),
        "python_stage_queries": sum(
            1 for v in out.values() if v.get("python_stages")
        ),
        "exchange_free": sum(
            1 for v in out.values() if v.get("exchanges") == 0
        ),
    }
    print(json.dumps({"summary": summary, "queries": out}))
    print(json.dumps(summary), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
