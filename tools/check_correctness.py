"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, column names,
and an order-insensitive value hash. Use while iterating; the real
gate is the driver's.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from qb_data_pipeline_backfill_spark.oracle import compare, duckdb_connection
    from qb_data_pipeline_backfill_spark.session import get_spark

    # 8g driver heap like the repo-root bench.py: a full-registry sweep keeps one
    # JVM alive across 160+ queries whose localCheckpoint/state-store
    # residue accumulates — at sf0.1 the 1g default OOMs mid-sweep
    spark = get_spark(
        "check-correctness", extra_conf={"spark.driver.memory": "8g"}
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # same per-query hygiene as bench.py: drop memory-sink temp
        # views and cached plans so residue never compounds
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"rows-only  {name}: {n} rows  ({time.time() - t0:.1f}s)")
                n_rowsonly += 1
                continue
            ok, detail = compare(sdf, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            n_fail += 1
            continue
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS ' if ok else 'FAIL '} {name}: {detail}  ({time.time() - t0:.1f}s)")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
