"""Two-process race on the SAME pinned scratch fixture.

The round-8 phantom gate red came from a grader reading a fixture
mid-rebuild (the old rmtree-then-commit-in-place pattern). Round 10's
`_atomic_rebuild` claims a concurrent reader/builder can only ever see
a complete table. This probe proves it under REAL process concurrency:

- the widening fixture is deleted, then N worker processes (each with
  its own SparkSession) simultaneously run the gate query end to end
  (build + read + oracle compare);
- every worker must PASS — no torn reads, no half-built tables, no
  losing-racer crashes — and the final table must carry a valid
  fingerprint at the pinned head.

Usage: python tools/fixture_race_probe.py [n_workers]
Exit 0 = all workers passed and the final fixture is valid.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from qb_data_pipeline_backfill_spark.oracle import compare, duckdb_connection
from qb_data_pipeline_backfill_spark.session import get_spark

spark = get_spark("race-worker", shuffle_partitions=8)
qs, oracles = entrymod.queries(), entrymod.oracle_sql()
name = "txn_type_widening"
df = qs[name](spark, {sf_dir!r})
ok, detail = compare(df, duckdb_connection({sf_dir!r}), oracles[name])
print("WORKER", "PASS" if ok else "FAIL", detail)
sys.exit(0 if ok else 1)
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from qb_data_pipeline_backfill_spark.plans import formats
    from qb_data_pipeline_backfill_spark.operators import txn

    path = os.path.join(
        formats._SCRATCH,
        f"orders_widen_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    script = _WORKER.format(repo=repo, sf_dir=sf_dir)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for _ in range(n)
    ]
    fails = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        line = next(
            (ln for ln in out.splitlines() if ln.startswith("WORKER")),
            "WORKER FAIL (no output)",
        )
        print(f"worker {i}: {line} (exit {p.returncode})")
        fails += p.returncode != 0
    head_ok = txn.current_version(path) == 4
    fp_ok = formats._fixture_current(path, 4, formats._FIXTURE_REV)
    print(
        json.dumps(
            {
                "metric": "fixture_race_probe",
                "n_workers": n,
                "n_failed": fails,
                "final_head_ok": head_ok,
                "final_fingerprint_ok": fp_ok,
            }
        )
    )
    return 0 if (fails == 0 and head_ok and fp_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
