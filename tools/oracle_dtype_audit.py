"""Registry-wide oracle dtype lint (VERDICT r12 #1).

Executes every ``oracle_sql()`` entry on DuckDB at the given sf dir and
asserts each output column's dtype lands in the PORTABLE set. DuckDB
silently promotes window/plain SUM(BIGINT) to HUGEINT (int128); a
HUGEINT column renders differently from BIGINT in an Arrow/pandas
fetch path, which is exactly the rows-match/hash-red signature the
driver gate recorded for sample_budget_fill in round 12. This lint
makes that class of oracle-portability defect a pre-commit failure
instead of a driver-red surprise.

Usage: python tools/oracle_dtype_audit.py [sf_dir]
Exit 1 if any oracle yields a non-portable dtype or fails to execute.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Exact portable types, plus parameterized DECIMAL(p,s) via regex.
PORTABLE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}
_DECIMAL_RE = re.compile(r"^DECIMAL\(\d+,\d+\)$")
# Nested types are portable iff every leaf is; strip containers first.
# Limitation: STRUCT field names quoted with embedded spaces
# (`STRUCT("a b" INT)`) would misparse below; no registered oracle
# emits one, and the LIMIT-0 plan step would still catch an execution
# failure.
_CONTAINER_RE = re.compile(r"^(?:MAP|STRUCT)\((.*)\)$")


def _leaf_types(dtype: str) -> list[str]:
    dtype = dtype.strip()
    if dtype.endswith("[]"):
        return _leaf_types(dtype[:-2])
    m = _CONTAINER_RE.match(dtype)
    if m:
        inner, leaves, depth, cur = m.group(1), [], 0, ""
        for ch in inner:
            depth += ch == "("
            depth -= ch == ")"
            if ch == "," and depth == 0:
                leaves.append(cur)
                cur = ""
            else:
                cur += ch
        leaves.append(cur)
        out: list[str] = []
        for leaf in leaves:
            # STRUCT fields look like `name TYPE`; keep the TYPE tail
            leaf = leaf.strip()
            parts = leaf.split(" ", 1)
            out.extend(_leaf_types(parts[-1]))
        return out
    return [dtype]


def _portable(dtype: str) -> bool:
    return all(
        t in PORTABLE or _DECIMAL_RE.match(t) for t in _leaf_types(dtype)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from qb_data_pipeline_backfill_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    oracles = entrymod.oracle_sql()
    bad = errs = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            errs += 1
            continue
        types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        offending = {c: t for c, t in types.items() if not _portable(t)}
        if offending:
            print(f"NONPORTABLE {name}: {offending}")
            bad += 1
    print(f"\n{len(oracles)} oracles, {bad} non-portable, {errs} errors")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
