"""Oracle-portability lint as a pytest (VERDICT r12 #1).

DuckDB promotes SUM(BIGINT) — plain and windowed — to HUGEINT
(int128). A HUGEINT output column renders differently from BIGINT in
an Arrow/pandas fetch path, which is exactly the rows-match/hash-red
signature the driver gate recorded for the budget-fill pair in round
12. This test plans (LIMIT 0 — binding only, no execution) every
registered oracle on DuckDB and asserts each output column's dtype is
portable, so that defect class fails at commit time, not gate time.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_dtype_audit import _leaf_types, _portable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_portable_flags_hugeint_and_accepts_bigint():
    import duckdb

    con = duckdb.connect()
    rel = con.sql(
        "SELECT SUM(x) OVER () AS raw, CAST(SUM(x) OVER () AS BIGINT) AS ok "
        "FROM (VALUES (1::BIGINT)) t(x) LIMIT 0"
    )
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert not _portable(types["raw"]) and types["raw"] == "HUGEINT"
    assert _portable(types["ok"])


def test_leaf_types_unwrap_containers():
    assert _leaf_types("BIGINT[]") == ["BIGINT"]
    assert _portable("STRUCT(a BIGINT, b VARCHAR)")
    assert not _portable("STRUCT(a HUGEINT, b VARCHAR)")
    assert _portable("MAP(VARCHAR, BIGINT)")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)
def test_every_registered_oracle_yields_portable_dtypes():
    import __spark_entry__ as entrymod
    from qb_data_pipeline_backfill_spark.oracle import duckdb_connection

    con = duckdb_connection(SF_DIR)
    offending: dict[str, dict[str, str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = {
            c: str(t)
            for c, t in zip(rel.columns, rel.types)
            if not _portable(str(t))
        }
        if bad:
            offending[name] = bad
    assert not offending, offending
