"""DuckDB-oracle comparison utilities (mirrors the driver's gate).

The driver compares each Spark query against its DuckDB oracle SQL by
row count + sorted column names + order-insensitive value hash. These
helpers replicate that locally so tests and the iterate loop catch
mismatches before the driver does.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import duckdb

from qb_data_pipeline_backfill_spark.tables import TABLE_NAMES


def norm_value(v) -> str:
    """Engine-neutral stringification of a cell value."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return norm_value(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_digest(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_value(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), digest


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the synthetic tables registered as views."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    """Run both sides; return (match, human-readable detail)."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s = table_digest(scols, srows)
    o = table_digest(ocols, orows)
    if s == o:
        return True, f"match: {s[0]} rows"
    if s[1] != o[1]:
        return False, f"column mismatch: spark={s[1]} oracle={o[1]}"
    if s[0] != o[0]:
        return False, f"rowcount mismatch: spark={s[0]} oracle={o[0]}"
    sset = {tuple(norm_value(v) for v in r) for r in srows}
    oset = {tuple(norm_value(v) for v in r) for r in orows}
    return False, (
        f"value mismatch; spark-only(≤3)={list(sset - oset)[:3]} "
        f"oracle-only(≤3)={list(oset - sset)[:3]}"
    )
