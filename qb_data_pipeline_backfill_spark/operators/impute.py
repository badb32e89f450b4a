"""Median imputation — the reference template pipeline's transformer.

Reference: transformers/fill_in_missing_values.py:9-18 — project
numeric columns, then per column: sort the non-null values, take
``sorted_vals[len // 2]`` (the UPPER median — NOT the interpolated
median), and fill nulls with it.

Two paths:
- ``upper_median``: exact reference semantics via ORDER BY + OFFSET
  (a global sort per column — fine for the template's use; at 100 TB
  you would switch to ``approx_quantile``).
- ``median_impute``: the full projection + fillna transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upper_median(df: DataFrame, col: str) -> float | None:
    """sorted(non-null values)[n // 2], computed distributed.

    ORDER BY + OFFSET(n//2) + LIMIT 1: Catalyst plans a global sort
    but the limit keeps the driver-side result to one row.
    """
    non_null = df.select(col).filter(F.col(col).isNotNull())
    n = non_null.count()
    if n == 0:
        return None
    row = non_null.orderBy(col).offset(n // 2).limit(1).collect()
    return row[0][0]


def median_impute(df: DataFrame, cols: list[str]) -> DataFrame:
    """Project ``cols`` and fill each column's nulls with its upper median.

    Matches the reference transform end-to-end (projection at
    fill_in_missing_values.py:9-10, imputation at :13-18).
    """
    out = df.select(*cols)
    fill = {}
    for c in cols:
        m = upper_median(out, c)
        if m is not None:
            fill[c] = m
    return out.na.fill(fill)
