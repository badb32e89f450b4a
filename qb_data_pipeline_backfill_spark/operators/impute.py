"""Median imputation — the reference template pipeline's transformer.

Reference: transformers/fill_in_missing_values.py:9-18 — project
numeric columns, then per column: sort the non-null values, take
``sorted_vals[len // 2]`` (the UPPER median — NOT the interpolated
median), and fill nulls with it.

Single-pass design: all columns are melted into (column_name, value)
rows and ranked in ONE window job — one shuffle on the column-name key
regardless of how many columns are imputed. The reference (and the
naive port) runs a full sort per column; at 6 template columns that is
12 jobs where this is 1. At 100 TB you would swap the exact rank for
``approx_quantile`` — kept exact here because the reference's
semantics (and the oracle) are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def upper_medians(df: DataFrame, cols: list[str]) -> dict[str, float | int]:
    """All upper medians (``sorted(non-null)[n // 2]``) in one job.

    Melt → per-column window rank → pick rank n//2+1. The collect is
    one row per column (bounded, driver-safe).
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.col_name", "m.value").filter(F.col("value").isNotNull())
    w = Window.partitionBy("col_name").orderBy("value")
    wn = Window.partitionBy("col_name")
    picked = (
        melted.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == F.floor(F.col("n") / 2) + 1)
        .select("col_name", "value")
        .collect()
    )
    # restore integral dtype where the source column was integral
    return {
        r["col_name"]: (
            int(r["value"])
            if isinstance(df.schema[r["col_name"]].dataType, _INTEGRAL)
            else r["value"]
        )
        for r in picked
    }


def upper_median(df: DataFrame, col: str) -> float | int | None:
    """Single-column upper median (same one-job path)."""
    return upper_medians(df, [col]).get(col)


def approx_upper_medians(
    df: DataFrame, cols: list[str], accuracy: int = 10_000
) -> dict[str, float | int]:
    """The 100 TB path: approximate medians via ``percentile_approx``
    (Greenwald-Khanna sketch) — one aggregate-only job, no per-column
    global sort, rank error bounded by n/``accuracy`` per column.

    The exact path (``upper_medians``) window-sorts EVERY value of a
    column inside one task — semantically required by the reference's
    exact upper median and fine at template scale, but a straggler at
    100 TB. This variant keeps the same call shape so ``median_impute``
    can swap it in; the registered ``contract_approx_median`` query
    pins its rank-error bound against the exact path cross-engine.
    """
    row = (
        df.select(
            *[
                F.percentile_approx(
                    F.col(c).cast("double"), 0.5, accuracy
                ).alias(c)
                for c in cols
            ]
        )
        .collect()[0]
        .asDict()
    )
    return {
        c: (
            int(row[c])
            if isinstance(df.schema[c].dataType, _INTEGRAL) and row[c] is not None
            else row[c]
        )
        for c in cols
    }


def median_impute(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Project ``cols`` and fill each column's nulls with its upper
    median — the reference transform end-to-end (projection at
    fill_in_missing_values.py:9-10, imputation at :13-18) with one
    aggregation job instead of 2×len(cols).

    ``exact=False`` swaps in ``approx_upper_medians`` — the sketch-
    based path to use once a column's value count makes a single-task
    sort a straggler.
    """
    out = df.select(*cols)
    medians = upper_medians(out, cols) if exact else approx_upper_medians(out, cols)
    return out.na.fill({k: v for k, v in medians.items() if v is not None})
