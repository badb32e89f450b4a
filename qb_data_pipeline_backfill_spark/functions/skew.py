"""Skew mitigation: deterministic salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- joins where the skewed side must co-partition with a NON-broadcastable
  build side (AQE splits sort-merge partitions, but a single hot key
  inside one partition still serializes), and
- aggregations with no partial-combine form (collect_list/collect_set),
  where every value of a hot key lands on one reducer.

Salt values are derived from xxhash64 of row content — deterministic
across runs (no rand()), so retried tasks re-salt identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, n_salts: int, from_cols: list[str] | None = None) -> Column:
    """Deterministic salt in [0, n_salts) from the row's content."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact against a small-but-not-broadcastable side.

    The skewed side gets a content-derived salt; the small side is
    replicated once per salt value (explode of a literal range), so the
    hot key's rows spread over ``n_salts`` reducers instead of one.
    Output equals the plain join (salt is dropped).
    """
    salted = skewed.withColumn("__salt", salt_column(skewed, n_salts))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def salted_collect_list(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """collect_list per key without a single-reducer hot spot.

    Phase 1 collects per (key, salt) — spreading a hot key across
    ``n_salts`` reducers — phase 2 flattens the at-most-``n_salts``
    partial lists per key. The result list is sorted (collect_list
    order is nondeterministic under parallelism anyway; sorting makes
    the operator's output stable)."""
    salted = df.withColumn("__salt", salt_column(df, n_salts))
    partial = salted.groupBy(key, "__salt").agg(
        F.collect_list(value).alias("__part")
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("__part")).alias(value + "s"))
        .withColumn(value + "s", F.array_sort(F.col(value + "s")))
    )
