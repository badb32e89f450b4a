"""Declarative registry of engine queries and their DuckDB oracles.

Every operator the engine claims (SURVEY.md §2) is registered here as
a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus —
whenever the semantics are ANSI-SQL-expressible — an equivalent
DuckDB SQL string over the same parquet tables. The driver hash-
compares the two at sf=0.01 (order-insensitive, column-name-sorted),
so: alias every computed column identically on both sides, round
floating-point aggregates identically on both sides, and never emit
wall-clock-dependent values (current_timestamp) in query output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
