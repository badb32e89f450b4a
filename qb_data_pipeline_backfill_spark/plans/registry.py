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


def prioritize(names: list[str]) -> None:
    """Reorder the registry so ``names`` come first (then the rest in
    registration order).

    The driver's correctness gate checks the first N registry entries
    (N=50 in round 2), so queries without a prior green artifact —
    newly added ones and any that fell past the window last round —
    must register ahead of queries the record already covers.
    Unknown names are ignored (callers may list queries that only
    exist in a later round).
    """
    front = [n for n in names if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in front + rest})


def queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
