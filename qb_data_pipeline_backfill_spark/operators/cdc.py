"""Changelog compaction: latest-state (last-wins upsert) views.

The reference's sinks only append (save_to_raw_*.py; SURVEY.md §2A
#21-23) — replaying a window re-extracts the same entity `id` with a
newer payload, so consumers need "the latest row per id". At 100 TB
the wrong plan is a ROW_NUMBER window (full shuffle + sort of every
historical version); the right plan is ``MAX_BY(row, version)``: a
declarative aggregate with a map-side partial, so each input partition
collapses to one candidate per key BEFORE the exchange, and the
shuffle carries keys, not history. Same shape as the engine's
first-wins dedup (operators/ingest.py min_by), pointed the other way.

Determinism: the version must be a TOTAL order. A timestamp alone
ties under at-least-once delivery; callers pass tiebreak columns and
the operator orders by ``struct(version, *tiebreaks)`` (struct
comparison is lexicographic in both Spark and DuckDB's
``row_number`` ordering, which the oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the values carried by the greatest version.

    ``version_cols`` must totally order each key's changelog (e.g.
    ``["ts", "event_id"]``). Returns key columns + version columns +
    ``value_cols`` (default: all remaining columns), with original
    names.
    """
    if value_cols is None:
        claimed = set(key_cols) | set(version_cols)
        value_cols = [c for c in df.columns if c not in claimed]
    ver = F.struct(*[F.col(c) for c in version_cols])
    payload = F.struct(*[F.col(c) for c in version_cols + value_cols])
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, ver).alias("__last"))
    return agg.select(
        *key_cols, *[F.col(f"__last.{c}").alias(c) for c in version_cols + value_cols]
    )


def changes_between(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Keys whose latest state differs between two compacted snapshots
    (insert/update detection): an anti-join of full rows — appears in
    ``new`` with no identical row in ``old``. Deletes don't exist in
    an append-only changelog; pair with a tombstone column upstream if
    needed."""
    return new.join(old, on=new.columns, how="left_anti")
