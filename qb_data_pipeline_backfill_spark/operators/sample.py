"""Deterministic, reproducible sampling for training-data curation.

A 100 TB corpus pipeline needs samples that are (a) reproducible
across runs and engines (no RNG state, no partition-order
dependence), (b) computable in a single narrow pass (no shuffle, no
global sort, no count-first), and (c) stable under re-partitioning —
the same ROW always lands in the same sample/split. ``rand()`` /
``df.sample`` give none of that; hashing the row's key gives all of
it. This is the standard "salted hash-mod" split used to carve
train/val/test from web-scale corpora.

Mechanism: ``md5(key)`` → take the first 8 hex chars → compare
against a precomputed fixed-width hex threshold. Because both Spark
and DuckDB emit lowercase fixed-width hex, LEXICOGRAPHIC order on the
prefix equals numeric order on the 32-bit value, so a plain string
``<`` is an engine-neutral uniform-[0,1) test — no integer
conversion, no float division, no rounding to diverge on. A
``fraction`` maps to threshold ``hex32(floor(fraction * 2^32))``.

All helpers are pure Column expressions: they fuse into the scan's
WholeStageCodegen, push no shuffle, and the same expressions render
to ANSI SQL for the DuckDB oracles (see ``plans/llm.py`` sample_*
queries — full hash gate, not rows-only, precisely because the
sample membership is engine-independent).

The reference has no sampling surface (its batches are API pages,
SURVEY.md §2A#1); this extends the engine for the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT_SEP = "|"


def threshold_hex(fraction: float) -> str:
    """Fixed-width lowercase hex threshold for a [0,1] fraction.

    hash_prefix(key) < threshold_hex(f) keeps ~f of all keys.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def hash_prefix(cols: list[str | Column], salt: str = "") -> Column:
    """First 8 hex chars of md5 over the salted, '|'-joined key.

    The salt decorrelates independent samples drawn from the same key
    (e.g. a 10% eval sample vs an 80/10/10 split): different salts →
    independent hash streams.
    """
    parts = [F.lit(salt)] + [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.substring(F.md5(F.concat_ws(_SALT_SEP, *parts)), 1, 8)


def hash_prefix_sql(cols: list[str], salt: str = "") -> str:
    """The DuckDB rendering of :func:`hash_prefix` — identical bytes in,
    identical lowercase hex out."""
    parts = [f"'{salt}'"] + [f"CAST({c} AS VARCHAR)" for c in cols]
    return f"substring(md5(concat_ws('{_SALT_SEP}', {', '.join(parts)})), 1, 8)"


def deterministic_sample(
    df: DataFrame, cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    across runs, engines, and partitionings; pure narrow filter."""
    return df.filter(hash_prefix(cols, salt) < F.lit(threshold_hex(fraction)))


def split_assignments(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(label, upper-threshold-hex) pairs from cumulative weights.

    Weights must sum to ~1; the last bucket absorbs rounding so every
    row gets exactly one label.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out, cum = [], 0.0
    for label, w in weights.items():
        cum += w
        out.append((label, threshold_hex(min(cum, 1.0))))
    # The last bucket is the unconditional ELSE in both renderings, so
    # its threshold is never compared — every row gets a label even at
    # the top of the hash range.
    return out


def split_column(
    cols: list[str], weights: dict[str, float], salt: str = ""
) -> Column:
    """A label column assigning each row to one split (train/val/...).

    Same row → same split, always; independent of partitioning and of
    any other sample drawn with a different salt.
    """
    h = hash_prefix(cols, salt)
    expr: Column | None = None
    for label, hi in reversed(split_assignments(weights)):
        expr = (
            F.lit(label)
            if expr is None
            else F.when(h < F.lit(hi), F.lit(label)).otherwise(expr)
        )
    return expr


def split_column_sql(cols: list[str], weights: dict[str, float], salt: str = "") -> str:
    """DuckDB CASE expression equivalent to :func:`split_column`."""
    h = hash_prefix_sql(cols, salt)
    pairs = split_assignments(weights)
    whens = " ".join(
        f"WHEN {h} < '{hi}' THEN '{label}'" for label, hi in pairs[:-1]
    )
    return f"CASE {whens} ELSE '{pairs[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (downsample boilerplate
    strata, keep rare ones) — the corpus-rebalancing primitive.

    One narrow filter; the per-stratum threshold is a CASE over the
    stratum value, so no join and no shuffle regardless of how many
    strata there are (for open-ended strata maps, broadcast-join a
    thresholds dim instead).
    """
    h = hash_prefix(key_cols, salt)
    thr: Column = F.lit(threshold_hex(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(h < thr)


def stratified_threshold_sql(
    stratum_col: str, fractions: dict[str, float], default_fraction: float = 0.0
) -> str:
    """DuckDB CASE expression for the per-stratum threshold."""
    whens = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN '{threshold_hex(f)}'"
        for v, f in fractions.items()
    )
    return f"CASE {whens} ELSE '{threshold_hex(default_fraction)}' END"
