"""Z-order (Morton) clustering: multi-dimensional data layout.

Partition/sort layout can serve ONE predicate column well (range
partitioning, ``operators/layout.py``); queries that filter on TWO or
more columns need a space-filling curve so that every file holds a
small rectangle of the key space and parquet footer min/max stats
prune on ALL dimensions at once. This is the layout move behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here as a plain expression +
repartitionByRange, no table format required.

The z-value is built as a static expression tree (shift/AND/OR per
bit — whole-stage codegen, no UDF, no HOF). ``zorder_sql`` renders
the IDENTICAL arithmetic as ANSI SQL so an oracle can replay it
bit-for-bit.

100 TB posture: ``cluster_by_zorder`` is one range-repartition on the
z-value (sampled range boundaries — balanced output files regardless
of key skew) plus an in-partition sort that feeds parquet row-group
stats. Cost is one shuffle of the data being laid out — the same
price as any compaction pass — and reads thereafter prune files on
every z-ordered dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of k non-negative int columns.

    Caller guarantees each value fits in ``bits`` bits (bucket or rank
    wider domains first); k * bits must stay < 63. Bit j of column i
    lands at position j*k + i, so the result orders rows along the
    Morton curve of the joint key space.
    """
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflow a signed 64-bit key")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return out


def zorder_sql(cols: list[str], bits: int = 21) -> str:
    """The identical interleave as an ANSI SQL expression (oracle twin)."""
    k = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 21
) -> DataFrame:
    """Lay ``df`` out along the Morton curve of ``cols``.

    Range-repartition on the z-value (balanced files under skew, since
    boundaries come from sampling) then sort within each partition so
    parquet row-group min/max stats are tight on every dimension.
    """
    z = zvalue(cols, bits=bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
