"""Bloom-filter join pruning, built from declarative DataFrame ops.

The scale pattern: before shuffling a 100 TB fact table into a join,
probe each fact key against a Bloom filter of the (much smaller) dim
key set and drop rows that cannot match. The shuffle then moves only
plausible rows — the same idea as Spark's runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled, measured-and-
rejected globally for this surface in session.py), but as an explicit
operator the caller applies to the one join that needs it.

Construction is pure DataFrame algebra — no driver-side
``df.stat.bloomFilter`` collect, no UDF:

- build: explode each dim key into its k hash positions (xxhash64
  seeded per probe), ``pmod`` into m bits, pack them into 64-bit
  words (``bit_or`` of shifted bits per word index), and aggregate
  into ONE row holding a word→bits map (≤ m/64 entries, broadcast-
  sized by construction).
- probe: broadcast that row and keep fact rows where ALL k bit
  positions test set (``element_at`` + bitwise AND — narrow,
  codegen'd, constant work per probe).

False negatives are impossible (every dim key set exactly the bits
the probe checks) — contract_bloom_prune hash-proves it; false
positives only cost the join some extra rows. On a real cluster you
would size m ~ 8-16 bits per expected dim key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m: int, k: int) -> list[Column]:
    """k seeded hash positions in [0, m) for a key column."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]


def bloom_build(dim: DataFrame, key: str, m: int = 16384, k: int = 4) -> DataFrame:
    """One-row DataFrame: ``bits`` = map<word_index, or'd 64-bit word>
    over every dim key's k hash positions. Two map-side-combined
    aggregates (per-word bit_or, then map assembly); output is ≤ m/64
    entries regardless of dim cardinality."""
    packed = (
        dim.select(F.explode(F.array(*_positions(F.col(key), m, k))).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits_word"))
    )
    return packed.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits_word"))
        ).alias("bits")
    )


def bloom_probe(
    fact: DataFrame, key: str, bloom: DataFrame, m: int = 16384, k: int = 4
) -> DataFrame:
    """Keep fact rows whose key has ALL k hash positions set in the
    broadcast bloom row. Narrow filter — no shuffle of the fact side;
    each probe is one map lookup + bitwise AND."""
    def bit_set(pos: Column) -> Column:
        word = (pos / 64).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        return (
            F.coalesce(F.element_at(F.col("bits"), word), F.lit(0).cast("long"))
            .bitwiseAND(mask)
            != 0
        )

    cond = None
    for p in _positions(F.col(key), m, k):
        c = bit_set(p)
        cond = c if cond is None else (cond & c)
    return fact.crossJoin(F.broadcast(bloom)).filter(cond).drop("bits")
