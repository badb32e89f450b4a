"""Hypertable-style continuous aggregate: time-bucketed partials that
roll up to coarser grains WITHOUT re-reading raw data.

The pattern (TimescaleDB's continuous aggregates, Druid's rollup
segments): aggregate raw rows ONCE into fine-grain buckets carrying
*algebraic partials* — count, decimal sum, min, max — then derive
every coarser grain by re-aggregating the partials (sum of counts,
sum of sums, min of mins, max of maxes). Averages finalize as
sum/count. At 100 TB this is the difference between scanning the
fact table per dashboard grain and scanning it once: hourly partials
of a per-second event stream are ~3600× smaller, and the daily /
monthly rollups read only those.

Correctness hinges on the partials being associative and
order-insensitive: counts/min/max trivially are; double sums are NOT
(float addition reorders under partitioning), so sums accumulate as
``DECIMAL(18,6)`` — exact, associative, overflow-safe to ~1e12 per
value with Spark widening the accumulator per level (18→28→38
digits: finalize within two rollup levels or re-cast between).
``hypertable_rollup_daily`` in ``plans.analytics`` hash-proves the
equivalence: hourly→daily rollup must match DuckDB's direct daily
aggregate bit-for-bit.

Each level is one shuffle on (bucket, keys) with map-side partial
aggregation, and each level's input is the previous level's (already
tiny) output — the plan a 1000-executor cluster wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(col: Column | str, grain_seconds: int) -> Column:
    """Truncate a timestamp to its containing fixed-width bucket
    (UTC-anchored epoch multiple), returned as a timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    epoch = F.floor(c.cast("double") / F.lit(float(grain_seconds)))
    return F.timestamp_seconds(epoch.cast("long") * F.lit(grain_seconds))


def continuous_aggregate(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    values: list[str],
    grain_seconds: int,
) -> DataFrame:
    """Raw rows -> fine-grain partials.

    Output: ``bucket`` (timestamp), ``*keys``, ``n_rows``, and per
    value column ``sum_<v>`` (DECIMAL), ``min_<v>``, ``max_<v>``.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for v in values:
        aggs += [
            F.sum(F.col(v).cast("decimal(18,6)")).alias(f"sum_{v}"),
            F.min(v).alias(f"min_{v}"),
            F.max(v).alias(f"max_{v}"),
        ]
    return (
        df.withColumn("bucket", time_bucket(time_col, grain_seconds))
        .groupBy("bucket", *keys)
        .agg(*aggs)
    )


def rollup(
    partials: DataFrame,
    keys: list[str],
    values: list[str],
    grain_seconds: int,
) -> DataFrame:
    """Partials -> coarser partials, same shape, raw data untouched."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for v in values:
        aggs += [
            F.sum(f"sum_{v}").alias(f"sum_{v}"),
            F.min(f"min_{v}").alias(f"min_{v}"),
            F.max(f"max_{v}").alias(f"max_{v}"),
        ]
    return (
        partials.withColumn("bucket", time_bucket("bucket", grain_seconds))
        .groupBy("bucket", *keys)
        .agg(*aggs)
    )


def finalize(partials: DataFrame, keys: list[str], values: list[str]) -> DataFrame:
    """Partials -> presentation row: rounded sum/avg, min/max, count."""
    cols = [F.col("bucket"), *[F.col(k) for k in keys], F.col("n_rows")]
    for v in values:
        s = F.col(f"sum_{v}")
        # Mean via exact micro-unit integer division (functions.numeric
        # rationale): dividing the decimal sum as a double and rounding
        # flips against DuckDB on half boundaries (Spark rounds the
        # shortest-decimal string, DuckDB the binary value).
        micro = (s * F.lit(10**6)).cast("decimal(38,0)")
        div = (F.col("n_rows") * F.lit(100)).cast("decimal(38,0)")
        avg = ((micro - F.pmod(micro, div)) / div).cast("long") / F.lit(1e4)
        cols += [
            F.round(s, 2).cast("double").alias(f"sum_{v}"),
            avg.alias(f"avg_{v}"),
            F.col(f"min_{v}"),
            F.col(f"max_{v}"),
        ]
    return partials.select(*cols)
