"""Loading of the driver's synthetic parquet tables.

Tables (see TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per
table under ``/root/testdata/sf{0.001,0.01,0.1}``.

Scans stay declarative (``spark.read.parquet``) so Catalyst pushes
filters and prunes columns into the parquet reader; nothing here
collects or caches eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one synthetic table.

    Works under ANY SparkSession (the driver supplies its own): the
    two correctness-critical SQL confs are runtime-settable, so pin
    them here rather than relying on our session factory.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # UTC so timestamp values collect identically to DuckDB's UTC-naive ones.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet TIMESTAMP(NANOS), rejected by the vectorized
    # reader unless scanned as int64.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (scanned as
        # int64 under nanosAsLong) and as TIMESTAMP(MICROS) without a
        # timezone annotation (inferred as TIMESTAMP_NTZ). Normalize
        # both to TimestampType: with the session pinned to UTC the
        # NTZ→LTZ cast preserves the wall clock and gives the same
        # epoch DuckDB assigns its UTC-naive timestamps, and watermarks
        # / epoch arithmetic require the LTZ type.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` works on it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
