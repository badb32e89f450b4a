"""Idempotent sinks — anti-join-then-append, Parquet first, JDBC second.

The reference's exporter does check-then-insert: query the target for
already-present ids (an IN-list probe,
save_to_raw_customers_py.py:49-53), drop those rows client-side
(``df[~df['id'].isin(existing_ids)]``, :55), append the rest (:58),
and — a bug we deliberately do NOT replicate — blind-appends the whole
batch on any error (:63-65), risking duplicates.

The Spark-native shape is a LEFT ANTI join against the target's key
projection followed by an append. The anti-join broadcasts whichever
side is small (AQE decides at runtime); the target scan reads only the
key column (column pruning) and only the partitions the batch's
ingest-date range touches. This scales where the reference's
driver-side IN-list (bounded by SQL statement size) cannot.

True transactional exactly-once needs a table format with atomic
commits (Delta/Iceberg `MERGE INTO`) — not available in this image, so
`write_idempotent` documents single-writer discipline instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def new_rows_only(batch: DataFrame, existing_keys: DataFrame, key: str = "id") -> DataFrame:
    """Rows of ``batch`` whose key is not in ``existing_keys`` (op #21)."""
    probe = existing_keys.select(F.col(key)).distinct()
    return batch.join(probe, key, "left_anti")


def write_idempotent(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    key: str = "id",
    partition_by: list[str] | None = None,
) -> int:
    """Append only not-yet-loaded rows to a Parquet target; returns the
    number of rows written.

    Implements the reference's idempotent-load contract (ops #20-#23):
    re-running the same batch inserts 0 rows. Single-writer discipline:
    concurrent writers can still race between the anti-join read and
    the append (the reference has the same race); a transactional
    format (Delta MERGE) is the at-scale answer.
    """
    if _target_exists(spark, target_path):
        existing = spark.read.parquet(target_path).select(key)
        batch = new_rows_only(batch, existing, key)
    # Materialize once: we both count and write. At scale you would
    # skip the count (or read the committed files' row count) — kept
    # here because the reference logs "New records to insert: N".
    batch = batch.persist()
    try:
        n = batch.count()
        if n > 0:
            writer = batch.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(target_path)
        return n
    finally:
        batch.unpersist()


def write_jdbc_idempotent(
    spark: SparkSession,
    batch: DataFrame,
    url: str,
    table: str,
    key: str = "id",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC variant of the idempotent append (reference's actual sink:
    Postgres ``raw.*`` via io_config.yaml:84-91).

    The existing-key probe pushes a key-only projection down to the
    database (Spark JDBC source prunes columns server-side). No JDBC
    database ships in this container, so this is exercised only when a
    reachable ``url`` is configured.
    """
    props = {"driver": "org.postgresql.Driver", **(properties or {})}
    existing = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT {key} FROM {table}) AS existing_keys")
        .options(**props)
        .load()
    )
    new_rows = new_rows_only(batch, existing, key)
    (
        new_rows.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**props)
        .mode("append")
        .save()
    )


def _target_exists(spark: SparkSession, path: str) -> bool:
    # Local-fs fast path; falls back to Hadoop FS for cluster URIs.
    if "://" not in path:
        return os.path.exists(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
