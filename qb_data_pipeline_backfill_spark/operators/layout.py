"""Physical table layout for co-located joins: bucketing.

At 100 TB the dominant recurring cost of the fact⋈fact join
(lineitem⋈orders shape) is the shuffle of both sides on the join key —
paid on EVERY query. Bucketing pays it once at write time: both tables
hash-partitioned into the same number of buckets on the key, so the
join planner proves co-partitioning and plans a zero-Exchange
sort-merge join. This is the Spark analog of the co-located layouts
warehouse engines build with distribution keys.

(Parquet bucketing needs the session catalog — `saveAsTable` — because
bucket metadata lives in the metastore, not the files.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two same-bucketed tables — co-partitioned, shuffle-free.

    Spark's default broadcast threshold can hide the effect on small
    test tables (a broadcast join also has no shuffle); callers who
    need to SEE the merge-join shape disable the threshold. The
    correctness contract is just a join; the layout contract is
    asserted by tests/test_layout.py on the physical plan.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def input_bytes(df: DataFrame) -> int:
    """Total bytes of the files feeding ``df``'s scan(s), from the
    optimized plan's file indexes — no data read."""
    plan = df._jdf.queryExecution().optimizedPlan()
    return int(plan.stats().sizeInBytes())


def compaction_partitions(
    df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Partition count that compacts ``df`` into ~``target_file_bytes``
    output files.

    The small-files problem is the quiet killer of 100 TB tables: a
    1000-executor streaming or per-batch append easily leaves millions
    of KB-sized parquet files, and every later scan pays per-file
    open/footer/driver-listing costs. Compaction = rewrite at a
    partition count derived from actual input size, not a guessed
    constant. Uses the optimizer's size estimate (file-index bytes for
    scans), so planning reads no data.
    """
    return max(1, -(-input_bytes(df) // target_file_bytes))


def compact(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Rewrite ``df`` as ~``target_file_bytes`` files at ``path``;
    returns the file count written.

    With ``partition_col``, rows are hash-repartitioned BY that column
    first so each hive-partition directory is written by few tasks —
    otherwise every task appends a file into every directory and the
    file count multiplies back up (tasks × partitions, the classic
    re-fragmentation trap).
    """
    n = compaction_partitions(df, target_file_bytes)
    if partition_col:
        out = df.repartition(n, partition_col)
        out.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    else:
        out = df.repartition(n)
        out.write.mode("overwrite").parquet(path)
    return n
