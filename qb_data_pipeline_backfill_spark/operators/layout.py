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
