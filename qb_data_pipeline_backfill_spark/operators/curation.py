"""Corpus-curation operators: chunking, packing, vocabulary building,
percentile-band filtering.

These are the training-data preparation steps downstream of cleaning
and dedup: split documents into model-window-sized chunks, pack
variable-length documents into fixed token budgets, build a pruned
token vocabulary, and filter outlier documents by score percentiles.
The reference pipeline stops at landing raw JSON (SURVEY.md §0); at
100 TB these four are the steps that turn a deduplicated corpus into
trainable shards.

Scale notes per operator:

- ``chunk_documents`` is narrow (sequence+explode inside codegen, no
  shuffle): each task chunks its own documents.
- ``pack_greedy`` windows over a PARTITION key (e.g. language/shard),
  never globally — each shard packs in parallel, which is also how a
  real pipeline assigns pack bins (per output shard). A global pack
  order at 100 TB would serialize the corpus through one task.
- ``build_vocab`` shuffles once on term (map-side combined count);
  the id-assignment window runs over the POST-aggregation vocabulary
  (|V| rows, orders of magnitude smaller than the corpus), which is
  the standard and acceptable single-partition step.
- ``percentile_band_filter`` reduces the score column to two scalar
  thresholds in one aggregate, then broadcasts them back — no global
  sort, no window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.operators.text import (
    bpe_ish_token_count,
    tokens,
)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 400,
    overlap: int = 100,
) -> DataFrame:
    """Split each document into ``size``-char chunks whose starts are
    ``size - overlap`` apart (sliding with overlap).

    Pure narrow plan: ``sequence`` generates the chunk starts,
    ``explode`` fans them out, ``substring`` slices — all inside
    whole-stage codegen, zero shuffles, so chunking parallelizes with
    the scan. Emits the chunk hash + length (what a dedup or shard
    writer keys on) rather than the text itself to keep the row narrow.

    Documents shorter than ``size`` yield one chunk; empty documents
    yield none.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    length = F.length(F.col(text_col))
    starts = F.when(
        length >= 1, F.sequence(F.lit(0), length - 1, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), F.col(text_col), starts.alias("__starts"))
        .select(
            F.col(id_col),
            F.posexplode("__starts").alias("chunk_id", "chunk_start"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.length(
                F.substring(F.col(text_col), F.col("chunk_start") + 1, size)
            ).cast("long").alias("chunk_chars"),
            F.md5(
                F.substring(F.col(text_col), F.col("chunk_start") + 1, size)
            ).alias("chunk_hash"),
        )
    )


def pack_greedy(
    df: DataFrame,
    size_col: Column,
    budget: int,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Assign rows to contiguous bins of ~``budget`` total size within
    each partition key (the sequence-packing step before writing
    training shards).

    Deterministic spec: rows are taken in ``order_col`` order within
    ``partition_col``; a row lands in bin ``floor(exclusive_running_sum
    / budget)`` — the streaming-fill packing a single-pass shard writer
    produces. The window partitions by the shard key, so every shard
    packs in parallel; there is no global window.

    ``order_col`` must be UNIQUE within each partition: with ties the
    running sum depends on which tied row the sort emits first, so bin
    assignment would silently vary across partitionings/runs —
    unacceptable for a reproducible shard layout. Duplicates raise at
    execution time (``raise_error`` naming the offending key). The tie
    probe is a ``lag`` over the SAME window sort the running sum uses,
    so the check costs no extra shuffle or pass at any scale.
    """
    w_order = Window.partitionBy(partition_col).orderBy(order_col)
    w = w_order.rowsBetween(Window.unboundedPreceding, -1)
    cum_excl = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    is_dup = (F.row_number().over(w_order) > 1) & F.lag(
        F.col(order_col)
    ).over(w_order).eqNullSafe(F.col(order_col))
    pack_bin = F.when(
        is_dup,
        F.raise_error(
            F.concat(
                F.lit(
                    "pack_greedy: duplicate order_col value within a "
                    "partition — bin assignment would be "
                    "nondeterministic; pass a unique ordering key "
                    "(offending partition="
                ),
                F.col(partition_col).cast("string"),
                F.lit(f", {order_col}="),
                F.col(order_col).cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(F.floor(cum_excl / F.lit(budget)))
    return df.withColumn("__size", size_col).withColumn("pack_bin", pack_bin)


def pack_summary(packed: DataFrame, partition_col: str) -> DataFrame:
    """Roll a packed frame up to one row per (partition, bin): item
    count and total size — the manifest a shard writer emits."""
    return packed.groupBy(partition_col, "pack_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__size").cast("long").alias("total_tokens"),
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Corpus vocabulary with contiguous ids: term -> (term_id, n).

    One shuffle: explode tokens and count per term (map-side combined).
    Terms below ``min_count`` are pruned BEFORE id assignment, then ids
    are assigned by (count DESC, term) via a window over the
    aggregated vocabulary — |V| rows, not corpus rows, so the
    single-partition id pass is bounded by vocabulary size (the same
    shape every tokenizer trainer uses).
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    return counts.select(
        "term", F.row_number().over(w).cast("long").alias("term_id"), "n"
    )


def percentile_band_filter(
    df: DataFrame,
    score: Column,
    lo: float = 0.1,
    hi: float = 0.9,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose score lies within the [lo, hi] percentile band
    of the corpus (the outlier trim before training: drop the shortest
    and longest/degenerate tails).

    ``percentile_disc`` thresholds (exact, element-selecting — no
    interpolation arithmetic to disagree across engines) are computed
    in ONE aggregate reduced to a single row, broadcast back, and the
    filter stays a narrow scan — no global sort or corpus-wide window.
    """
    scored = df.select(F.col(id_col), score.alias("score"))
    bounds = scored.agg(
        F.expr(f"percentile_disc({lo}) WITHIN GROUP (ORDER BY score)").alias("__lo"),
        F.expr(f"percentile_disc({hi}) WITHIN GROUP (ORDER BY score)").alias("__hi"),
    )
    return (
        scored.crossJoin(F.broadcast(bounds))
        .filter((F.col("score") >= F.col("__lo")) & (F.col("score") <= F.col("__hi")))
        .select(id_col, "score")
    )


def doc_token_count(text_col: str = "text") -> Column:
    """BPE-ish token count column (shared with text.token_stats)."""
    return bpe_ish_token_count(text_col).cast("long")
