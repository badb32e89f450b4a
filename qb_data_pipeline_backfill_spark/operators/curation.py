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


# --------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# --------------------------------------------------------------------------
# The published successor to classifier-based quality filtering
# ("Data Selection for Language Models via Importance Resampling",
# NeurIPS 2023): estimate two bag-of-hashed-n-grams models — p̂ from a
# small TARGET corpus (the distribution you want more of) and q̂ from
# the RAW pool — and weight every raw document by its log importance
# ratio  log w(x) = Σ_f count_x(f) · (ln p̂[f] − ln q̂[f]),  then keep
# the top-k (the paper resamples with Gumbel noise; deterministic
# top-k is its temperature→0 limit, and adding a hash-derived Gumbel
# term is a one-line change orthogonal to the plan shape).
#
# Unlike the fastText-shape classifier (operators/text.py), whose
# weights are pinned, DSIR's model IS estimated from the data — so the
# plan has two corpus passes by construction:
#
#   fit:    explode n-gram buckets → ONE map-side-combined aggregate
#           on a ``n_buckets``-cardinality key (metadata-sized result
#           regardless of corpus size; target counts ride the same
#           pass as a conditional sum — the target corpus is a flagged
#           slice, never a second scan);
#   λ:      the per-bucket log-ratio table — ``n_buckets`` rows, the
#           MODEL ARTIFACT. It comes to the driver exactly like the
#           BPE merge table does (bounded at n_buckets, never grows
#           with data) and is re-shipped as a literal array, so
#   score:  one narrow codegen projection (tokens → hashes → bucket
#           ids → element_at fold-sum) — no shuffle, no UDF, no join;
#   select: TakeOrderedAndProject top-k — per-partition heads, k·P
#           rows to the driver, never a global sort.
#
# All weight arithmetic is exact BIGINT micro-units: the one
# transcendental per bucket (ln of a single exactly-computed integer
# ratio) is quantized to integers at the λ table — per-document sums
# are order-free integer additions, the drift_psi determinism recipe.
# Laplace(+1) smoothing keeps every bucket finite; a bucket never seen
# in either corpus gets lr = ln((raw_tot+B)/(tgt_tot+B)) — the prior
# odds — and a document of unseen grams scores the prior, not zero.

from qb_data_pipeline_backfill_spark.operators.text import (  # noqa: E402
    CLS_HASH_MOD,
    _char_fold_hash,
    _CLS_PAIR_MIX,
)

DSIR_BUCKETS = 1024


def dsir_bucket_features(
    text_col: Column | str = "text", n_buckets: int = DSIR_BUCKETS
) -> Column:
    """Hashed unigram+bigram bucket ids of the whitespace tokens, as
    one ``array<bigint>`` — the paper's hashed n-gram featurization,
    sharing the engine-pair-verified char-fold hash and bigram mix of
    the quality classifier so both models see identical features."""
    toks = tokens(text_col)
    hs = F.transform(toks, _char_fold_hash)
    n = F.size(hs)
    uni = F.transform(hs, lambda h: h % n_buckets)
    bi = F.zip_with(
        F.slice(hs, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(hs, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: ((a * _CLS_PAIR_MIX + b) % CLS_HASH_MOD) % n_buckets,
    )
    return F.concat(uni, bi)


def dsir_fit(
    df: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Estimate the λ table: ``(bucket, raw_n, tgt_n, lr_micro)`` over
    all ``n_buckets`` buckets (a dense spine — scoring may look up any
    bucket).

    ``lr_micro = round(1e6 · ln(p̂/q̂))`` with Laplace(+1)-smoothed
    ``p̂ = (tgt_n+1)/(tgt_tot+B)``, ``q̂ = (raw_n+1)/(raw_tot+B)``; the
    ratio is composed as ONE division of two exactly-representable
    integer products — ``(tgt_n+1)·(raw_tot+B) / (raw_n+1)·(tgt_tot+B)``
    — so both engines feed ``ln`` the identical double.

    One explode + one map-side-combined aggregate over the corpus;
    everything after is ≤ ``n_buckets`` rows (spine join and totals
    are broadcasts of metadata-sized relations).
    """
    spark = df.sparkSession
    feats = df.select(
        target.alias("_t"),
        F.explode(dsir_bucket_features(text_col, n_buckets)).alias("bucket"),
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("tgt_n"),
    )
    tot = counts.agg(
        F.coalesce(F.sum("raw_n"), F.lit(0)).alias("_raw_tot"),
        F.coalesce(F.sum("tgt_n"), F.lit(0)).alias("_tgt_tot"),
    )
    spine = spark.range(n_buckets).withColumnRenamed("id", "bucket")
    b = F.lit(n_buckets).cast("long")
    raw_n = F.coalesce("raw_n", F.lit(0)).cast("long")
    tgt_n = F.coalesce("tgt_n", F.lit(0)).cast("long")
    num = ((tgt_n + 1) * (F.col("_raw_tot") + b)).cast("double")
    den = ((raw_n + 1) * (F.col("_tgt_tot") + b)).cast("double")
    return (
        spine.join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            raw_n.alias("raw_n"),
            tgt_n.alias("tgt_n"),
            F.round(F.log(num / den) * F.lit(1e6), 0)
            .cast("long")
            .alias("lr_micro"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    lr_by_bucket: list[int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a fitted λ table (``lr_by_bucket``:
    the ``n_buckets``-long list of ``lr_micro``, bucket-indexed — the
    driver-side model artifact from :func:`dsir_fit`).

    Returns ``(id_col, n_feats, logw_micro)`` as ONE narrow codegen
    projection: bucket ids fold through ``element_at`` on the literal
    weight array — no shuffle, no UDF, no join. An empty document
    scores 0 with 0 features.
    """
    # One parsed literal array instead of F.lit(list) — pyspark's list
    # path issues one py4j `lit` call PER ELEMENT (n_buckets=1024 round
    # trips ≈ 1.2 s of measured driver latency per scored plan); the
    # parsed form is the identical integer array literal in one call.
    arr = F.expr(
        "array(" + ",".join(str(int(x)) for x in lr_by_bucket) + ")"
    )
    bs = dsir_bucket_features(text_col, len(lr_by_bucket))
    logw = F.aggregate(
        bs,
        F.lit(0).cast("long"),
        lambda acc, bkt: acc
        + F.element_at(arr, (bkt + 1).cast("int")).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.size(bs).cast("long").alias("n_feats"),
        logw.alias("logw_micro"),
    )


def dsir_fit_weights(
    df: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> list[int]:
    """Fit and collect the λ table as the bucket-indexed weight list
    :func:`dsir_log_weights` consumes — the driver-side model
    artifact, shared by the batch selector and the streaming scorer
    so bucket-count and assembly can never drift apart (review r12).
    """
    lam = dsir_fit(df, target, text_col=text_col, n_buckets=n_buckets)
    lr = [0] * n_buckets
    for r in lam.select("bucket", "lr_micro").collect():
        lr[r["bucket"]] = int(r["lr_micro"])
    return lr


def dsir_select_topk(
    df: DataFrame,
    target: Column,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Fit on the flagged corpus, score every document, keep the top-k
    by importance weight (ties broken by ``id_col`` — a total order, so
    the selection is deterministic on both engines).

    The λ collect is bounded at ``n_buckets`` rows whatever the corpus
    size (the model artifact, same driver contract as the BPE merge
    table); selection is ``TakeOrderedAndProject`` — per-partition
    top-k heads merged on the driver, never a corpus-wide sort.
    """
    lr = dsir_fit_weights(
        df, target, text_col=text_col, n_buckets=n_buckets
    )
    scored = dsir_log_weights(df, lr, id_col=id_col, text_col=text_col)
    return scored.orderBy(
        F.desc("logw_micro"), F.asc(id_col)
    ).limit(int(k))


def budget_fill(
    df: DataFrame,
    *,
    budget: int,
    score: Column,
    tok: Column,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked token-budget selection: within each group, keep
    documents in (score desc, id asc) order while the running token
    total stays ≤ ``budget`` — the "fill the training budget with the
    best documents first" curation step (GPT-3/LLaMA-style quality
    buckets with a fixed token allowance per language/domain).

    The running total is over ALL ranked rows (monotone
    nondecreasing), so ``cum_tok <= budget`` selects exactly the
    maximal prefix — a document that overflows the budget also blocks
    everything behind it, which keeps the rule order-stable and
    engine-replayable (no knapsack backfilling).

    Scale: one cumulative-sum window per group — each group
    serializes through one task, fine while groups are
    language/domain-grained and bounded. When a single group is
    corpus-sized, production switches to the two-pass threshold form
    (aggregate a score quantile at the budget point, then a narrow
    filter — percentile_band_filter's shape) and trades exactness at
    the boundary for full parallelism; this operator is the exact
    variant that also serves as its oracle.
    """
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.coalesce(tok.cast("long"), F.lit(0)).alias("tok"),
        score.cast("long").alias("score_micro"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ranked.withColumn(
        "cum_tok", F.sum("tok").over(w)
    ).filter(F.col("cum_tok") <= int(budget))


def budget_fill_scalable(
    df: DataFrame,
    *,
    budget: int,
    score: Column,
    tok: Column,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB form of :func:`budget_fill` — SAME selected set,
    no corpus-wide window. Two passes:

    REQUIRES A QUANTIZED RANKING KEY: the level table is bounded by
    DISTINCT scores, so feed a bucketed score (e.g. micro-units
    floored to 1e4) — a raw per-document-unique score degenerates the
    level table back to corpus size and with it the level window.
    Production threshold selection quantizes for exactly this reason;
    the boundary-repair step is what keeps the result EXACT anyway
    (the coarser the buckets, the more work moves to step 2).

    1. aggregate tokens per (group, score) — map-side combinable,
       bounded by distinct scores — and run the cumulative window
       over THAT table (thousands of rows, not the corpus):
       score levels whose running total fits the budget are kept
       wholesale; the single BOUNDARY level per group (the first
       whose total overflows) carries its remaining budget;
    2. only boundary-level documents (one score level per group)
       window among themselves in id order to fill the remainder —
       the quota_cap exact-repair pattern.

    The maximal-prefix semantics are preserved exactly: ordering by
    (score desc, id) first exhausts whole score levels, and the
    within-level prefix is what step 2 computes. Certified by
    `contract_budget_fill_scale`, whose oracle IS the exact
    single-window replay — the two algorithms must agree row for row.
    """
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        F.coalesce(tok.cast("long"), F.lit(0)).alias("tok"),
        score.cast("long").alias("score_micro"),
    )
    levels = scored.groupBy(group_col, "score_micro").agg(
        F.sum("tok").alias("level_tok")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("score_micro"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = levels.withColumn("cum", F.sum("level_tok").over(w))
    b = F.lit(int(budget)).cast("long")
    keep_levels = cum.filter(F.col("cum") <= b).select(
        group_col, "score_micro"
    )
    boundary = cum.filter(
        (F.col("cum") > b) & (F.col("cum") - F.col("level_tok") <= b)
    ).select(
        group_col,
        F.col("score_micro").alias("__bscore"),
        (b - (F.col("cum") - F.col("level_tok"))).alias("__remaining"),
        (F.col("cum") - F.col("level_tok")).alias("__prev_cum"),
    )
    # every join below matches NULL group/score levels too (eqNullSafe
    # — groupBy and window partitioning treat NULL as a real group, so
    # plain column joins would silently drop those rows from the
    # selection while the exact window form keeps them; review r12)
    kl = keep_levels.select(
        F.col(group_col).alias("__kg"), F.col("score_micro").alias("__ks")
    )
    whole = scored.join(
        kl,
        F.col(group_col).eqNullSafe(F.col("__kg"))
        & F.col("score_micro").eqNullSafe(F.col("__ks")),
        "left_semi",
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bnd = boundary.withColumnRenamed(group_col, "__bg")
    partial = (
        scored.join(
            F.broadcast(bnd), F.col(group_col).eqNullSafe(F.col("__bg"))
        )
        .filter(F.col("score_micro").eqNullSafe(F.col("__bscore")))
        .withColumn("__run", F.sum("tok").over(wb))
        .filter(F.col("__run") <= F.col("__remaining"))
        .select(
            id_col,
            group_col,
            "tok",
            "score_micro",
            (F.col("__prev_cum") + F.col("__run")).alias("cum_tok"),
        )
    )
    # rebuild the exact-window cum_tok so both forms return identical
    # rows: cum at the level's START (from the bounded level table) +
    # a running total WITHIN the level (partitioned by (group, score)
    # — fine-grained, parallel; never a per-group corpus window)
    level_start = cum.select(
        group_col,
        "score_micro",
        (F.col("cum") - F.col("level_tok")).alias("__start"),
    )
    w_in = (
        Window.partitionBy(group_col, "score_micro")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ls = level_start.select(
        F.col(group_col).alias("__lg"),
        F.col("score_micro").alias("__ls"),
        "__start",
    )
    whole_rows = (
        whole.join(
            ls,
            F.col(group_col).eqNullSafe(F.col("__lg"))
            & F.col("score_micro").eqNullSafe(F.col("__ls")),
        )
        .withColumn(
            "cum_tok", F.col("__start") + F.sum("tok").over(w_in)
        )
    )
    return whole_rows.select(
        id_col, group_col, "tok", "score_micro", "cum_tok"
    ).unionByName(partial)
