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

HASH DOMAIN VERSION 2 — upgrade note. The NULL marker and '|'/
backslash escaping (below) changed the hash input bytes for any
multi-column or NULL-able key, so split/sample membership computed by
version 1 (no escaping) does NOT match version 2 for such keys.
Split stability across runs is this module's core contract: a corpus
whose splits were MATERIALIZED under version 1 must be re-split in
full, never mixed with version-2 assignments (a mixed corpus leaks
eval rows into train). Single-column non-NULL string keys without
'|' or '\\' — e.g. the doc_id splits every registered query uses —
hash identically in both versions and need no action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bump when the bytes fed to md5 change (key escaping, separator,
# marker): consumers persisting split assignments should record this
# and rebuild materialized splits on mismatch.
HASH_DOMAIN_VERSION = 2

_SALT_SEP = "|"

# NULL marker and escaping for the '|'-joined hash key: without them,
# concat_ws SKIPS null parts and '|' inside a value shifts field
# boundaries, so distinct keys like ('x|y','z') / ('x','y|z') — or a
# NULL vs an absent field — would collide into one hash and be
# perfectly correlated in every sample (r7 review).
_NULL_MARK = "\\N"


def _escaped(c: Column) -> Column:
    esc = F.replace(
        F.replace(c.cast("string"), F.lit("\\"), F.lit("\\\\")),
        F.lit(_SALT_SEP),
        F.lit("\\" + _SALT_SEP),
    )
    return F.coalesce(esc, F.lit(_NULL_MARK))


def _escaped_sql(c: str) -> str:
    return (
        "coalesce(replace(replace(CAST(" + c + " AS VARCHAR), "
        "'\\', '\\\\'), '|', '\\|'), '\\N')"
    )


def _q(v) -> str:
    """Single-quote-escape a value for embedding in a SQL literal."""
    return str(v).replace("'", "''")


def _join_group(left: DataFrame, right: DataFrame, group_col: str) -> DataFrame:
    """Broadcast join on the group column that also matches NULL
    groups (a plain column join drops them — r7 review: rows with a
    NULL domain silently vanished from the sampled output while still
    counting in the rate denominators)."""
    r = right.withColumnRenamed(group_col, "__grp")
    return left.join(
        F.broadcast(r), left[group_col].eqNullSafe(F.col("__grp"))
    ).drop("__grp")


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
        _escaped(F.col(c) if isinstance(c, str) else c) for c in cols
    ]
    return F.substring(F.md5(F.concat_ws(_SALT_SEP, *parts)), 1, 8)


def hash_prefix_sql(cols: list[str], salt: str = "") -> str:
    """The DuckDB rendering of :func:`hash_prefix` — identical bytes in,
    identical lowercase hex out."""
    parts = [f"'{_q(salt)}'"] + [_escaped_sql(c) for c in cols]
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
        f"WHEN {h} < '{hi}' THEN '{_q(label)}'" for label, hi in pairs[:-1]
    )
    return f"CASE {whens} ELSE '{_q(pairs[-1][0])}' END"


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
        f"WHEN {stratum_col} = '{_q(v)}' THEN '{threshold_hex(f)}'"
        for v, f in fractions.items()
    )
    return f"CASE {whens} ELSE '{threshold_hex(default_fraction)}' END"


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    target_rows: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture rebalancing at T=2 (α=1/2): sample
    each group at a rate ∝ sqrt(n_g)/n_g, the standard multilingual-
    corpus upweighting of low-resource groups (mT5-style; α=1 is
    proportional, α→0 is uniform-over-groups — sqrt is the common
    middle).

    Unlike :func:`stratified_sample`, the per-group rates are computed
    FROM the data, distributed: one count aggregate over the group
    key, floor(sqrt) + integer divisions ONLY — every engine computes
    bit-identical thresholds (IEEE sqrt is correctly rounded, so
    floor(sqrt(bigint)) is exact; no pow(), whose last-ulp behavior is
    libm-specific). Group g with n_g rows gets
    ``t_g = target_rows * isqrt(n_g) // Σ isqrt`` kept rows (expected),
    via hash threshold ``min(2^32-1, t_g * 2^32 // n_g)``.

    Plan shape: narrow scan + one small aggregate + broadcast join of
    the per-group threshold dim + narrow filter. No data-sized shuffle.
    """
    if not 0 < target_rows < 2**30:
        raise ValueError(f"target_rows must be in (0, 2^30), got {target_rows}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    sqrts = counts.withColumn("__s", F.floor(F.sqrt("__n")).cast("long"))
    tot = sqrts.agg(F.sum("__s").alias("__sum"))
    rates = (
        sqrts.crossJoin(F.broadcast(tot))
        .withColumn("__t", F.expr(f"(CAST({target_rows} AS BIGINT) * __s) div __sum"))
        .withColumn(
            "__R",
            F.least(F.lit(2**32 - 1).cast("long"), F.expr("(__t * 4294967296) div __n")),
        )
        .withColumn("__thr", F.lower(F.lpad(F.hex("__R"), 8, "0")))
        .select(group_col, "__thr")
    )
    return (
        _join_group(df, rates, group_col)
        .filter(hash_prefix(key_cols, salt) < F.col("__thr"))
        .drop("__thr")
    )


def temperature_mixture_sql(
    table: str, group_col: str, key_cols: list[str], target_rows: int, salt: str = ""
) -> str:
    """DuckDB rendering of :func:`temperature_mixture_sample`'s
    membership predicate (same integer arithmetic, same hex compare).
    Returns a full SELECT of the kept rows' ``key_cols + group_col``."""
    h = hash_prefix_sql(key_cols, salt)
    keys = ", ".join(key_cols)
    return f"""
    WITH c AS (SELECT {group_col}, COUNT(*) AS n FROM {table} GROUP BY {group_col}),
    s AS (SELECT {group_col}, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS sg FROM c),
    tot AS (SELECT SUM(sg) AS S FROM s),
    r AS (SELECT {group_col}, n, (CAST({target_rows} AS BIGINT) * sg) // S AS t FROM s, tot),
    h AS (SELECT {group_col},
                 lower(lpad(to_hex(LEAST(4294967295, (t * 4294967296) // n)), 8, '0')) AS thr
          FROM r)
    SELECT d.{keys}, d.{group_col}
    FROM {table} d JOIN h ON d.{group_col} IS NOT DISTINCT FROM h.{group_col}
    WHERE {h} < h.thr
    """


def quota_cap(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    cap: int,
    salt: str = "",
    prefilter_factor: float | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the members with the
    smallest key hashes (ties broken by key), so the selection is
    deterministic across runs, engines, and partitionings. The
    per-domain/per-source quota primitive of corpus curation.

    The exact path is one window (shuffle on ``group_col`` + per-group
    sort). At 100 TB a boilerplate-heavy group lands on ONE reducer;
    ``prefilter_factor`` adds the scale fix: first keep only rows whose
    hash falls under ``cap * factor / n_g`` (broadcast threshold dim —
    narrow filter, expected survivors ≈ cap·factor per group), then
    run the exact window on the survivors. Because the prefilter could
    in principle cut below the cap-th smallest hash, groups whose
    survivor count came in under ``min(cap, n_g)`` are detected and
    REPAIRED through the exact path — opportunistic pruning, certified
    equal to the exact result (pytest asserts equality even with an
    absurdly small factor).
    """
    from pyspark.sql import Window

    h = hash_prefix(key_cols, salt)
    order = [h.asc()] + [F.col(c).asc() for c in key_cols]
    w = Window.partitionBy(group_col).orderBy(*order)

    def exact(d: DataFrame) -> DataFrame:
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )

    if prefilter_factor is None:
        return exact(df)

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    rates = (
        counts.withColumn(
            "__R",
            F.least(
                F.lit(2**32 - 1).cast("long"),
                F.expr(
                    f"(CAST({int(cap * prefilter_factor)} AS BIGINT)"
                    " * 4294967296) div __n"
                ),
            ),
        )
        .withColumn("__thr", F.lower(F.lpad(F.hex("__R"), 8, "0")))
        .select(group_col, "__thr", "__n")
    )
    pruned = _join_group(df, rates, group_col).filter(h < F.col("__thr"))
    # Repair: a group is safe iff the prune kept >= min(cap, n_g) rows
    # (then the cap smallest hashes all survived). Unsafe groups redo
    # the exact path on their full row set.
    kept_counts = pruned.groupBy(group_col).agg(F.count(F.lit(1)).alias("__k"))
    kc = kept_counts.withColumnRenamed(group_col, "__kg")
    safety = rates.join(
        F.broadcast(kc), rates[group_col].eqNullSafe(F.col("__kg")), "left"
    ).select(
        rates[group_col],
        (
            F.coalesce(F.col("__k"), F.lit(0)) >= F.least(F.lit(cap), F.col("__n"))
        ).alias("__safe"),
    )
    safe_rows = _join_group(
        pruned, safety.filter("__safe"), group_col
    ).drop("__thr", "__n", "__safe")
    unsafe_rows = _join_group(
        df, safety.filter(~F.col("__safe")), group_col
    ).drop("__safe")
    return exact(safe_rows).unionByName(exact(unsafe_rows))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    broadcast_max_rows: int = 500_000,
) -> DataFrame:
    """Split assignment that cannot leak near-duplicates across the
    train/test boundary (the contamination failure mode Lee et al.
    2022 §6.2 measure): resolve the near-dup ``pairs`` (doc_a, doc_b)
    to clusters, then hash each document's CLUSTER REPRESENTATIVE —
    not its own id — through the usual :func:`split_column` CASE, so
    every member of a near-dup cluster inherits one split decision. A
    per-document hash would independently coin-flip each near-copy,
    putting ~2·p·(1-p) of every dup pair on opposite sides of the
    boundary. Documents in no pair are their own singleton cluster
    (hashed by their own id, so existing singleton assignments match
    plain :func:`split_column` under the same salt).

    Returns ``docs`` + ``split_key`` (the representative hashed) +
    ``split``. Scale: the cluster map covers only documents that
    appear in a pair — usually far smaller than the corpus — but "far
    smaller than 100 TB" can still be billions of rows at web dup
    rates, so the join strategy is decided from the map's MEASURED
    size, never a forced hint: the map is materialized once
    (``localCheckpoint`` — it feeds both the count and the join, and
    the iterative CC underneath must not replay), broadcast only when
    it actually fits (``broadcast_max_rows``), and shuffled-hash-joined
    on the id key otherwise. The assignment itself stays a pure column
    expression on top (no persisted random column, no extra shuffle).
    """
    from qb_data_pipeline_backfill_spark.operators.graph import (
        dedup_clusters,
    )

    cc = dedup_clusters(pairs).select(
        F.col("doc_id").alias("__ls_id"),
        F.col("cluster_id").alias("__ls_cluster"),
    ).localCheckpoint(eager=True)
    small = cc.count() <= broadcast_max_rows
    keyed = docs.join(
        F.broadcast(cc) if small else cc,
        docs[id_col] == F.col("__ls_id"),
        "left",
    ).withColumn(
        "split_key", F.coalesce(F.col("__ls_cluster"), F.col(id_col))
    )
    return keyed.withColumn(
        "split", split_column(["split_key"], weights, salt=salt)
    ).drop("__ls_id", "__ls_cluster")


def hash_full(cols: list[str | Column], salt: str = "") -> Column:
    """Full 32-hex md5 over the salted, '|'-joined key — the total
    ORDER key of :func:`global_shuffle` (``hash_prefix`` keeps 8 hex
    chars, plenty for thresholds but collision-prone as a sort key at
    billions of rows)."""
    parts = [F.lit(salt)] + [
        _escaped(F.col(c) if isinstance(c, str) else c) for c in cols
    ]
    return F.md5(F.concat_ws(_SALT_SEP, *parts))


def hash_full_sql(cols: list[str], salt: str = "") -> str:
    """DuckDB rendering of :func:`hash_full`."""
    parts = [f"'{_q(salt)}'"] + [_escaped_sql(c) for c in cols]
    return f"md5(concat_ws('{_SALT_SEP}', {', '.join(parts)}))"


_HEX_DIGITS = "0123456789abcdef"


def hash_u32(key: Column) -> Column:
    """First 8 hex chars of a hash key folded to their uint32 value —
    pure codegen (char positions in the hex alphabet, base-16 fold);
    the same fold renders in ANSI SQL, where no hex-parse builtin is
    engine-portable."""
    return F.aggregate(
        F.split(F.substring(key, 1, 8), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc * 16 + (F.position(c, F.lit(_HEX_DIGITS)) - 1),
    )


def global_shuffle(
    df: DataFrame,
    cols: list[str],
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a
    ``(shard, pos)`` — which output shard it belongs to and its
    position within that shard — reproducible across runs, engines,
    partitionings, and cluster sizes (the property a training pipeline
    needs to resume mid-epoch or re-derive an example's global step).

    The permutation is the md5 order of the salted key; the shard is
    the CONTIGUOUS RANGE ``floor(u32(key) · n_shards / 2^32)`` of that
    same order, so shard files concatenated in shard order reproduce
    the single global permutation exactly, and different salts give
    independent epoch orders.

    100 TB shape: key and shard are narrow codegen; the only movement
    is one hash repartition by ``shard`` with a per-shard sort (the
    window below is partitioned by shard — Spark plans it as exchange
    + in-partition sort), which is the exact topology that WRITES the
    shards; a global ``orderBy`` would range-sample and sort the whole
    corpus for no additional benefit. Shards should outnumber executor
    cores; md5 uniformity bounds shard skew at √ variance.

    Ties: md5 collisions order by the key columns themselves —
    deterministic total order even then.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # appended outputs + temporaries must not clobber or shadow input
    # columns (warc_parse's guard pattern; review r13)
    reserved = {"shard", "pos", "__key", "__shard"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"global_shuffle reserves output/temp columns {sorted(reserved)}; "
            f"input already has {clash} — rename them first"
        )
    from pyspark.sql.window import Window

    key = hash_full(cols, salt)
    shard = F.floor(
        (hash_u32(key) * F.lit(int(n_shards))) / F.lit(float(2**32))
    ).cast("long")
    with_key = df.withColumn("__key", key).withColumn("__shard", shard)
    w = Window.partitionBy("__shard").orderBy("__key", *cols)
    return (
        with_key.withColumn("pos", F.row_number().over(w).cast("long"))
        .withColumnRenamed("__shard", "shard")
        .drop("__key")
    )


def epoch_plan(
    df: DataFrame,
    *,
    budget_tokens: int,
    weights: dict[str, int],
    tok: Column,
    group_col: str = "source",
) -> DataFrame:
    """Data-constrained repetition plan (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): given a total token
    budget and integer per-group target weights, compute per group how
    many tokens it must contribute (``target_tokens = budget ·
    w_g / Σw``, floor), how many FULL epochs of the group that takes
    (``epochs = ceil(target/available)``), and the leftover the final
    partial epoch must sample (``last_epoch_tokens``). All integer
    arithmetic — a plan two engines and two runs always agree on.

    Groups absent from ``weights`` get weight 0 (excluded, reported
    with zeroes). One map-side-combined aggregate on the group key +
    a broadcast of the |groups|-row plan arithmetic; nothing
    corpus-sized moves.
    """
    if budget_tokens < 0 or not weights:
        raise ValueError("budget_tokens must be >= 0 and weights non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    wsum = sum(weights.values())
    if wsum == 0:
        raise ValueError("weights must not all be zero")
    avail = df.groupBy(group_col).agg(
        F.sum(tok.cast("long")).alias("avail_tokens")
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    w = F.coalesce(
        wmap[F.col(group_col)], F.lit(0)
    ).cast("long")
    def _floor_div(a: Column, b: Column) -> Column:
        # exact non-negative integer division in DECIMAL(38,0): the
        # pmod subtraction makes the numerator exactly divisible, and
        # decimals keep it exact past 2^53 where a double numerator
        # would round (review r12 — weight x budget can exceed 9e15)
        a38 = a.cast("decimal(38,0)")
        b38 = b.cast("decimal(38,0)")
        return ((a38 - F.pmod(a38, b38)) / b38).cast("long")

    target = _floor_div(
        w * F.lit(int(budget_tokens)), F.lit(int(wsum)).cast("long")
    )
    epochs = F.when(
        (target > 0) & (F.col("avail_tokens") > 0),
        _floor_div(
            target + F.col("avail_tokens") - 1, F.col("avail_tokens")
        ),
    ).otherwise(F.lit(0)).cast("long")
    last = F.when(
        epochs > 0, target - (epochs - 1) * F.col("avail_tokens")
    ).otherwise(F.lit(0)).cast("long")
    return avail.select(
        group_col,
        "avail_tokens",
        w.alias("weight"),
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        last.alias("last_epoch_tokens"),
    )


def unimax_mixture(
    df: DataFrame,
    *,
    budget_tokens: int,
    max_epochs: int,
    tok: Column,
    group_col: str = "source",
) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a token budget as UNIFORMLY as possible
    across groups, capping each group at ``max_epochs`` passes over
    its available data — the fairness-first alternative to
    temperature sampling that never over-repeats a low-resource group.

    Exact integer waterfill: with per-group capacity ``cap_g =
    avail_g * max_epochs`` sorted ascending, the capped set is a
    prefix of that order (``cap_i * (G-i+1) + prefix_{i-1} <=
    budget`` — monotone, so one window decides it); uncapped groups
    share the remaining budget at level ``U = floor(rem / n_uncapped)``
    with the ``rem - U * n_uncapped`` leftover tokens granted one
    each to the first uncapped groups in (capacity, group) order — a
    total, engine-replayable tie rule. Invariants (pytest-pinned):
    ``sum(alloc) = min(budget, sum(cap))``, ``alloc_g <= cap_g``,
    uncapped allocations differ by at most one token.

    Scale: one map-side-combined aggregate on the group key; the
    waterfill windows order the |groups|-row table (languages/domains
    — bounded by design, the vocab-window convention, never corpus
    rows).
    """
    from pyspark.sql.window import Window

    if budget_tokens < 0 or max_epochs < 1:
        raise ValueError(
            "budget_tokens must be >= 0 and max_epochs >= 1 "
            f"(got {budget_tokens}, {max_epochs})"
        )
    avail = df.groupBy(group_col).agg(
        F.coalesce(F.sum(tok.cast("long")), F.lit(0)).alias("avail_tokens")
    )
    caps = avail.withColumn(
        "cap_tokens", F.col("avail_tokens") * F.lit(int(max_epochs))
    )
    w = Window.orderBy("cap_tokens", group_col)
    w_all = Window.partitionBy()
    B = F.lit(int(budget_tokens))
    staged = (
        caps.withColumn("__i", F.row_number().over(w))
        .withColumn(
            "__pre",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("__g", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.col("__g") - F.col("__i") + 1)
            + F.col("__pre")
            <= B,
        )
    )
    s_capped = F.coalesce(
        F.sum(F.when(F.col("capped"), F.col("cap_tokens"))).over(w_all),
        F.lit(0),
    )
    n_unc = F.col("__g") - F.count(
        F.when(F.col("capped"), F.lit(1))
    ).over(w_all)
    rem = B - s_capped
    # exact integer floor-division in DECIMAL(38,0) (the epoch_plan
    # recipe): a double quotient rounds past 2^53
    rem38 = rem.cast("decimal(38,0)")
    n38 = n_unc.cast("decimal(38,0)")
    level = ((rem38 - F.pmod(rem38, n38)) / n38).cast("long")
    extra = rem - level * n_unc
    # uncapped rank in (cap, group) order: 1-based among uncapped
    j = F.col("__i") - (F.col("__g") - n_unc)
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        level + F.when(j <= extra, F.lit(1)).otherwise(F.lit(0))
    )
    return staged.select(
        group_col,
        "avail_tokens",
        "cap_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        "capped",
    )
