"""Distributed ExactSubstr dedup: prefix-doubled substring classes.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") showed the strongest dedup for LLM corpora is EXACT-SUBSTRING:
mark every span whose text occurs elsewhere in the corpus (min length
L) and cut it. Their implementation is a single-node memory-mapped
suffix array; this module re-derives the result Spark-first — and the
road to this shape is instructive, so it is documented:

- A suffix array needs a TOTAL ORDER of suffixes; every scalable
  global-ranking construction tried here was either
  nondeterministic under Spark's recompute-on-demand execution
  (``repartitionByRange`` samples boundaries per physical plan, so
  collected offsets and partition ids drift between evaluations — a
  correctness bug the oracle gate's brute-force replay caught) or
  O(rounds^2)-to-exponential in plan size (each prefix-doubling
  round that references its input TWICE — a self-join, or an
  aggregate + join pair — doubles the lazy plan; measured 17 s
  collect-per-round and 88 s fully-lazy at sf0.1).
- The fix is the observation that DUPLICATE DETECTION NEEDS NO
  ORDER: prefix doubling works just as well on EQUALITY CLASSES.
  Each round assigns every position the class id of its first 2^m
  characters, where the id is the MINIMUM (doc, pos) encoding in the
  class — a representative, not a rank. That is ONE window function
  (``min() OVER (PARTITION BY r, r2)``), and the partner class is
  ONE ``lead()`` over the per-document position order — so a round
  references its input exactly once, the whole chain is a single
  linear lazy DAG, and there are zero driver round-trips after the
  collected (bounded, broadcast) alphabet map. Measured 3.8 s at
  sf0.1 where the ranked forms took 17-88 s (SCALING §15).

A length-L window at position p then has composite key
``(class_m[p], class_m[p + L - h])`` with ``h = 2^floor(log2 L)``
(two overlapping h-prefixes cover the window); duplicated windows are
the classes with count >= 2 (one more window function), and matched
spans merge per document with gaps-and-islands. Strings are touched
exactly once, at the single-character explode; every later round
moves only integers.

100 TB notes: class windows partition by the class-pair key — the
popular-prefix class (runs of spaces) is the skew exposure, same as
any groupBy on that key; per-document windows are bounded by document
length. Encodings assume non-negative doc_id < 2^31 and positions
< 2^32 (the ``enc = doc_id * 2^32 + pos`` packing) — a documented
contract; wider id spaces swap the encoding for a struct min.

Reference parity: the corpus-level exact analog of the in-document
``repeated_substring_spans`` (dedup.py) and the exact counterpart of
the MinHash/SimHash near-dup family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def char_classes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode to ``(doc_id, pos, r)`` with ``r`` a per-character
    class id from the collected corpus alphabet — a bounded,
    deterministic, broadcast model artifact (the BPE/unigram-trainer
    pattern). Ids are arbitrary-but-stable; only equality matters."""
    chars = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "")).alias("pos", "c"),
    ).filter(F.col("c") != "")
    vocab = sorted(r["c"] for r in chars.select("c").distinct().collect())
    if not vocab:
        # all-empty corpus: an empty create_map() types as VOID and
        # fails analysis (hypothesis-found edge) — no characters means
        # no class rows
        return chars.select(
            "doc_id", "pos", F.lit(None).cast("long").alias("r")
        ).filter(F.lit(False))
    cmap = F.create_map(
        *[F.lit(x) for i, c in enumerate(vocab) for x in (c, i + 1)]
    )
    return chars.select(
        "doc_id", "pos", cmap[F.col("c")].cast("long").alias("r")
    )


def suffix_prefix_classes(
    df: DataFrame,
    *,
    target_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    skew_safe: bool = False,
) -> tuple[DataFrame, int]:
    """Prefix-doubled substring equality classes: returns
    ``(classes, h)`` where ``classes`` is ``(doc_id, pos, r)`` — two
    positions share ``r`` iff their first ``h = 2^floor(log2
    target_len)`` characters (truncated at document end) are equal —
    via ``floor(log2 h)`` rounds of two window functions each:

        r2 = lead(r, step) OVER (PARTITION BY doc_id ORDER BY pos)
        r  = min(doc_id·2^32 + pos) OVER (PARTITION BY r, r2)

    The min-encoding representative is deterministic, needs no global
    order, and keeps every round a SINGLE reference to its input —
    the linear-plan property the module docstring explains. Suffixes
    never cross documents; a missing partner (suffix shorter than the
    offset) keys as -1, the sentinel below every class.

    ``skew_safe=True`` (VERDICT r13 #4) computes the SAME class min
    through a map-side-combinable aggregate + join instead of the
    window: ``min`` is algebraic, so Spark's partial aggregation
    collapses even the hottest class (whitespace runs) to one partial
    row per map task before the shuffle, and the join back is
    AQE-skew-splittable — a window partition, by contrast, must
    assemble ALL of the hot class's rows in ONE task, the corpus-scale
    ceiling. The round's input is consumed twice in this form (agg +
    probe), which is exactly the plan-doubling trap SCALING §15
    documents — so each round first ``localCheckpoint(eager=True)``'s
    the paired table (the BPE-trainer lineage-truncation precedent):
    one materialization per round, constant plan size, no recompute.
    Results are bit-identical either way (min over the same groups);
    the probe row in SCALING §15 records the measured trade."""
    if target_len < 2:
        raise ValueError(f"target_len must be >= 2, got {target_len}")
    h = 1 << int(math.floor(math.log2(target_len)))
    classes = char_classes(df, text_col, id_col)
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    enc = F.col("doc_id") * F.lit(1 << 32) + F.col("pos")
    step = 1
    while step < h:
        paired = classes.withColumn(
            "r2", F.coalesce(F.lead("r", step).over(w_doc), F.lit(-1))
        )
        if skew_safe:
            paired = paired.localCheckpoint(eager=True)
            mins = paired.groupBy("r", "r2").agg(F.min(enc).alias("__nr"))
            classes = paired.join(mins, ["r", "r2"]).select(
                "doc_id", "pos", F.col("__nr").alias("r")
            )
        else:
            classes = paired.withColumn(
                "r", F.min(enc).over(Window.partitionBy("r", "r2"))
            ).select("doc_id", "pos", "r")
        step *= 2
    return classes, h


def exact_substring_spans(
    df: DataFrame,
    *,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    skew_safe: bool = False,
) -> DataFrame:
    """ExactSubstr duplicate marking (Lee et al. 2021): every maximal
    span covered by length-``min_len`` windows whose text occurs at
    least twice in the corpus (any document, including self-repeats),
    as ``(doc_id, start, end)`` with ``end`` exclusive, 0-based.

    Pipeline: prefix-doubled classes to h = 2^floor(log2 min_len);
    window key = (class[p], class[p + min_len - h]) via one more
    per-doc ``lead``; duplicated keys found with a count window; spans
    merged per document with gaps-and-islands. One linear DAG, no
    self-joins, no driver collects beyond the alphabet.

    ``skew_safe=True`` routes BOTH class-keyed windows (the per-round
    class min and this function's duplicate-count) through map-side-
    combinable aggregates + AQE-skew-splittable joins, lifting the
    one-task-per-hot-class ceiling at corpus scale — bit-identical
    output; see :func:`suffix_prefix_classes`."""
    classes, h = suffix_prefix_classes(
        df,
        target_len=min_len,
        text_col=text_col,
        id_col=id_col,
        skew_safe=skew_safe,
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    w_len = Window.partitionBy("doc_id")
    windows = (
        classes.withColumn(
            "r_tail", F.lead("r", min_len - h).over(w_doc)
        )
        .withColumn("__len", F.max("pos").over(w_len) + 1)
        .filter(F.col("pos") + F.lit(min_len) <= F.col("__len"))
    )
    if skew_safe:
        # duplicated window keys via partial-combined count + inner
        # join back: count is algebraic, so the hot key arrives at its
        # reducer as per-map partials, and the join's hot partition is
        # AQE-splittable. The probe side is consumed twice (agg +
        # join) — checkpoint once, same rationale as the round loop.
        windows = windows.localCheckpoint(eager=True)
        dup_keys = (
            windows.groupBy("r", "r_tail")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
            .select("r", "r_tail")
        )
        marked = windows.join(dup_keys, ["r", "r_tail"]).select(
            "doc_id",
            F.col("pos").alias("start"),
            (F.col("pos") + F.lit(min_len)).alias("end"),
        )
    else:
        marked = (
            windows.withColumn(
                "n",
                F.count(F.lit(1)).over(Window.partitionBy("r", "r_tail")),
            )
            .filter(F.col("n") >= 2)
            .select(
                "doc_id",
                F.col("pos").alias("start"),
                (F.col("pos") + F.lit(min_len)).alias("end"),
            )
        )
    return _merge_spans(marked)


def _merge_spans(marked: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of ``(doc_id, start, end)`` window marks
    into maximal spans per document: a new island starts where the
    window begins past every previous end. Bounded per-doc window
    state — shared by the one-shot and incremental marking paths."""
    w_isl = Window.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max("end").over(
        w_isl.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("start") > F.coalesce(prev_max_end, F.lit(-1)), 1
            ).otherwise(0)
        ).over(w_isl),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("long").alias("start"),
            F.max("end").cast("long").alias("end"),
        )
        .select("doc_id", "start", "end")
    )


def _window_hashes(
    df: DataFrame, min_len: int, text_col: str, id_col: str
) -> DataFrame:
    """``(doc_id, pos, win_hash)`` — the xxhash64 of every length-
    ``min_len`` character window. The substring materializes only
    transiently inside the scan stage's codegen (explode → substr →
    hash in one projection); nothing wider than the 8-byte hash ever
    reaches a shuffle."""
    pos_idx = F.when(
        F.length(text_col) >= min_len,
        F.sequence(F.lit(0), F.length(text_col) - min_len),
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(pos_idx).alias("pos"),
        F.col(text_col),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.xxhash64(
            F.col(text_col).substr(F.col("pos") + 1, F.lit(min_len))
        ).alias("win_hash"),
    )


def substring_window_index(
    df: DataFrame,
    *,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The PERSISTABLE ExactSubstr index of a corpus batch: one row
    ``(win_hash, n)`` per distinct length-``min_len`` window hash —
    the cross-RUN face of the dedup (the ``minhash_band_index``
    pattern, dedup.py). Write it once, append each new batch's rows
    (duplicate ``win_hash`` rows across appends are fine — the probe
    reads membership), and incremental marking never re-explodes a
    character of history. At 100 TB the index is |distinct windows|
    8-byte keys — orders smaller than the corpus — and bucketing it
    on ``win_hash`` (operators/layout.py) makes every later probe
    join co-located.

    The hash key trades the one-shot path's exact-by-construction
    class equality for xxhash64 equality: a collision can fabricate a
    false duplicate window (never lose one) with probability ~2^-64
    per window pair — the documented ``repeated_substring_spans
    (hash_grams=True)`` trade, gated the same way (the incremental
    query's oracle replays raw strings)."""
    return (
        _window_hashes(df, min_len, text_col, id_col)
        .groupBy("win_hash")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def incremental_substring_spans(
    index: DataFrame,
    new_docs: DataFrame,
    *,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr marking of a NEW batch against a persisted window
    index — without touching a character of history (VERDICT r13 #7;
    the ``incremental_minhash_pairs`` protocol). A new-batch window is
    duplicated iff it occurs ≥ 2 times within the batch OR at least
    once in history; that is exactly the one-shot
    :func:`exact_substring_spans` over (history ∪ batch) RESTRICTED to
    the batch's documents (pinned by the oracle-gated
    dedup_incremental_substring, whose DuckDB replay brute-forces the
    union, and by pytest on crafted batches).

    Plan: one explode+hash pass over the batch only, one map-side-
    combined count, one semi-join of 8-byte keys against the index
    (broadcast or co-located when the index is bucketed), the shared
    bounded island merge. History never re-explodes; the batch moves
    as (doc, pos, hash) integers."""
    wins = _window_hashes(new_docs, min_len, text_col, id_col)
    batch_counts = wins.groupBy("win_hash").agg(
        F.count(F.lit(1)).alias("__n")
    )
    in_batch_dups = batch_counts.filter(F.col("__n") >= 2).select("win_hash")
    in_history = batch_counts.select("win_hash").join(
        index.select("win_hash"), "win_hash", "left_semi"
    )
    dup_keys = in_batch_dups.unionByName(in_history).distinct()
    marked = wins.join(dup_keys, "win_hash").select(
        "doc_id",
        F.col("pos").alias("start"),
        (F.col("pos") + F.lit(min_len)).alias("end"),
    )
    return _merge_spans(marked)


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply ExactSubstr cuts: remove every ``(start, end)`` span
    (0-based, end-exclusive, non-overlapping — the
    :func:`exact_substring_spans` contract) from its document and
    return ``(doc_id, clean_text, n_spans, cut_chars)``. Documents
    with no spans pass through unchanged (0 / 0).

    Lee et al. 2021 cut every duplicated byte (all occurrences), which
    is exactly the marked-span set; a keep-first policy is a caller-
    side filter on the spans before cutting.

    Shape: one join of the span table onto its documents (span rows
    only — documents without duplicates never shuffle), a per-doc
    ``lag`` window to find each inter-span segment, and one per-doc
    aggregate that stitches segments in order. All bounded per-doc
    work; the untouched majority of the corpus takes the
    anti-join-free left path.
    """
    w = Window.partitionBy(id_col).orderBy("start")
    seg = (
        spans.join(df.select(F.col(id_col), F.col(text_col)), id_col)
        .withColumn(
            "prev_end", F.coalesce(F.lag("end").over(w), F.lit(0))
        )
        .withColumn(
            "seg",
            F.substring(
                F.col(text_col),
                (F.col("prev_end") + 1).cast("int"),
                (F.col("start") - F.col("prev_end")).cast("int"),
            ),
        )
    )
    cut = seg.groupBy(id_col).agg(
        F.concat(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start", "seg"))
                    ),
                    lambda s: s.getField("seg"),
                ),
            ),
            F.substring(
                F.first(F.col(text_col)),
                (F.max("end") + 1).cast("int"),
                F.lit(1 << 30),
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("end") - F.col("start")).cast("long").alias("cut_chars"),
    )
    untouched = df.join(spans.select(id_col).distinct(), id_col, "left_anti")
    return cut.unionByName(
        untouched.select(
            F.col(id_col),
            F.col(text_col).alias("clean_text"),
            F.lit(0).cast("long").alias("n_spans"),
            F.lit(0).cast("long").alias("cut_chars"),
        )
    )
