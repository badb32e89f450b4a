"""Text-analysis operators for a large-scale training-data pipeline.

The reference pipeline stops at landing raw JSON (SURVEY.md §0); a
100 TB training-data pipeline additionally needs per-document text
statistics, n-gram/TF-IDF features, language identification, quality
scoring, and content fingerprinting. All operators here are pure
DataFrame expressions (JVM-side, whole-stage-codegen-friendly): token
arrays are built with `split`/`transform`/`filter`/`aggregate` higher-
order functions, so every per-document computation is narrow (no
shuffle) and the only shuffles are the final aggregations the caller
asks for (e.g. global n-gram counts).

No Python UDFs on the expression path — at 100 TB a row-at-a-time UDF
on the token path would dominate the job cost. The one deliberate
exception is ``bpe_encode``: ranked-merge application is inherently
sequential per word, so it runs as an Arrow-batched ``pandas_udf``
with a per-batch distinct-word cache (the same vectorized-Python
boundary policy as the media codecs).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.functions import int_ratio

# Driver-side fit fast path (optimization round 16, guide §1.2 step 1 /
# §3.1 spirit — pick the strategy from the MEASURED size): every
# tokenizer trainer starts from the distinct-word frequency table, a
# model-artifact-scale relation (Zipf: |word types| ≪ corpus tokens).
# When that table fits under this row cap, the merge/EM rounds replay
# in plain Python on the collected rows — bit-identical arithmetic,
# zero per-round Spark jobs — instead of paying tens of sequential
# driver-coordinated jobs whose per-round data is a few thousand rows.
# Above the cap the distributed round loop below runs unchanged (the
# 100 TB shape). 1M word types ≈ tens of MB collected — the same
# budget class as a broadcast-join build side.
_FIT_DRIVER_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_FIT_DRIVER_MAX", "1000000")
)


def _collect_word_types(words: DataFrame, max_rows: int | None) -> list[Row] | None:
    """Limit-probe collect of a word-type table: ONE job; returns all
    rows when the table has at most ``max_rows`` of them, else ``None``
    (caller falls back to the distributed loop). ``limit(max_rows + 1)``
    bounds the transfer, so an over-cap vocabulary costs one truncated
    fetch, never an unbounded collect."""
    cap = _FIT_DRIVER_MAX_ROWS if max_rows is None else max_rows
    if cap <= 0:
        return None
    rows = words.limit(cap + 1).collect()
    return None if len(rows) > cap else rows


def _apply_merge_py(syms: list[str], s1: str, s2: str, merged: str) -> list[str]:
    """The driver replay of the trainers' codegen greedy fold: scan
    left to right, fuse ``(s1, s2)`` into ``merged`` whenever the
    accumulator's last element is ``s1`` and the next symbol is ``s2``
    — the freshly merged cell (== merged ≠ s1) never chain-merges
    within the round, exactly the Spark ``aggregate`` semantics."""
    acc: list[str] = []
    for x in syms:
        if acc and acc[-1] == s1 and x == s2:
            acc[-1] = merged
        else:
            acc.append(x)
    return acc

# Tiny public stopword profiles (top function words per language) used
# by the n-gram-free language-ID heuristic and the quality score.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}

# A BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
# the shape GPT-2-style tokenizers split on before byte-pair merging.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def normalize_text(col: Column | str) -> Column:
    """lower → trim → collapse internal whitespace (the canonical form
    every dedup/fingerprint operator keys on)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>).

    Empty strings are removed: ``split("", " ")`` yields ``['']`` — a
    phantom 1-token document for empty/whitespace-only input that
    every downstream token statistic would inherit (and that the BPE
    family, which filters ``''``, would disagree with). ``array_remove``
    stays inside whole-stage codegen (unlike a ``filter`` HOF, which
    evaluates interpreted); for non-empty documents the normalized
    form has no empty tokens, so this is the identity. NULL input
    stays NULL.
    """
    return F.array_remove(F.split(normalize_text(col), " "), "")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def gram_positions(arr: Column, n: int) -> Column:
    """Start indices of every length-``n`` window over an array —
    ``[0 .. size-n]``, empty when the array is shorter than ``n``
    (including a NULL array, matching SQL's no-rows-from-no-grams
    semantics). The shared index expression of the n-gram family
    (word_ngrams, repetition, bigram LM, BPE pair counting)."""
    return F.when(
        F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
    ).otherwise(F.array().cast("array<int>"))


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) from a token array.

    Built with sequence+transform so it stays inside codegen; documents
    shorter than ``n`` tokens yield an empty array.
    """
    return F.array_distinct(
        F.transform(
            gram_positions(toks, n),
            lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
        )
    )


def _with_tokens(
    df: DataFrame, text_col: str, id_col: str, extra: list[str] | None = None
) -> DataFrame:
    """Pre-projection materializing the normalized text (``__norm``)
    and its token array (``__t``) ONCE per row. Downstream selects
    reference the aliases many times; because both are non-cheap and
    multiply-referenced, Catalyst's CollapseProject keeps the barrier
    instead of inlining — so the regexp+split subtree evaluates once
    per document, not once per consuming expression (the r8 text-
    family regression: every score lane re-ran the tokenizer)."""
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (extra or [])],
        F.col(text_col).alias("__raw"),
        normalize_text(text_col).alias("__norm"),
        tokens(text_col).alias("__t"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: counts, distinct counts, mean
    token length, BPE-ish token count. Narrow (no shuffle)."""
    pre = _with_tokens(df, text_col, id_col)
    t = F.col("__t")
    n_tok = F.size(t)
    # sum(token lengths) via the normalized-form identity: for
    # n_tok >= 1 the SPACE-trimmed ``__norm`` is exactly the tokens
    # joined by single spaces, so the character total is its length
    # minus (n_tok - 1) — an O(1) codegen'd expression instead of an
    # interpreted aggregate() fold over the array. The extra trim is
    # load-bearing: ``normalize_text``'s trim strips SPACES only, so a
    # document with a boundary tab/newline keeps one boundary space
    # after the \s+ collapse ('hello\n' → 'hello ') and the untrimmed
    # length would overcount by one per ragged edge (review r10).
    char_total = F.length(F.trim(F.col("__norm"))) - n_tok + 1
    # empty/whitespace-only documents have 0 tokens: the mean token
    # length is NULL (ANSI division by zero would throw; the DuckDB
    # oracle's `// 0` yields NULL — the CASE keeps the engines agreed)
    return pre.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.when(n_tok == 0, F.lit(None).cast("double"))
        .otherwise(int_ratio(char_total, n_tok))
        .alias("avg_token_len"),
        bpe_ish_token_count(F.col("__raw")).alias("n_bpe_tokens"),
    )


def ngram_topk(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Global top-k word n-grams by document frequency (distinct per
    doc, so a gram repeated within one document counts once).

    One shuffle (groupBy gram) with map-side partial counts; the top-k
    is a TakeOrdered, not a global sort.
    """
    grams = df.select(F.explode(word_ngrams(tokens(text_col), n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "gram")
        .limit(k)
    )


def tfidf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, term) TF-IDF with the smooth formula
    ``tf * (ln((1 + N) / (1 + df)) + 1)``.

    Hand-rolled on DataFrames (no MLlib pipeline objects): term counts
    explode once, document frequency is a groupBy over distinct
    (doc, term), and N is a scalar broadcast join. Two shuffles total,
    both on the term key.
    """
    term_counts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = term_counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_total"))
    # doc_freq is the full term dictionary — unbounded cardinality at
    # corpus scale, so it must NOT be broadcast. Both sides are already
    # hash-partitioned on `term` by their groupBys, so the shuffle join
    # co-partitions with no extra exchange on the term_counts side.
    # (The 1-row n_docs crossJoin broadcast below IS correct.)
    return (
        term_counts.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((1 + F.col("n_total")) / (1 + F.col("df"))) + 1)
            ).alias("tfidf"),
        )
    )


def language_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language scores + argmax prediction.

    score(lang) = fraction of tokens that are in that language's
    stopword profile. Prediction = highest score, ties broken by
    language code. Purely narrow column expressions; the token array
    materializes once (``_with_tokens``) and every language lane
    reads the same array column.
    """
    pre = _with_tokens(df, text_col, id_col)
    t = F.col("__t")
    cols = [F.col(id_col)]
    score_structs = []
    for lang, profile in sorted(LANG_PROFILES.items()):
        prof = F.array(*[F.lit(w) for w in profile])
        hits = F.size(F.filter(t, lambda x: F.array_contains(prof, x)))
        # a 0-token (empty/whitespace-only) document has no evidence:
        # scores are NULL, not 0/0 (which throws under ANSI; the
        # DuckDB oracle's double 0/0 is NULL — CASE keeps parity)
        score = F.when(F.size(t) == 0, F.lit(None).cast("double")).otherwise(
            F.round(hits.cast("double") / F.size(t), 4)
        )
        cols.append(score.alias(f"score_{lang}"))
        # negative score first => array_sort ranks best score, then
        # alphabetical language for ties.
        score_structs.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    # a NULL or 0-token document has NULL scores — predicting the
    # alphabetically first language for it (r7 review: every NULL doc
    # filed under 'de') would silently misroute rows; prediction NULL
    cols.append(
        F.when(
            F.col("__raw").isNull() | (F.size(t) == 0),
            F.lit(None).cast("string"),
        ).otherwise(
            F.array_sort(F.array(*score_structs))
            .getItem(0)
            .getField("lang")
        ).alias("predicted_lang")
    )
    return pre.select(*cols)


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division of two non-negative integer columns.

    floor(a / b) on a correctly-rounded double quotient equals true
    integer division for operands < 2^53 — and unlike float ratios it
    is bit-identical across engines.
    """
    return F.floor(a.cast("double") / b.cast("double")).cast("long")


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document-quality components + composite score.

    Components: token count, punctuation ratio, English-stopword
    ratio — the standard cheap pre-filters a training-data pipeline
    applies before expensive model scoring. Composite =
    0.4·min(n_tokens/50, 1) + 0.3·(1 − punct_ratio)
    + 0.3·min(5·stop_ratio, 1), in [0, 1].

    All ratios are computed in integer BASIS POINTS (×10⁴, truncating
    division) and divided by 10⁴ only at the end: float rounding of a
    composite like 0.86875 sits exactly on the 4dp boundary and
    engines disagree on which side the accumulated double lands —
    integer arithmetic has no such boundary.
    """
    pre = _with_tokens(df, text_col, id_col)
    t = F.col("__t")
    raw = F.col("__raw")
    n_tok = F.size(t)
    bp = F.lit(10000)
    # Unicode-aware punctuation: everything that is not a letter
    # (\p{L}), digit (\p{N}) or whitespace. The char count is taken as
    # length(raw) - length(raw with punctuation RUNS removed): same
    # value as stripping the keep-class char by char, but the regex
    # engine emits one match event per punctuation RUN instead of one
    # replacement per kept character — typical prose is ~98% keep-class,
    # so the per-char form did ~50× more regex events (the r8 perf
    # regression). \p{L}/\p{N} behave identically in Java (Spark) and
    # RE2 (DuckDB) — verified char-for-char on accented/CJK fixtures.
    punct_bp = _idiv(
        (
            F.length(raw)
            - F.length(F.regexp_replace(raw, r"[^\p{L}\p{N}\s]+", ""))
        )
        * bp,
        F.greatest(F.length(raw), F.lit(1)),
    )
    prof = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_bp = _idiv(
        F.size(F.filter(t, lambda x: F.array_contains(prof, x))) * bp,
        F.greatest(n_tok, F.lit(1)),
    )
    tok_bp = F.least(n_tok * 200, bp)  # min(n_tokens/50, 1) in bp
    quality_bp = _idiv(
        4 * tok_bp + 3 * (bp - punct_bp) + 3 * F.least(5 * stop_bp, bp),
        F.lit(10),
    )
    return pre.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (punct_bp / 10000.0).alias("punct_ratio"),
        (stop_bp / 10000.0).alias("stopword_ratio"),
        (quality_bp / 10000.0).alias("quality"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_words: int = 5
) -> DataFrame:
    """Content fingerprints: whole-document md5 plus a shingle
    fingerprint (lexicographic min of per-shingle md5 hex digests —
    a 1-hash MinHash, stable under local edits away from the minimum
    shingle). Hex-string min avoids any engine-specific int casts, so
    the same fingerprint is computable in ANSI SQL.

    Plan shape: explode + min aggregate rather than a per-row
    ``array_min(transform(..., md5))`` fold — higher-order functions
    evaluate interpreted (one md5 call per array element outside
    codegen), while the exploded form hashes each shingle inside
    whole-stage codegen and reduces with a map-side-combined MIN.
    Same trick as ``dedup.minhash_lsh_pairs``; the exchange carries
    one partially-min-reduced digest per (doc, partition), not one
    per shingle. ``explode_outer`` keeps documents shorter than
    ``shingle_words`` (empty gram array → null shingle_fp), matching
    the fold form's semantics.
    """
    exploded = df.select(
        F.col(id_col),
        F.md5(normalize_text(text_col)).alias("content_fp"),
        F.explode_outer(word_ngrams(tokens(text_col), shingle_words)).alias("gram"),
    )
    return (
        exploded.groupBy(id_col, "content_fp")
        .agg(F.min(F.md5("gram")).alias("shingle_fp"))
        .select(id_col, "content_fp", "shingle_fp")
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every character ``k``-gram, slide
    a window of ``w`` consecutive hashes, and select each window's
    MINIMUM hash (rightmost position on ties). Output: one row per
    selected ``(doc_id, pos, fp)``, distinct per document.

    The published guarantee: any substring match of length at least
    ``w + k - 1`` between two documents shares at least one selected
    fingerprint — the local-sampling property that makes winnowing
    the standard plagiarism/overlap detector, with density ~2/(w+1).

    Engine shape: gram hashes are md5 HEX STRINGS compared
    lexicographically (the ``fingerprints`` portability idiom — no
    engine-specific int hashing), hashed inside codegen on the
    exploded gram rows, then re-collected per document (bounded
    per-doc arrays) for the O(n*w) window scan in higher-order
    expressions. Documents shorter than ``k + w - 1`` chars produce
    no fingerprints."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1 (got k={k}, w={w})")
    # r16 optimization (guide §2.4/§4.2): winnowing is a purely
    # per-document computation, but the old shape exploded one row PER
    # CHARACTER, hashed it, and shuffled (doc, pos, 32-hex) rows into a
    # collect_list just to reassemble per-doc arrays for the window
    # scan — ~40 shuffle bytes per corpus character for zero cross-doc
    # work. The fused form runs the gram-hash + window-min scan in one
    # Arrow mapInPandas pass (the media-codec slot): no shuffle at all,
    # and only the selected fingerprints (~2/(w+1) density) leave
    # Python. hashlib.md5 hex over UTF-8 bytes of the code-point slice
    # is exactly F.md5(F.substring(...)); the rightmost-min tie rule
    # and per-doc (pos, fp) dedupe replay the published algorithm
    # unchanged (oracle + pytest pinned).
    import hashlib

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("pos", T.LongType(), True),
            T.StructField("fp", T.StringType(), True),
        ]
    )
    src = df.select(F.col(id_col), F.col(text_col).alias("__txt"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            poss: list = []
            fps: list = []
            for did, txt in zip(pdf[id_col], pdf["__txt"]):
                if txt is None or len(txt) < k + w - 1:
                    continue
                hs = [
                    hashlib.md5(txt[i : i + k].encode("utf-8")).hexdigest()
                    for i in range(len(txt) - k + 1)
                ]
                seen: set = set()
                for j in range(len(hs) - w + 1):
                    win = hs[j : j + w]
                    m = min(win)
                    p = j + max(i for i in range(w) if win[i] == m)
                    if (p, m) not in seen:
                        seen.add((p, m))
                        ids.append(did)
                        poss.append(p)
                        fps.append(m)
            yield pd.DataFrame({id_col: ids, "pos": poss, "fp": fps})

    return src.mapInPandas(run, schema)


def winnow_overlap_pairs(
    df: DataFrame,
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS's matching phase: document pairs ranked by the number of
    winnowing fingerprints they share — ``(doc_a, doc_b, n_shared)``
    with ``doc_a < doc_b`` and ``n_shared >= min_shared``.

    By the winnowing guarantee, every cross-document exact match of
    at least ``w + k - 1`` characters contributes at least one shared
    fingerprint, so high ``n_shared`` ranks heavy textual overlap
    (plagiarism, boilerplate reuse, mirrored pages) without any
    pairwise text comparison.

    100 TB shape: an inverted-index join on the fingerprint value —
    one shuffle on ``fp``, in-bucket pair generation bounded by
    ``max_bucket`` (a fingerprint shared by more documents than the
    cap is stopword-grade boilerplate and is dropped, the
    ``dedup.minhash_lsh_pairs`` skew rule), then one map-side-combined
    count per pair. Never all-pairs."""
    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col
    ).select(F.col(id_col), "fp").distinct()
    members = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set(id_col)).alias("docs"))
        .filter(
            (F.size("docs") >= 2) & (F.size("docs") <= max_bucket)
        )
    )
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("docs"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("docs"),
                            i + F.lit(2),
                            F.size(F.col("docs")),
                        ),
                        lambda b: F.struct(
                            a.alias("doc_a"), b.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Within-document repetition signals (the Gopher-rule family):
    duplicate-n-gram fraction and most-frequent-n-gram fraction, in
    integer basis points. High values mark boilerplate/spam documents
    a curation pass drops before training.

    Plan: explode NON-distinct n-grams → (doc, gram) counts → per-doc
    rollup — two map-side-combined shuffles, no HOF quadratics.
    Documents shorter than ``n`` tokens have no n-grams and are
    excluded (matching SQL semantics of the oracle).
    """
    toks = tokens(text_col)
    grams = F.transform(
        gram_positions(toks, n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    exploded = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    per_gram = exploded.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        _idiv(
            (F.col("n_ngrams") - F.col("n_distinct")) * 10000, F.col("n_ngrams")
        ).alias("dup_ngram_bp"),
        _idiv(F.col("top_c") * 10000, F.col("n_ngrams")).alias("top_ngram_bp"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher document-quality rule suite (Rae et al. 2021,
    Appendix A1.1 plus the duplicate-line rule of A1.2) — the
    published heuristics MassiveWeb was filtered with, and the
    rule-level complement of the coarse composite in
    :func:`quality_scores`:

    - word count in [50, 100 000] (whitespace words of the RAW text)
    - mean word length in [3, 10] characters
    - symbol-to-word ratio (``#`` chars + ``...``/``…`` ellipses)
      at most 0.1
    - at most 90 % of lines starting with a bullet (``-``/``*``/``•``)
    - at most 30 % of lines ending with an ellipsis
    - at least 80 % of words containing an alphabetic character
    - at least 2 of the 8 canonical English stop words present
    - duplicate-line fraction at most 30 %

    Emits every metric in integer BASIS POINTS (the engine's exact-
    ratio convention), one boolean per rule, and the conjunction
    ``keep``. Everything is codegen higher-order expressions over the
    split word/line arrays — no UDF, no shuffle, fully SQL-replayable.
    Lines are newline-split, trimmed, empties dropped before the
    line-level rules."""
    raw = F.col(text_col)
    words = F.filter(F.split(raw, r"\s+"), lambda w: w != "")
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    pre = df.select(
        F.col(id_col),
        raw.alias("__raw"),
        words.alias("__w"),
        lines.alias("__l"),
    )
    w, ln = F.col("__w"), F.col("__l")
    raw = F.col("__raw")
    n_words = F.size(w).cast("long")
    n_lines = F.size(ln).cast("long")
    d_words = F.greatest(n_words, F.lit(1))
    d_lines = F.greatest(n_lines, F.lit(1))
    word_chars = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#")))
    n_ell = _idiv(
        F.length(raw) - F.length(F.replace(raw, F.lit("..."))), F.lit(3)
    ) + (F.length(raw) - F.length(F.replace(raw, F.lit("…"))))
    n_bullet = F.size(
        F.filter(
            ln,
            lambda x: F.substring(x, 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    n_ell_end = F.size(
        F.filter(
            ln,
            lambda x: x.endswith("...") | x.endswith("…"),
        )
    ).cast("long")
    n_alpha = F.size(
        F.filter(w, lambda x: x.rlike("[a-zA-Z]"))
    ).cast("long")
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(w, lambda x: F.lower(x))), stops
        )
    ).cast("long")
    n_dup_lines = n_lines - F.size(F.array_distinct(ln)).cast("long")

    mean_word_len_bp = _idiv(word_chars * 10000, d_words)
    symbol_bp = _idiv((n_hash + n_ell) * 10000, d_words)
    bullet_bp = _idiv(n_bullet * 10000, d_lines)
    ellipsis_bp = _idiv(n_ell_end * 10000, d_lines)
    alpha_bp = _idiv(n_alpha * 10000, d_words)
    dup_line_bp = _idiv(n_dup_lines * 10000, d_lines)

    scored = pre.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len_bp.alias("mean_word_len_bp"),
        symbol_bp.alias("symbol_bp"),
        bullet_bp.alias("bullet_bp"),
        ellipsis_bp.alias("ellipsis_bp"),
        alpha_bp.alias("alpha_bp"),
        n_stop.alias("n_stopwords"),
        dup_line_bp.alias("dup_line_bp"),
    )
    ok_words = F.col("n_words").between(50, 100_000)
    ok_wlen = F.col("mean_word_len_bp").between(30_000, 100_000)
    ok_symbol = F.col("symbol_bp") <= 1_000
    ok_bullet = F.col("bullet_bp") <= 9_000
    ok_ellipsis = F.col("ellipsis_bp") <= 3_000
    ok_alpha = F.col("alpha_bp") >= 8_000
    ok_stop = F.col("n_stopwords") >= 2
    ok_dup = F.col("dup_line_bp") <= 3_000
    return scored.select(
        "*",
        ok_words.alias("ok_word_count"),
        ok_wlen.alias("ok_word_len"),
        ok_symbol.alias("ok_symbol_ratio"),
        ok_bullet.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        ok_dup.alias("ok_dup_lines"),
        (
            ok_words
            & ok_wlen
            & ok_symbol
            & ok_bullet
            & ok_ellipsis
            & ok_alpha
            & ok_stop
            & ok_dup
        ).alias("keep"),
    )


def lang_corpus_stats(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-language corpus rollup: doc/token/char volume, source
    diversity, mean document length — the summary a curation run emits
    per language shard. One map-side-combined shuffle on the language
    key (cardinality ~dozens, so the final aggregate is tiny at any
    corpus size); the mean is an exact integer-sum ratio, so it is
    engine-stable without decimal gymnastics."""
    t = tokens(text_col)
    pre = df.select(
        F.col(lang_col).alias("lang"),
        F.size(t).alias("__nt"),
        F.col(chars_col).alias("__nc"),
        F.col(source_col).alias("__src"),
    )
    return pre.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.sum("__nc").alias("total_chars"),
        F.countDistinct("__src").alias("n_sources"),
        int_ratio(F.sum("__nt"), F.count(F.lit(1))).alias("avg_tokens_per_doc"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Most frequent adjacent character pairs, weighted by word
    frequency — the inner statistic of one BPE-training merge step
    (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
    with Subword Units"; end-of-word markers omitted).

    The classic BPE-training distribution trick: reduce the corpus to
    its distinct-word frequency table FIRST (one map-side-combinable
    shuffle on the word), so the character-level explode scales with
    |vocab|, not corpus tokens — at 100 TB the pair stage touches a
    few million distinct words instead of trillions of running words.
    Then one more combinable shuffle on the pair key and a global
    top-k (rank over a single ordered window of |pairs| ≈ |alphabet|²
    rows — driver-safe).
    """
    words = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.col("w") != ""
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    pair_idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = freq.select(
        F.explode(pair_idx).alias("i"), F.col("w"), F.col("f")
    ).select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "f")
    agg = pairs.groupBy("pair").agg(F.sum("f").cast("long").alias("pair_count"))
    # unpartitioned rank over the AGGREGATED pair table (|pairs| ≤
    # |V|·max_len rows, not corpus rows) — bounded like build_vocab
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("pair", "pair_count", "rnk")
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document language-model quality score from a corpus-trained
    bigram LM — the shape of CCNet's KenLM perplexity filter (docs
    whose token transitions are improbable under the corpus LM are
    boilerplate/garbled candidates), self-trained here so the whole
    signal derives from the data.

    Model: add-one-smoothed bigram probabilities
    P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), with c(w1·) the history
    count (bigrams starting at w1) and V the corpus vocabulary size.
    Score: each document's mean negative log-probability over its
    bigram instances (lower = more typical). Documents with fewer than
    2 tokens produce no row.

    Distribution shape: one bigram-keyed count (map-side combinable),
    history counts derived FROM the bigram table (one more tiny
    aggregate, never a rescan), V as a broadcast scalar; scoring joins
    each bigram instance back to its probability on the same bigram
    key Catalyst co-partitions. Per-instance −ln p is quantized to
    integer micro-units BEFORE summing (the PSI trick), so the
    per-document sum is an order-free integer and the score is
    bit-identical across engines and partitionings.
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("t"))
    pos = gram_positions(F.col("t"), 2)
    bi = toks.select(F.col(id_col), F.explode(pos).alias("i"), "t").select(
        F.col(id_col),
        F.get("t", F.col("i")).alias("w1"),
        F.get("t", F.col("i") + 1).alias("w2"),
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    prob = (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    # assemble the per-bigram probability on the DISTINCT-bigram table
    # first (c12 ⋈ c1 ⋈ vocab — vocabulary-scale), then join the huge
    # per-instance table ONCE on (w1, w2): the previous chain
    # exchanged the corpus-scale bi twice, once per join key (r7
    # review) — the values are bit-identical, only the plan changes
    probs = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(-F.log(prob) * F.lit(1e6), 0).cast("long").alias("nll"),
        )
    )
    terms = bi.join(probs, ["w1", "w2"]).select(F.col(id_col), "nll")
    return terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll").alias("nll_micro"),
        F.floor(F.sum("nll") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("nll_micro_avg"),
    )


def ngram_lm_scores(
    df: DataFrame,
    order: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document quality score from a corpus-trained INTERPOLATED
    ``order``-gram LM — at order=5 this is CCNet's actual filter
    strength (Wenzek et al. 2020 use a 5-gram Kneser-Ney KenLM):
    absolute discounting with interpolation (Ney/Essen/Kneser 1994;
    the recursion Chen & Goodman 1999 eq. 10 write KN in), with the
    unigram level being the Kneser-Ney CONTINUATION distribution
    (how many distinct contexts a word completes, not how often it
    occurs — the KN signature that demotes "Francisco"-style words).
    One recursion level per order k = ``order`` .. 2:

        p_k(w|h_k) = (c_k − D)/c(h_k) + D·N1+(h_k·)/c(h_k) · p_{k−1}(w|h_{k−1})
        pc(w)      = N1+(·w) / N1+(··)           (the k=1 base case)

    where h_k is the (k−1)-word history and c_k the corpus count of
    the k-gram. Every scored instance has c_order ≥ 1 > D, so no
    zero-probability path exists when scoring the training corpus.
    Scores are mean −ln p over a document's order-gram instances,
    quantized to integer micro-units per instance BEFORE summing
    (order-free integer sums — the bigram scorer's determinism
    recipe). Documents with fewer than ``order`` tokens produce no
    row. Output: (id, n_ngrams, nll_micro, nll_micro_avg).

    Distribution shape: ``order − 1`` map-side-combinable count
    tables (every history table derived FROM its count table — never
    a corpus rescan), one broadcast scalar (distinct-bigram total);
    probabilities assemble bottom-up on the DISTINCT k-gram tables
    (each level joins the one below on its k−1 suffix words) and the
    huge per-instance table joins the finished table ONCE on the
    order words. Columns are suffix-positioned (level k holds
    w{order−k+1}..w{order}), so at order=3 this is bit-for-bit the
    engine's original trigram plan."""
    inst = ngram_instances(df, order, text_col=text_col, id_col=id_col)
    probs = ngram_nll_table(
        df, order, text_col=text_col, id_col=id_col, discount=discount
    )
    wn = [f"w{j}" for j in range(1, order + 1)]
    terms = inst.join(probs, wn).select(F.col(id_col), "nll")
    return terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("nll").alias("nll_micro"),
        F.floor(F.sum("nll") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("nll_micro_avg"),
    )


def ngram_instances(
    df: DataFrame,
    order: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document order-gram instance table ``(id, w1..wn)`` —
    stateless per-row extraction, so it runs unchanged on a stream
    (the scoring half of the fit-offline/apply-on-ingest split)."""
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    n = order
    toks = df.select(F.col(id_col), tokens(text_col).alias("t"))
    cols = [F.get("t", F.col("i") + j).alias(f"w{j + 1}") for j in range(n)]
    return toks.select(
        F.col(id_col),
        F.explode(gram_positions(F.col("t"), n)).alias("i"),
        "t",
    ).select(F.col(id_col), *cols)


def _nll_table_from_pdf(spark, pdf, n: int, discount: float):
    """Driver replay of the integer half of :func:`ngram_nll_table`
    over the collected padded-gram table G (``p0..p{n-1}, cnt`` as a
    pandas frame): level rollups, histogram (ch, nh) pairs,
    continuation counts and the suffix joins are vectorized pandas
    groupby/merge operations on exact int64 counts; the float KN
    recursion then runs IN SPARK as the same column-expression tree
    the distributed chain builds (same subtraction/division/
    multiplication order on the same long inputs), so every double —
    and the rounded nll — is bit-identical to the distributed path
    (pytest-pinned)."""
    from pyspark.sql import types as T

    pnames = [f"p{j}" for j in range(n)]
    # level k count: sum of cnt grouped by the k-prefix, rows
    # qualifying iff p{k-1} is non-null (k=2 positions always have
    # both tokens — gram_positions(t, 2) stops at size-2)
    counts = {}
    for k in range(n, 1, -1):
        sel = pdf if k == 2 else pdf[pdf[pnames[k - 1]].notna()]
        counts[k] = (
            sel.groupby(pnames[:k], sort=False, as_index=False)["cnt"]
            .sum()
            .rename(columns={"cnt": f"c{k}"})
        )
    hists = {}
    for k in range(n, 1, -1):
        g = counts[k].groupby(pnames[: k - 1], sort=False)[f"c{k}"]
        h = g.agg(["sum", "size"]).reset_index()
        h.columns = pnames[: k - 1] + [f"ch{k}", f"nh{k}"]
        hists[k] = h
    cont = (
        counts[2]
        .groupby(pnames[1], sort=False)
        .size()
        .reset_index(name="npn")
    )
    nb = len(counts[2])

    # one output row per full n-gram; level k attaches on the gram's
    # length-k SUFFIX (rename the level table's prefix columns to the
    # suffix positions) — exactly the distributed chain's wcols joins
    out = counts[n]
    out = out.merge(hists[n], on=pnames[: n - 1], how="left")
    for k in range(n - 1, 1, -1):
        ck = counts[k].rename(
            columns=dict(zip(pnames[:k], pnames[n - k :]))
        )
        out = out.merge(ck, on=pnames[n - k :], how="left")
        hk = hists[k].rename(
            columns=dict(zip(pnames[: k - 1], pnames[n - k : n - 1]))
        )
        out = out.merge(hk, on=pnames[n - k : n - 1], how="left")
    out = out.merge(
        cont.rename(columns={pnames[1]: pnames[n - 1]}),
        on=pnames[n - 1],
        how="left",
    )

    wcols = [f"w{j}" for j in range(1, n + 1)]
    out = out.rename(columns=dict(zip(pnames, wcols)))
    num_cols: list[str] = []
    for k in range(n, 1, -1):
        num_cols += [f"c{k}", f"ch{k}", f"nh{k}"]
    num_cols.append("npn")
    schema = T.StructType(
        [T.StructField(c, T.StringType(), False) for c in wcols]
        + [T.StructField(c, T.LongType(), False) for c in num_cols]
    )
    # checkpoint the driver-built table: a bare LocalRelation of a few
    # hundred thousand rows is serialized INTO every consumer plan —
    # a streaming consumer re-ships it per micro-batch (measured 8.1
    # → 11.5 s on the stream twin without this); checkpointed blocks
    # are distributed once and referenced by id
    base = spark.createDataFrame(
        out[wcols + num_cols], schema=schema
    ).localCheckpoint(eager=True)

    D = F.lit(float(discount))
    pc = F.col("npn") / F.lit(nb)
    prev = (
        (F.col("c2") - D) / F.col("ch2")
        + D * F.col("nh2") / F.col("ch2") * pc
    )
    if n == 2:
        return base.select(*wcols, prev.alias("p2"))
    for k in range(3, n + 1):
        prev = (
            (F.col(f"c{k}") - D) / F.col(f"ch{k}")
            + D * F.col(f"nh{k}") / F.col(f"ch{k}") * prev
        )
    return base.select(
        *wcols,
        F.round(-F.log(prev) * F.lit(1e6), 0).cast("long").alias("nll"),
    )


def ngram_nll_table(
    df: DataFrame,
    order: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    driver_fit_max_rows: int | None = None,
) -> DataFrame:
    """The FIT half of :func:`ngram_lm_scores`: the distinct-gram NLL
    table ``(w1..wn, nll)`` for the corpus — the model artifact a
    streaming scorer joins against (stream-static join; see
    streaming_fivegram_perplexity).

    Size-gated driver replay (r17, the §2-r16 trainer pattern): when
    the distinct padded-gram table G fits under
    ``SPARK_GRAFT_FIT_DRIVER_MAX`` rows (``limit(cap+1)`` probe — one
    bounded job), the INTEGER half of the fit — level rollups,
    histogram sums, continuation counts, and the four suffix joins —
    is replayed in plain Python dicts over the collected G, and only
    the float KN recursion runs in Spark, as the IDENTICAL column
    expressions over the driver-built table: bit-identical doubles by
    construction, ~20 small shuffles/joins replaced by one collect +
    one createDataFrame. This is the real deployment shape: an LM fit
    runs on a bounded reference corpus (CCNet fits KenLM on Wikipedia,
    not on the crawl) while SCORING streams the 100 TB side. An
    over-cap corpus takes the distributed chain below unchanged."""
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    n = order
    toks = df.select(F.col(id_col), tokens(text_col).alias("t"))

    def wcols(k: int) -> list[str]:
        return [f"w{j}" for j in range(n - k + 1, n + 1)]

    # Distinct k-gram count tables, k = n..2 — all derived from ONE
    # corpus pass (r16 optimization, guide §2.4): explode the BIGRAM
    # positions once, padding each row to n columns (p{j} = token at
    # offset j, NULL past the document end), and aggregate to the
    # null-padded n-gram group table G. A position holds a valid
    # k-gram iff p{k-1} is non-null, so every level-k count is a
    # cheap rollup of G — the big scan+explode+shuffle happens once
    # (Catalyst reuses G's exchange across the consumers) instead of
    # once per order. Counts are identical integers; the recursion
    # below is untouched, so at order=3 this still reproduces the
    # original trigram plan's values bit-for-bit.
    pcols = [F.get("t", F.col("i") + j).alias(f"p{j}") for j in range(n)]
    padded = toks.select(
        F.explode(gram_positions(F.col("t"), 2)).alias("i"), "t"
    ).select(*pcols)
    G = padded.groupBy(*[f"p{j}" for j in range(n)]).agg(
        F.count(F.lit(1)).alias("cnt")
    )

    cap = (
        _FIT_DRIVER_MAX_ROWS
        if driver_fit_max_rows is None
        else driver_fit_max_rows
    )
    if cap > 0:
        try:  # Arrow limit-probe; no pandas → distributed chain below
            fit_pdf = G.limit(cap + 1).toPandas()
        except ImportError:
            fit_pdf = None
        if fit_pdf is not None and len(fit_pdf) <= cap:
            return _nll_table_from_pdf(df.sparkSession, fit_pdf, n, discount)

    def level_counts(k: int) -> DataFrame:
        renames = [
            F.col(f"p{j}").alias(f"w{n - k + 1 + j}") for j in range(k)
        ]
        if k == n:
            sel = G if k == 2 else G.filter(F.col(f"p{k - 1}").isNotNull())
            return sel.select(*renames, F.col("cnt").alias(f"c{k}"))
        sel = G if k == 2 else G.filter(F.col(f"p{k - 1}").isNotNull())
        return (
            sel.groupBy(*[f"p{j}" for j in range(k)])
            .agg(F.sum("cnt").alias(f"c{k}"))
            .select(*renames, f"c{k}")
        )

    counts: dict[int, DataFrame] = {
        k: level_counts(k) for k in range(n, 1, -1)
    }
    hists = {
        k: counts[k]
        .groupBy(*wcols(k)[:-1])
        .agg(
            F.sum(f"c{k}").alias(f"ch{k}"),
            F.count(F.lit(1)).alias(f"nh{k}"),
        )
        for k in range(n, 1, -1)
    }
    # KN continuation base: N1+(·w) per word, N1+(··) total — both
    # from the distinct-bigram table
    cont = counts[2].groupBy(f"w{n}").agg(F.count(F.lit(1)).alias("npn"))
    nb = counts[2].agg(F.count(F.lit(1)).alias("nb"))
    D = F.lit(float(discount))
    pc = F.col("npn") / F.col("nb")
    p2 = (
        (F.col("c2") - D) / F.col("ch2")
        + D * F.col("nh2") / F.col("ch2") * pc
    )
    probs = (
        counts[2]
        .join(hists[2], wcols(2)[:-1])
        .join(cont, f"w{n}")
        .crossJoin(F.broadcast(nb))
        .select(*wcols(2), p2.alias("p2"))
    )
    for k in range(3, n + 1):
        pk = (
            (F.col(f"c{k}") - D) / F.col(f"ch{k}")
            + D * F.col(f"nh{k}") / F.col(f"ch{k}") * F.col(f"p{k - 1}")
        )
        out_col = (
            pk.alias(f"p{k}")
            if k < n
            else F.round(-F.log(pk) * F.lit(1e6), 0).cast("long").alias("nll")
        )
        probs = (
            counts[k]
            .join(hists[k], wcols(k)[:-1])
            .join(probs, wcols(k - 1))
            .select(*wcols(k), out_col)
        )
    return probs


def trigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Order-3 instance of :func:`ngram_lm_scores` with the original
    trigram output contract (``n_trigrams``); the generalized
    recursion reproduces the old dedicated plan bit-for-bit (same
    suffix column naming, same expression shapes, same join order) —
    pinned by the still-green text_trigram_perplexity oracle."""
    return ngram_lm_scores(
        df, order=3, text_col=text_col, id_col=id_col, discount=discount
    ).withColumnRenamed("n_ngrams", "n_trigrams")


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    order: int = 5,
) -> DataFrame:
    """CCNet's head/middle/tail partition (Wenzek et al. 2020 §4.3):
    per language, split documents into perplexity TERCILES under the
    corpus LM — ``head`` (lowest third of per-doc NLL: most fluent),
    ``middle``, ``tail``. The bucket label is CCNet's primary quality
    signal; training recipes typically keep head+middle.

    Built on :func:`ngram_lm_scores` (default order 5 — CCNet's
    actual KenLM strength); thresholds are exact
    ``percentile_disc`` terciles (element-selecting — no
    interpolation arithmetic to diverge cross-engine) computed per
    language and broadcast back, so the corpus-sized side takes one
    narrow join and no window. Boundary rule: ``nll <= t33`` is head,
    ``<= t67`` middle, else tail (ties fall toward the better
    bucket, the deterministic direction)."""
    scores = ngram_lm_scores(
        df, order=order, text_col=text_col, id_col=id_col
    )
    langs = df.select(F.col(id_col), F.col(lang_col))
    scored = scores.join(langs, id_col)
    thresholds = scored.groupBy(lang_col).agg(
        F.expr(
            "percentile_disc(CAST(1 AS DOUBLE)/3) "
            "WITHIN GROUP (ORDER BY nll_micro_avg)"
        ).alias("t33"),
        F.expr(
            "percentile_disc(CAST(2 AS DOUBLE)/3) "
            "WITHIN GROUP (ORDER BY nll_micro_avg)"
        ).alias("t67"),
    )
    labeled = scored.join(F.broadcast(thresholds), lang_col)
    bucket = (
        F.when(F.col("nll_micro_avg") <= F.col("t33"), F.lit("head"))
        .when(F.col("nll_micro_avg") <= F.col("t67"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return labeled.select(
        F.col(id_col),
        F.col(lang_col),
        "nll_micro_avg",
        bucket.alias("ppl_bucket"),
    )


def _bpe_merge_rounds_py(
    syms_f: list[tuple[list[str], int]], n_merges: int
) -> list[tuple]:
    """Driver replay of ``train_bpe``'s round loop over collected word
    types. Integer pair counts are order-free sums, the argmax order
    is (count desc, s1 asc, s2 asc) — Python str comparison is code-
    point order, identical to Spark's binary UTF-8 string ordering —
    and the merge applies through :func:`_apply_merge_py`, so every
    round lands on the same merge row as the distributed loop."""
    merges: list[tuple] = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in syms_f:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + f
        if not pc:
            break
        (s1, s2), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, s1, s2, int(c)))
        merged = s1 + s2
        syms_f = [
            (_apply_merge_py(s, s1, s2, merged), f) for s, f in syms_f
        ]
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    driver_fit_max_rows: int | None = None,
) -> DataFrame:
    """Distributed byte-pair-encoding trainer (Sennrich et al. 2016):
    ``n_merges`` rounds of count-adjacent-pairs → merge-the-argmax,
    returning the learned merge table (rank, left, right, pair_count).

    Distribution shape, the same vocab-reduction trick as
    ``bpe_pair_counts``: the corpus collapses ONCE to the distinct-word
    frequency table (one combinable shuffle over running words), and
    every subsequent round works on |vocab| symbol sequences — at
    100 TB that is millions of rows, not trillions. Per round: one
    map-side-combined pair count, ONE row collected (the argmax pair —
    the only driver traffic), and a codegen'd left-to-right greedy
    fold (``aggregate`` over the symbol array) applies the merge; a
    symbol formed in this round never participates in the same round,
    matching the reference algorithm. Ties break lexicographically so
    training is deterministic across engines and partitionings.
    localCheckpoint every few rounds truncates the growing lineage
    (the standard iterative-algorithm hygiene, as in operators/graph).
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(F.split("w", "").alias("syms"), "f")
    )
    spark = df.sparkSession
    # Size-gated driver replay (see _FIT_DRIVER_MAX_ROWS): the whole
    # round loop runs on the collected word-type table in ONE job
    # instead of n_merges sequential count+argmax jobs. Bit-identical
    # (pinned by contract_bpe_merge/encode replays and the pytest
    # fast-vs-distributed equivalence test); over-cap vocabularies
    # take the distributed loop below unchanged.
    fit_rows = _collect_word_types(words, driver_fit_max_rows)
    if fit_rows is not None:
        return spark.createDataFrame(
            _bpe_merge_rounds_py(
                [(list(r["syms"]), int(r["f"])) for r in fit_rows],
                n_merges,
            ),
            "rank int, left string, right string, pair_count bigint",
        )
    merges: list[tuple] = []
    for rank in range(n_merges):
        pair_idx = gram_positions(F.col("syms"), 2)
        pairs = words.select(F.explode(pair_idx).alias("i"), "syms", "f").select(
            F.get("syms", F.col("i")).alias("s1"),
            F.get("syms", F.col("i") + 1).alias("s2"),
            "f",
        )
        top = (
            pairs.groupBy("s1", "s2")
            .agg(F.sum("f").alias("c"))
            .orderBy(F.desc("c"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        s1, s2, c = top[0]["s1"], top[0]["s2"], int(top[0]["c"])
        merges.append((rank, s1, s2, c))
        merged = s1 + s2
        step = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == s1)
                & (x == s2)
                # a symbol created THIS round (== merged) must not
                # chain-merge within the round; when s1 is a strict
                # prefix repeat (s1==s1+s2 impossible), element_at
                # equality to s1 already excludes freshly merged cells
                # unless merged == s1, which cannot happen (s2 != "")
                ,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(step.alias("syms"), "f")
        if (rank + 1) % 4 == 0:
            # eager: actually truncates the lineage now — the nested
            # per-round fold expressions otherwise compound analysis
            # cost quadratically across rounds
            words = words.localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def _wordpiece_merge_rounds_py(
    syms_f: list[tuple[list[str], int]], n_merges: int
) -> list[tuple]:
    """Driver replay of ``train_wordpiece``'s round loop (the
    :func:`_bpe_merge_rounds_py` scaffold with the likelihood score).
    The score is computed as ``float(c) / float(f1 * f2)`` — the same
    long→double casts and one double division the Spark expression
    performs — so the (score desc, s1, s2) argmax is bit-identical."""
    merges: list[tuple] = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sf: dict[str, int] = {}
        for syms, f in syms_f:
            for x in syms:
                sf[x] = sf.get(x, 0) + f
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + f
        if not pc:
            break
        (s1, s2), c = min(
            pc.items(),
            key=lambda kv: (
                -(float(kv[1]) / float(sf[kv[0][0]] * sf[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        denom = sf[s1] * sf[s2]
        merges.append((rank, s1, s2, int(c), int(denom)))
        merged = s1 + (s2[2:] if s2.startswith("##") else s2)
        syms_f = [
            (_apply_merge_py(s, s1, s2, merged), f) for s, f in syms_f
        ]
    return merges


def train_wordpiece(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    driver_fit_max_rows: int | None = None,
) -> DataFrame:
    """Distributed WordPiece trainer (Schuster & Nakajima 2012; the
    BERT tokenizer family — the third trainer next to BPE and
    unigram-LM): ``n_merges`` rounds of merge-the-argmax where the
    objective is the LIKELIHOOD score ``count(pair) / (count(left) ·
    count(right))`` rather than BPE's raw pair count — the pair whose
    fusion most increases corpus likelihood under a unigram factor-
    ization. Non-initial symbols carry the ``##`` continuation prefix
    (merging A+B yields ``A + B-without-##``), so the learned vocab
    is directly usable by greedy longest-match encoding.

    Returns (rank, left, right, pair_count, denom) with ``denom =
    count(left)·count(right)`` — the score ships as an EXACT integer
    rational (pair_count/denom), so the oracle replay compares
    integers, never floats.

    Distribution shape = ``train_bpe``'s vocab-reduction scaffold:
    corpus collapses once to the distinct-word frequency table; per
    round one map-side-combined pair count, one symbol count (both
    over |vocab| rows), a 3-way broadcast-scale join for the score,
    ONE collected argmax row, and the same codegen greedy fold
    applies the merge. Ordering: score DESC (double ratio — counts
    are far below the 2^52 scale where two DISTINCT small-integer
    rationals could collide in double), then lexicographic — fully
    deterministic."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            F.concat(
                F.array(F.substring("w", 1, 1)),
                F.transform(
                    F.split(F.expr("substring(w, 2)"), ""),
                    lambda c: F.concat(F.lit("##"), c),
                ),
            ).alias("syms"),
            "f",
        )
        .select(
            F.filter("syms", lambda s: s != F.lit("##")).alias("syms"), "f"
        )
    )
    spark = df.sparkSession
    # Size-gated driver replay — see train_bpe; same cap, same
    # equivalence argument, likelihood score replayed with the exact
    # long→double cast sequence.
    fit_rows = _collect_word_types(words, driver_fit_max_rows)
    if fit_rows is not None:
        return spark.createDataFrame(
            _wordpiece_merge_rounds_py(
                [(list(r["syms"]), int(r["f"])) for r in fit_rows],
                n_merges,
            ),
            "rank int, left string, right string, pair_count bigint, "
            "denom bigint",
        )
    merges: list[tuple] = []
    for rank in range(n_merges):
        pair_idx = gram_positions(F.col("syms"), 2)
        pairs = words.select(
            F.explode(pair_idx).alias("i"), "syms", "f"
        ).select(
            F.get("syms", F.col("i")).alias("s1"),
            F.get("syms", F.col("i") + 1).alias("s2"),
            "f",
        )
        pc = pairs.groupBy("s1", "s2").agg(F.sum("f").alias("c"))
        sc = (
            words.select(F.explode("syms").alias("s"), "f")
            .groupBy("s")
            .agg(F.sum("f").alias("sf"))
        )
        top = (
            pc.join(sc.withColumnRenamed("s", "s1"), "s1")
            .withColumnRenamed("sf", "f1")
            .join(sc.withColumnRenamed("s", "s2"), "s2")
            .withColumnRenamed("sf", "f2")
            .select(
                "s1",
                "s2",
                "c",
                (F.col("f1") * F.col("f2")).alias("denom"),
                (F.col("c") / (F.col("f1") * F.col("f2"))).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        s1, s2 = top[0]["s1"], top[0]["s2"]
        merges.append(
            (rank, s1, s2, int(top[0]["c"]), int(top[0]["denom"]))
        )
        merged = s1 + (s2[2:] if s2.startswith("##") else s2)
        step = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == s1)
                & (x == s2),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(step.alias("syms"), "f")
        if (rank + 1) % 4 == 0:
            words = words.localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, pair_count bigint, "
        "denom bigint",
    )


def wordpiece_vocab(
    df: DataFrame, merges_df: DataFrame, text_col: str = "text"
) -> list[str]:
    """The vocabulary a trained WordPiece model encodes with: every
    initial/continuation single-character form present in the corpus
    plus each merge's output token. Bounded model artifact (the
    BPE-merge-table pattern): one distinct-character collect."""
    chars = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .select(
            F.explode(
                F.concat(
                    F.array(F.substring("w", 1, 1)),
                    F.transform(
                        F.split(F.expr("substring(w, 2)"), ""),
                        lambda c: F.concat(F.lit("##"), c),
                    ),
                )
            ).alias("s")
        )
        .filter(F.col("s") != "##")
        .distinct()
        .collect()
    )
    vocab = {r["s"] for r in chars}
    for r in merges_df.orderBy("rank").collect():
        right = r["right"]
        vocab.add(r["left"] + (right[2:] if right.startswith("##") else right))
    return sorted(vocab)


def _wp_segment(word: str, vset: frozenset, cache: dict) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one word
    (the BERT runtime algorithm): repeatedly take the longest
    vocabulary prefix (``##``-prefixed after the first piece); a word
    with no match at any position becomes one ``[UNK]``. Shared by
    the per-document encoder and the word->pieces model-artifact
    builder so the two cannot drift."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    out: list[str] = []
    i = 0
    while i < len(word):
        end, piece = len(word), None
        while end > i:
            cand = word[i:end] if i == 0 else "##" + word[i:end]
            if cand in vset:
                piece = cand
                break
            end -= 1
        if piece is None:
            out = ["[UNK]"]
            break
        out.append(piece)
        i = end
    cache[word] = out
    return out


def wordpiece_word_pieces(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
) -> DataFrame:
    """The WordPiece MODEL ARTIFACT in fit/apply-split form: one row
    per (word, piece, cnt) over the corpus's DISTINCT words, where
    ``cnt`` is how often ``piece`` occurs in the greedy segmentation
    of ``word``. The tokenizer analog of ``ngram_nll_table`` — fit
    once offline (cost scales with |distinct words|, the Zipf
    exploit, not with tokens), then streamed encoding is a stateless
    word explode + ONE stream-static join + a per-doc aggregate (see
    plans/contracts.py streaming_wordpiece_encode). Streamed words
    absent from the table are novel; the deploy convention is a left
    join coalescing to one ``[UNK]`` piece."""
    from pyspark.sql.functions import pandas_udf

    vset = frozenset(vocab)

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        cache: dict = {}
        return words.map(lambda w: _wp_segment(w, vset, cache))

    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    pieces = words.select("word", F.explode(seg("word")).alias("piece"))
    return pieces.groupBy("word", "piece").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy longest-match-first WordPiece encoding (the BERT
    tokenizer's runtime algorithm): per word, repeatedly take the
    longest vocabulary prefix (``##``-prefixed after the first
    piece); a word with no match at any position becomes one
    ``[UNK]``. Emits per-document (n_subwords, n_distinct_subwords,
    n_unk) — the same Arrow pandas_udf + per-batch word cache shape
    as :func:`bpe_encode` (segmentation is inherently sequential per
    word; cost tracks DISTINCT words, the Zipf exploit)."""
    from pyspark.sql.functions import pandas_udf

    vset = frozenset(vocab)

    @pandas_udf("n_subwords long, n_distinct_subwords long, n_unk long")
    def stats(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        n, nd, nu = [], [], []
        for t in texts:
            words = " ".join((t or "").lower().strip().split()).split(" ")
            subs: list[str] = []
            for w in words:
                if w:
                    subs.extend(_wp_segment(w, vset, cache))
            n.append(len(subs))
            nd.append(len(set(subs)))
            nu.append(sum(1 for s in subs if s == "[UNK]"))
        return pd.DataFrame(
            {"n_subwords": n, "n_distinct_subwords": nd, "n_unk": nu}
        )

    out = df.select(F.col(id_col), stats(F.col(text_col)).alias("s"))
    return out.select(
        id_col, "s.n_subwords", "s.n_distinct_subwords", "s.n_unk"
    )


def _bpe_segment(
    word: str, ranks: dict, cache: dict
) -> list[str]:
    """Rank-priority BPE segmentation of one word (the shared core of
    :func:`bpe_encode` and :func:`bpe_word_pieces`): repeatedly apply
    the best-ranked merge greedily left-to-right until no pair in the
    symbol sequence has a rank."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # apply the single best-ranked merge greedily left-to-right
        pair = (syms[best], syms[best + 1])
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_word_pieces(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """The BPE MODEL ARTIFACT in fit/apply-split form — the third
    member of the trio next to :func:`wordpiece_word_pieces` and
    :func:`unigram_word_pieces` (VERDICT r15 missing #3): one row per
    (word, piece, cnt) over the corpus's DISTINCT words, where
    ``cnt`` is how often ``piece`` occurs in the word's rank-priority
    segmentation. Fit cost scales with |distinct words| (the Zipf
    exploit); streamed encoding is then a stateless word explode +
    ONE stream-static join + a per-doc aggregate (see
    plans/contracts.py streaming_bpe_encode). The deploy convention
    for streamed words absent from the table: a left join coalescing
    ``cnt`` to ``length(word)`` — a novel word with no applicable
    merge segments to its characters, and that count is codegen-
    computable stream-side."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        cache: dict = {}
        return words.map(lambda w: _bpe_segment(w, ranks, cache))

    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    pieces = words.select("word", F.explode(seg("word")).alias("piece"))
    return pieces.groupBy("word", "piece").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table: per document, the token-count
    and distinct-subword stats under the learned segmentation — the
    "measure the corpus under the real tokenizer" step between
    ``train_bpe`` and sequence packing.

    The merge list (typically 10k-50k entries) broadcasts with the
    closure of an Arrow-batched ``pandas_udf``. Applying ranked merges
    is inherently sequential per word (each merge rewrites the symbol
    sequence the next one scans), which is exactly the boundary where
    this engine drops to vectorized Python (same policy as the media
    codecs: Arrow batches in, numpy/str ops inside, never row-at-a-time
    Python in a JVM expression). A per-batch word cache exploits the
    corpus' Zipf shape — each distinct word is segmented once per
    batch, so cost tracks distinct words, mirroring train_bpe's
    vocab-reduction trick.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("n_subwords long, n_distinct_subwords long")
    def stats(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        n, nd = [], []
        for t in texts:
            words = " ".join((t or "").lower().strip().split()).split(" ")
            subs: list[str] = []
            for w in words:
                if w:
                    subs.extend(_bpe_segment(w, ranks, cache))
            n.append(len(subs))
            nd.append(len(set(subs)))
        return pd.DataFrame({"n_subwords": n, "n_distinct_subwords": nd})

    out = df.select(F.col(id_col), stats(F.col(text_col)).alias("s"))
    return out.select(id_col, "s.n_subwords", "s.n_distinct_subwords")


# --------------------------------------------------------------------------
# hashed-n-gram linear quality classifier (fastText shape)
# --------------------------------------------------------------------------
# The CCNet/GPT-3 curation step between heuristic quality scores and
# perplexity filtering: a linear model over hashed word n-grams
# (Joulin et al. 2016, "Bag of Tricks for Efficient Text
# Classification" — fastText's architecture: hash features, look up
# weights, sum, squash). Weights here are PINNED IN CLOSED FORM — a
# multiplicative scramble of the feature hash — so the whole model is
# replayable in ANSI SQL and the gate can hash-compare the score
# arithmetic end to end. Swapping in trained weights = replacing
# `_feature_weight` with a broadcast map lookup; every other part of
# the plan (one narrow scan, zero shuffles, pure codegen expressions)
# is the production shape.
#
# All arithmetic is exact BIGINT in micro-units (1e-6): float dot
# products differ in ULPs across engines, integers never do. The
# squash is the hard sigmoid (clip(x/4 + 1/2, 0, 1) — Courbariaux et
# al. 2016's binarized-net activation), whose integer form is exact;
# it is monotone in the score, so thresholding prob is thresholding
# the dot product, which is all a filter consumes.

CLS_HASH_MOD = 1_000_003  # prime modulus of the char-fold feature hash
CLS_WEIGHT_SPAN = 1997  # prime; weights lie in [-998, 998] micro-units
_CLS_SCRAMBLE = 2_654_435_761  # Knuth's multiplicative-hash constant
_CLS_PAIR_MIX = 8191  # 2^13 - 1, Mersenne prime for bigram mixing


def _char_fold_hash(tok: Column) -> Column:
    """Deterministic polynomial string hash: fold codepoints with
    ``h = (h*31 + cp) % CLS_HASH_MOD``. Verified byte-identical between
    Spark (`aggregate`/`split`/`ascii`) and DuckDB
    (`list_reduce`/`string_split`/`ascii`) including non-ASCII."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % CLS_HASH_MOD,
    )


def _feature_weight(h: Column) -> Column:
    """Closed-form pinned weight (micro-units) for feature hash ``h``:
    scramble the hash, fold into ``[-998, 998]``. Stands in for a
    trained weight table; same formula rendered in the oracle SQL."""
    return (h * _CLS_SCRAMBLE) % CLS_WEIGHT_SPAN - (CLS_WEIGHT_SPAN - 1) // 2


def classifier_score_expr(
    text_col: Column | str = "text", bias_micro: int = 0
) -> tuple[Column, Column]:
    """The classifier as a COLUMN pair ``(n_feats, score_micro)`` —
    composable inside a wider projection (e.g. the raw-web pipeline
    scores right after extraction without a self-join that would
    re-run the upstream Python stage; review r12). See
    :func:`classifier_scores` for the model definition."""
    toks = tokens(text_col)
    hs = F.transform(toks, _char_fold_hash)
    uni = F.aggregate(
        hs, F.lit(0).cast("long"), lambda a, h: a + _feature_weight(h)
    )
    n = F.size(hs)
    bi_hs = F.zip_with(
        F.slice(hs, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(hs, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: (a * _CLS_PAIR_MIX + b) % CLS_HASH_MOD,
    )
    bi = F.aggregate(
        bi_hs, F.lit(0).cast("long"), lambda a, h: a + _feature_weight(h)
    )
    score = F.lit(int(bias_micro)).cast("long") + uni + bi
    n_feats = (n + F.greatest(n - 1, F.lit(0))).cast("long")
    return n_feats, score


def classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias_micro: int = 0,
) -> DataFrame:
    """Score every document with the hashed-bigram linear classifier.

    Returns ``(id_col, n_feats, score_micro, prob_micro, label)``:

    - features = word unigrams + adjacent-word bigrams of the
      normalized whitespace tokens (fastText ``wordNgrams=2``);
      unigram hash = char fold, bigram hash = ``(h1*8191 + h2) % M``;
    - ``score_micro`` = bias + sum of feature weights (exact BIGINT
      micro-units; fastText's mean-vs-sum difference is a monotone
      rescale, irrelevant to thresholding);
    - ``prob_micro`` = hard sigmoid ``clip(500000 + score//4, 0, 1e6)``
      (``div`` truncates toward zero on both engines);
    - ``label`` = ``score_micro > 0``.

    Plan shape: one narrow projection over the scan — tokens, hashes,
    weights, and the two fold-sums are all codegen'd higher-order
    functions; no shuffle, no UDF, no driver round-trip. An empty
    document scores exactly the bias.
    """
    n_feats, score = classifier_score_expr(text_col, bias_micro)
    # truncate-toward-zero score/4 without engine-specific div: the %
    # remainder carries the dividend's sign on both engines, so
    # (score - score % 4) is the exact trunc multiple and the double
    # division by 4 is lossless (power of two)
    quarter = ((score - score % 4) / 4).cast("long")
    prob = F.least(
        F.lit(1_000_000).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.lit(500_000).cast("long") + quarter),
    )
    return df.select(
        F.col(id_col),
        n_feats.alias("n_feats"),
        score.alias("score_micro"),
        prob.alias("prob_micro"),
        (score > 0).alias("label"),
    )


# --------------------------------------------------------------------------
# Unicode normalization (the CCNet/C4 text-normalization step)
# --------------------------------------------------------------------------
# Web text arrives in mixed normalization forms: 'café' as U+00E9 or
# as 'e' + U+0301 are byte-different, hash-different, dedup-different
# strings for the same rendered text. CCNet (Wenzek et al. 2019)
# normalizes before hashing for exactly this reason. Two passes:
#
# - nfc_text: Unicode NFC (canonical composition) — the lossless
#   canonical form every hash/dedup/fingerprint key should see;
# - fold_accents_text: NFD -> drop combining marks (category Mn) ->
#   NFC — CCNet's lowercase-and-strip-accents shape for dedup keys
#   (lossy by design; pair with lower() at the call site).
#
# Spark has no built-in normalizer, so both run as Arrow-batched
# pandas_udfs over Python's unicodedata (the same UAX#15 tables
# DuckDB's utf8proc implements — gate-verified equal engine-pair).
# This is an edge-of-plan stage like the media codecs: normalize once
# at ingest, persist, and every downstream key operator stays codegen.


def nfc_text(col: Column | str) -> Column:
    """Unicode NFC normalization of a string column (NULL-safe)."""
    import unicodedata  # noqa: PLC0415

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc(F.col(col) if isinstance(col, str) else col)


def fold_accents_text(col: Column | str) -> Column:
    """Accent folding: NFD, drop combining marks, recompose (NFC).
    'Élan déjà' -> 'Elan deja'; non-Latin scripts pass through
    (combining marks are dropped in ANY script — the CCNet dedup-key
    convention, lossy by design). NULL-safe."""
    import unicodedata  # noqa: PLC0415

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            d = unicodedata.normalize("NFD", t)
            return unicodedata.normalize(
                "NFC",
                "".join(c for c in d if unicodedata.category(c) != "Mn"),
            )

        return s.map(one)

    return _fold(F.col(col) if isinstance(col, str) else col)


# --------------------------------------------------------------------------
# unigram-LM tokenizer (Kudo 2018 — SentencePiece's second family)
# --------------------------------------------------------------------------
# The other major subword tokenizer next to BPE ("Subword
# Regularization: Improving Neural Network Translation Models with
# Multiple Subword Candidates", ACL 2018): a unigram language model
# over a piece vocabulary, trained by EM over the segmentation
# lattice, pruned down to the target vocabulary, decoded by Viterbi.
# Deterministic core implemented here (deviations documented):
#
# - seed vocabulary = the top substrings (length ≤ max_len) of the
#   DISTINCT-WORD frequency table by occurrence count — the same
#   vocab-reduction trick as train_bpe: every stage below scales with
#   |vocab|, never corpus tokens. All single characters are always
#   kept (words stay segmentable; SentencePiece's required-char rule).
# - EM: the E-step runs forward-backward over each word's lattice in
#   one Arrow mapInPandas pass (per-word float DP — the inherently
#   sequential inner loop, same Python boundary as bpe_encode), and
#   each word's expected piece counts are QUANTIZED TO INTEGER
#   MICRO-UNITS before the corpus-wide aggregate — the PSI/perplexity
#   trick — so the M-step consumes an order-free integer sum and
#   training is bit-reproducible across partitionings and cluster
#   sizes. New log-probs are re-quantized to micro-units between
#   rounds, so every round's inputs are integers.
# - pruning keeps the top pieces by expected count (shrink factor
#   0.75/round toward vocab_size, single chars exempt). SentencePiece
#   ranks by likelihood-loss-on-removal instead; that refinement
#   replaces only this ranking — the distributed shape (per-round:
#   one lattice pass, one bounded aggregate, one |V|-row driver
#   collect, the BPE-trainer driver contract) is unchanged. The
#   Bayesian digamma smoothing of the reference implementation is
#   likewise omitted for cross-engine determinism.
# - Viterbi encode: integer micro-unit scores, ties broken by fewer
#   pieces then longer last piece — a total, engine-replayable order.
#
# Certification mirrors the BPE family: closed-form pinned-replay
# contracts (micro-corpus EM + encode, derived with an independent
# pure-Python implementation, gated as DuckDB VALUES) plus rows-only
# corpus runs; pytest re-derives both against the reference
# implementation in tests.

UNIGRAM_UNK_MICRO = -20_000_000  # lp of an out-of-vocabulary character


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table ``(w, f)`` — the vocab-collapse
    every tokenizer-training stage starts from (one map-side-combined
    shuffle over running words)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def seed_unigram_pieces(
    words: DataFrame, *, max_len: int = 4, seed_size: int = 300
) -> DataFrame:
    """Seed piece table ``(piece, cnt, lp_micro)``: all substrings of
    length ≤ ``max_len`` counted with word multiplicity (codegen
    nested-sequence explode over the |vocab|-sized word table), top
    ``seed_size`` by (count desc, piece asc) plus every single
    character; initial log-probs ∝ count, quantized to micro-units."""
    n = F.length("w")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_len), n - i + 1)),
                lambda ln: F.col("w").substr(i, ln),
            ),
        )
    )
    pieces = (
        words.select(F.explode(subs).alias("piece"), "f")
        .groupBy("piece")
        .agg(F.sum("f").cast("long").alias("cnt"))
    )
    # rank over the AGGREGATED piece table (bounded by |vocab|·max_len
    # distinct substrings, not corpus tokens) — build_vocab precedent
    rnk = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("piece")))
    kept = (
        pieces.withColumn("rnk", rnk)
        .filter((F.col("rnk") <= seed_size) | (F.length("piece") == 1))
        .drop("rnk")
    )
    tot = kept.agg(F.sum("cnt").alias("t"))
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("t").cast("double"))
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("lp_micro"),
    )


def _round_half_up_i(x: float) -> int:
    """Spark's ``ROUND(double, 0)`` exactly: the double's shortest
    decimal representation (``repr`` — the same string
    ``Double.toString`` produces) rounded HALF_UP via ``Decimal``,
    matching the JVM's ``BigDecimal.valueOf(x).setScale(0, HALF_UP)``.
    Python's builtin ``round`` is half-EVEN and would drift on exact
    .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _seed_unigram_py(
    wf: list[tuple[str, int]], *, max_len: int, seed_size: int
) -> dict[str, int]:
    """Driver replay of :func:`seed_unigram_pieces` over collected word
    types: substring counts with word multiplicity, top ``seed_size``
    by (count desc, piece asc) plus every single character, log-probs
    quantized with Spark's HALF_UP round. Returns {piece: lp_micro}."""
    import math

    cnt: dict[str, int] = {}
    for w, f in wf:
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_len, n - i) + 1):
                p = w[i : i + ln]
                cnt[p] = cnt.get(p, 0) + f
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:seed_size]} | {
        p for p in cnt if len(p) == 1
    }
    tot = sum(c for p, c in cnt.items() if p in kept)
    return {
        p: _round_half_up_i(math.log(float(cnt[p]) / float(tot)) * 1e6)
        for p in kept
    }


def _logaddexp(a: float, b: float) -> float:
    import math

    if a < b:
        a, b = b, a
    if b <= -1e29:
        return a
    return a + math.log1p(math.exp(b - a))


def unigram_expected_counts(
    word: str, lp: dict[str, float], max_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for ONE word occurrence
    under the current model — the E-step inner loop (driver-side unit;
    the distributed face batches it through mapInPandas). Pieces not
    in ``lp`` are skipped; single characters are assumed present (the
    seed guarantees it), so every word is segmentable."""
    import math

    n = len(word)
    NEG = -1e30
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_len), i):
            v = lp.get(word[j:i])
            if v is None or alpha[j] <= -1e29:
                continue
            acc = _logaddexp(acc, alpha[j] + v)
        alpha[i] = acc
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = NEG
        for i in range(j + 1, min(n, j + max_len) + 1):
            v = lp.get(word[j:i])
            if v is None or beta[i] <= -1e29:
                continue
            acc = _logaddexp(acc, v + beta[i])
        beta[j] = acc
    z = alpha[n]
    out: dict[str, float] = {}
    if z <= -1e29:
        return out
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            p = word[j:i]
            v = lp.get(p)
            if v is None or alpha[j] <= -1e29 or beta[i] <= -1e29:
                continue
            ll = alpha[j] + v + beta[i] - z
            if ll > -60.0:
                out[p] = out.get(p, 0.0) + math.exp(ll)
    return out


def _unigram_estep(
    words: DataFrame, pieces_lp_micro: dict[str, int], max_len: int
) -> DataFrame:
    """One distributed E-step: expected piece counts over the word
    table, quantized to integer micro-units per WORD TYPE (weight f
    applied before rounding) so the corpus aggregate is an order-free
    integer sum. Returns ``(piece, e_micro)``."""
    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType(), False),
            T.StructField("e_micro", T.LongType(), False),
        ]
    )
    lp = {p: m / 1e6 for p, m in pieces_lp_micro.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["w"], pdf["f"]):
                for p, e in unigram_expected_counts(w, lp, max_len).items():
                    m = int(round(e * int(f) * 1e6))
                    if m:
                        acc[p] = acc.get(p, 0) + m
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "e_micro": list(acc.values())}
            )

    return (
        words.mapInPandas(run, out_schema)
        .groupBy("piece")
        .agg(F.sum("e_micro").alias("e_micro"))
    )


def _unigram_mstep(
    e: dict[str, int],
    pieces: dict[str, int],
    *,
    vocab_size: int,
    shrink: float,
    final_round: bool,
) -> tuple[dict[str, int], dict[str, int]]:
    """One M-step: prune + re-quantize from integer expected counts.

    Returns ``(new_pieces_lp_micro, e_final)``. Single chars are
    REQUIRED, never dropped (the seed guarantee that every word stays
    segmentable): the floor is seeded from the CURRENT model, not just
    the aggregated counts — a single char whose every per-word
    expectation rounds below half a micro-unit never leaves the E-step
    at all (the ``if m:`` guard in ``_unigram_estep``), so a floor on
    only the aggregated dict would never see it and the char — and
    every word containing it — would silently vanish from later
    rounds' lattices (review r13)."""
    import math

    e = dict(e)
    for p in pieces:
        if len(p) == 1:
            e.setdefault(p, 1)
    # prune toward the target (single chars exempt): keep top by
    # (e_micro desc, piece asc)
    multi = sorted(
        ((p, m) for p, m in e.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep_multi = max(
        vocab_size - sum(1 for p in e if len(p) == 1),
        0 if final_round else int(len(multi) * shrink),
    )
    keep_multi = max(keep_multi, 0)
    kept = {p for p, _ in multi[:keep_multi]} | {
        p for p in e if len(p) == 1
    }
    e = {p: (max(m, 1) if len(p) == 1 else m) for p, m in e.items()}
    total = sum(m for p, m in e.items() if p in kept)
    new_pieces = {
        p: int(round(math.log(m / total) * 1e6))
        for p, m in e.items()
        if p in kept and m > 0
    }
    return new_pieces, {p: m for p, m in e.items() if p in new_pieces}


def train_unigram(
    df: DataFrame,
    *,
    vocab_size: int = 120,
    max_len: int = 4,
    seed_size: int = 300,
    em_rounds: int = 3,
    shrink: float = 0.75,
    text_col: str = "text",
    driver_fit_max_rows: int | None = None,
) -> DataFrame:
    """Train the unigram-LM piece vocabulary; returns ``(piece,
    e_micro, lp_micro)`` — final expected counts and quantized
    log-probs, deterministically ordered facts.

    Driver contract (the BPE-trainer precedent): per round, ONE
    |pieces|-bounded collect — the model artifact — plus one lattice
    pass over the |vocab| word table; nothing corpus-sized ever moves.
    See the section comment for the determinism and pruning design.
    """
    if em_rounds < 1 or vocab_size < 1:
        raise ValueError("em_rounds and vocab_size must be >= 1")
    spark = df.sparkSession
    # Size-gated driver replay — see train_bpe. The E-step already
    # quantizes per WORD TYPE to integer micro-units before summing
    # (order-free), and the lattice code is the SAME Python function
    # the distributed mapInPandas face batches, so replaying seed +
    # E-steps over the collected word-type table is bit-identical.
    fit_rows = _collect_word_types(
        word_frequencies(df, text_col), driver_fit_max_rows
    )
    if fit_rows is not None:
        wf = [(r["w"], int(r["f"])) for r in fit_rows]
        pieces = _seed_unigram_py(wf, max_len=max_len, seed_size=seed_size)
        e_final: dict[str, int] = {}
        for rnd in range(em_rounds):
            lp = {p: m / 1e6 for p, m in pieces.items()}
            e: dict[str, int] = {}
            for w, f in wf:
                for p, ev in unigram_expected_counts(w, lp, max_len).items():
                    m = int(round(ev * f * 1e6))
                    if m:
                        e[p] = e.get(p, 0) + m
            pieces, e_final = _unigram_mstep(
                e,
                pieces,
                vocab_size=vocab_size,
                shrink=shrink,
                final_round=rnd == em_rounds - 1,
            )
        rows = [
            (p, e_final.get(p, 0), lp)
            for p, lp in sorted(pieces.items())
        ]
        return spark.createDataFrame(
            rows, "piece string, e_micro long, lp_micro long"
        )
    words = word_frequencies(df, text_col).persist()
    try:
        seed = seed_unigram_pieces(
            words, max_len=max_len, seed_size=seed_size
        ).collect()
        pieces = {r["piece"]: int(r["lp_micro"]) for r in seed}
        e_final: dict[str, int] = {}
        for rnd in range(em_rounds):
            rows = _unigram_estep(words, pieces, max_len).collect()
            e = {r["piece"]: int(r["e_micro"]) for r in rows}
            pieces, e_final = _unigram_mstep(
                e,
                pieces,
                vocab_size=vocab_size,
                shrink=shrink,
                final_round=rnd == em_rounds - 1,
            )
    finally:
        words.unpersist()
    rows = [
        (p, e_final.get(p, 0), lp)
        for p, lp in sorted(pieces.items())
    ]
    return spark.createDataFrame(
        rows, "piece string, e_micro long, lp_micro long"
    )


def unigram_viterbi(
    word: str, lp_micro: dict[str, int], max_len: int
) -> list[str]:
    """Best segmentation under integer micro-unit piece scores —
    maximize total score; ties: fewer pieces, then longer last piece
    (a total, engine-replayable order). Out-of-vocabulary single
    characters score ``UNIGRAM_UNK_MICRO``."""
    n = len(word)
    NEG = -(10**18)
    # dp[i] = (score, -n_pieces); back[i] = start of best last piece
    dp: list[tuple[int, int]] = [(NEG, 0)] * (n + 1)
    dp[0] = (0, 0)
    back = [-1] * (n + 1)
    for i in range(1, n + 1):
        best_key = None
        best_j = -1
        for j in range(max(0, i - max_len), i):
            if dp[j][0] <= NEG // 2:
                continue
            v = lp_micro.get(word[j:i])
            if v is None:
                if i - j == 1:
                    v = UNIGRAM_UNK_MICRO
                else:
                    continue
            # longer last piece = SMALLER j, so j negates in the
            # maximized key (review r12: the un-negated form preferred
            # the shorter last piece, inverting the documented order)
            key = (dp[j][0] + v, dp[j][1] - 1, -j)
            if best_key is None or key > best_key:
                best_key, best_j = key, j
        if best_key is not None:
            dp[i] = (best_key[0], best_key[1])
            back[i] = best_j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_encode(
    df: DataFrame,
    pieces_lp_micro: dict[str, int],
    *,
    max_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-encode every document under a trained piece table:
    ``(id, n_pieces, n_distinct_pieces, n_unk, score_micro)`` — exact
    integer totals, so the whole encode is replayable. Arrow-batched
    ``pandas_udf`` with a per-batch word cache (Zipf: each distinct
    word segments once per batch), the bpe_encode execution shape."""
    from pyspark.sql.functions import pandas_udf

    lp = dict(pieces_lp_micro)
    ml = int(max_len)

    @pandas_udf(
        "n_pieces long, n_distinct_pieces long, n_unk long, score_micro long"
    )
    def stats(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, list[str]] = {}
        np_, nd, nu, sc = [], [], [], []
        for t in texts:
            words = " ".join((t or "").lower().strip().split()).split(" ")
            segs: list[str] = []
            for w in words:
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = unigram_viterbi(w, lp, ml)
                    cache[w] = hit
                segs.extend(hit)
            np_.append(len(segs))
            nd.append(len(set(segs)))
            nu.append(sum(1 for p in segs if p not in lp))
            sc.append(
                sum(lp.get(p, UNIGRAM_UNK_MICRO) for p in segs)
            )
        return pd.DataFrame(
            {
                "n_pieces": np_,
                "n_distinct_pieces": nd,
                "n_unk": nu,
                "score_micro": sc,
            }
        )

    out = df.select(F.col(id_col), stats(F.col(text_col)).alias("s"))
    return out.select(
        id_col,
        "s.n_pieces",
        "s.n_distinct_pieces",
        "s.n_unk",
        "s.score_micro",
    )


def unigram_word_pieces(
    df: DataFrame,
    pieces_lp_micro: dict[str, int],
    *,
    max_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """The unigram-LM tokenizer MODEL ARTIFACT in fit/apply-split
    form: one row per DISTINCT word with its Viterbi totals
    ``(word, n_pieces, n_unk, score_micro)`` — the unigram analog of
    ``wordpiece_word_pieces`` (and of ``ngram_nll_table``). Fit once
    offline (cost scales with |distinct words|); streamed encoding is
    then a stateless word explode + ONE stream-static join + a
    per-doc aggregate with zero stream-side Python (see
    plans/contracts.py streaming_unigram_encode). Uses the SAME
    ``unigram_viterbi`` the batch encoder uses, so the two cannot
    drift. Streamed words absent from the table are novel; the
    deploy convention is a left join coalescing to one UNK piece at
    ``UNIGRAM_UNK_MICRO``."""
    from pyspark.sql.functions import pandas_udf

    lp = dict(pieces_lp_micro)
    ml = int(max_len)

    @pandas_udf("n_pieces long, n_unk long, score_micro long")
    def seg(words: pd.Series) -> pd.DataFrame:
        n, nu, sc = [], [], []
        for w in words:
            pieces = unigram_viterbi(w, lp, ml)
            n.append(len(pieces))
            nu.append(sum(1 for p in pieces if p not in lp))
            sc.append(sum(lp.get(p, UNIGRAM_UNK_MICRO) for p in pieces))
        return pd.DataFrame({"n_pieces": n, "n_unk": nu, "score_micro": sc})

    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    return words.select("word", seg("word").alias("s")).select(
        "word", "s.n_pieces", "s.n_unk", "s.score_micro"
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson-Spärck Jones / Okapi)
# --------------------------------------------------------------------------
def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25
    (k1 = 1.2, b = 0.75) — the corpus search/inspection primitive
    (find the documents most like a probe query: contamination
    spot-checks, quality auditing, eval-set neighborhood checks).

    Exactness: with k1 = 6/5 and b = 3/4, each term's score is the
    rational  idf · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    = idf_micro · 22·tf·TL / (10·TL·tf + 3·TL + 9·dl·N)
    after multiplying through by 10·TL (TL = total corpus tokens,
    N = docs, dl = doc length) — numerator and denominator are EXACT
    BIGINTs, the one division per (doc, term) is IEEE-identical on
    identical integers, and idf_micro = round(1e6·ln((2N+2)/(2df+1)))
    — Lucene's non-negative idf form ln(1+(N−df+0.5)/(df+0.5)), so a
    term appearing in over half the corpus dampens instead of
    flipping the ranking — is the PSI recipe (one ln over one exact
    integer ratio). Per-doc totals sum the rounded per-term micro scores —
    order-free integers. At 100 TB the BIGINT products approach 2^63;
    swap the two product expressions to DECIMAL(38,0) (same plan,
    wider accumulator — the decimal_sum trade documented in
    functions/numeric.py).

    Plan shape: one tokenize+explode restricted to the query terms
    BEFORE any shuffle (the filter rides the scan projection), one
    map-side-combined (doc, term) tf aggregate, a term-level df
    aggregate of |query| rows broadcast back, corpus stats (N, TL) as
    one broadcast row, and TakeOrderedAndProject for the top-k —
    never a global sort, nothing corpus-wide moves except the
    qualifying postings.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    toks = df.select(F.col(id_col), tokens(text_col).alias("t"))
    lens = toks.select(F.col(id_col), F.size("t").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    # dl rides the postings (functionally dependent on the doc id), so
    # scoring never re-joins the corpus-sized lengths table
    hits = (
        toks.select(
            F.col(id_col),
            F.size("t").cast("long").alias("dl"),
            F.explode("t").alias("term"),
        )
        .filter(F.col("term").isin(qt))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
    )
    dfreq = hits.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("dfreq")
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (2 * F.col("n_docs") + 2).cast("double")
                / (2 * F.col("dfreq") + 1).cast("double")
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = (
        hits.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(
                (
                    F.col("idf_micro") * 22 * F.col("tf") * F.col("total_len")
                ).cast("double")
                / (
                    10 * F.col("total_len") * F.col("tf")
                    + 3 * F.col("total_len")
                    + 9 * F.col("dl") * F.col("n_docs")
                ).cast("double"),
                0,
            )
            .cast("long")
            .alias("term_score_micro"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.sum("term_score_micro").alias("score_micro"),
    )
    return per_doc.orderBy(
        F.desc("score_micro"), F.asc(id_col)
    ).limit(int(k))


# --------------------------------------------------------------------------
# sentence segmentation (RE2-portable rule-based splitter)
# --------------------------------------------------------------------------
# One regex, no lookaround (DuckDB is RE2; Java regex has lookbehind
# but the oracle could not replay it): a sentence is a maximal run of
# non-terminator characters followed by its run of terminators
# ([.!?]+); a trailing unterminated fragment is its own sentence.
# Empty docs yield zero sentences. The chunker packs CONSECUTIVE
# sentences greedily into a character budget — the chunk boundary
# quality step between char-blind chunk_documents and model windows
# (splitting mid-sentence degrades training examples) — as a pure
# codegen fold over the sentence array: no shuffle, no window, no UDF.
_SENTENCE_RE = r"[^.!?]+[.!?]*|[.!?]+"


def sentences(text_col: Column | str = "text") -> Column:
    """``array<string>`` of trimmed, non-empty sentences."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    raw = F.regexp_extract_all(c, F.lit(_SENTENCE_RE), 0)
    # explicit 1-arg lambda: transform hands (element, index) to any
    # 2-arg callable, and F.trim's optional second parameter would
    # silently become a trim-character list (review: the deprecation
    # warning was the only symptom)
    return F.filter(F.transform(raw, lambda s: F.trim(s)), lambda s: s != "")


def sentence_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc sentence accounting: count, total/max sentence chars,
    and the greedy sentence-boundary chunk count for a 200-char
    budget (a sentence longer than the budget takes a chunk alone) —
    all from one codegen fold, replayable in SQL."""
    sents = sentences(text_col)
    lens = F.transform(sents, F.length)
    # greedy pack: state = (chunks_so_far, chars_in_open_chunk)
    packed = F.aggregate(
        lens,
        F.struct(
            F.lit(0).cast("long").alias("chunks"),
            F.lit(0).cast("long").alias("open"),
        ),
        lambda acc, ln: F.when(
            acc["chunks"] == 0,
            F.struct(
                F.lit(1).cast("long").alias("chunks"),
                ln.cast("long").alias("open"),
            ),
        )
        .when(
            acc["open"] + ln <= 200,
            F.struct(
                acc["chunks"].alias("chunks"),
                (acc["open"] + ln).alias("open"),
            ),
        )
        .otherwise(
            F.struct(
                (acc["chunks"] + 1).alias("chunks"),
                ln.cast("long").alias("open"),
            )
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(sents).cast("long").alias("n_sentences"),
        F.coalesce(
            F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0),
        ).alias("sentence_chars"),
        F.coalesce(F.array_max(lens), F.lit(0)).cast("long").alias(
            "max_sentence_chars"
        ),
        packed["chunks"].alias("n_chunks_200"),
    )
