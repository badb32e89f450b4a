"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Generalizes the reference's keyed relational dedup
(``drop_duplicates(subset=['id'])``,
reference: data_exporters/save_to_raw_customers_py.py:20) to the
content-level dedup a training-data pipeline runs over billions of
documents. Design rules for the 100 TB posture:

- **Never all-pairs.** Every fuzzy-dedup path generates candidates by
  bucketing (LSH bands / SimHash chunks / shared n-grams) and only
  compares within buckets. No cartesian products anywhere.
- **Signatures are computed narrow.** MinHash/SimHash signatures are
  per-row higher-order-function expressions (no explode, no shuffle);
  the only shuffle is the bucket groupBy.
- **Skew guard.** Pathological buckets (boilerplate shingles shared by
  millions of docs) are capped by ``max_bucket`` — at 100 TB an
  uncapped hot bucket turns one task into a quadratic straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.text import (
    normalize_text,
    tokens,
    word_ngrams,
)


# --------------------------------------------------------------------------
# exact content dedup
# --------------------------------------------------------------------------
def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per normalized text content.

    The shuffle key is a 256-bit content hash, not the text itself, so
    at scale the exchange carries 32 bytes per row instead of the
    document body. min_by keeps the winner in a single aggregate
    (map-side partial, one shuffle).
    """
    key = F.sha2(normalize_text(text_col), 256).alias("content_key")
    return (
        df.select(key, F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


# --------------------------------------------------------------------------
# character shingles + MinHash-LSH
# --------------------------------------------------------------------------
def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text."""
    c = normalize_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - k + 1, F.lit(1))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )


_MERSENNE_P = (1 << 31) - 1


def _mix_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pair per hash function for the universal
    family ``(a·h + b) mod p``, md5-derived (stable across runs).
    Operands stay < 2^31 so the mix never overflows a signed long
    under ANSI arithmetic."""
    import hashlib

    out = []
    for j in range(num_hashes):
        h = hashlib.md5(f"minhash:{j}".encode()).hexdigest()
        a = int(h[:8], 16) % (_MERSENNE_P - 1) + 1  # 1 .. p-1
        b = int(h[8:16], 16) % _MERSENNE_P  # 0 .. p-1
        out.append((a, b))
    return out


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``).

    Each shingle is xxhash64'd once per evaluation; the k-function
    family is the universal mix ``(a_j·h + b_j) mod (2³¹−1)`` — k
    multiply-adds per shingle instead of k full string hashes. Pure
    expression — evaluated inside the scan stage, no shuffle.
    (``minhash_lsh_pairs`` uses the aggregate form instead, which
    shares the base hash across all k functions.)
    """
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)))

    def mix(a: int, b: int):
        # closure factory: PySpark infers higher-order-function arity
        # from the lambda's parameter count, so captured constants must
        # NOT appear as default parameters.
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))

    return F.array(
        *[
            F.array_min(F.transform(hashes, mix(a, b)))
            for (a, b) in _mix_constants(num_hashes)
        ]
    )


def _bucket_pairs(
    with_sig: DataFrame,
    id_col: str,
    sig_col: str,
    band_exprs: list[Column],
    max_bucket: int,
    est_fn,
) -> DataFrame:
    """Shared band→bucket→within-bucket-pairs plumbing.

    ``band_exprs`` yields one (band_idx, band_hash) per band; docs
    colliding in ANY band become candidate pairs. One shuffle on the
    band hash; pairs are generated inside each bucket (bounded by
    ``max_bucket``), then deduped across bands.
    """
    bands = with_sig.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(F.array(*band_exprs)).alias("band"),
    ).select(id_col, sig_col, "band.band_idx", "band.band_hash")

    members = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(sig_col).alias("s")))
    )
    buckets = (
        bands.groupBy("band_idx", "band_hash")
        .agg(members.alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("members"), i + F.lit(2), F.size(F.col("members"))
                        ),
                        lambda y: F.struct(
                            x.getField("i").alias("doc_a"),
                            y.getField("i").alias("doc_b"),
                            est_fn(x.getField("s"), y.getField("s")).alias("est"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.est")
    # The same pair can collide in several bands — keep one row.
    return pairs.groupBy("doc_a", "doc_b").agg(F.first("est").alias("est"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    shingle → minhash → band → bucket-join, never all-pairs. With 16
    bands × 4 rows the S-curve midpoint is ≈ (1/16)^(1/4) ≈ 0.5
    Jaccard, so 0.7+ near-dups are caught with high probability.
    ``est`` is the signature-agreement Jaccard estimate; pairs below
    ``threshold`` are dropped after estimation.
    """
    with_sig = _minhash_sigs(df, text_col, id_col, num_hashes, shingle_k)
    band_exprs = _band_exprs(num_hashes, bands)
    out = _bucket_pairs(
        with_sig, id_col, "sig", band_exprs, max_bucket, _est_jaccard(num_hashes)
    )
    return out.filter(F.col("est") >= threshold).select(
        "doc_a", "doc_b", F.col("est").alias("est_jaccard")
    )


def _minhash_sigs(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_k: int
) -> DataFrame:
    """(id, sig array<bigint>) per document.

    Hash each shingle ONCE (explode → xxhash64), then take the k
    affine-mix minima as k map-side-combined aggregates — Catalyst's
    projection collapse would re-evaluate a per-row expression form
    k times, so the agg form is the one that actually shares the
    base hash. One shuffle of k longs per doc."""
    shingled = df.select(
        F.col(id_col), F.explode(char_shingles(text_col, shingle_k)).alias("s")
    ).select(F.col(id_col), F.pmod(F.xxhash64("s"), F.lit(_MERSENNE_P)).alias("h"))
    # The k min-mix aggregates are built as ONE parsed SQL string per
    # aggregate (r17, guide §1.2 step 2 applied to the DRIVER): the
    # Column-API form issued ~80 py4j round trips per hash function
    # (~5 s of measured plan-construction latency per signature tree at
    # k=64); F.expr parses the identical expression JVM-side in one
    # call. Analyzed trees are the same — same integer literals, same
    # pmod/min — so plans and results are bit-identical.
    mins = shingled.groupBy(id_col).agg(
        *[
            F.expr(f"min(pmod(h * {a} + {b}, {_MERSENNE_P})) AS _m{j}")
            for j, (a, b) in enumerate(_mix_constants(num_hashes))
        ]
    )
    return mins.select(
        F.col(id_col),
        F.expr(
            "array(" + ",".join(f"_m{j}" for j in range(num_hashes)) + ") AS sig"
        ),
    )


def _band_exprs(num_hashes: int, bands: int) -> list[Column]:
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} evenly "
            "(a remainder would silently ignore trailing hashes; "
            "bands > num_hashes would band empty slices and emit "
            "nothing)"
        )
    rows_per_band = num_hashes // bands
    # One parsed SQL struct per band instead of ~10 py4j calls each
    # (same r17 build-latency move as _minhash_sigs) — identical
    # analyzed expression: int literals, slice, two-arg xxhash64.
    return [
        F.expr(
            f"struct({b} AS band_idx, "
            f"xxhash64(slice(sig, {b * rows_per_band + 1}, {rows_per_band}), "
            f"{b}) AS band_hash)"
        )
        for b in range(bands)
    ]


def _est_jaccard(num_hashes: int):
    def est(sa: Column, sb: Column) -> Column:
        eq = F.zip_with(sa, sb, lambda x, y: (x == y).cast("int"))
        return F.round(
            F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double")
            / F.lit(num_hashes),
            4,
        )

    return est


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """The PERSISTABLE LSH index of a corpus batch: one row per
    (band_idx, band_hash, doc_id, sig). Write it once (ideally
    bucketed on band_hash via operators/layout.py so later probe
    joins co-locate without shuffling the index), append each new
    batch's rows, and incremental dedup never re-shingles history —
    the cross-RUN scaling story for a corpus that grows daily."""
    with_sig = _minhash_sigs(df, text_col, id_col, num_hashes, shingle_k)
    return with_sig.select(
        F.col(id_col),
        "sig",
        F.explode(F.array(*_band_exprs(num_hashes, bands))).alias("band"),
    ).select("band.band_idx", "band.band_hash", id_col, "sig")


def incremental_minhash_pairs(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against a persisted corpus index
    (plus within-batch pairs) — without recomputing one signature of
    history. Exactly the pairs ``minhash_lsh_pairs`` over the full
    corpus would emit restricted to pairs touching the new batch
    (pytest-certified equality, including the skew cap: bucket size
    is counted over index ∪ new, matching the full run's cap).

    Plan: shingle/sign the new batch only, join its band rows against
    the index on (band_idx, band_hash) — a hash join whose shuffle is
    the new batch plus matching index partitions (none of history
    moves if the index table is bucketed on the join key). Returns
    (doc_a, doc_b, est_jaccard) canonically ordered doc_a < doc_b —
    the SAME ordering as the full-corpus run, so incremental and full
    results compare set-equal. Note doc_b is therefore the LARGER id,
    not necessarily the new-batch side: with non-monotonic ids a
    backfilled new doc can sort below its historical match, so decide
    which copy to keep by an explicit policy (e.g. smallest id wins),
    never by pair side (r7 review: the old wording invited deleting
    the historical keeper).
    """
    # r16 optimization (guide §2.4): the old shape probed the index
    # with two hash joins (new ⋈ bucket-sizes ⋈ index∪new), whose
    # THREE references to the signature subtrees were not exchange-
    # reused at runtime (final adaptive plan: 10 parquet scans,
    # 0 ReusedExchange — history AND the new batch were re-shingled
    # per reference). One bucket groupBy over index ∪ flagged-new
    # computes each side's signatures exactly once and replaces both
    # joins: candidate pairs are generated within each bucket's
    # collected members (the _bucket_pairs shape), kept only when at
    # least one side is new. The signature-agreement estimate is a
    # symmetric integer count, so every emitted (doc_a, doc_b, est)
    # is bit-identical to the join form; the skew cap still counts
    # TOTAL membership (history + new), and all-history buckets are
    # dropped before pair generation rather than after.
    #
    # ACCEPTED TRADEOFF (ADVICE r16): the size filter runs AFTER
    # collect_list materializes a bucket's member array, so one
    # aggregation buffer briefly holds a hot bucket before it is
    # dropped — bounded per member at num_hashes longs + id (~0.5 KB
    # at k=64), i.e. ~0.5 MB per 1,000-member bucket and linear
    # beyond. A count-first pre-filter would bound that, but its
    # count aggregate is a SECOND exchange over the same band rows
    # whose canonical plan differs from the collect exchange, so the
    # runtime re-executes the full signature/decode map side per
    # reference — exactly the 3× recompute this r16 rewrite removed.
    # If num_hashes or expected hot-bucket mass ever grows, revisit
    # with an eagerly materialized band table feeding both aggregates.
    new_rows = minhash_band_index(
        new_docs, text_col, id_col, num_hashes, bands, shingle_k
    )
    all_rows = index.withColumn("__new", F.lit(False)).unionByName(
        new_rows.withColumn("__new", F.lit(True))
    )
    members = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("i"),
                F.col("sig").alias("s"),
                F.col("__new").alias("n"),
            )
        )
    )
    buckets = (
        all_rows.groupBy("band_idx", "band_hash")
        .agg(members.alias("members"))
        .filter(
            (F.size("members") >= 2)
            & (F.size("members") <= max_bucket)
            & F.exists("members", lambda m: m.getField("n"))
        )
    )
    est = _est_jaccard(num_hashes)
    # candidates are filtered on (x.new | y.new) BEFORE the struct is
    # built (ADVICE r16), so the signature-agreement fold never runs
    # for the history-history pairs a large mostly-history bucket is
    # dominated by — same kept pairs, same est arithmetic.
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda x, i: F.transform(
                        F.filter(
                            F.slice(
                                F.col("members"),
                                i + F.lit(2),
                                F.size(F.col("members")),
                            ),
                            lambda y: x.getField("n") | y.getField("n"),
                        ),
                        lambda y: F.struct(
                            x.getField("i").alias("doc_a"),
                            y.getField("i").alias("doc_b"),
                            est(x.getField("s"), y.getField("s")).alias(
                                "est"
                            ),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.est")
    # a doc_id present in BOTH index and new batch would meet itself
    # in its bucket; the join form's hid != nid filter dropped that
    pairs = pairs.filter(F.col("doc_a") != F.col("doc_b"))
    out = pairs.groupBy("doc_a", "doc_b").agg(F.first("est").alias("est"))
    return out.filter(F.col("est") >= threshold).select(
        "doc_a", "doc_b", F.col("est").alias("est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def _chunk_bounds(n_chunks: int, total_bits: int = 64) -> list[tuple[int, int]]:
    """Partition ``total_bits`` into ``n_chunks`` near-equal
    (start, width) chunks; 4 chunks reproduce the classic 16-bit
    layout exactly."""
    cuts = [round(total_bits * c / n_chunks) for c in range(n_chunks + 1)]
    return [(cuts[c], cuts[c + 1] - cuts[c]) for c in range(n_chunks)]


def _simhash_chunks_agg(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bounds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """SimHash of the token multiset (classic construction: each token
    votes ±1 per bit position of its 64-bit hash; a simhash bit is 1
    where the vote sum is positive), computed via explode + codegen'd
    aggregates: hash each token ONCE, then 64 conditional-SUM bit
    votes inside whole-stage codegen. One shuffle, map-side combined.
    ``bounds`` lists each chunk's (start_bit, width) — default the
    classic 4×16 split; the pigeonhole banding passes ``max_hamming
    + 1`` chunks instead.

    Chunks are BIGINT: narrow radii mean wide chunks (``max_hamming
    = 1`` → two 32-bit chunks whose values reach 2^32−1, overflowing
    an int cast under ANSI; ``max_hamming = 0`` → one 64-bit chunk).
    For a width-64 chunk, bit 63 folds into the long sign bit
    (``-(1 << 63)``) — the signed-64 reinterpretation of the unsigned
    bit pattern, still injective per pattern and overflow-free.
    """
    bounds = bounds or _chunk_bounds(4)
    n_bits = max(st + w for st, w in bounds)
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).select(F.col(id_col), F.xxhash64("t").alias("h"))
    # Vote and chunk trees parsed as one SQL string each (r17 driver-
    # latency move, see _minhash_sigs): identical analyzed expressions
    # — CASE WHEN bit-test votes, CASE WHEN weighted bit sums — built
    # in ~70 py4j calls instead of ~2,000. The j=63 weight is written
    # shiftleft(1, 63) because the parser rejects the min-long literal;
    # it constant-folds to the same -(1 << 63) value.
    votes = tok.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {pos}) & 1) = 1 "
                f"THEN 1 ELSE -1 END) AS _v{pos}"
            )
            for pos in range(n_bits)
        ]
    )
    chunk_sqls = []
    for start, width in bounds:
        terms = [
            (
                f"CASE WHEN _v{start + j} > 0 THEN "
                + (
                    "shiftleft(CAST(1 AS BIGINT), 63)"
                    if j == 63
                    else f"CAST({1 << j} AS BIGINT)"
                )
                + " ELSE CAST(0 AS BIGINT) END"
            )
            for j in range(width)
        ]
        chunk_sqls.append("CAST(" + " + ".join(terms) + " AS BIGINT)")
    return votes.select(
        F.col(id_col),
        F.expr("array(" + ", ".join(chunk_sqls) + ") AS sig"),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding with ``max_hamming + 1`` chunks over the 64-bit
    signature: any pair within Hamming ``max_hamming`` must agree on
    at least one whole chunk — bucket by (chunk_idx, chunk value),
    compare within buckets only. The chunk count ADAPTS to the radius
    (r7 review: a fixed 4-chunk split silently missed qualifying
    pairs at distance >= 4 — one differing bit per chunk defeats the
    pigeonhole); larger radii mean narrower chunks and hotter buckets,
    bounded by ``max_bucket`` as always.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_chunks = max_hamming + 1
    with_sig = _simhash_chunks_agg(
        df, text_col, id_col, bounds=_chunk_bounds(n_chunks)
    )
    band_exprs = [
        F.struct(
            F.lit(c).alias("band_idx"),
            F.get(F.col("sig"), c).cast("bigint").alias("band_hash"),
        )
        for c in range(n_chunks)
    ]

    def hamming(sa: Column, sb: Column) -> Column:
        x = F.zip_with(sa, sb, lambda a, b: F.bit_count(a.bitwiseXOR(b)))
        return F.aggregate(x, F.lit(0), lambda acc, v: acc + v).cast("double")

    out = _bucket_pairs(with_sig, id_col, "sig", band_exprs, max_bucket, hamming)
    return out.filter(F.col("est") <= max_hamming).select(
        "doc_a", "doc_b", F.col("est").cast("int").alias("hamming")
    )


# --------------------------------------------------------------------------
# train-vs-eval decontamination (n-gram collision report)
# --------------------------------------------------------------------------
def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Decontamination report: training documents sharing ≥ 1 distinct
    word-``n``-gram with any held-out evaluation document, with the
    shared-gram and matched-eval-doc counts — the standard pre-training
    hygiene pass that keeps benchmark text out of the training mix.

    Inverted-index join on the gram (never doc×doc). At 100 TB, join
    on ``xxhash64(gram)`` instead of the string to shrink the shuffle
    width (collision-tolerant: a 64-bit collision can only ADD a
    candidate, and candidates are reviewed/dropped anyway); the string
    join is kept here for exact cross-engine parity with the oracle.
    Hot boilerplate grams are naturally bounded because per-doc grams
    are DISTINCT; add a gram-document-frequency cap before the join if
    an eval set ever contains giant boilerplate.
    """
    tg = train.select(
        F.col(id_col).alias("train_doc_id"),
        F.explode(word_ngrams(tokens(text_col), n)).alias("gram"),
    )
    eg = eval_df.select(
        F.col(id_col).alias("eval_doc_id"),
        F.explode(word_ngrams(tokens(text_col), n)).alias("gram"),
    )
    return (
        tg.join(eg, "gram")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        )
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (index-join, SQL-expressible)
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for pairs sharing ≥ 1 gram.

    An inverted-index self-join: explode distinct grams, join on the
    gram, count shared grams per pair, Jaccard = shared/(|A|+|B|−shared).
    Exact — and therefore quadratic in the worst case; at 100 TB run it
    only on LSH candidates (``minhash_lsh_pairs``), not the full corpus.
    """
    # r16 optimization (guide §2.4): the per-doc gram count is the SIZE
    # of the distinct-gram array, so carry it through the explode (8
    # bytes per gram row) instead of re-scanning + re-aggregating the
    # corpus twice for the old sa/sb join-backs — 4 scans/explodes
    # become 2 and two joins disappear; the count is functionally
    # dependent on the doc id, so adding it to the pair groupBy changes
    # no groups and the jaccard arithmetic is bit-identical.
    # explode_OUTER + a post-filter on the generated column, not plain
    # explode: InferFiltersFromGenerate would otherwise pin a
    # size(..)>0 filter under the Generate and push it through the
    # projection, INLINING the whole gram-array expression twice more
    # per row at the scan (measured 4x slower). A null gram row only
    # arises from an empty/null array (word_ngrams never emits null
    # elements), so the filter reproduces plain-explode semantics.
    grams = (
        df.select(
            F.col(id_col), word_ngrams(tokens(text_col), n).alias("__grams")
        )
        .select(
            F.col(id_col),
            F.size("__grams").alias("__ng"),
            F.explode_outer("__grams").alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, "gram")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.__ng").alias("na"),
            F.col("b.__ng").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dup_gram_doc_fraction(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document fraction of word n-grams shared with other documents
    — the corpus-level duplicate-n-gram quality signal (the Gopher /
    RefinedWeb "duplicate n-gram" filter), complementary to
    ``text.repetition_scores`` which measures only *intra*-document
    repetition.

    Two map-side-combinable shuffles, both keyed on the gram: (1) count
    distinct documents per gram, (2) join the counts back to the
    per-doc gram set — Catalyst co-partitions both sides on the same
    key — then a per-doc aggregate. Never doc×doc. At 100 TB the gram
    string would be replaced by a 64-bit hash to narrow the exchange
    (collisions only perturb a quality *score*, not membership);
    kept as the raw string here so the DuckDB oracle can replay it
    exactly.
    """
    from pyspark.sql.window import Window

    from qb_data_pipeline_backfill_spark.operators.text import tokens, word_ngrams

    grams = df.select(
        F.col(id_col),
        F.explode(word_ngrams(tokens(text_col), n)).alias("gram"),
    )
    # r17 (guide §2.4): the old groupBy(gram)+join-back referenced the
    # gram table twice with DIFFERENT exchanges (one partial-agg, one
    # raw probe), so the corpus was scanned/tokenized/exploded twice
    # and shuffled twice. A count window over the gram partition is the
    # same per-gram document count from ONE exchange and one sort — no
    # join, one corpus pass. Skew exposure is unchanged: the join form
    # also co-located every instance of a hot gram in one partition on
    # the probe side.
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    dup = F.sum(
        F.when(F.col("n_docs") >= min_docs, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        grams.select(F.col(id_col), n_docs.alias("n_docs"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            dup.alias("dup_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "dup_grams",
            F.round(F.col("dup_grams") / F.col("n_grams"), 4).alias("dup_fraction"),
        )
    )


def repeated_substring_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal cross-document repeated token SPANS — the exact
    substring-level dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), which removes
    verbatim repeated passages rather than whole near-dup documents.
    Their single-machine tool builds a suffix array; the distributed
    equivalent: a position is *duplicated* when its k-token gram occurs
    in ≥2 distinct documents, and every maximal run of consecutive
    duplicated positions is one span (a shared passage of length
    L ≥ k yields L−k+1 consecutive duplicated grams, so the island
    reconstructs the full passage extent).

    Plan shape: one gram-keyed aggregate (map-side combinable) to find
    shared grams, one co-partitioned join back to positions, then a
    per-document window for the gaps-and-islands merge — never
    doc×doc, and the window partitions by document so its state is
    bounded by document length. ``hash_grams=True`` is the 100 TB
    shuffle shape: the gram narrows to its xxhash64 before the
    exchange (8 bytes instead of the k-token string; a cross-document
    collision between two DIFFERENT grams can fabricate a spurious
    duplicated position — a false positive span, never a dropped one —
    with probability ~2^-64 per gram pair, negligible at 64 bits) —
    ``contract_substring_hash_parity`` gates the hashed path against
    the exact string-keyed oracle. Default keeps the raw string so the
    DuckDB oracle replays it exactly — same trade as
    ``dup_gram_doc_fraction``.

    Returns (doc_id, span_start, span_tokens, n_dup_grams): token
    offset of the span, its extent in tokens, and the duplicated-gram
    run length inside it.
    """
    from pyspark.sql.window import Window

    from qb_data_pipeline_backfill_spark.operators.text import tokens

    toks = df.select(F.col(id_col), tokens(text_col).alias("t"))
    pos_idx = F.when(
        F.size("t") >= k, F.sequence(F.lit(0), F.size("t") - k)
    ).otherwise(F.array().cast("array<int>"))
    gram_text = F.concat_ws(" ", F.slice("t", F.col("pos") + 1, F.lit(k)))
    grams = toks.select(
        F.col(id_col), F.explode(pos_idx).alias("pos"), "t"
    ).select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        (F.xxhash64(gram_text) if hash_grams else gram_text).alias("gram"),
    )
    shared = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("gram")
    )
    dup_pos = grams.join(shared, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn(
        "__island", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + k).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("__island")
    )


def edit_distance_pairs(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs of documents whose normalized texts are within edit
    (Levenshtein) distance ``k`` — a PassJoin-style segment-blocked
    string similarity join (Li, Deng, Feng, "PassJoin: A Partition-
    based Method for Similarity Joins", VLDB 2012). The string-
    similarity sibling of the set-based MinHash/Jaccard family:
    catches char-level noise (typos, OCR damage, small insertions)
    that token-set methods blur over.

    Blocking, never all-pairs: each string is partitioned into k+1
    contiguous segments (pigeonhole: ≤ k edits leave ≥ 1 segment an
    EXACT substring of the other string at a bounded position). The
    index side emits its k+1 (segment_idx, length, segment) keys; the
    probe side emits, per candidate indexed length l_b within ±k of
    its own, the substrings at the multi-match-aware positions
    δ ∈ [max(−i, Δ−(k−i)), min(i, Δ+(k−i))] (Δ = l_a − l_b) — O(k²)
    probe keys per string instead of O(n) comparisons. Candidates
    collide in one hash join on (segment_idx, l_b, substring), then
    exact Levenshtein verifies. Both sides are narrow projections; the
    verify join rejoins texts by id. Completeness is oracle-certified
    (the gate's quadratic-levenshtein DuckDB replay would go red on
    any missed pair).
    """
    from qb_data_pipeline_backfill_spark.operators.text import normalize_text

    n_seg = k + 1
    d = df.select(
        F.col(id_col).alias("id"),
        normalize_text(text_col).alias("t"),
    ).withColumn("l", F.length("t"))

    seg_i = F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i")

    def seg_len(l: Column, i: Column) -> Column:
        base, rem = (l / n_seg).cast("int"), l % n_seg
        return base + F.when(i < rem, 1).otherwise(0)

    def seg_start(l: Column, i: Column) -> Column:  # 0-based
        base, rem = (l / n_seg).cast("int"), l % n_seg
        return i * base + F.least(i, rem)

    index = d.select("id", "t", "l", seg_i).select(
        F.col("id").alias("id_b"),
        "i",
        F.col("l").alias("lb"),
        F.col("t")
        .substr(seg_start(F.col("l"), F.col("i")) + 1, seg_len(F.col("l"), F.col("i")))
        .alias("sub"),
    )

    lb = F.explode(
        F.sequence(F.greatest(F.col("l") - k, F.lit(0)), F.col("l") + k)
    ).alias("lb")
    probe = d.select("id", "t", "l", lb).select("id", "t", "l", "lb", seg_i)
    delta = F.col("l") - F.col("lb")
    lo = F.greatest(-F.col("i"), delta - (F.lit(k) - F.col("i")))
    hi = F.least(F.col("i"), delta + (F.lit(k) - F.col("i")))
    probe = (
        probe.filter(lo <= hi)
        .select(
            "id",
            "t",
            "l",
            "lb",
            "i",
            F.explode(F.sequence(lo, hi)).alias("dl"),
        )
        .withColumn("p", seg_start(F.col("lb"), F.col("i")) + F.col("dl"))
        .withColumn("slen", seg_len(F.col("lb"), F.col("i")))
        .filter((F.col("p") >= 0) & (F.col("p") + F.col("slen") <= F.col("l")))
        .select(
            F.col("id").alias("id_a"),
            "i",
            "lb",
            F.col("t").substr(F.col("p") + 1, F.col("slen")).alias("sub"),
        )
    )

    cand = (
        probe.join(index, ["i", "lb", "sub"])
        .filter(F.col("id_a") > F.col("id_b"))
        .select(
            F.col("id_b").alias("doc_a"), F.col("id_a").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ta = d.select(F.col("id").alias("doc_a"), F.col("t").alias("ta"))
    tb = d.select(F.col("id").alias("doc_b"), F.col("t").alias("tb"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("edit_distance", F.levenshtein("ta", "tb"))
        .filter(F.col("edit_distance") <= k)
        .select("doc_a", "doc_b", "edit_distance")
    )


# --------------------------------------------------------------------------
# paragraph-level dedup (corpus-wide first-occurrence rewrite)
# --------------------------------------------------------------------------


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide paragraph dedup, the Dolma / CCNet curation shape
    (Soldaini et al. 2024 §2.2; the reference has no content-level
    analog — its dedup is keyed rows,
    data_exporters/save_to_raw_customers_py.py:20): split every
    document on ``sep``, keep each distinct paragraph only at its
    globally FIRST occurrence (ordered by ``(id_col, position)``), and
    rewrite each document as its surviving paragraphs joined by
    ``sep`` in original order. Repeats WITHIN a document collapse to
    the first position by the same rule. Documents whose every
    paragraph was seen earlier vanish from the output (Dolma drops
    empty docs rather than emit "" shells).

    Returns ``(id_col, text_col, n_paragraphs, n_kept)`` — the
    pre/post paragraph counts per surviving document.

    Scale shape: first-occurrence election is ``groupBy(paragraph
    hash).agg(min(struct(id, pos)))`` — a map-side-combined partial
    aggregate, NOT a window, so a boilerplate paragraph repeated
    across millions of documents combines locally instead of fanning
    one hot key into a single reducer (the skew guard a
    ``row_number() OVER (PARTITION BY paragraph)`` plan lacks). Two
    shuffles total: the election (32-byte sha256 key) and the
    per-document reassembly."""
    pid, pos, para, h = "__pd_id", "__pd_pos", "__pd_para", "__pd_h"
    paras = df.select(
        F.col(id_col).alias(pid),
        # \Q..\E: sep is a LITERAL separator (Spark split takes a
        # regex; an unquoted "." or "|" would split on everything)
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E", -1)
        ).alias(pos, para),
    ).withColumn(h, F.sha2(F.col(para), 256))
    # distinct names on the election side: the semi-join is a self-join
    # on shared lineage, and same-name references would be ambiguous
    firsts = (
        paras.groupBy(h)
        .agg(F.min(F.struct(F.col(pid), F.col(pos))).alias("__pd_f"))
        .select(
            F.col(h).alias("__pd_hr"),
            F.col("__pd_f." + pid).alias("__pd_idr"),
            F.col("__pd_f." + pos).alias("__pd_posr"),
        )
    )
    kept = paras.join(
        firsts,
        (F.col(h) == F.col("__pd_hr"))
        & (F.col(pid) == F.col("__pd_idr"))
        & (F.col(pos) == F.col("__pd_posr")),
        "left_semi",
    )
    totals = paras.groupBy(pid).agg(F.count(F.lit(1)).alias("n_paragraphs"))
    rebuilt = kept.groupBy(pid).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(pos), F.col(para)))),
                lambda s: s[para],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return rebuilt.join(totals, pid).select(
        F.col(pid).alias(id_col), text_col, "n_paragraphs", "n_kept"
    )
