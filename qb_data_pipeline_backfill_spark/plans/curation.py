r"""Corpus-curation query surface: chunking, packing, vocab, band filter.

Registered twins of operators/curation.py, each with an exact DuckDB
oracle. Token counts reuse the BPE-ish pre-tokenizer already proven
cross-engine by text_token_stats (plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import curation as C
from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table

# DuckDB fragment: per-document BPE-ish token count (parity with
# operators.text.bpe_ish_token_count, proven by text_token_stats).
_BPE_COUNT = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.plans.llm import _docs as docs

    return docs(spark, sf_dir)


@register(
    "doc_chunking",
    oracle="""
    SELECT doc_id,
           CAST(i AS BIGINT) // 300 AS chunk_id,
           CAST(i AS BIGINT) AS chunk_start,
           CAST(length(substring(text, i + 1, 400)) AS BIGINT) AS chunk_chars,
           md5(substring(text, i + 1, 400)) AS chunk_hash
    FROM documents, LATERAL unnest(generate_series(0, length(text) - 1, 300)) AS t(i)
    WHERE length(text) >= 1
    """,
    doc="Model-window chunking: 400-char chunks, 100-char overlap "
    "(starts every 300), emitted as (chunk_id, start, len, md5). Pure "
    "narrow sequence+posexplode+substring plan — zero shuffles, chunking "
    "parallelizes with the scan.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.chunk_documents(
        _docs(spark, sf_dir), size=400, overlap=100
    )


@register(
    "sequence_packing",
    oracle=f"""
    WITH sized AS (
        SELECT lang, doc_id, {_BPE_COUNT} AS n_tok
        FROM documents
    ), packed AS (
        SELECT lang, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 2048 AS BIGINT) AS pack_bin
        FROM sized
    )
    SELECT lang, pack_bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY lang, pack_bin
    """,
    doc="Greedy sequence packing into 2048-token bins per language "
    "shard (streaming-fill: bin = exclusive-running-sum // budget). The "
    "window partitions by the shard key so every shard packs in "
    "parallel — no global window at any scale.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    packed = C.pack_greedy(
        docs,
        size_col=C.doc_token_count("text"),
        budget=2048,
        partition_col="lang",
        order_col="doc_id",
    )
    return C.pack_summary(packed, "lang")


@register(
    "vocab_build",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(string_split(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        FROM documents
    ), counts AS (
        SELECT term, COUNT(*) AS n FROM toks
        WHERE length(term) > 0
        GROUP BY term HAVING COUNT(*) >= 5
    )
    SELECT term,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS term_id,
           n
    FROM counts
    """,
    doc="Pruned vocabulary with contiguous frequency-ranked ids: one "
    "map-side-combined shuffle on term; id assignment windows over the "
    "aggregated vocabulary (|V| rows), not the corpus.",
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.build_vocab(_docs(spark, sf_dir), min_count=5)


@register(
    "quality_band_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, CAST({_BPE_COUNT} AS BIGINT) AS score
        FROM documents
    ), bounds AS (
        SELECT quantile_disc(score, 0.1) AS lo, quantile_disc(score, 0.9) AS hi
        FROM scored
    )
    SELECT s.doc_id, s.score
    FROM scored s, bounds b
    WHERE s.score >= b.lo AND s.score <= b.hi
    """,
    doc="Percentile-band outlier trim: keep documents inside the "
    "[p10, p90] token-count band. Thresholds come from ONE percentile_disc "
    "aggregate (exact, element-selecting — no interpolation arithmetic) "
    "reduced to a single broadcast row; the filter stays a narrow scan.",
)
def quality_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.percentile_band_filter(
        _docs(spark, sf_dir), score=C.doc_token_count("text"), lo=0.1, hi=0.9
    )


@register(
    "score_normalize_per_lang",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, CAST({_BPE_COUNT} AS BIGINT) AS score
        FROM documents
    )
    SELECT doc_id, lang, score,
           ROUND(PERCENT_RANK() OVER (PARTITION BY lang
                                      ORDER BY score, doc_id), 6) AS pct_rank
    FROM scored
    """,
    doc="Percentile-rank normalization of a quality score WITHIN each "
    "language shard (cross-lingual score comparability — raw token "
    "counts aren't comparable across languages). The window partitions "
    "by lang, so normalization parallelizes per shard; the (score, "
    "doc_id) order is total, making percent_rank an exact small "
    "rational on both engines.",
)
def score_normalize_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    scored = _docs(spark, sf_dir).select(
        "doc_id", "lang", C.doc_token_count("text").alias("score")
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    return scored.select(
        "doc_id",
        "lang",
        "score",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "training_shard_manifest",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, text, CAST({_BPE_COUNT} AS BIGINT) AS score,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents
    ),
    bounds AS (
        SELECT quantile_disc(score, 0.05) AS lo, quantile_disc(score, 0.95) AS hi
        FROM scored
    ),
    kept AS (
        SELECT s.* FROM scored s, bounds b
        WHERE s.score >= b.lo AND s.score <= b.hi
    ),
    canonical AS (
        SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY norm
    ),
    eligible AS (
        SELECT k.doc_id, k.lang, k.text FROM kept k
        JOIN canonical c ON k.doc_id = c.doc_id
    ),
    chunked AS (
        SELECT doc_id, lang,
               COUNT(*) AS n_chunks,
               CAST(SUM(length(substring(text, i + 1, 400))) AS BIGINT) AS chunk_chars
        FROM eligible, LATERAL unnest(generate_series(0, length(text) - 1, 300)) AS t(i)
        WHERE length(text) >= 1
        GROUP BY doc_id, lang
    ),
    packed AS (
        SELECT lang, n_chunks, chunk_chars,
               CAST(COALESCE(SUM(chunk_chars) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 8000 AS BIGINT) AS shard
        FROM chunked
    )
    SELECT lang, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(chunk_chars) AS BIGINT) AS total_chars
    FROM packed
    GROUP BY lang, shard
    """,
    doc="The end-to-end training-shard pipeline as ONE declarative "
    "plan: percentile-band quality trim (p5-p95) -> exact content "
    "dedup (canonical min-id per normalized text) -> overlapping "
    "chunking -> greedy per-language packing into ~8000-char shards "
    "-> shard manifest. Every stage is an already-certified operator; "
    "Catalyst fuses the whole chain (narrow stages stay pipelined, "
    "the only shuffles are the dedup hash-aggregate, the per-lang "
    "packing window, and the final manifest rollup).",
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.dedup import exact_dedup
    from qb_data_pipeline_backfill_spark.operators.text import normalize_text

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id", "lang", "text", C.doc_token_count("text").alias("score")
    )
    bounds = scored.agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY score)").alias("__lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY score)").alias("__hi"),
    )
    kept = (
        scored.crossJoin(F.broadcast(bounds))
        .filter((F.col("score") >= F.col("__lo")) & (F.col("score") <= F.col("__hi")))
        .select("doc_id", "lang", "text")
    )
    canonical = (
        kept.groupBy(F.sha2(normalize_text("text"), 256).alias("__k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    eligible = kept.join(canonical, "doc_id")
    chunked = (
        C.chunk_documents(eligible, size=400, overlap=100)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_chars").cast("long").alias("chunk_chars"),
        )
        .join(eligible.select("doc_id", "lang"), "doc_id")
    )
    packed = C.pack_greedy(
        chunked,
        size_col=F.col("chunk_chars"),
        budget=8000,
        partition_col="lang",
        order_col="doc_id",
    ).withColumnRenamed("pack_bin", "shard")
    return packed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").cast("long").alias("n_chunks"),
        F.sum("chunk_chars").cast("long").alias("total_chars"),
    )


@register(
    "vocab_coverage_oov",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        FROM documents
    ),
    occurrences AS (
        SELECT lang, term FROM toks WHERE length(term) > 0
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
            FROM occurrences GROUP BY term
        ) WHERE rk <= 20
    )
    SELECT o.lang,
           COUNT(*) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.term IS NOT NULL) AS BIGINT) AS n_covered,
           CAST(COUNT(*) FILTER (WHERE v.term IS NULL) AS BIGINT) AS n_oov
    FROM occurrences o LEFT JOIN vocab v ON o.term = v.term
    GROUP BY o.lang
    """,
    doc="Vocabulary coverage report: token occurrences covered by the "
    "global top-20 vocabulary vs out-of-vocabulary, per language — the "
    "coverage curve that drives vocab-size choices. The tiny ranked "
    "vocab broadcasts; the occurrence stream stays a narrow scan into "
    "one aggregate.",
)
def vocab_coverage_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from qb_data_pipeline_backfill_spark.operators.text import tokens

    occ = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(tokens("text")).alias("term"))
        .filter(F.length("term") > 0)
    )
    # unpartitioned window over the AGGREGATED vocabulary (|V| rows,
    # not corpus rows) — the single-partition rank pass is bounded by
    # vocab size, same shape as operators/curation.py build_vocab
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    vocab = (
        occ.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        occ.join(F.broadcast(vocab), "term", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab"), 1)).alias("n_covered"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )


@register(
    "sample_weighted_by_length",
    oracle="""
    WITH wm AS (SELECT MAX(n_chars) AS wmax FROM documents)
    SELECT doc_id, n_chars
    FROM documents, wm
    WHERE substring(md5('weighted|' || CAST(doc_id AS VARCHAR)), 1, 8)
          < printf('%08x', LEAST(n_chars * 4294967296 // wmax, 4294967295))
    """,
    doc="Weighted deterministic sampling: inclusion probability "
    "proportional to document length (token-budget-fair subsampling), "
    "with the per-row threshold rendered as fixed-width hex so the "
    "membership test stays the engine-neutral string compare the "
    "uniform samplers use — all integer arithmetic, no RNG, no float; "
    "row membership is identical across engines, partitionings, and "
    "runs. One broadcast max + a narrow filter.",
)
def sample_weighted_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.sample import hash_prefix

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    wmax = docs.agg(F.max("n_chars").alias("wmax"))
    thr = F.format_string(
        "%08x",
        F.least(
            F.expr("CAST(n_chars AS BIGINT) * 4294967296 div wmax"),
            F.lit(4294967295).cast("long"),
        ),
    )
    return (
        docs.crossJoin(F.broadcast(wmax))
        .filter(hash_prefix(["doc_id"], salt="weighted") < thr)
        .select("doc_id", "n_chars")
    )
