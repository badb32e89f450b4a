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
