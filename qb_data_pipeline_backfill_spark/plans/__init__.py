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
# Round-15 rotation, exactly as pre-committed in the r14 window note
# and ordered by VERDICT r14 #1: (a) the queries NEW in r15 (JPEG
# 4:2:0 contract, GIF contract + GIF perceptual dedup, the persisted
# image-index incremental + streaming faces, streaming WordPiece
# encode) plus contract_jpeg_decode_replay, whose decoder/encoder the
# 4:2:0 generalization rewrote; (b) the seven r14-late queries that
# have NEVER received a driver grade (streaming_fivegram_perplexity
# also had its oracle-splice escaping fixed this round); (c)
# dedup_simhash, which yielded its r14 slot; (d) MECHANICAL
# OLDEST-FIRST fill from per-name last-graded rounds computed over
# CORRECTNESS_r01..14 — the r6 stragglers, the full r7 block, then
# the r9 block alphabetically as far as the 50 reach
# (session_windows_events, incremental_rollup_merge,
# multimodal_frame_alignment,
# quality_band_filter, range_join_attribution, retention_cohorts,
# rolling_user_window, score_normalize_per_lang, udtf_term_counts and
# value_histogram are next, queued for r16).
# Every registered query is still re-verified in the local full
# sweep (tools/check_correctness.py, sf0.01) each round regardless.
prioritize(
    [
        # --- (a) new in r15 / r15-code-touched ---
        "contract_jpeg420_decode_replay",
        "contract_jpeg_gray_decode_replay",
        "contract_tiff_decode_replay",
        "contract_png_types_decode_replay",
        "contract_gif_decode_replay",
        "dedup_image_dhash_gif",
        "dedup_image_dhash_jpeg420",
        "dedup_image_dhash_crossformat",
        "dedup_incremental_image",
        "streaming_incremental_image",
        "streaming_wordpiece_encode",
        "streaming_unigram_encode",
        "multimodal_audio_g711_stats",
        "streaming_audio_g711",
        "contract_jpeg_decode_replay",
        # --- (b) r14-late, first driver grade (VERDICT r14 #1) ---
        "dedup_image_dhash_jpeg",
        "multimodal_mp4_frame_stats",
        "contract_wordpiece_merge_replay",
        "contract_wordpiece_encode_replay",
        "wordpiece_encode_stats",
        "streaming_fivegram_perplexity",
        "warc_gzip_parse",
        # --- (c) yielded its r14 slot ---
        "dedup_simhash",
        # --- (d) oldest-first: last graded r6 ---
        "running_total_per_customer",
        "status_priority_cube",
        "topk_orders_per_customer",
        "tumbling_window_events",
        # --- (d) oldest-first: last graded r7 ---
        "anti_join_idempotence",
        "coalesce_filter_key",
        "decontamination_bloom_prefilter",
        "dedup_semantic_prune",
        "doc_chunking",
        "equidepth_histogram",
        "exists_correlated_orders",
        "full_outer_reconciliation",
        "group_percentiles",
        "grouping_sets_report",
        "having_fraction_of_total",
        "isin_predicate",
        "json_extract_props",
        "multimodal_byte_features",
        "outlier_report",
        "pq_encode_codes",
        "semi_join_probe",
        "training_shard_manifest",
        "txn_bloom_point_lookup",
        "validate_dedup_first_wins",
        "vocab_build",
        "vocab_coverage_oov",
        "zorder_clustering_key",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
