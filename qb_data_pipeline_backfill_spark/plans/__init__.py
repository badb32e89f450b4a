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

# The driver's correctness gate covers the first 50 registry entries;
# put queries WITHOUT a green artifact of record first: the 6 red in
# CORRECTNESS_r03 (TIMESTAMP_NTZ breakage, fixed in tables/jobs), the
# 5 rows-only fuzzy operators that have never landed a driver row,
# everything new in round 4, then the r02-green queries that fell past
# r03's window (oldest artifacts, refresh while space remains).
# Queries green in r03 keep that artifact outside this round's window.
prioritize(
    [
        # --- red in CORRECTNESS_r03: fixed, must re-prove ---
        "streaming_tumbling_window",
        "streaming_session_window",
        "streaming_dedup_exactly_once",
        "streaming_enriched_rollup",
        "range_join_attribution",
        "hypertable_rollup_daily",
        # --- rows-only fuzzy ops with no driver row yet ---
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_lsh",
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        # --- new in round 4 ---
        "doc_chunking",
        "sequence_packing",
        "vocab_build",
        "quality_band_filter",
        "retention_cohorts",
        "rolling_user_window",
        "group_percentiles",
        "exists_correlated_orders",
        "scalar_subquery_max_qty",
        "having_fraction_of_total",
        "recursive_reachability",
        "streaming_sliding_window",
        "streaming_stream_stream_join",
        "streaming_interval_join_outer",
        "incremental_rollup_merge",
        "value_histogram",
        "contract_bloom_prune",
        "contract_hll_merge",
        "decontamination_bloom_prefilter",
        "vocab_coverage_oov",
        "sample_weighted_by_length",
        "equidepth_histogram",
        "local_supplier_revenue",
        "streaming_top_users",
        "pq_encode_codes",
        "grouping_sets_report",
        "jsonl_roundtrip_scan",
        "orc_roundtrip_scan",
        "multimodal_frame_alignment",
        "pagerank_parts",
        "training_shard_manifest",
        "udtf_term_counts",
        "pandas_udaf_cents_sum",
        "unpivot_measures",
        "full_outer_reconciliation",
        "score_normalize_per_lang",
        # --- r02-green queries that fell past r03's 50-entry window ---
        "salted_collect_stats",
        "salted_join_segment_revenue",
        "cdc_latest_state",
        "window_function_suite",
        "set_ops_report",
        "dedup_exact_text",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "similarity_cosine_topk",
        "text_token_stats",
        "text_ngram_topk",
        "text_quality_scores",
        "text_language_scores",
        "corpus_curation",
        "text_lang_corpus_stats",
        "sample_eval_holdout",
        "sample_train_val_test",
        "sample_stratified_rebalance",
        "envelope_projection",
        "ingest_validate_dedup",
        "upper_median_by_segment",
        "invoice_line_explode",
        "volumetry_unionall",
        "integrity_report",
        "approx_distinct_report",
        "dup_detection_having",
        "filtered_aggregates",
        "minmax_dates",
        "date_window_filter",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
