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
# Round-17 rotation (VERDICT r16 next #5): (a) queries whose operator
# code this optimization round TOUCHED, so the driver re-grades them
# (triangle adjacency-intersection, dup-gram window rewrite,
# numeric-profile split, minhash/simhash expr-string trees, LM-fit
# driver replay, pagerank broadcast loop, DSIR literal); several of
# the touched contract twins are already in (b)/(c). (b) the full
# r11 remainder — scalar_subquery_max_qty through
# window_function_suite, last graded round 11 (oldest-first fill
# from per-name last-graded rounds over CORRECTNESS_r01..16).
# (c) the r12 block alphabetically as far as the 50 reach (the
# remaining r12 names — min_cost_supplier onwards — are next,
# queued for r18).
# Every registered query is still re-verified in the local full
# sweep (tools/check_correctness.py, sf0.01) each round regardless.
prioritize(
    [
        # --- (a) r17-touched operators (oracled members) ---
        "triangle_counts_parts",
        "corpus_dup_gram_stats",
        "numeric_profile",
        "contract_minhash_recall",
        "pagerank_parts",
        "text_trigram_perplexity",
        "text_fivegram_perplexity",
        "text_perplexity_buckets",
        "streaming_fivegram_perplexity",
        # --- (b) oldest-first: the full r11 remainder ---
        "scalar_subquery_max_qty",
        "sequence_packing",
        "streaming_dedup_exactly_once",
        "streaming_drift_psi",
        "streaming_enriched_rollup",
        "streaming_interval_join_outer",
        "streaming_media_decode",
        "streaming_session_window",
        "streaming_sliding_window",
        "streaming_stateful_counts",
        "streaming_stream_stream_join",
        "streaming_top_users",
        "streaming_tumbling_window",
        "streaming_txn_cdf",
        "text_fingerprint",
        "text_lang_corpus_stats",
        "text_language_scores",
        "text_ngram_topk",
        "text_quality_scores",
        "text_repetition_scores",
        "text_tfidf_topk",
        "text_token_stats",
        "top_revenue_orders",
        "txn_cdf_feed",
        "txn_count_where",
        "txn_maintenance_cycle",
        "txn_merge_cdc_read",
        "txn_replace_where_read",
        "txn_snapshot_minmax",
        "txn_type_widening",
        "txn_widening_lanes",
        "unpivot_measures",
        "window_function_suite",
        # --- (c) oldest-first: r12 block, alphabetical ---
        "contract_heavy_hitters",
        "contract_incremental_minhash",
        "contract_simhash_recall",
        "disjunctive_brand_revenue",
        "dormant_customer_balances",
        "dsir_select_topk",
        "excess_stock_suppliers",
        "important_stock_parts",
        "large_qty_order_customers",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
