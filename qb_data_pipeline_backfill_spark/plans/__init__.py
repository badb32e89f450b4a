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
# Round-11 rotation (VERDICT r10 #2): (a) everything round 11 touched —
# the de-hinted TPC-H Q3/Q5 analogs (forced fact-scaled-dim broadcasts
# dropped, AQE chooses), the size-gated streaming dim join, the three
# queries NEW this round (txn_table_health, txn_scd2_apply,
# contract_heavy_hitters), the zone-map paths fixed for
# date-widened stats (_cmp_stat), the _sql_str/_values_df literal
# rendering plus the new backslash edge doc that changes the whole
# text-family input, and the BPE contracts that share _sql_str; then
# (b) the now-stalest blocks — last driver grade r08/r09: streaming_*,
# salted_*, the window/subquery/unpivot/rollup block,
# numeric_profile/covariance, sequence packing, simhash, the remaining
# txn CDC queries, and recursive_reachability (which gave its r10 slot
# to txn_files_metadata). The full registry is additionally verified
# locally each round (tools/check_correctness.py, sf0.01, full sweep).
prioritize(
    [
        # --- (a) round-11 code-touched ---
        "txn_table_health",
        "txn_scd2_apply",
        "top_revenue_orders",
        "local_supplier_revenue",
        "streaming_enriched_rollup",
        "txn_type_widening",
        "txn_widening_lanes",
        "txn_count_where",
        "txn_snapshot_minmax",
        # txn_files_metadata (r10-graded, table_files untouched this
        # round) yields its slot to txn_scd2_apply, new this round;
        # it stays in the local full sweep
        "contract_bpe_merge_replay",
        "contract_bpe_encode_replay",
        "contract_heavy_hitters",
        "constraint_report",
        "text_token_stats",
        "text_ngram_topk",
        "text_tfidf_topk",
        "text_quality_scores",
        "text_language_scores",
        "text_fingerprint",
        "text_repetition_scores",
        "text_lang_corpus_stats",
        "text_bigram_perplexity",
        "corpus_curation",
        "dedup_paragraph_rewrite",
        # --- (b) stalest: last driver grade r08/r09 ---
        "streaming_tumbling_window",
        "streaming_sliding_window",
        "streaming_stream_stream_join",
        "streaming_session_window",
        "streaming_stateful_counts",
        "streaming_dedup_exactly_once",
        "streaming_interval_join_outer",
        "streaming_top_users",
        "streaming_media_decode",
        "streaming_txn_cdf",
        "streaming_drift_psi",
        "salted_collect_stats",
        "salted_join_segment_revenue",
        "window_function_suite",
        # rolling_user_window: same r08/r09 window block, represented
        # by window_function_suite; its slot goes to the NEW
        # contract_heavy_hitters (untested-by-definition code first)
        "scalar_subquery_max_qty",
        "unpivot_measures",
        "region_nation_rollup",
        "numeric_profile",
        "numeric_covariance",
        "sequence_packing",
        "dedup_simhash",
        "txn_cdf_feed",
        "txn_replace_where_read",
        "txn_merge_cdc_read",
        "txn_maintenance_cycle",
        "recursive_reachability",
        # The r10-graded blocks (the remaining txn fixtures, jsonl/orc
        # round trips, leakage, cdc/scd2/funnel, the sample_* and
        # sketch families, the graph family) rotate out this round:
        # their records are one round old, while everything above is
        # either code-touched this round or 2+ rounds stale; all are
        # re-verified in the local full sweep regardless.
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
