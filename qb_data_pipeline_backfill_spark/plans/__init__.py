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
# Round-7 rotation (VERDICT r6 #3): (a) everything round 7 touched —
# the whole txn/CDC family (change-feed recording became per-table
# opt-in; commit paths, stream planner, log readers, and
# table_changes' snapshot resolution all changed) plus the two new
# round-7 queries; then (b) the 14 records whose last driver grade
# was r03, and (c) 24 of the 49 r04-era records, certification
# contracts and the two bench-wobble suspects (dedup_embedding_lsh,
# similarity_ann_ivf) first. The remaining 25 r04-era records
# (incl. hypertable_rollup_daily and incremental_rollup_merge,
# displaced by the new round-7 entries) rotate in round 8. r05/r06 greens are
# the freshest and wait. The full registry was additionally verified
# locally this round (tools/check_correctness.py, sf0.01, full
# sweep), and the replay-sensitive CDC gate queries were re-run
# back to back after every commit-path change.
prioritize(
    [
        # --- (a) round-7 code-touched: txn/CDC family + new operators ---
        "txn_maintenance_cycle",
        "dedup_semantic_prune",
        "streaming_txn_cdf",
        "txn_cdf_feed",
        "txn_cdf_log_feed",
        "txn_cdf_log_net_feed",
        "txn_cdf_rollup_maintenance",
        "txn_replica_audit",
        "txn_merge_cdc_read",
        "txn_replace_where_read",
        "txn_mor_delete_read",
        "txn_bloom_point_lookup",
        # --- (b) last driver grade r03 ---
        "anti_join_idempotence",
        "coalesce_filter_key",
        "constraint_report",
        "isin_predicate",
        "json_extract_props",
        "multimodal_byte_features",
        "numeric_covariance",
        "outlier_report",
        "semi_join_probe",
        "session_windows_events",
        "streaming_stateful_counts",
        "text_repetition_scores",
        "validate_dedup_first_wins",
        "zorder_clustering_key",
        # --- (c) last driver grade r04: contracts + wobble watch first ---
        "contract_bloom_prune",
        "contract_hll_merge",
        "decontamination_bloom_prefilter",
        "dedup_embedding_lsh",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "similarity_ann_ivf",
        "similarity_ann_lsh",
        "pq_encode_codes",
        "pagerank_parts",
        "recursive_reachability",
        "cdc_latest_state",
        "doc_chunking",
        "sequence_packing",
        "training_shard_manifest",
        "vocab_build",
        "vocab_coverage_oov",
        "sample_weighted_by_length",
        "equidepth_histogram",
        "exists_correlated_orders",
        "full_outer_reconciliation",
        "group_percentiles",
        "grouping_sets_report",
        "having_fraction_of_total",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
