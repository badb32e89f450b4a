"""Query plans: named (spark, sf_dir) -> DataFrame callables + DuckDB oracles.

Importing this package populates the registry; each submodule groups
one slice of the engine's surface.
"""

from qb_data_pipeline_backfill_spark.plans import analytics  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import contracts  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import ingestion  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import llm  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import nested  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import relational  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import rest  # noqa: F401
from qb_data_pipeline_backfill_spark.plans import stream_plans  # noqa: F401
from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    prioritize,
    queries,
)

# The driver's correctness gate covers the first 50 registry entries;
# put queries WITHOUT a green CORRECTNESS_r02 row first — the 12 that
# fell past last round's window (REST + streaming + the tail of the
# relational surface) and everything new in round 3 — so the signal of
# record covers the unproven surface. Previously-green queries keep
# their r02 artifact even if they fall outside this round's window.
prioritize(
    [
        # --- unchecked in CORRECTNESS_r02 (registry-order overflow) ---
        "coalesce_filter_key",
        "json_extract_props",
        "isin_predicate",
        "semi_join_probe",
        "anti_join_idempotence",
        "validate_dedup_first_wins",
        "rest_source_scan",
        "rest_source_filtered",
        "streaming_tumbling_window",
        "streaming_session_window",
        "streaming_stateful_counts",
        "streaming_dedup_exactly_once",
        # --- fixed gate entry (r02 row was a canonicalizer error) ---
        "multimodal_byte_features",
        # --- new in round 3 ---
        "csv_http_scan",
        "contract_minhash_recall",
        "contract_simhash_recall",
        "contract_embedding_lsh_recall",
        "contract_ann_lsh_recall",
        "contract_ann_ivf_recall",
        "contract_approx_median",
        "text_repetition_scores",
        "decontamination_overlap",
        "dedup_cluster_resolution",
        "timeseries_gap_fill",
        "pii_scrub",
        "numeric_profile",
        "constraint_report",
        "zorder_clustering_key",
        "kmeans_codebook",
        "status_priority_cube",
        "scd2_intervals",
        "funnel_conversion",
        "numeric_covariance",
        "streaming_enriched_rollup",
        "outlier_report",
        # --- operators whose plans changed this round (re-prove) ---
        "text_fingerprint",
        "text_tfidf_topk",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
