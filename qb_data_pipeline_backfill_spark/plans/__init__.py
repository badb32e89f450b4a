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
# Round-10 rotation (VERDICT r9 #5): (a) everything round 10 touched —
# the two queries NEW this round (txn_widening_lanes, txn_count_where),
# txn_type_widening (driver-red in r8+r9, now rewritten hash-trivial
# with a forced fixture rebuild — the round's #1 done criterion), every
# pinned fixture converted to the fingerprinted _atomic_rebuild, the
# whole _docs_edge/text family (VALUES-literal edge rows + tokenizer
# materialization + run-quantified punctuation), and leakage_safe_splits
# (size-gated cluster-map join); then (b) the stalest never-regraded
# block — last driver grade r05-r07: cdc/scd2/funnel, the sample_*
# family, the sketch contracts, pii_scrub, timeseries_gap_fill, and
# the graph family. The full registry is additionally verified locally
# each round (tools/check_correctness.py, sf0.01, full sweep).
prioritize(
    [
        # --- (a) round-10 code-touched ---
        "txn_type_widening",
        "txn_widening_lanes",
        "txn_count_where",
        "txn_files_metadata",
        "txn_mor_delete_read",
        "txn_cdf_log_feed",
        "txn_cdf_log_net_feed",
        "txn_cdf_rollup_maintenance",
        "txn_replica_audit",
        "txn_idempotent_stream_append",
        "txn_zorder_compact",
        "txn_restore_rollback",
        "txn_table_history",
        "txn_snapshot_count",
        "txn_snapshot_minmax",
        "jsonl_roundtrip_scan",
        "orc_roundtrip_scan",
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
        "leakage_safe_splits",
        # --- (b) stalest: last driver grade r05-r07 ---
        "cdc_latest_state",
        "scd2_intervals",
        "funnel_conversion",
        "pii_scrub",
        "timeseries_gap_fill",
        "drift_psi_report",
        "sample_eval_holdout",
        "sample_train_val_test",
        "sample_stratified_rebalance",
        "sample_temperature_mixture",
        "sample_domain_quota",
        "sample_weighted_by_length",
        "cms_frequency_contract",
        "quantile_sketch_contract",
        "contract_approx_median",
        "contract_bloom_prune",
        "contract_hll_intersection",
        "contract_hll_merge",
        "pagerank_parts",
        "triangle_counts_parts",
        "dedup_cluster_resolution",
        # recursive_reachability (same r05-era graph block) yields its
        # slot to txn_files_metadata, new this round — untested-by-
        # definition code needs the driver grade more than a third
        # stale-but-green record; it stays in the local full sweep.
        # The r8/r9-green blocks (streaming_*, salted_*, the window/
        # subquery/unpivot block, profile, packing, simhash, the
        # remaining txn CDC queries) rotate out this round: their
        # records are at most two rounds old, while everything above
        # is either code-touched this round or 3+ rounds stale; all
        # are re-verified in the local full sweep regardless.
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
