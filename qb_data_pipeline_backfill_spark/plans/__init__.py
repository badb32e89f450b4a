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
# Round-16 rotation, exactly as pre-committed in the r15 window note
# and ordered by VERDICT r15 next #1: (a) the queries NEW in r16
# (incremental + streaming audio near-dup on the format-generic
# hash64 band index, streaming BPE encode, multi-frame GIF) plus
# contract_tiff_decode_replay, whose decoder grew LZW + PackBits
# strip decompression this round; (b) the ten r7/r9-stale queries
# pre-named in the r15 note; (c) MECHANICAL OLDEST-FIRST fill from
# per-name last-graded rounds computed over CORRECTNESS_r01..15 —
# the full r10 block (20), then the r11 block alphabetically as far
# as the 50 reach (the remaining r11 names — scalar_subquery_max_qty through
# window_function_suite — are next, queued for r17).
# Every registered query is still re-verified in the local full
# sweep (tools/check_correctness.py, sf0.01) each round regardless.
prioritize(
    [
        # --- (a) new in r16 / r16-code-touched ---
        "dedup_incremental_audio",
        "streaming_incremental_audio",
        "streaming_bpe_encode",
        "contract_tiff_decode_replay",
        "contract_tiff_compressed_replay",
        "contract_tiff_pages_replay",
        "contract_gif_frames_replay",
        "dedup_gif_frames",
        # --- (b) the ten r7/r9-stale queries (VERDICT r15 next #1) ---
        "session_windows_events",
        "incremental_rollup_merge",
        "multimodal_frame_alignment",
        "quality_band_filter",
        "range_join_attribution",
        "retention_cohorts",
        "rolling_user_window",
        "score_normalize_per_lang",
        "udtf_term_counts",
        "value_histogram",
        # --- (c) oldest-first: the full r10 block ---
        "cdc_latest_state",
        "drift_psi_report",
        "funnel_conversion",
        "jsonl_roundtrip_scan",
        "leakage_safe_splits",
        "pii_scrub",
        "sample_domain_quota",
        "sample_eval_holdout",
        "sample_stratified_rebalance",
        "sample_temperature_mixture",
        "sample_weighted_by_length",
        "scd2_intervals",
        "timeseries_gap_fill",
        "txn_cdf_log_feed",
        "txn_cdf_log_net_feed",
        "txn_cdf_rollup_maintenance",
        "txn_mor_delete_read",
        "txn_restore_rollback",
        "txn_table_history",
        "txn_zorder_compact",
        # --- (c) oldest-first: r11 block, alphabetical ---
        "constraint_report",
        "contract_bpe_encode_replay",
        "contract_bpe_merge_replay",
        "corpus_curation",
        "dedup_paragraph_rewrite",
        "local_supplier_revenue",
        "numeric_covariance",
        "numeric_profile",
        "recursive_reachability",
        "region_nation_rollup",
        "salted_collect_stats",
        "salted_join_segment_revenue",
    ]
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "prioritize"]
