"""Physical-plan regression tests: the properties that make the
headline queries scale (pushdown, pruning, broadcast, map-side partial
aggregation) must survive refactors. A query that silently loses its
pushed filter still passes the value gate — these tests catch the
plan, not the answer."""

from __future__ import annotations

import pytest

from qb_data_pipeline_backfill_spark import plans

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = plans.REGISTRY[name].spark(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_filter_reaches_parquet_scan(spark):
    plan = _plan(spark, "date_window_filter")
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan and "o_orderdate" in scan[0]
    # the BETWEEN bounds are evaluated at the scan, not post-scan
    assert "DataFilters: [isnotnull(o_orderdate" in scan[0]


def test_pricing_summary_prunes_columns_and_partials(spark):
    plan = _plan(spark, "pricing_summary")
    # column pruning: comment/name columns never leave the reader
    assert "l_comment" not in plan
    # partial aggregation before the single exchange
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_top_revenue_orders_dim_broadcast_is_chosen_not_forced(spark):
    """The filtered customer side grows with the corpus, so the query
    must NOT carry a forced broadcast hint (it would OOM at 100×);
    the planner/AQE may still *choose* broadcast at this sf because
    the side measurably fits."""
    df = plans.REGISTRY["top_revenue_orders"].spark(spark, SF)
    logical = df._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower()
    plan = _plan(spark, "top_revenue_orders")
    assert "CartesianProduct" not in plan
    # the segment filter runs at the customer scan, pre-join
    scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "c_mktsegment" in ln
    ]
    assert scan and "BUILDING" in scan[0]


def test_local_supplier_revenue_only_fixed_dims_hinted(spark):
    """Q5 analog: nation/region (fixed 25/5 rows) keep their broadcast
    hints; fact-scaled customer/supplier must not be hinted."""
    df = plans.REGISTRY["local_supplier_revenue"].spark(spark, SF)
    logical = df._jdf.queryExecution().logical().toString()
    hinted = [
        ln for ln in logical.splitlines() if "hint" in ln.lower()
    ]
    assert len(hinted) == 2, hinted  # nation + region only
    plan = _plan(spark, "local_supplier_revenue")
    assert "CartesianProduct" not in plan


def test_fuzzy_dedup_paths_have_no_cartesian_product(spark):
    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_ann_lsh_has_no_cartesian_product(spark):
    plan = _plan(spark, "similarity_ann_lsh")
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["semi_join_probe", "anti_join_idempotence"])
def test_probe_joins_are_hash_joins(spark, name):
    plan = _plan(spark, name)
    assert "Join" in plan and "CartesianProduct" not in plan


def test_tfidf_vocabulary_join_is_not_hint_broadcast(spark):
    """The doc_freq side of the TF-IDF term join is the full term
    dictionary — unbounded cardinality at corpus scale, so it must
    never carry a broadcast HINT (Catalyst may still auto-broadcast
    below spark.sql.autoBroadcastJoinThreshold, which is size-aware
    and correct). With the threshold disabled, only hinted joins can
    broadcast — so the term join must plan as a shuffle join, while
    the 1-row corpus-size crossJoin keeps its explicit hint."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "text_tfidf_topk")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan, "term join must not be hint-forced"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the scalar n_total side stays broadcast (1 row, explicit hint)
    assert "BroadcastNestedLoopJoin" in plan


def test_constraint_report_referential_rule_is_hint_broadcast(spark):
    """The referential rule's dimension side is an explicit broadcast
    (projected key column only) — the anti join must never shuffle the
    fact table against a sorted dimension."""
    plan = _plan(spark, "constraint_report")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_gap_fill_reuses_key_partitioning_for_window(spark):
    """grid -> left join -> LOCF window: the window's user_id
    partitioning must be satisfied by the aggregate's exchange, not a
    fresh shuffle — hashpartitioning exchanges appear only under the
    two aggregates (one per side), never between join and window."""
    plan = _plan(spark, "timeseries_gap_fill")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" in plan


def test_funnel_stage_aggregates_are_partial(spark):
    plan = _plan(spark, "funnel_conversion")
    assert "partial_min" in plan  # stage MINs combine map-side
    assert "CartesianProduct" not in plan  # scalar joins are BNLJ on 1-row sides


def test_zorder_key_is_pure_projection(spark):
    """The Morton key must be a scan + project — no exchange, no
    aggregate, no join, and no Python evaluation anywhere."""
    plan = _plan(spark, "zorder_clustering_key")
    for op in ("Exchange", "Join", "Aggregate", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan, op


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Every Lloyd round's assignment joins the corpus against the
    (tiny) codebook — all joins must be broadcast nested-loop over the
    broadcast codebook; the corpus must never shuffle for assignment
    (the only exchanges belong to the per-dimension mean aggregates
    and the codebook rebuild)."""
    plan = _plan(spark, "kmeans_codebook")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# --- round 4: curation / subquery / pq / rollup-merge shapes -----------------
def test_doc_chunking_is_narrow(spark):
    plan = _plan(spark, "doc_chunking")
    # chunking must parallelize with the scan: no exchange anywhere
    # (the corpus _spread repartition is the only allowed one)
    assert plan.count("Exchange hashpartitioning") == 0


def test_sequence_packing_windows_by_shard_key(spark):
    plan = _plan(spark, "sequence_packing")
    # the packing window partitions by lang — never a global
    # single-partition sort
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(lang" in plan


def test_vocab_build_id_window_is_post_aggregation(spark):
    plan = _plan(spark, "vocab_build")
    # the only single-partition exchange feeds the |V|-row id
    # assignment AFTER the term count aggregate, never the corpus
    single = plan.split("Exchange SinglePartition")
    assert len(single) == 2
    assert "HashAggregate" in single[1]


def test_exists_probe_decorrelates_to_semi_join(spark):
    plan = _plan(spark, "exists_correlated_orders")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_decorrelates_to_aggregate_join(spark):
    plan = _plan(spark, "scalar_subquery_max_qty")
    # per-part MAX computed once and joined back — no per-row subquery
    assert "max(l_quantity" in plan
    assert "CartesianProduct" not in plan


def test_rolling_window_single_shuffle(spark):
    plan = _plan(spark, "rolling_user_window")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "RangeFrame" in plan


def test_pq_encode_broadcasts_codebook(spark):
    plan = _plan(spark, "pq_encode_codes")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_merge_reaggregates_partials(spark):
    plan = _plan(spark, "incremental_rollup_merge")
    # partial aggregation on both slices before the merge shuffle
    assert "partial_sum" in plan


def test_pagerank_joins_are_hash_joins(spark):
    plan = _plan(spark, "pagerank_parts")
    # co-purchase pair generation is an equi-join on orderkey with a
    # post-filter, never a cartesian product; rank iterations join on
    # the node id
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_frame_alignment_single_asof_shuffle(spark):
    plan = _plan(spark, "multimodal_frame_alignment")
    # the as-of union+carry-forward plan: exactly one window, no join
    # operator anywhere (alignment is NOT a per-row probe)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Window") >= 1


def test_ivfpq_broadcasts_small_sides_no_cartesian(spark):
    """IVFADC's quantizer, probe list, and ADC lookup table are all
    broadcast; the only shuffles are the codes⋈cells co-partition and
    the ADC aggregation — never a cartesian over the corpus."""
    plan = _plan(spark, "similarity_ann_ivfpq")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dup_gram_stats_partial_aggregates_no_cartesian(spark):
    """Corpus duplicate-n-gram stats: gram counting must map-side
    combine before its exchange, and the counts⋈grams join must be a
    keyed join, not a product."""
    plan = _plan(spark, "corpus_dup_gram_stats")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_bpe_pair_counts_two_keyed_exchanges(spark):
    """BPE pair counting: one exchange on the word (vocab reduction),
    one on the pair — both with map-side partials; the final top-k
    window over |alphabet|² rows is the only single-partition stage."""
    plan = _plan(spark, "bpe_pair_counts")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 2
