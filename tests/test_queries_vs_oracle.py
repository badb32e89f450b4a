"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is the same comparison the driver runs at sf0.01 — running it in
pytest at the smallest scale keeps the suite fast while catching
semantic drift the moment an operator lands.
"""

from __future__ import annotations

import pytest

from qb_data_pipeline_backfill_spark import plans
from qb_data_pipeline_backfill_spark.oracle import compare


def _cases():
    return [(q.name, q) for q in plans.REGISTRY.values()]


@pytest.mark.parametrize("name,query", _cases(), ids=[n for n, _ in _cases()])
def test_query_matches_oracle(spark, sf_dir, oracle_con, name, query):
    df = query.spark(spark, sf_dir)
    if query.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    ok, detail = compare(df, oracle_con, query.oracle)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_contract_shape():
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql has keys not in queries(): {unknown}"


# --------------------------------------------------------------------------
# VERDICT r16 item 10: the size-gated driver fast paths must stay
# oracle-green THROUGH THEIR DISTRIBUTED FALLBACKS — force every gate
# to 0 and replay the gated families' oracle queries end to end.
# --------------------------------------------------------------------------
_GATED_FALLBACK_QUERIES = [
    # tokenizer-trainer gate (text._FIT_DRIVER_MAX_ROWS)
    "contract_bpe_merge_replay",
    "contract_wordpiece_merge_replay",
    "contract_unigram_em_replay",
    # graph driver-fixpoint gate (graph._CC_DRIVER_MAX_EDGES)
    "dedup_cluster_resolution",
    "leakage_safe_splits",
    "pagerank_parts",
    # triangle broadcast gate (graph._TRI_BROADCAST_MAX_EDGES, r17)
    "triangle_counts_parts",
]


@pytest.mark.parametrize("name", _GATED_FALLBACK_QUERIES)
def test_gated_query_matches_oracle_through_fallback(
    spark, sf_dir, oracle_con, name, monkeypatch
):
    from qb_data_pipeline_backfill_spark.operators import graph as G
    from qb_data_pipeline_backfill_spark.operators import text as X

    monkeypatch.setattr(X, "_FIT_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(G, "_CC_DRIVER_MAX_EDGES", 0)
    monkeypatch.setattr(G, "_TRI_BROADCAST_MAX_EDGES", 0)
    query = plans.REGISTRY[name]
    df = query.spark(spark, sf_dir)
    ok, detail = compare(df, oracle_con, query.oracle)
    assert ok, f"{name} (fallback path): {detail}"
