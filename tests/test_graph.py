"""Connected components / dedup-cluster resolution (operators/graph.py)."""

from __future__ import annotations

import pytest

from qb_data_pipeline_backfill_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["cluster_id"] for r in connected_components(df).collect()
    }


def test_cc_two_components_and_isolated_edge(spark):
    got = _cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_long_chain_needs_pointer_jumping(spark):
    # Diameter-9 path: naive propagation needs 9 rounds; pointer
    # jumping must converge well under max_iter and still hit the
    # exact fixpoint (every node labeled 0).
    chain = [(i, i + 1) for i in range(9)]
    got = _cc(spark, chain)
    assert got == {i: 0 for i in range(10)}


def test_cc_merges_via_high_id_bridge(spark):
    # Two low-id stars bridged through a high-id node: the min label
    # must flow across the bridge in both directions.
    got = _cc(spark, [(10, 1), (10, 2), (20, 11), (20, 12), (2, 20)])
    assert set(got.values()) == {1}


def test_cc_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_keep_flag_and_sizes(spark):
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (100, 101)], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[3]["cluster_id"] == 3 and rows[3]["keep"] is True
    assert rows[7]["cluster_id"] == 3 and rows[7]["keep"] is False
    assert rows[9]["cluster_size"] == 3
    assert rows[100]["keep"] is True and rows[100]["cluster_size"] == 2
    assert sum(1 for r in rows.values() if r["keep"]) == 2


def test_cc_empty_edges_yield_empty_result(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup_clusters(pairs).count() == 0


def test_cc_raises_when_iteration_capped(spark):
    # max_iter guards the DISTRIBUTED loop; pin that path explicitly
    # (driver_max_edges=0), since the r16 size-gated driver fixpoint
    # has no iterations to cap on a graph this small.
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, driver_max_edges=0)


# --------------------------------------------------------------------------
# triangle counting
# --------------------------------------------------------------------------
def test_triangle_counts_hand_graph(spark):
    from qb_data_pipeline_backfill_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a
    # pendant node 5 and an isolated edge 6-7 (no triangles)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5), (6, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_direction_and_dup_insensitive(spark):
    from qb_data_pipeline_backfill_spark.operators.graph import triangle_counts

    # same triangle given with mixed orientations, duplicates, self-loop
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2), (1, 3), (3, 1), (2, 2)], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_matches_bruteforce_random(spark):
    import itertools
    import random

    from qb_data_pipeline_backfill_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    nodes = list(range(40))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.2
    ]
    adj = set(edges)

    def connected(x, y):
        return (x, y) in adj or (y, x) in adj

    expect: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if connected(a, b) and connected(b, c) and connected(a, c):
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == expect


def test_connected_components_string_ids(spark):
    """Doc ids are often strings/hashes: the convergence checksum must
    work for ANY id type (r7 review: the old decimal-cast label sum
    crashed under ANSI on string ids, and with ANSI off 'converged'
    after one iteration with wrong clusters)."""
    from qb_data_pipeline_backfill_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert {got[n] for n in "abcde"} == {"a"}  # one 5-node chain
    assert got["x"] == got["y"] == "x"


def test_graph_driver_fast_path_matches_distributed_loop(spark):
    """r16 optimization: the size-gated driver fixpoint (union-find /
    integer power iteration) must land on exactly the distributed
    loops' labels and ranks — same min-reachable cluster ids, same
    BIGINT truncating-division rank trajectory."""
    from qb_data_pipeline_backfill_spark.operators.graph import (
        connected_components,
        pagerank_exact,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (5, 4), (20, 21), (21, 22),
         (22, 20), (7, 8), (8, 9), (9, 7), (30, 31)],
        "src long, dst long",
    )
    cc_fast = sorted(tuple(r) for r in connected_components(edges).collect())
    cc_slow = sorted(
        tuple(r)
        for r in connected_components(edges, driver_max_edges=0).collect()
    )
    assert cc_fast == cc_slow
    pr_fast = sorted(tuple(r) for r in pagerank_exact(edges).collect())
    pr_slow = sorted(
        tuple(r) for r in pagerank_exact(edges, driver_max_edges=0).collect()
    )
    assert pr_fast == pr_slow


def test_triangle_broadcast_path_matches_shuffle_plan(spark):
    """r17 optimization: the size-gated adjacency-intersection form
    (broadcast N⁺ arrays, no wedge shuffle) must produce exactly the
    wedge/semi-join shuffle plan's per-node counts."""
    import itertools
    import random

    from qb_data_pipeline_backfill_spark.operators.graph import triangle_counts

    rng = random.Random(13)
    nodes = list(range(30))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.25
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = sorted(tuple(r) for r in triangle_counts(df).collect())
    slow = sorted(
        tuple(r)
        for r in triangle_counts(df, broadcast_max_edges=0).collect()
    )
    assert fast == slow and len(fast) > 0
