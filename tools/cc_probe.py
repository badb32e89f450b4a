"""Connected-components variant probe: hook+jump (current engine
implementation) vs two-phase large-star/small-star (Kiveris et al.)
vs hook+double-jump, raced on three graph shapes.

VERDICT r4 asked whether the star optimization cuts rounds on
chain-heavy graphs enough to beat the engine's min-label propagation
with pointer jumping. This probe measures wall time AND validates that
every variant computes the identical (node, min-reachable-id) mapping.

Graph shapes:
- chain:  path graph, the worst-case diameter (depth = n).
- random: sparse Erdős–Rényi-ish (2 deterministic hash edges per node).
- dedup:  the engine's real near-dup candidate graph at sf0.1
          (MinHash-LSH pairs over documents).

Usage: python tools/cc_probe.py [chain_n] [random_n]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.graph import connected_components
from qb_data_pipeline_backfill_spark.session import get_spark


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Two-phase star algorithm (Kiveris et al. 2014): alternate
    large-star (connect strictly-larger neighbors to the neighborhood
    min) and small-star (connect smaller-or-equal neighbors to it)
    until the edge set stabilizes into min-rooted stars.

    Per round: two (groupBy-min + join) passes over the current edge
    set. Unlike label propagation, the WORKING SET is the edge list
    itself and shrinks as components collapse."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    cur = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)

    def large_star(edge_df: DataFrame) -> DataFrame:
        """Connect every strictly-larger neighbor to min(Γ⁺(u))."""
        sym = edge_df.union(
            edge_df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        out = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        return out.distinct()  # already big→small: v = m < u

    def small_star(edge_df: DataFrame) -> DataFrame:
        """On big→small directed edges: per node u, m = min smaller
        neighbor; re-root u and its other smaller neighbors at m."""
        mins = edge_df.groupBy("u").agg(F.min("v").alias("m"))
        re_rooted = (
            edge_df.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = mins.select("u", F.col("m").alias("v"))
        return re_rooted.union(self_edge).filter(
            F.col("u") != F.col("v")
        ).distinct()

    def star(edge_df: DataFrame) -> DataFrame:
        return small_star(large_star(edge_df))

    def fingerprint(edge_df: DataFrame):
        return edge_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]

    prev = fingerprint(cur)
    for i in range(max_iter):
        cur = star(cur).localCheckpoint(eager=True)
        fp = fingerprint(cur)
        if tuple(fp) == tuple(prev):
            stars = cur  # (u big, v root) min-rooted star edges
            nodes = e.select(F.col("u").alias("node")).union(
                e.select(F.col("v").alias("node"))
            ).distinct()
            lab = stars.groupBy("u").agg(F.min("v").alias("cluster_id"))
            return nodes.join(
                lab.withColumnRenamed("u", "node"), "node", "left"
            ).select(
                "node", F.coalesce("cluster_id", "node").alias("cluster_id")
            )
        prev = fp
    raise RuntimeError(f"star CC did not converge in {max_iter} iterations")


def connected_components_jump2(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """The engine's hook+jump with ONE extra pointer jump per round —
    the jump's self-join runs on the node-sized label table (no edge
    shuffle), so doubling it roughly quarters chain depth per round
    for one cheap extra join."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u") != F.col("v")
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    n_edges = sym.count()
    parts = max(1, min(n_edges // 2_000_000 + 1, sym.rdd.getNumPartitions()))
    if parts < sym.rdd.getNumPartitions():
        sym = sym.repartition(parts, "v").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_iter):
        nbr = sym.join(labels.withColumnRenamed("node", "v"), "v").select(
            F.col("u").alias("node"), "label"
        )
        hooked = labels.unionByName(nbr).groupBy("node").agg(
            F.min("label").alias("label")
        )
        cur = hooked
        for _j in range(2):
            parent = cur.select(
                F.col("node").alias("label"), F.col("label").alias("label2")
            )
            cur = cur.join(parent, "label", "left").select(
                "node", F.coalesce(F.col("label2"), F.col("label")).alias("label")
            )
        jumped = cur.localCheckpoint(eager=True)
        cur_sum = jumped.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = jumped
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"jump2 CC did not converge in {max_iter} iterations")


def main() -> None:
    chain_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rand_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    spark = get_spark("cc-probe", extra_conf={"spark.driver.memory": "8g"})

    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    rand = spark.range(rand_n).select(
        F.col("id").alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(rand_n)).alias("dst"),
    ).union(
        spark.range(rand_n).select(
            F.col("id").alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(rand_n)).alias("dst"),
        )
    )

    from qb_data_pipeline_backfill_spark.operators import dedup as D
    from qb_data_pipeline_backfill_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    dedup_pairs = D.minhash_lsh_pairs(docs).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)

    variants = {
        "hook_jump": connected_components,
        "jump2": connected_components_jump2,
        "two_phase_star": connected_components_star,
    }
    graphs = {"chain": chain, "random": rand, "dedup_pairs": dedup_pairs}

    results: dict[str, dict[str, float]] = {}
    baseline: dict[str, dict] = {}
    for gname, g in graphs.items():
        g = g.localCheckpoint(eager=True)
        results[gname] = {}
        for vname, fn in variants.items():
            t0 = time.time()
            out = {r["node"]: r["cluster_id"] for r in fn(g).collect()}
            took = round(time.time() - t0, 2)
            results[gname][vname] = took
            if gname not in baseline:
                baseline[gname] = out
            else:
                assert out == baseline[gname], f"{vname} wrong on {gname}"
            print(f"{gname:12s} {vname:15s} {took:7.2f}s", file=sys.stderr)
    print(json.dumps({"probe": "cc_variants", "chain_n": chain_n,
                      "rand_n": rand_n, "results": results}))


if __name__ == "__main__":
    main()
