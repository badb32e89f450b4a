"""Graph operators: connected components for dedup-cluster resolution.

Near-dup detection (``operators/dedup.py``) emits PAIRS; to actually
drop duplicates a pipeline must resolve pairs into CLUSTERS and keep
one canonical document per cluster — transitive closure, since near-dup
is not transitive (A~B, B~C does not imply A~C, yet all three are one
redundancy group). This generalizes the reference's keyed dedup
(reference: data_exporters/save_to_raw_customers_py.py:20 —
``drop_duplicates`` on an id) to content-level duplicate GROUPS.

100 TB posture: min-label propagation with pointer jumping — the
classic O(log d) MapReduce connected-components shape (Kiveris et al.,
"Connected Components in MapReduce and Beyond"). Each iteration is a
bounded number of hash-partitioned joins on the node id; no step ever
materializes a neighborhood in one task, so skew is bounded by the
hottest single node's degree (and dup-cluster edge lists are capped
upstream by the candidate generators' ``max_bucket`` guards).
``localCheckpoint`` truncates lineage each round so the plan does not
grow exponentially with iterations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Driver fast path (optimization round 16): candidate-pair edge lists
# are usually tiny relative to the corpus, yet the iterative loops pay
# 2+ Spark jobs per round (hook/jump + fixpoint checksum) regardless of
# size. When the MEASURED symmetrized edge count fits under this cap,
# the fixpoint computes driver-side (union-find / integer power
# iteration) on the collected edges — exact same result, one job.
# Above the cap the distributed loops run unchanged (the 100 TB shape).
# 2M edges matches the module's existing per-partition working-set
# constant; a collected edge row is two ids.
_CC_DRIVER_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_GRAPH_DRIVER_MAX", "2000000")
)

# Broadcast gate for triangle_counts (optimization round 17, guide §3.1):
# when the MEASURED deduplicated edge count fits under this cap, the
# degree table and the closing-edge set are broadcast instead of
# shuffle-joined — the wedge stream (the E^1.5 term) then never
# crosses an exchange; only the 3-rows-per-triangle explode does.
# 4M oriented edges ≈ 64 MB of key bytes (two longs) — comfortably
# inside the guide's few-hundred-MB broadcast budget; above the cap
# the shuffle plan below runs unchanged (the 100 TB shape, where the
# closing-edge set no longer fits every executor).
_TRI_BROADCAST_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_GRAPH_BROADCAST_MAX", "4000000")
)


def _edge_tuples(sym: DataFrame) -> list:
    """Collected (u, v) tuples of a symmetric edge frame, via the
    Arrow `toPandas` transfer instead of the py4j row path (guide §6:
    Arrow driver transfers) — measured 2.39M edges: collect + row
    unpack 10.8 s vs toPandas + tolist 3.5 s, identical tuples
    (`.tolist()` converts int64→int and object→str exactly). Falls
    back to the row-based collect when pandas/pyarrow are absent
    (pyspark declares neither as a hard dependency) or the session
    runs Arrow-disabled (slower, still correct).

    Precondition: no null u/v (both call sites drop them via the
    u != v filter). pandas would coerce a nullable int64 column to
    float64, yielding float labels that break the LongType
    createDataFrame in _min_label_components_py."""
    try:
        pdf = sym.toPandas()
    except ImportError:  # no pandas/pyarrow in this interpreter
        return [(r["u"], r["v"]) for r in sym.collect()]
    return list(zip(pdf["u"].tolist(), pdf["v"].tolist()))


def _min_label_components_py(
    edge_tuples: list, spark, node_type: T.DataType
) -> DataFrame:
    """Union-find over collected symmetric edges, labeling every node
    with the MINIMUM node id reachable from it — the exact fixpoint
    the distributed hook/jump loop converges to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_tuples:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    mins: dict = {}
    for x in parent:
        rt = find(x)
        m = mins.get(rt)
        if m is None or x < m:
            mins[rt] = x
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("cluster_id", node_type, False),
        ]
    )
    return spark.createDataFrame(
        [(x, mins[find(x)]) for x in parent], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, cluster_id)`` where ``cluster_id`` is the minimum
    node id reachable from ``node`` — deterministic and oracle-checkable
    (a recursive-CTE transitive closure computes the same fixpoint).

    Per iteration: (1) every node takes the min label among itself and
    its neighbors (one shuffle join + map-side-combined min aggregate);
    (2) pointer jumping — every node re-reads the label OF its label
    (one self-join), halving chain depth, which is what turns a
    diameter-d chain from d rounds into O(log d). Convergence is an
    exact fixpoint check (count of improved labels == 0), so the result
    is the true closure, not an iteration-capped approximation;
    ``max_iter`` only bounds pathological inputs and raises if hit.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u") != F.col("v")
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    # Right-size the iteration working set from the MEASURED edge count
    # (free: the checkpoint already materialized it). Candidate-pair
    # edge lists are usually tiny relative to the corpus; iterating a
    # few hundred edges across the session's full shuffle width pays
    # fixed per-task cost every round. ~2M edges per partition keeps
    # one task's working set in memory at any scale.
    n_edges = sym.count()
    # Size-gated driver fixpoint (see _CC_DRIVER_MAX_EDGES): the count
    # is already measured and the checkpoint already materialized the
    # edges, so the gate is free; union-find lands on the identical
    # min-reachable-label assignment in one collect.
    cap = _CC_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if n_edges <= cap:
        return _min_label_components_py(
            _edge_tuples(sym), edges.sparkSession, sym.schema["u"].dataType
        )
    # Working-set AND parallelism sizing (r17): ~2M edges per task
    # bounds one task's memory at any scale, but the floor is the
    # session's core count — the checkpointed distinct output arrives
    # AQE-coalesced into a handful of partitions (often ONE at a few
    # tens of MB), which would run every hook/jump round nearly
    # serially. Labels are a deterministic fixpoint, so partitioning
    # cannot change results.
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    parts = max(n_edges // 2_000_000 + 1, min(parallelism, max(n_edges, 1)))
    if parts != sym.rdd.getNumPartitions():
        sym = sym.repartition(parts, "v").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    # Fixpoint test: one scalar aggregate per round instead of a join —
    # sum of per-row (node, label) hashes, unchanged iff no label moved
    # (w.h.p.; a colliding change needs a 2^-64 hash-sum coincidence).
    # Hashing works for ANY id type — the previous numeric-sum proxy
    # cast labels to decimal, which under Spark 4's ANSI default
    # CRASHED on string/UUID doc ids and with ANSI off returned NULL
    # sums that "converged" after one iteration with wrong clusters
    # (r7 review, reproduced). The decimal cast of the hash itself is
    # numeric-to-decimal — always valid — and keeps the sum overflow-
    # free under ANSI.
    def _label_checksum(d):
        return d.agg(
            F.sum(
                F.xxhash64(F.col("node"), F.col("label")).cast("decimal(38,0)")
            ).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_checksum(labels)

    for _ in range(max_iter):
        # (1) hook: min label over self + neighbors.
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        hooked = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # (2) pointer jump: label <- label(label).  Nodes whose label is
        # already a root (label(label) == label) pass through unchanged.
        parent = hooked.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        jumped = (
            hooked.join(parent, "label", "left")
            .select(
                "node",
                F.coalesce(F.col("label2"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = _label_checksum(jumped)
        labels = jumped
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → cluster assignment + keep/drop decision.

    Output: ``(doc_id, cluster_id, cluster_size, keep)`` for every
    document that appears in at least one pair; ``keep`` marks the
    canonical (minimum-id) member. Documents in no pair are trivially
    their own cluster and are omitted (at 100 TB the pair set is
    vastly smaller than the corpus — joining the full corpus back in
    is the caller's cheap left-anti/left join).
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("keep"),
        )
    )


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Deterministic PageRank: ``iters`` fixed power iterations in
    exact integer micro-units, so every engine lands on identical
    bits (the graph companion to kmeans_refine's certified loop).

    Arithmetic spec (all BIGINT, truncating division — no float ever):
      r0(v)        = 1_000_000
      contrib(u→v) = r(u) DIV out_degree(u)
      r'(v)        = (100 - d)% * 1_000_000 DIV 100
                     + d% * Σ contrib DIV 100
    Nodes with no in-edges keep the teleport term only. The undirected
    input is symmetrized, so there are no dangling nodes.

    Plan per iteration: one join edges⋈ranks on src (both sides
    hash-partitioned on the node id) + one map-side-combined SUM by
    dst — the standard distributed power-iteration shape, linear per
    round, no driver-side state. With a FIXED iteration count the
    whole power loop unrolls into ONE declarative plan (the edge set
    is checkpointed once and re-read per round; ranks flow through
    the DAG without materialization barriers — measured 4x faster
    than eager per-round checkpoints at harness scale, and AQE still
    re-plans each shuffle). Unbounded-iteration variants should
    checkpoint every few rounds like connected_components does.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Right-size the iteration working set from the measured edge
    # count (same move as connected_components): tiny graphs across
    # the session's full shuffle width pay fixed per-task cost per
    # round for nothing.
    sym = sym.localCheckpoint(eager=True)
    n_edges = sym.count()
    teleport_i = (100 - damping_pct) * 1_000_000 // 100
    # Size-gated driver power iteration (see _CC_DRIVER_MAX_EDGES):
    # the arithmetic spec is all-BIGINT truncating division on
    # non-negative values, so the Python replay is exact — identical
    # ranks, one collect instead of iters unrolled join+agg rounds.
    cap = _CC_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if n_edges <= cap:
        es = _edge_tuples(sym)
        deg_d: dict = {}
        for u, _v in es:
            deg_d[u] = deg_d.get(u, 0) + 1
        ranks_d = {n: 1_000_000 for n in deg_d}
        for _ in range(iters):
            s: dict = {}
            for u, v in es:
                s[v] = s.get(v, 0) + ranks_d[u] // deg_d[u]
            ranks_d = {
                n: teleport_i + (damping_pct * s.get(n, 0)) // 100
                for n in deg_d
            }
        schema = T.StructType(
            [
                T.StructField("node", sym.schema["u"].dataType, False),
                T.StructField("rank", T.LongType(), False),
            ]
        )
        return edges.sparkSession.createDataFrame(
            list(ranks_d.items()), schema
        )
    # same working-set/parallelism sizing as connected_components
    # (r17): floor at the session's cores — the AQE-coalesced
    # checkpoint would otherwise run all power iterations on 1-2
    # partitions. Integer rank arithmetic is partitioning-independent.
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    parts = max(n_edges // 2_000_000 + 1, min(parallelism, max(n_edges, 1)))
    if parts != sym.rdd.getNumPartitions():
        sym = sym.repartition(parts, "u").localCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # Node tables (deg, ranks) are |V| rows of two longs. When |V|
    # fits the broadcast budget (same knob as the triangle gate), the
    # per-iteration joins broadcast them and the edge list never
    # leaves its checkpointed partitioning — the planner otherwise
    # sort-merge-joins the 2·|E| edge rows against 20 K-row sides
    # every round (measured 8.5 → 2.3 s warm on the 2.39M-edge
    # co-purchase graph). deg is checkpointed once so the broadcast
    # builds don't re-aggregate the edges per round. |V| over the
    # budget (the truly huge 100 TB graphs) keeps the shuffle loop.
    deg = deg.localCheckpoint(eager=True)
    bcast_nodes = deg.count() <= _TRI_BROADCAST_MAX_EDGES
    nodes = deg.select(F.col("u").alias("node"))
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank"))
    teleport = (100 - damping_pct) * 1_000_000 // 100
    for _ in range(iters):
        r_u = ranks.withColumnRenamed("node", "u")
        contribs = (
            sym.join(F.broadcast(r_u) if bcast_nodes else r_u, "u")
            .join(F.broadcast(deg) if bcast_nodes else deg, "u")
            .select(
                F.col("v").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100"
                    )
                ).alias("rank"),
            )
        )
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_edges: int | None = None,
) -> DataFrame:
    """Per-node triangle counts via degree-ordered compact-forward
    enumeration (Latapy 2008; the MapReduce shape is Suri & Vassilvitskii
    2011's "Counting Triangles and the Curse of the Last Reducer").

    The naive 3-way self-join enumerates every wedge at its center —
    Σ deg(v)², which a single celebrity node turns into the "last
    reducer" straggler. Orienting each edge from its (degree, id)-
    smaller endpoint to the larger caps every node's out-degree at
    O(√|E|), so wedge volume drops to Σ outdeg(v)² ≤ |E|^1.5 — the
    standard bound that makes exact triangle counting feasible on
    skewed 100 TB graphs.

    Plan: one degree aggregate (map-side combined), one broadcast-free
    orientation join, one wedge self-join on the shared source, one
    semi-join of wedges against oriented edges (the closing edge), one
    explode+count. Every join is keyed — no cartesian anywhere.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    # Materialize the deduplicated edge list once (the CC/pagerank
    # move): it is referenced by the degree aggregate, both wedge
    # sides and the closing-edge set, and the measured count gates the
    # broadcast plan below for free. Spread it over the session's
    # parallelism first: AQE coalesces the small distinct output to a
    # handful of partitions, and under the broadcast plan the wedge
    # generation (the E^1.5 compute term) inherits the CHECKPOINT's
    # partitioning — a 1-partition checkpoint would run it on one core.
    # Hash on (u, v) — deterministic, uniform, no sort-before-
    # repartition cost (guide §2.5).
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    e = e.repartition(parallelism, "u", "v").localCheckpoint(eager=True)
    n_edges = e.count()
    cap = (
        _TRI_BROADCAST_MAX_EDGES
        if broadcast_max_edges is None
        else broadcast_max_edges
    )
    small = n_edges <= cap
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # Under the cap (guide §3.1): the degree table (≤ 2·|E| nodes) and
    # the closing-edge set are broadcast, so the orientation join and
    # the wedge join/semi-join all happen map-side — the E^1.5 wedge
    # stream never crosses an exchange; the only shuffle left is the
    # 3-rows-per-triangle count. Same joins, same rows, bit-identical
    # counts — only the join strategy changes.
    if small:
        du, dv = F.broadcast(du), F.broadcast(dv)
    ranked = e.join(du, "u").join(dv, "v")
    lower_first = F.struct("du", "u") < F.struct("dv", "v")
    r_v = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    r_u = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, r_v).otherwise(r_u).alias("rb"),
    )
    if small:
        # Adjacency-intersection form (guide §2.4 — remove the wedge
        # shuffle outright): a triangle a→b, a→c, b→c is found exactly
        # once, at its source edge (a, b), as c ∈ N⁺(a) ∩ N⁺(b). The
        # out-adjacency arrays are capped at O(√E) by the orientation
        # (the same compact-forward bound), the whole array table is
        # |nodes| rows, and the E^1.5 wedge stream never exists as
        # rows — it is the array_intersect work inside one codegen
        # stage. The arrays are checkpointed once (they are broadcast
        # twice) and the only exchange left is the 3-rows-per-triangle
        # count. Emitted triangles are the identical (a, b, c) set the
        # wedge/semi-join form produces, so counts are bit-identical.
        adj = (
            oriented.groupBy("a")
            .agg(F.collect_list("b").alias("nbs"))
            .localCheckpoint(eager=True)
        )
        nb = F.broadcast(
            adj.select(F.col("a").alias("b"), F.col("nbs").alias("nbl"))
        )
        # The probe side re-derives each oriented edge (a, b) from the
        # adjacency table itself (explode), carrying N⁺(a) along — so
        # the whole enumeration is one scan of adj plus ONE broadcast
        # join for N⁺(b). Nodes with no out-edges simply don't appear
        # in adj, which the inner join reproduces.
        tris = (
            adj.select(
                "a", F.explode("nbs").alias("b"), F.col("nbs").alias("na")
            )
            .join(nb, "b")
            .select(
                "a", "b", F.explode(F.array_intersect("na", "nbl")).alias("c")
            )
        )
        return (
            tris.select(
                F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                    "node"
                )
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
    o1 = oriented.select("a", F.col("b").alias("x"), F.col("rb").alias("rx"))
    o2 = oriented.select("a", F.col("b").alias("y"), F.col("rb").alias("ry"))
    wedges = o1.join(o2, "a").filter(F.col("rx") < F.col("ry")).select(
        "a", F.col("x").alias("wb"), F.col("y").alias("wc")
    )
    closing = oriented.select(F.col("a").alias("wb"), F.col("b").alias("wc"))
    tris = wedges.join(closing, ["wb", "wc"], "left_semi")
    return (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("wb"), F.col("wc"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
