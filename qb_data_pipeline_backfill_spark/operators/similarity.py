"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- ``cosine_topk`` — exact brute force: broadcast the (small) query
  set against the corpus, compute cosine with JVM-side higher-order
  functions, rank per query. Linear in |corpus|×|queries|; the
  correctness baseline and the right answer whenever the query set is
  small enough to broadcast.
- ``rp_lsh_ann_topk`` — random-hyperplane (SimHash-for-vectors) LSH:
  bucket the corpus by sign-pattern signatures under deterministic
  pseudo-random planes, probe only colliding buckets. The 100 TB path:
  one shuffle on the bucket key, candidate set ≪ corpus.

All vector math runs in double precision via zip_with/aggregate —
no Python UDFs, no MLlib vector objects, no collect.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query side is broadcast (shuffle-free scan of the corpus);
    ranking shuffles only (query_id, candidate) rows — at 100 TB the
    scan dominates and parallelizes perfectly. Ties broken by
    neighbor id.
    """
    # Norms are computed ONCE per row on each side (a narrow
    # projection) instead of per candidate pair — same doubles, 3×
    # less fold work in the pair loop.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cos ≥ threshold).

    Deliberately quadratic — the oracle baseline. At scale, generate
    candidates with ``rp_signature`` buckets first and verify only
    bucket collisions (same shape as dedup.minhash_lsh_pairs). Norms
    are precomputed per side so the pair loop folds one dot product,
    not three.
    """
    a = df.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization + cell probing
# --------------------------------------------------------------------------
def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine) —
    the IVF coarse quantizer. Centroids are broadcast; assignment is a
    narrow argmax per row, so building the inverted file is one linear
    pass + one small shuffle if the caller repartitions by cell.
    ``round_dp`` rounds the cosine before the argmax (ties then break
    on centroid id) — the cross-engine determinism knob
    ``semantic_dedup_flags`` needs so a SQL oracle reproduces the
    assignment bit-for-bit despite float summation order."""
    cents = centroids.select(
        F.col("centroid_id"), F.col("c_vec"), F.col("c_norm")
    )
    scored = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("v_norm"),
    ).crossJoin(F.broadcast(cents))
    sim = dot(F.col(vec_col), F.col("c_vec")) / (
        F.col("v_norm") * F.col("c_norm")
    )
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), "centroid_id")
    return (
        scored.select(id_col, vec_col, "v_norm", "centroid_id", sim.alias("sim"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "v_norm", F.col("centroid_id").alias("cell"))
    )


def deterministic_centroids(
    df: DataFrame, stride: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Training-free coarse quantizer: every ``stride``-th vector by id
    is a centroid. (A k-means refinement would plug in here; selection
    must stay deterministic for reproducible layouts.) Raises when the
    stride selects NO vector — downstream assignment would otherwise
    cross-join against an empty side and silently return an empty
    result (r7 review)."""
    cents = df.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    if cents.limit(1).count() == 0:
        raise ValueError(
            f"stride={stride} selects no centroid (no {id_col} divisible "
            "by it); pick a stride <= the id range"
        )
    return cents


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    stride: int = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` nearest cells
    per query, exact-cosine rank within them.

    The inverted file bounds the scanned fraction to ~nprobe/n_cells
    of the corpus — the classic recall/cost dial. A query's true
    neighbor is missed iff it quantized into an unprobed cell.
    Pass ``centroids`` (``centroid_id, c_vec, c_norm``) to use a
    trained codebook — e.g. ``kmeans.refined_codebook`` — instead of
    the training-free strided quantizer.
    """
    if centroids is None:
        centroids = deterministic_centroids(corpus, stride, id_col, vec_col)
    inv = ivf_assign(corpus, centroids, id_col, vec_col)
    return ivf_topk_from_index(
        inv, centroids, queries, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )


def ivf_topk_from_index(
    inv: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a PREBUILT inverted file ``(id, vec, v_norm,
    cell)`` — the search half of :func:`ivf_ann_topk`, split out so a
    PERSISTED index can grow incrementally: new vector batches assign
    under the FROZEN centroids (``ivf_assign`` with the stored
    codebook — one narrow broadcast argmax per batch, no history
    touched) and append their postings; searches over the appended
    index are bit-identical to a fresh build over the full corpus
    under the same centroids (pytest-certified). Centroid retraining
    (codebook drift as the corpus shifts) is a REBUILD by design —
    assignments are a pure function of the codebook, so mixing
    codebook generations in one index would silently corrupt cells.
    """
    # nprobe nearest cells per query (same broadcast quantizer)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    ).crossJoin(F.broadcast(centroids))
    qsim = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), "centroid_id")
    probed = (
        q.select("query_id", "q_vec", "q_norm", "centroid_id", qsim.alias("qsim"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q_vec", "q_norm", F.col("centroid_id").alias("cell"))
    )

    candidates = (
        inv.join(F.broadcast(probed), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("v_norm") * F.col("q_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


# --------------------------------------------------------------------------
# random-hyperplane LSH (approximate, the scale path)
# --------------------------------------------------------------------------
def _plane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: md5-seeded uniform in
    [-0.5, 0.5) per coordinate. Stable across runs and engines."""
    return [
        int(hashlib.md5(f"rp:{table}:{plane}:{d}".encode()).hexdigest()[:8], 16)
        / 2**32
        - 0.5
        for d in range(dim)
    ]


def rp_signature(vec: Column, table: int, n_planes: int, dim: int) -> Column:
    """Sign-pattern bucket id (0 .. 2^n_planes − 1) of a vector under
    ``n_planes`` deterministic hyperplanes (pure-expression form)."""
    sig = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(table, p, dim)])
        sig = sig + F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig.cast("int")


def rp_buckets_vectorized(n_tables: int, n_planes: int, dim: int):
    """Arrow-vectorized bucket assignment: ALL tables' sign-pattern
    buckets in one numpy matmul per batch (``(batch, dim) @ (dim,
    tables·planes)``), returned as array<int> of length ``n_tables``.

    This is the sanctioned Pandas-UDF slow path: per-element
    higher-order-function folds are interpreted (~µs each), so 32
    plane projections per vector cost more than a BLAS matmul over the
    whole Arrow batch by orders of magnitude. Same planes as
    ``rp_signature`` — identical buckets.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _plane(t, p, dim)
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    ).T  # (dim, n_tables * n_planes)
    weights = np.tile(1 << np.arange(n_planes), n_tables)  # per-bit weights

    def buckets(emb):
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        bits = (mat @ planes) >= 0  # (batch, n_tables * n_planes)
        weighted = (bits * weights).reshape(len(mat), n_tables, n_planes)
        return pd.Series(list(weighted.sum(axis=2).astype("int32")))

    # set real (non-stringified) annotations: `from __future__ import
    # annotations` would otherwise leave pandas_udf unable to infer
    # the eval type from string hints.
    buckets.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return pandas_udf(buckets, "array<int>")


def rp_lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane buckets — the
    100 TB path for ``embedding_near_dup_pairs``: candidate pairs are
    bucket collisions (any table), verified with exact cosine. Linear
    bucketing + within-bucket pairs; recall < 1 by construction
    (P[collision] = (1 − θ/π)^n_planes per table for angle θ)."""
    bucket_udf = rp_buckets_vectorized(n_tables, n_planes, dim)
    # a NULL embedding cannot be bucketed (np.stack would crash the
    # whole batch with an opaque worker error) and cannot be a
    # near-dup of anything: skip it up front
    bucketed = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        bucket_udf(F.col(vec_col)).alias("bks"),
    ).select(
        "vid",
        "vec",
        "nrm",
        F.posexplode("bks").alias("table_id", "bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            (
                dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        "vec_a", "vec_b", F.round("cos", 4).alias("cos")
    )


def rp_bucket_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """The PERSISTABLE ANN index of a corpus batch: one row per
    (table_id, bucket, vec_id, vec) under the deterministic
    hyperplane family. Write it once (bucketed on ``bucket`` so probe
    joins co-locate), append new batches' rows, and query batches
    probe it without ever re-bucketing the corpus — the vector-store
    shape of a growing embedding table (the MinHash twin is
    ``dedup.minhash_band_index``)."""
    bucket_udf = rp_buckets_vectorized(n_tables, n_planes, dim)
    return corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket_udf(F.col(vec_col)).alias("bks"),
    ).select("vec_id", "vec", F.posexplode("bks").alias("table_id", "bucket"))


def ann_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors of ``queries`` against a PERSISTED
    ``rp_bucket_index`` — bit-identical to ``rp_lsh_ann_topk`` on the
    same corpus (pytest-certified), but the corpus side arrives
    pre-bucketed by reference. Only the query batch computes buckets."""
    bucket_udf = rp_buckets_vectorized(n_tables, n_planes, dim)
    qb = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_nrm"),
        bucket_udf(F.col(vec_col)).alias("bks"),
    ).select(
        "query_id", "q_vec", "q_nrm",
        F.posexplode("bks").alias("table_id", "bucket"),
    )
    cb = index.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        # norms fold once per exploded index row, not once per
        # candidate PAIR inside cosine() (r7 review: the per-pair
        # interpreted aggregate tripled the hot ranking path's work)
        l2_norm(F.col("vec")).alias("c_nrm"),
        "table_id",
        "bucket",
    )
    return _rank_candidates(cb, qb, k)


def rp_lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table
    random-hyperplane LSH.

    Corpus and queries are bucketed under the same planes; candidates
    are bucket collisions in ANY table (union via explode), then
    exact-cosine ranked. Recall is tunable with n_planes/n_tables;
    misses are possible by construction. One shuffle on the bucket
    key, one on query_id for ranking — never all-pairs.
    """
    return ann_topk_from_index(
        rp_bucket_index(corpus, id_col, vec_col, dim, n_planes, n_tables),
        queries,
        k,
        id_col,
        vec_col,
        dim,
        n_planes,
        n_tables,
    )


def _rank_candidates(cb: DataFrame, qb: DataFrame, k: int) -> DataFrame:
    candidates = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "q_nrm", "neighbor_id", "c_vec", "c_nrm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


# --------------------------------------------------------------------------
# IVF + PQ (IVFADC): coarse quantizer candidates, code-compressed ranking
# --------------------------------------------------------------------------
def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    stride: int = 50,
    nprobe: int = 4,
    m: int = 4,
    n_centroids: int = 8,
    refine_k: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVFADC approximate top-k: IVF cells bound the scanned fraction,
    PQ codes bound the bytes per scanned vector (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).

    The billion-vector memory-budget play that neither ``ivf_ann_topk``
    (exact vectors in probed cells: D floats per candidate) nor
    ``pq_encode`` (codes, no search) gives alone:

    1. every corpus vector is assigned to an IVF cell (broadcast coarse
       quantizer, narrow argmax) and PQ-encoded (``pq.pq_encode``: m
       code bytes replace D floats);
    2. a query probes its ``nprobe`` nearest cells; candidates are the
       code rows of those cells — at 100 TB the shuffle/scan moves
       m≈8 bytes per candidate instead of 256 B of raw floats;
    3. asymmetric distance (ADC): d²(q, x) ≈ Σ_s ‖q_s − c_s[code]‖².
       The per-query lookup table (n_queries × m × n_centroids rows)
       is tiny and broadcast; the sum is one map-side-combinable
       groupBy — never an all-pairs join;
    4. optional refine: the ADC top-``refine_k`` candidates are
       re-ranked by exact cosine against the raw vectors (a semi-join
       back to the corpus on id — candidate count is k-bounded, so the
       rejoin touches ≤ |queries|·refine_k rows).

    Shuffle budget: one co-partitioned join (codes ⋈ cells on id), one
    ADC aggregation on (query, candidate); everything else broadcast.
    Returns (query_id, neighbor_id, rank, score) where score is exact
    cosine when refining, else the negated ADC distance.
    """
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    d_sub = dim // m
    if centroids is None:
        centroids = deterministic_centroids(corpus, stride, id_col, vec_col)
    # PQ codebook: subvector slices of the first n_centroids vectors by
    # id (pq_encode's deterministic default, spelled out here because
    # the ADC table needs the same centroid subvectors).
    cb = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("long").alias("code"), F.col(vec_col).alias("cv")
    )

    from qb_data_pipeline_backfill_spark.operators.pq import pq_encode

    cells = ivf_assign(corpus, centroids, id_col, vec_col).select(id_col, "cell")
    codes = pq_encode(
        corpus, id_col, vec_col, dims=dim, m=m, n_centroids=n_centroids, codebook=cb
    ).join(cells, id_col)  # co-partitioned on id: one shuffle, both sides narrow

    # nprobe nearest cells per query under the same coarse quantizer.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    probe = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "centroid_id",
        (
            dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
        ).alias("qsim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), "centroid_id")
    probed = (
        probe.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("cell"))
    )

    # ADC lookup table: ‖q_s − c_s[code]‖² per (query, subspace, code).
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace")
    start = F.col("subspace") * d_sub + 1
    qs = F.slice(F.col("q_vec"), start, F.lit(d_sub))
    cs = F.slice(F.col("cv"), start, F.lit(d_sub))
    d2 = F.aggregate(
        F.zip_with(
            qs,
            cs,
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = (
        q.select("query_id", "q_vec", sub)
        .crossJoin(F.broadcast(cb))
        .select("query_id", "subspace", "code", d2.alias("d2"))
    )

    adc = (
        codes.join(F.broadcast(probed), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("d2").alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), "neighbor_id")
    pool = k if refine_k is None else refine_k
    top = adc.withColumn("__rn", F.row_number().over(wa)).filter(F.col("__rn") <= pool)
    if refine_k is None:
        return top.select(
            "query_id",
            "neighbor_id",
            F.col("__rn").alias("rank"),
            F.round(-F.col("adc_dist"), 4).alias("score"),
        )
    # Refine: exact cosine over the ADC shortlist only.
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    rescored = (
        top.select("query_id", "neighbor_id")
        .join(raw, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("c_vec"), F.col("q_vec"))
                / (F.col("c_norm") * F.col("q_norm"))
            ).alias("cos"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("score"))
    )


def semantic_dedup_flags(
    df: DataFrame,
    stride: int = 50,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster first so candidate pairs form only
    WITHIN a coarse cell — the move that bounds the quadratic, exactly
    like MinHash banding bounds shingle dedup — then flag as removed
    every vector some lower-id cell-mate matches at cosine >=
    ``threshold`` (greedy keep-first-id, the same first-wins policy as
    the repo's exact dedup). Returns (id, cell, removed).

    Deterministic end to end, so the WHOLE pipeline — not just a
    recall floor — replays as a SQL oracle: strided centroids
    (``deterministic_centroids``), argmax assignment on the cosine
    ROUNDED to 6 dp with ties broken on centroid id (the rounding
    absorbs float-summation-order differences across engines), and
    pair admission on 4-dp-rounded cosine (the repo's near-dup
    convention). Scale shape: one broadcast argmax pass for
    assignment, one cell-key shuffle, per-cell pair generation
    O(Σ|cell|²) — at 100 TB, cell size is capped by the centroid
    count exactly as SemDeDup prescribes (their 50k clusters on 1.3B
    LAION embeddings), never all-pairs."""
    cents = deterministic_centroids(df, stride, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col, round_dp=6)
    a = assigned.select(
        "cell",
        F.col(id_col).alias("__a"),
        F.col(vec_col).alias("__va"),
        F.col("v_norm").alias("__na"),
    )
    b = assigned.select(
        "cell",
        F.col(id_col).alias("__b"),
        F.col(vec_col).alias("__vb"),
        F.col("v_norm").alias("__nb"),
    )
    cos = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 4
    )
    removed = (
        a.join(b, "cell")
        .filter(F.col("__a") < F.col("__b"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("__b").alias(id_col))
        .distinct()
        .withColumn("__gone", F.lit(True))
    )
    return assigned.select(id_col, "cell").join(
        removed, id_col, "left_outer"
    ).select(
        id_col,
        "cell",
        F.coalesce(F.col("__gone"), F.lit(False)).alias("removed"),
    )
