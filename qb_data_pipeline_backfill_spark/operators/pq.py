"""Product quantization (PQ) encoding for the embedding column.

The vector-index compression step downstream of the IVF coarse
quantizer (operators/similarity.py, operators/kmeans.py): split each
D-dim vector into ``m`` subvectors and replace every subvector with
the id of its nearest codebook entry — D floats become m small ints
(here 64×4B → 4×1B, a 64× compression), which is what makes
billion-vector ANN indexes fit in memory.

Deterministic spec (so the encoding is oracle-checkable bit-for-bit):
the per-subspace codebook is the subvector slice of the first
``n_centroids`` vectors by id (the same strided-deterministic-init
move as similarity.deterministic_centroids; kmeans_refine would plug
in here for a trained codebook), assignment is argmin squared-L2 with
ties broken on the smaller code id.

Plan shape: explode each vector into its m subspaces (narrow),
broadcast-join the (m × n_centroids)-row codebook, fold the distance
inside codegen (zip_with + aggregate over the slice — no UDF), and
take argmin per (vector, subspace) with one window over the
(vec, subspace) key. One shuffle total, no all-pairs join — the same
cost profile as ivf_assign, linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    m: int = 4,
    n_centroids: int = 8,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Encode each vector as ``m`` codebook ids: one row per
    (vec_id, subspace) with the argmin-L2² code."""
    if dims % m:
        raise ValueError("dims must divide evenly into m subspaces")
    d_sub = dims // m
    cb = codebook
    if cb is None:
        cb = df.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).cast("long").alias("code"),
            F.col(vec_col).alias("cv"),
        )
    sub = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        F.col(vec_col).alias("qv"),
    )
    start = F.col("subspace") * d_sub + 1
    qs = F.slice(F.col("qv"), start, F.lit(d_sub))
    cs = F.slice(F.col("cv"), start, F.lit(d_sub))
    dist = F.aggregate(
        F.zip_with(
            qs,
            cs,
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = sub.join(F.broadcast(cb)).select(
        F.col(id_col),
        F.col("subspace").cast("long").alias("subspace"),
        F.col("code"),
        dist.alias("__dist"),
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.asc("__dist"), F.asc("code")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "subspace", "code")
    )
