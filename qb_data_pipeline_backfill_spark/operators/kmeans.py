"""Deterministic Lloyd k-means refinement for the IVF coarse quantizer.

``similarity.deterministic_centroids`` picks every ``stride``-th vector
as a cell center ("a k-means refinement would plug in here; selection
must stay deterministic" — this is that refinement). A FIXED number of
Lloyd rounds with exactly-reproducible arithmetic, so the refined
codebook is bit-identical on every engine and every run:

- **Assignment** is the broadcast argmax-cosine pass already used by
  ``ivf_assign`` (narrow, one window per vector, ties broken on
  centroid id).
- **Update** computes per-dimension means in exact dyadic integer
  arithmetic (``numeric.dyadic_mean`` — power-of-two quantization has
  no decimal rounding boundary, so no float accumulation order OR
  half-rounding divergence anywhere), and iteration N+1 starts from
  values both engines agree on bit-for-bit. Cells that lose all
  members drop out (documented Lloyd behavior with deterministic
  init).

Fixed ``iters`` (no convergence actions) keeps the plan a straight
DAG: per round, one broadcast-join assignment + one explode +
map-side-combinable aggregate — at 100 TB the cost is iters linear
passes, the textbook distributed k-means shape. The refined codebook
feeds ``ivf_ann_topk`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions.numeric import dyadic_mean
from qb_data_pipeline_backfill_spark.operators.similarity import (
    deterministic_centroids,
    ivf_assign,
    l2_norm,
)


def kmeans_refine(
    df: DataFrame,
    stride: int = 50,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refine the strided codebook with ``iters`` Lloyd rounds.

    Returns the refined codebook as ``(centroid_id, dim, value)`` rows
    (dim is 1-based) — the long form keeps the result oracle-hashable
    and trivially pivotable back to vectors.
    """
    means, _ = _refine(df, stride, iters, id_col, vec_col)
    return means


def refined_codebook(
    df: DataFrame,
    stride: int = 50,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The same refinement in quantizer form: ``(centroid_id, c_vec,
    c_norm)`` — drop-in for ``similarity.ivf_ann_topk(centroids=...)``."""
    _, centroids = _refine(df, stride, iters, id_col, vec_col)
    return centroids


def _refine(
    df: DataFrame, stride: int, iters: int, id_col: str, vec_col: str
) -> tuple[DataFrame, DataFrame]:
    centroids = deterministic_centroids(df, stride, id_col, vec_col)
    means: DataFrame | None = None
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col)
        means = (
            assigned.select(
                F.col("cell"), F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("cell", (F.col("pos") + 1).alias("dim"))
            .agg(dyadic_mean(F.col("val"), bits=20).alias("value"))
        )
        cvec = (
            means.groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "value"))
                ).alias("s")
            )
            .select(
                F.col("cell").alias("centroid_id"),
                F.transform(F.col("s"), lambda x: x["value"]).alias("c_vec"),
            )
        )
        centroids = cvec.select(
            "centroid_id", "c_vec", l2_norm(F.col("c_vec")).alias("c_norm")
        )
    assert means is not None
    return (
        means.select(F.col("cell").alias("centroid_id"), "dim", "value"),
        centroids,
    )


def kmeans_sql(
    stride: int = 50, iters: int = 2, n_dims: int = 64, table: str = "embeddings"
) -> str:
    """Render the IDENTICAL computation as DuckDB SQL (oracle twin).

    Same init, same index-order cosine folds, same dyadic integer
    means — generated from one spec like ``zorder.zorder_sql`` so the
    two engines cannot drift apart silently.
    """

    def cos(evec: str, cvec: str) -> str:
        return (
            f"((SELECT SUM(CAST({evec}[i] AS DOUBLE) * CAST({cvec}[i] AS DOUBLE)) "
            f"FROM generate_series(1, {n_dims}) AS t(i)) / "
            f"(sqrt((SELECT SUM(CAST({evec}[i] AS DOUBLE) * CAST({evec}[i] AS DOUBLE)) "
            f"FROM generate_series(1, {n_dims}) AS t(i))) * "
            f"sqrt((SELECT SUM(CAST({cvec}[i] AS DOUBLE) * CAST({cvec}[i] AS DOUBLE)) "
            f"FROM generate_series(1, {n_dims}) AS t(i)))))"
        )

    parts = [
        f"c0 AS (SELECT vec_id AS centroid_id, embedding AS c_vec "
        f"FROM {table} WHERE vec_id % {stride} = 0)"
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f"a{it} AS (SELECT e.vec_id, e.embedding, c.centroid_id AS cell, "
            f"ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
            f"{cos('e.embedding', 'c.c_vec')} DESC, c.centroid_id) AS rn "
            f"FROM {table} e, {prev} c)"
        )
        parts.append(
            f"m{it} AS (SELECT cell, t.i AS dim, "
            f"CAST(SUM(CAST(FLOOR(CAST(a.embedding[t.i] AS DOUBLE) * 1048576) "
            f"AS HUGEINT)) // COUNT(*) AS DOUBLE) / 1048576.0 AS value "
            f"FROM a{it} a, generate_series(1, {n_dims}) AS t(i) "
            f"WHERE a.rn = 1 GROUP BY cell, t.i)"
        )
        parts.append(
            f"c{it} AS (SELECT cell AS centroid_id, "
            f"list(value ORDER BY dim) AS c_vec FROM m{it} GROUP BY cell)"
        )
        prev = f"c{it}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT cell AS centroid_id, CAST(dim AS BIGINT) AS dim, value FROM m{iters}"
    )
