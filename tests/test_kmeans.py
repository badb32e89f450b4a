"""Deterministic k-means refinement (operators/kmeans.py)."""

from __future__ import annotations

import math

from qb_data_pipeline_backfill_spark.operators.kmeans import kmeans_refine


def _dyadic_mean(vals, bits=20):
    s = sum(math.floor(v * 2**bits) for v in vals)
    q = abs(s) // len(vals)
    return (-q if s < 0 else q) / 2**bits


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.8, 0.2, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_one_round_means_are_exact(spark):
    out = {
        (r["centroid_id"], r["dim"]): r["value"]
        for r in kmeans_refine(_vecs(spark), stride=2, iters=1).collect()
    }
    # seeds: vec 0 and vec 2. Cluster of seed 0 = {0, 1}; seed 2 = {2, 3}.
    assert out[(0, 1)] == _dyadic_mean([1.0, 0.8])
    assert out[(0, 2)] == _dyadic_mean([0.0, 0.2])
    assert out[(2, 2)] == _dyadic_mean([1.0, 0.9])
    assert out[(2, 3)] == _dyadic_mean([0.0, 0.1])
    assert len(out) == 6  # 2 centroids x 3 dims


def test_second_round_is_stable_here_and_deterministic(spark):
    one = kmeans_refine(_vecs(spark), stride=2, iters=1).collect()
    two = kmeans_refine(_vecs(spark), stride=2, iters=2).collect()
    # Assignments don't change for this separated input, so round 2
    # reproduces round 1's means exactly.
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))
    again = kmeans_refine(_vecs(spark), stride=2, iters=2).collect()
    assert sorted(map(tuple, two)) == sorted(map(tuple, again))


def test_refined_codebook_plugs_into_ivf(spark):
    from qb_data_pipeline_backfill_spark.operators.kmeans import refined_codebook
    from qb_data_pipeline_backfill_spark.operators.similarity import ivf_ann_topk

    rows = [
        (i, [1.0 + 0.01 * i, 0.1 * (i % 3), 0.5]) for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = refined_codebook(df, stride=4, iters=1)
    assert set(cb.columns) == {"centroid_id", "c_vec", "c_norm"}
    out = ivf_ann_topk(df, df.limit(3), k=2, nprobe=3, centroids=cb)
    got = {r["query_id"] for r in out.collect()}
    assert got == {0, 1, 2}
    assert out.groupBy("query_id").count().filter("count != 2").count() == 0


def test_empty_cells_drop_out(spark):
    # Perfectly collinear vectors: every cosine is exactly 1.0, so the
    # tie-break sends every vector to the lowest-id seed and the other
    # cell goes empty and must drop out of the codebook.
    rows = [(i, [float(i + 1), 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_refine(df, stride=3, iters=2).collect()
    cells = {r["centroid_id"] for r in out}
    assert cells == {0} and len(out) == 2
