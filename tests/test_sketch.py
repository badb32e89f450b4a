"""Count-Min sketch: CMS guarantees + mergeability + bounded size.

Mirrors the reference's verification-query posture (exact counts as
the oracle) but for the sketch path the reference has no analog of —
the 100 TB frequency-estimation story from SURVEY.md's scale notes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)

DEPTH, WIDTH = 4, 1024


def _keys_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "k bigint")


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    # 100 distinct keys in a 4x1024 grid: collisions possible but the
    # >= guarantee must hold for every key regardless.
    values = [i % 100 for i in range(5000)]
    df = _keys_df(spark, values)
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["estimate"]
        for r in cms_estimate(sketch, probes, "k", depth=DEPTH, width=WIDTH).collect()
    }
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, f"CMS underestimated key {k}: {est[k]} < {t}"


def test_cms_grid_size_bounded(spark):
    # The sketch never exceeds depth*width rows no matter the input —
    # this is the whole point: shuffle volume bounded by the grid.
    df = _keys_df(spark, range(20000))
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    assert sketch.count() <= DEPTH * WIDTH


def test_cms_merge_equals_sketch_of_union(spark):
    a = _keys_df(spark, [1, 2, 3, 3, 5] * 10)
    b = _keys_df(spark, [3, 4, 5, 5, 9] * 10)
    merged = cms_merge(
        cms_sketch(a, "k", depth=DEPTH, width=WIDTH),
        cms_sketch(b, "k", depth=DEPTH, width=WIDTH),
    )
    direct = cms_sketch(a.unionByName(b), "k", depth=DEPTH, width=WIDTH)
    # Element-wise identical grids (mergeability = algebraic aggregate).
    diff = merged.join(direct, ["d", "b"], "full").where(
        ~(merged["n"].eqNullSafe(direct["n"]))
    )
    assert diff.count() == 0


def test_cms_absent_key_estimates_small(spark):
    df = _keys_df(spark, [7] * 100)
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    probes = _keys_df(spark, [123456789])
    est = cms_estimate(sketch, probes, "k", depth=DEPTH, width=WIDTH).collect()
    # Absent key: min over its cells; with one hot key, at most that
    # key's count on a full collision, usually 0.
    assert est[0]["estimate"] <= 100


def test_cms_plan_is_aggregate_only(spark):
    # No sort, no cartesian product; grid probe join is broadcast.
    df = _keys_df(spark, range(1000))
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    est = cms_estimate(sketch, df.distinct(), "k", depth=DEPTH, width=WIDTH)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_hll_intersection_contract_holds_on_smoke(spark, sf_dir):
    """Inclusion-exclusion over HLL sketches stays inside its envelope
    and the exact count matches a hand-computed pandas intersection."""
    from qb_data_pipeline_backfill_spark.plans.contracts import (
        contract_hll_intersection,
    )

    row = contract_hll_intersection(spark, sf_dir).collect()[0]
    assert row["within_tolerance"] and row["non_negative"]

    import duckdb

    exact = duckdb.sql(
        f"""
        SELECT COUNT(*) FROM (
            SELECT user_id FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase'
        )
        """
    ).fetchone()[0]
    assert row["n_exact"] == exact


def test_cms_estimate_survives_reserved_column_names(spark):
    """Probing a key column named 'd', 'b', or 'n' must not collide
    with the sketch grid's internal columns (r7 review: crashed with
    AMBIGUOUS_REFERENCE)."""
    from qb_data_pipeline_backfill_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    for name in ("d", "b", "n"):
        df = spark.createDataFrame(
            [(v,) for v in ["x", "x", "y"]], f"{name} string"
        )
        sk = cms_sketch(df, name)
        got = {
            r[name]: r["estimate"]
            for r in cms_estimate(sk, df.distinct(), name).collect()
        }
        assert got["x"] >= 2 and got["y"] >= 1


def test_frequent_items_exact_when_under_capacity(spark):
    """Cardinality <= capacity: no decrements, counts exact, bound 0."""
    from qb_data_pipeline_backfill_spark.operators.sketch import frequent_items

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)], "k string"
    ).coalesce(2)
    got = {r["item"]: (r["cnt_lb"], r["err_ub"]) for r in
           frequent_items(df, "k", capacity=8).collect()}
    assert got == {"a": (5, 0), "b": (3, 0), "c": (1, 0)}  # NULL dropped


def test_frequent_items_guarantees_under_eviction(spark):
    """Forced eviction (capacity << cardinality): every true heavy
    hitter survives, counts never overestimate, undershoot <= err_ub,
    and err_ub <= N/(capacity+1)."""
    from qb_data_pipeline_backfill_spark.operators.sketch import frequent_items

    # 10 hot keys with 200 rows each + 4000 singletons, shuffled
    hot = spark.range(2000).select((F.col("id") % 10).alias("k"))
    tail = spark.range(4000).select((F.col("id") + 1000).alias("k"))
    df = hot.unionByName(tail).repartition(8)
    n_total = 6000
    cap = 50
    rows = frequent_items(df, "k", capacity=cap).collect()
    by_item = {r["item"]: r for r in rows}
    err = rows[0]["err_ub"]
    # sum of per-partition decrements <= sum n_p/(cap+1) = N/(cap+1)
    assert err <= n_total // (cap + 1)
    for k in range(10):
        assert k in by_item, f"hot key {k} evicted"
        r = by_item[k]
        assert r["cnt_lb"] <= 200
        assert 200 - r["cnt_lb"] <= err
    assert len(rows) <= 8 * cap  # summary-bounded output


def test_frequent_items_err_counts_emptied_partitions(spark):
    """A partition whose summary empties must still contribute its
    decrement to the global bound (the bound is a promise about TRUE
    counts — dropping a partition's loss would break it)."""
    from qb_data_pipeline_backfill_spark.operators.sketch import frequent_items

    # all-singleton partition with capacity 1: everything evicts
    df = spark.range(100).select(F.col("id").alias("k")).coalesce(1)
    rows = frequent_items(df, "k", capacity=1).collect()
    if rows:  # whatever survives, the bound must cover the evictions
        assert rows[0]["err_ub"] >= 49
