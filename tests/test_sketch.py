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


def test_frequent_items_decrement_accounting_closed_form(spark):
    """One partition, capacity 2, counts {a:5, b:5, c:1} in a single
    Arrow batch: the decrement subtracts c_star = the 3rd-largest
    count (1), so the summary is exactly {a:4, b:4} with err_ub 1 —
    and the bound covers both the survivors' undershoot and the
    evicted singleton's whole mass (true(c)=1 <= err_ub)."""
    from qb_data_pipeline_backfill_spark.operators.sketch import frequent_items

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5 + [("c",)], "k string"
    ).coalesce(1)
    rows = {r["item"]: r for r in frequent_items(df, "k", capacity=2).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["cnt_lb"] == 4 and rows["b"]["cnt_lb"] == 4
    assert rows["a"]["err_ub"] == 1  # covers 5-4 undershoot AND true(c)


def test_frequent_items_emptied_partition_still_ships_decrement(spark):
    """A partition whose summary empties ENTIRELY must still ship its
    decrement (the null-item row): the merged err_ub is a promise
    about TRUE counts, and dropping an emptied partition's loss would
    break it. Two controlled partitions: A = [a, b] with capacity 1
    (both evict, dec=1, summary empty); B = [c, c, c] (survives,
    dec=0). c's row must carry err_ub = 1 — partition A's loss —
    which is what bounds true(a) = true(b) = 1."""
    from qb_data_pipeline_backfill_spark.operators.sketch import frequent_items

    # explicit RDD slices, NOT createDataFrame/union: Catalyst
    # collapses local unions to one partition, which would merge both
    # groups into a single summary
    rdd = spark.sparkContext.parallelize(
        [("a",), ("b",), ("c",), ("c",), ("c",)], 2
    )
    df = spark.createDataFrame(rdd, "k string")
    assert df.rdd.getNumPartitions() == 2  # [a, b] | [c, c, c]
    rows = frequent_items(df, "k", capacity=1).collect()
    by = {r["item"]: r for r in rows}
    assert set(by) == {"c"}
    assert by["c"]["cnt_lb"] == 3 and by["c"]["err_ub"] == 1
