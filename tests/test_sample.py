"""Deterministic sampling: reproducibility, partition-independence,
split totality, stratified fractions, and narrow-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import sample as SA


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "k")


def test_sample_reproducible_and_partition_independent(spark):
    df = _ids(spark)
    a = set(r["k"] for r in SA.deterministic_sample(df, ["k"], 0.2).collect())
    b = set(
        r["k"]
        for r in SA.deterministic_sample(df.repartition(13), ["k"], 0.2).collect()
    )
    assert a == b
    assert 0.1 < len(a) / 2000 < 0.3


def test_sample_nested_fractions(spark):
    # A 10% sample is a subset of the 20% sample at the same salt —
    # thresholds nest, so growing a sample never resamples.
    df = _ids(spark)
    s10 = set(r["k"] for r in SA.deterministic_sample(df, ["k"], 0.1).collect())
    s20 = set(r["k"] for r in SA.deterministic_sample(df, ["k"], 0.2).collect())
    assert s10 <= s20


def test_salts_give_independent_samples(spark):
    df = _ids(spark)
    a = set(r["k"] for r in SA.deterministic_sample(df, ["k"], 0.5, salt="a").collect())
    b = set(r["k"] for r in SA.deterministic_sample(df, ["k"], 0.5, salt="b").collect())
    overlap = len(a & b) / max(len(a), 1)
    # Independent 50% samples overlap ~50%, not ~100% / ~0%.
    assert 0.3 < overlap < 0.7
    assert a != b


def test_split_column_total_and_disjoint(spark):
    df = _ids(spark)
    labeled = df.withColumn(
        "split", SA.split_column(["k"], {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row exactly one label
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_split_weights_must_sum_to_one():
    import pytest

    with pytest.raises(ValueError):
        SA.split_assignments({"a": 0.5, "b": 0.1})


def test_stratified_fractions_respected(spark):
    df = _ids(spark).withColumn(
        "stratum", F.when(F.col("k") % 2 == 0, "big").otherwise("small")
    )
    kept = SA.stratified_sample(df, "stratum", {"big": 0.1, "small": 1.0}, ["k"])
    counts = {r["stratum"]: r["n"] for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 1000  # fraction 1.0 keeps everything
    assert 40 < counts["big"] < 200  # ~10% of 1000


def test_sample_plan_is_narrow(spark):
    # The filter must not introduce an exchange: sampling is map-side.
    df = _ids(spark)
    plan = (
        SA.deterministic_sample(df, ["k"], 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_threshold_hex_edges():
    assert SA.threshold_hex(0.0) == "00000000"
    assert SA.threshold_hex(1.0) == "ffffffff"
    assert len(SA.threshold_hex(0.1)) == 8


def _skewed(spark):
    """3 groups with 1000 / 100 / 10 rows."""
    return spark.range(1110).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, F.lit("big"))
        .when(F.col("id") < 1100, F.lit("mid"))
        .otherwise(F.lit("rare"))
        .alias("g"),
    )


def test_temperature_mixture_upweights_rare_groups(spark):
    df = _skewed(spark)
    kept = SA.temperature_mixture_sample(df, "g", ["k"], target_rows=300)
    by_g = {r["g"]: r["n"] for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    n = {"big": 1000, "mid": 100, "rare": 10}
    rate = {g: by_g.get(g, 0) / n[g] for g in n}
    # sqrt rebalancing: kept FRACTION must rise as group size falls
    assert rate["rare"] > rate["mid"] > rate["big"] > 0
    # and per-group kept counts track target * sqrt share (isqrt:
    # 31/10/3 of 44) within binomial noise
    assert abs(by_g["big"] - 300 * 31 / 44) < 60
    # deterministic: second run identical row set
    again = SA.temperature_mixture_sample(df, "g", ["k"], target_rows=300)
    assert {r["k"] for r in kept.collect()} == {r["k"] for r in again.collect()}


def test_quota_cap_exact_limits_each_group(spark):
    df = _skewed(spark)
    capped = SA.quota_cap(df, "g", ["k"], cap=25)
    counts = {r["g"]: r["n"] for r in capped.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 25, "mid": 25, "rare": 10}  # min(cap, n_g)


def test_quota_cap_prefilter_equals_exact_even_underprovisioned(spark):
    """The scale path (hash prefilter + repair) must return the exact
    result row-for-row even when the prefilter factor is absurdly
    small and every group needs repair."""
    df = _skewed(spark)
    exact = {r["k"] for r in SA.quota_cap(df, "g", ["k"], cap=25).collect()}
    for factor in (0.1, 1.0, 4.0):
        fast = {
            r["k"]
            for r in SA.quota_cap(
                df, "g", ["k"], cap=25, prefilter_factor=factor
            ).collect()
        }
        assert fast == exact, f"prefilter_factor={factor} diverged"


def test_temperature_mixture_plan_broadcasts_rates(spark):
    """The data-sized side must never shuffle: the per-group rate dim
    broadcast-joins onto the scan (the threshold dim is group-
    cardinality-sized). A SortMergeJoin here would mean the whole
    corpus shuffles on the group key at 100 TB."""
    df = _skewed(spark)
    kept = SA.temperature_mixture_sample(df, "g", ["k"], target_rows=300)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quota_cap_prefilter_plan_broadcasts_thresholds(spark):
    df = _skewed(spark)
    kept = SA.quota_cap(df, "g", ["k"], cap=25, prefilter_factor=4.0)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_leakage_safe_split_keeps_clusters_together(spark):
    from qb_data_pipeline_backfill_spark.operators.sample import (
        leakage_safe_split,
        split_column,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 101)], "doc_id bigint"
    )
    # two clusters: {1,2,3} (transitively) and {50,60}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (50, 60)], "doc_a bigint, doc_b bigint"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(docs, pairs, w, salt="s").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 100
    # every cluster member shares the representative's decision
    assert len({by_id[i]["split"] for i in (1, 2, 3)}) == 1
    assert by_id[1]["split_key"] == by_id[3]["split_key"] == 1
    assert by_id[50]["split"] == by_id[60]["split"]
    # singletons match the plain per-doc split under the same salt
    plain = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn(
            "s", split_column(["doc_id"], w, salt="s")
        ).collect()
    }
    singles = set(range(1, 101)) - {1, 2, 3, 50, 60}
    assert all(by_id[i]["split"] == plain[i] for i in singles)


def test_leakage_safe_split_large_map_not_broadcast(spark):
    """At web dup rates the cluster map is corpus-scale; a forced
    broadcast hint would OOM executors (VERDICT r8/r9). With pairs
    covering >50% of the docs and a broadcast budget the map exceeds,
    the join must run as a shuffle join — and still assign every
    cluster one split decision."""
    from pyspark.sql import functions as F

    from qb_data_pipeline_backfill_spark.operators.sample import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    # 60 chained pairs -> 120 docs in the map (60% coverage)
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(60)], "doc_a bigint, doc_b bigint"
    )
    w = {"train": 0.8, "test": 0.2}
    out = leakage_safe_split(docs, pairs, w, salt="s", broadcast_max_rows=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    rows = out.collect()
    assert len(rows) == 200
    by_id = {r["doc_id"]: r for r in rows}
    for i in range(60):
        assert by_id[2 * i]["split"] == by_id[2 * i + 1]["split"]
    # the small-map path still broadcasts (no perf regression)
    out2 = leakage_safe_split(docs, pairs, w, salt="s")
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2
    got2 = {(r["doc_id"], r["split"]) for r in out2.collect()}
    assert got2 == {(r["doc_id"], r["split"]) for r in rows}


# --------------------------------------------------------------------------
# global_shuffle
# --------------------------------------------------------------------------
def test_global_shuffle_shards_are_contiguous_ranges_of_one_permutation(spark):
    from qb_data_pipeline_backfill_spark.operators import sample as SA

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    got = SA.global_shuffle(df, ["doc_id"], 4, salt="e0")
    rows = got.select("doc_id", "shard", "pos").collect()
    assert len(rows) == 200 and {r.shard for r in rows} <= set(range(4))
    # per-shard positions are exactly 1..n_shard
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # concatenating shards in order reproduces the single md5 order
    keyed = got.withColumn(
        "key", SA.hash_full(["doc_id"], salt="e0")
    ).collect()
    global_order = [
        (r.doc_id) for r in sorted(keyed, key=lambda r: (r.key, r.doc_id))
    ]
    shard_concat = [
        r.doc_id for r in sorted(keyed, key=lambda r: (r.shard, r.pos))
    ]
    assert shard_concat == global_order


def test_global_shuffle_salt_changes_permutation_and_validates(spark):
    import pytest as _pytest

    from qb_data_pipeline_backfill_spark.operators import sample as SA

    df = spark.range(50).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in SA.global_shuffle(df, ["doc_id"], 1, salt="e0")
         .orderBy("pos").collect()]
    b = [r.doc_id for r in SA.global_shuffle(df, ["doc_id"], 1, salt="e1")
         .orderBy("pos").collect()]
    assert a != b and sorted(a) == sorted(b) == list(range(50))
    with _pytest.raises(ValueError, match="n_shards"):
        SA.global_shuffle(df, ["doc_id"], 0)


def test_global_shuffle_rejects_reserved_column_collisions(spark):
    """Review r13: inputs already carrying an output ('shard'/'pos')
    or temporary ('__key'/'__shard') column name must fail loudly,
    not get silently clobbered or ambiguous (warc_parse's guard)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from qb_data_pipeline_backfill_spark.operators import sample as SA

    base = spark.range(10).withColumnRenamed("id", "doc_id")
    for bad in ("shard", "pos", "__key", "__shard"):
        df = base.withColumn(bad, F.lit(1))
        with _pytest.raises(ValueError, match=bad):
            SA.global_shuffle(df, ["doc_id"], 2)


def test_epoch_plan_exact_integer_arithmetic(spark):
    from qb_data_pipeline_backfill_spark.operators import sample as SA
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 100), ("a", 50), ("b", 10), ("c", 7)],
        "source string, tok int",
    )
    got = {
        r.source: (r.avail_tokens, r.weight, r.target_tokens, r.epochs,
                   r.last_epoch_tokens)
        for r in SA.epoch_plan(
            df, budget_tokens=300, weights={"a": 1, "b": 2},
            tok=F.col("tok"),
        ).collect()
    }
    # wsum=3: a target=100 (1 epoch of 150 avail, last=100);
    # b target=200 over 10 avail -> 20 epochs, last epoch = 10;
    # c has weight 0 -> excluded with zeroes
    assert got == {
        "a": (150, 1, 100, 1, 100),
        "b": (10, 2, 200, 20, 10),
        "c": (7, 0, 0, 0, 0),
    }


def test_epoch_plan_validates(spark):
    import pytest as _pytest
    from qb_data_pipeline_backfill_spark.operators import sample as SA
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", 1)], "source string, tok int")
    with _pytest.raises(ValueError):
        SA.epoch_plan(df, budget_tokens=10, weights={}, tok=F.col("tok"))
    with _pytest.raises(ValueError):
        SA.epoch_plan(df, budget_tokens=10, weights={"a": 0}, tok=F.col("tok"))
    with _pytest.raises(ValueError):
        SA.epoch_plan(df, budget_tokens=10, weights={"a": -1}, tok=F.col("tok"))


def test_epoch_plan_exact_past_double_precision(spark):
    """The review-fix claim: target division stays exact past 2^53.
    weight*budget = 999_999_999_999_999_989 (prime-ish, not exactly
    representable as a double) divided by 3 must floor exactly."""
    from pyspark.sql import functions as F

    from qb_data_pipeline_backfill_spark.operators import sample as SA

    big = 999_999_999_999_999_989
    df = spark.createDataFrame([("a", 1)], "source string, tok int")
    got = SA.epoch_plan(
        df, budget_tokens=big, weights={"a": 1, "b": 2}, tok=F.col("tok")
    ).collect()[0]
    assert got.target_tokens == big // 3  # python int division = ground truth


def test_unimax_waterfill_invariants_and_reference(spark):
    from pyspark.sql import functions as F

    from qb_data_pipeline_backfill_spark.operators import sample as SA

    rows = [("a", 10), ("a", 5), ("b", 100), ("c", 3), ("d", 0), ("e", 40)]
    df = spark.createDataFrame(rows, "source string, tok int")
    avails = {"a": 15, "b": 100, "c": 3, "d": 0, "e": 40}

    def ref(B, E):
        caps = sorted((a * E, g) for g, a in avails.items())
        G, pre, alloc, k = len(caps), 0, {}, None
        for i, (c, g) in enumerate(caps, start=1):
            if c * (G - i + 1) + pre <= B:
                alloc[g] = c
                pre += c
            else:
                k = i
                break
        if k is not None:
            unc = caps[k - 1 :]
            rem = B - sum(alloc.values())
            U, r = rem // len(unc), rem % len(unc)
            for j, (c, g) in enumerate(unc, start=1):
                alloc[g] = U + (1 if j <= r else 0)
        return alloc

    for B, E in [(100, 2), (0, 1), (10**6, 3), (37, 1), (7, 4)]:
        got = {
            r.source: r.alloc_tokens
            for r in SA.unimax_mixture(
                df, budget_tokens=B, max_epochs=E, tok=F.col("tok")
            ).collect()
        }
        assert got == ref(B, E), (B, E)
        caps = {g: a * E for g, a in avails.items()}
        assert sum(got.values()) == min(B, sum(caps.values()))
        assert all(got[g] <= caps[g] for g in got)
        unc = [v for g, v in got.items() if v < caps[g]]
        assert not unc or max(unc) - min(unc) <= 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget_tokens"):
        SA.unimax_mixture(df, budget_tokens=-1, max_epochs=1, tok=F.col("tok"))
