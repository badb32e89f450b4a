"""Bloom-prune operator: soundness (no false negatives), selectivity,
and plan shape (no shuffle on the probed side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.bloom import bloom_build, bloom_probe


def test_bloom_never_drops_true_members(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    fact = spark.range(0, 5000).select(F.col("id").alias("key"))
    bloom = bloom_build(dim, "key")
    kept = {r.key for r in bloom_probe(fact, "key", bloom).collect()}
    true_members = {r.key for r in fact.join(dim, "key", "left_semi").collect()}
    assert true_members <= kept


def test_bloom_prunes_most_non_members(spark):
    dim = spark.range(0, 200).select(F.col("id").alias("key"))
    fact = spark.range(100000, 110000).select(F.col("id").alias("key"))
    bloom = bloom_build(dim, "key")
    n_kept = bloom_probe(fact, "key", bloom).count()
    # 200 keys * 4 hashes in 16384 bits -> fp rate well under 5%
    assert n_kept < 500


def test_bloom_probe_is_narrow(spark):
    dim = spark.range(0, 100).select(F.col("id").alias("key"))
    fact = spark.range(0, 1000).select(F.col("id").alias("key"))
    plan = bloom_probe(fact, "key", bloom_build(dim, "key"))._jdf.queryExecution().executedPlan().toString()
    # the fact side must reach the filter without an exchange; the only
    # exchanges belong to the one-row bloom aggregate + its broadcast
    before_filter = plan.split("Filter")[-1]
    assert "Exchange" not in before_filter.split("BroadcastNestedLoopJoin")[0]


def test_decontamination_prefilter_actually_prunes(spark):
    """The bloom prefilter must REDUCE the train gram stream that
    reaches the join (the scale win), not just preserve results."""
    from qb_data_pipeline_backfill_spark.operators import sample as SA
    from qb_data_pipeline_backfill_spark.operators.text import tokens, word_ngrams
    from qb_data_pipeline_backfill_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    is_eval = SA.hash_prefix(["doc_id"], salt="eval") < F.lit(SA.threshold_hex(0.1))
    tg = docs.filter(~is_eval).select(
        F.explode(word_ngrams(tokens("text"), 5)).alias("gram")
    )
    eg = docs.filter(is_eval).select(
        F.explode(word_ngrams(tokens("text"), 5)).alias("gram")
    )
    bloom = bloom_build(eg, "gram", m=65536, k=4)
    n_all = tg.count()
    n_kept = bloom_probe(tg, "gram", bloom, m=65536, k=4).count()
    # eval is ~10% of the corpus; non-candidate train grams must drop
    assert n_kept < n_all * 0.5
