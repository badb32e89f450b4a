"""Unit tests for operators/curation.py edge cases (the sf0.001 gate
parity is covered by test_queries_vs_oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_chunking_covers_text_with_overlap(spark):
    # 1000 chars, size=400, overlap=100 -> starts 0,300,600,900
    df = _docs(spark, [(1, "a" * 1000, "en")])
    got = C.chunk_documents(df, size=400, overlap=100).collect()
    assert [(r.chunk_id, r.chunk_start, r.chunk_chars) for r in got] == [
        (0, 0, 400),
        (1, 300, 400),
        (2, 600, 400),
        (3, 900, 100),
    ]


def test_chunking_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "short", "en"), (2, "", "en")])
    got = C.chunk_documents(df, size=400, overlap=100).collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].chunk_chars == 5


def test_chunking_rejects_overlap_ge_size(spark):
    df = _docs(spark, [(1, "x", "en")])
    with pytest.raises(ValueError):
        C.chunk_documents(df, size=100, overlap=100)


def test_pack_greedy_fills_bins_in_order(spark):
    df = spark.createDataFrame(
        [(i, "en", 60) for i in range(5)], "doc_id long, lang string, n int"
    )
    packed = C.pack_greedy(
        df, size_col=F.col("n"), budget=100, partition_col="lang", order_col="doc_id"
    )
    bins = {r.doc_id: r.pack_bin for r in packed.collect()}
    # exclusive cumsum: 0,60,120,180,240 // 100 -> 0,0,1,1,2
    assert bins == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_greedy_partitions_independently(spark):
    df = spark.createDataFrame(
        [(1, "en", 80), (2, "de", 80), (3, "en", 80), (4, "de", 80)],
        "doc_id long, lang string, n int",
    )
    packed = C.pack_greedy(
        df, size_col=F.col("n"), budget=80, partition_col="lang", order_col="doc_id"
    )
    by_lang_bin = {
        (r.lang, r.doc_id): r.pack_bin for r in packed.collect()
    }
    # each language packs from bin 0 independently
    assert by_lang_bin[("en", 1)] == 0 and by_lang_bin[("de", 2)] == 0
    assert by_lang_bin[("en", 3)] == 1 and by_lang_bin[("de", 4)] == 1


def test_pack_greedy_rejects_tied_order_values(spark):
    # tied order keys make bin assignment depend on which tied row the
    # sort emits first — nondeterministic across partitionings, so the
    # operator must fail loudly instead of silently wobbling
    df = spark.createDataFrame(
        [(1, "en", 60), (2, "en", 60), (3, "en", 60)],
        "doc_id long, lang string, n int",
    ).withColumn("order_key", F.lit(7))
    packed = C.pack_greedy(
        df, size_col=F.col("n"), budget=100,
        partition_col="lang", order_col="order_key",
    )
    with pytest.raises(Exception, match="pack_greedy: duplicate order_col"):
        packed.collect()


def test_pack_greedy_deterministic_across_partitionings(spark):
    rows = [(i, ["en", "de"][i % 2], 30 + (i % 7) * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n int")
    def run(d):
        return {
            (r.lang, r.doc_id): r.pack_bin
            for r in C.pack_greedy(
                d, size_col=F.col("n"), budget=100,
                partition_col="lang", order_col="doc_id",
            ).collect()
        }
    assert run(df.repartition(1)) == run(df.repartition(13, "n"))


def test_build_vocab_prunes_and_ranks(spark):
    df = _docs(spark, [(1, "a a a b b c", "en"), (2, "b a", "en")])
    vocab = {r.term: (r.term_id, r.n) for r in C.build_vocab(df, min_count=3).collect()}
    # a: 4, b: 3, c pruned; ids by (count desc, term)
    assert vocab == {"a": (1, 4), "b": (2, 3)}


def test_percentile_band_filter_keeps_inclusive_band(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "doc_id long, s long"
    )
    kept = sorted(
        r.doc_id
        for r in C.percentile_band_filter(
            df, score=F.col("s"), lo=0.2, hi=0.8
        ).collect()
    )
    # percentile_disc(0.2)=2, percentile_disc(0.8)=8, inclusive
    assert kept == [2, 3, 4, 5, 6, 7, 8]


def test_language_scores_null_text_predicts_null(spark):
    """A NULL document must not be filed under the alphabetically
    first language (r7 review: every NULL doc predicted 'de')."""
    from qb_data_pipeline_backfill_spark.operators.text import language_scores

    df = spark.createDataFrame(
        [(1, "the of and to in a is it"), (2, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in language_scores(df).collect()}
    assert got[1] == "en" and got[2] is None


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------
def test_dsir_prefers_target_like_documents(spark):
    # target docs share a distinctive vocabulary; raw-only docs another.
    rows = (
        [(i, "alpha beta gamma", "en") for i in range(4)]
        + [(10 + i, "zork quux blorp", "de") for i in range(4)]
        + [(20, "alpha beta gamma", "de")]  # target-LIKE but raw-labelled
    )
    df = _docs(spark, rows)
    all9 = C.dsir_select_topk(df, F.col("lang") == "en", 9).collect()
    ids = {r.doc_id for r in all9[:5]}
    # the five target-vocabulary docs strictly outrank every zork doc
    assert ids == {0, 1, 2, 3, 20}
    assert min(r.logw_micro for r in all9[:5]) > max(
        r.logw_micro for r in all9[5:]
    )


def test_dsir_empty_doc_scores_zero_and_ties_break_by_id(spark):
    df = _docs(
        spark,
        [(3, "", "en"), (1, "   ", "de"), (2, "", "de")],
    )
    got = C.dsir_select_topk(df, F.col("lang") == "en", 2).collect()
    # all weights 0 (no features anywhere) -> tie broken by doc_id asc
    assert [(r.doc_id, r.n_feats, r.logw_micro) for r in got] == [
        (1, 0, 0),
        (2, 0, 0),
    ]


def test_dsir_unseen_bucket_gets_prior_odds(spark):
    # one target doc, three raw docs with disjoint vocab: a bucket
    # seen only in raw must carry a NEGATIVE log-ratio; buckets seen
    # only in target a positive one.
    df = _docs(
        spark,
        [(1, "tok", "en"), (2, "other", "de"), (3, "other", "de")],
    )
    lam = C.dsir_fit(df, F.col("lang") == "en", n_buckets=64)
    rows = {r.bucket: r for r in lam.collect()}
    assert len(rows) == 64
    tgt_only = [r for r in rows.values() if r.tgt_n > 0 and r.raw_n == r.tgt_n]
    raw_only = [r for r in rows.values() if r.tgt_n == 0 and r.raw_n > 0]
    assert tgt_only and all(r.lr_micro > 0 for r in tgt_only)
    assert raw_only and all(r.lr_micro < 0 for r in raw_only)
    # unseen buckets score the prior odds ln((raw_tot+B)/(tgt_tot+B)),
    # identical for every unseen bucket
    unseen = {r.lr_micro for r in rows.values() if r.raw_n == 0}
    assert len(unseen) == 1


def test_dsir_scoring_stage_is_narrow_codegen(spark):
    df = _docs(spark, [(1, "a b c", "en"), (2, "d e", "de")])
    scored = C.dsir_log_weights(df, [0] * 64)
    plan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_budget_fill_is_maximal_prefix_per_group(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 40, 100),
            (2, "en", 50, 90),   # cum 90 -> kept
            (3, "en", 30, 80),   # cum 120 > 100: blocks
            (4, "en", 5, 70),    # would fit alone, but prefix rule blocks
            (5, "de", 60, 10),   # own group
        ],
        "doc_id long, lang string, tok int, q int",
    )
    got = C.budget_fill(
        df, budget=100, score=F.col("q"), tok=F.col("tok")
    ).collect()
    assert {(r.doc_id, r.cum_tok) for r in got} == {
        (1, 40),
        (2, 90),
        (5, 60),
    }


def test_budget_fill_ties_break_by_id_and_zero_budget_empty(spark):
    df = spark.createDataFrame(
        [(2, "en", 10, 5), (1, "en", 10, 5)],
        "doc_id long, lang string, tok int, q int",
    )
    got = C.budget_fill(
        df, budget=10, score=F.col("q"), tok=F.col("tok")
    ).collect()
    assert [(r.doc_id,) for r in got] == [(1,)]
    assert (
        C.budget_fill(df, budget=0, score=F.col("q"), tok=F.col("tok")).count()
        == 0
    )
