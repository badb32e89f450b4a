"""ExactSubstr dedup (operators/suffix.py): brute-force parity on
crafted corpora, boundary behavior, and plan hygiene."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import suffix as SX


def _brute_spans(docs: list[tuple[int, str]], L: int) -> list[tuple]:
    cnt = Counter()
    for _, t in docs:
        for p in range(len(t) - L + 1):
            cnt[t[p : p + L]] += 1
    out = []
    for d, t in docs:
        merged: list[list[int]] = []
        for p in range(len(t) - L + 1):
            if cnt[t[p : p + L]] < 2:
                continue
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + L)
            else:
                merged.append([p, p + L])
        out.extend((d, s, e) for s, e in merged)
    return sorted(out)


def _spark_spans(spark, docs, L):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.exact_substring_spans(df, min_len=L).collect()
    )


def test_exact_substring_matches_brute_force(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "something unrelated entirely here with no repeats at all!"),
        (3, "zz the quick brown fox jumps over the lazy dog zz ok fine"),
        (4, "abcabcabcabcabcabcabcabcabcabc"),  # self-overlapping repeats
        (5, "short"),
        (6, ""),
    ]
    for L in (8, 12, 20):
        assert _spark_spans(spark, docs, L) == _brute_spans(docs, L), L


def test_exact_substring_skew_safe_path_is_identical(spark):
    """skew_safe=True (agg+join class min, agg+join dup count —
    the corpus-scale hot-class path, VERDICT r13 #4) must reproduce
    the window path bit-for-bit, including on a planted hot class:
    long whitespace runs shared by many documents — the exact key
    the verdict names as the one-task funnel."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "something unrelated entirely here with no repeats at all!"),
        (3, "zz the quick brown fox jumps over the lazy dog zz ok fine"),
        (4, "abcabcabcabcabcabcabcabcabcabc"),
        (5, "short"),
        (6, ""),
    ] + [
        # hot class: every doc carries the same 30-space run
        (100 + i, f"doc{i} " + " " * 30 + f"tail{i}") for i in range(12)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for L in (8, 12, 20):
        window_path = sorted(
            (r.doc_id, r.start, r.end)
            for r in SX.exact_substring_spans(df, min_len=L).collect()
        )
        agg_path = sorted(
            (r.doc_id, r.start, r.end)
            for r in SX.exact_substring_spans(
                df, min_len=L, skew_safe=True
            ).collect()
        )
        assert agg_path == window_path == _brute_spans(docs, L), L


def test_exact_substring_non_power_of_two_and_tail_dupes(spark):
    # L=12 -> h=8, tail offset 4: the two-overlapping-prefix key path.
    # Docs share a 13-char tail; a 12-window must match, but an
    # 11-char shared tail must NOT (the truncated-class trap: equal
    # short suffixes across docs may share classes yet not span L).
    docs = [
        (1, "xxxxxxxxx-ends with this"),
        (2, "yyyyyyyyyyy-ends with this"),
        (3, "qqqqqq-ends with thi"),  # only 11 shared tail chars...
    ]
    L = 12
    assert _spark_spans(spark, docs, L) == _brute_spans(docs, L)


def test_exact_substring_unicode_and_whitespace_runs(spark):
    docs = [
        (1, "é漢字 répété motif here é漢字 répété motif here ok"),
        (2, "   many   spaces   inside   this   one   doc   "),
        (3, "   many   spaces   inside   another   doc   too  "),
    ]
    for L in (8, 10):
        assert _spark_spans(spark, docs, L) == _brute_spans(docs, L), L


def test_suffix_classes_group_equal_prefixes_only(spark):
    docs = [(1, "abcdefgh"), (2, "abcdxyzw"), (3, "abcdefgh")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    classes, h = SX.suffix_prefix_classes(df, target_len=8)
    assert h == 8
    at0 = {r.doc_id: r.r for r in classes.filter(F.col("pos") == 0).collect()}
    assert at0[1] == at0[3] and at0[1] != at0[2]


def test_exact_substring_validates_min_len(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="target_len"):
        SX.exact_substring_spans(df, min_len=1).collect()


def test_exact_substring_plan_is_joinless_and_cartesian_free(spark):
    docs = [(i, f"document number {i} with shared shared shared text") for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    plan = (
        SX.exact_substring_spans(df, min_len=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the class-based form has no joins at all — windows and one agg
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_cut_spans_edge_positions(spark):
    docs = [
        (1, "0123456789"),
        (2, "abcdefghij"),
        (3, "untouched"),
        (4, "xyz"),
    ]
    spans = [
        (1, 0, 3),   # span at document start
        (1, 7, 10),  # span at document end
        (2, 4, 6),   # interior span
        (4, 0, 3),   # whole document
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sp = spark.createDataFrame(spans, ["doc_id", "start", "end"])
    from qb_data_pipeline_backfill_spark.operators import suffix as SX

    got = {r.doc_id: r for r in SX.cut_spans(df, sp).collect()}
    assert (got[1].clean_text, got[1].n_spans, got[1].cut_chars) == ("3456", 2, 6)
    assert (got[2].clean_text, got[2].cut_chars) == ("abcdghij", 2)
    assert (got[3].clean_text, got[3].n_spans) == ("untouched", 0)
    assert (got[4].clean_text, got[4].cut_chars) == ("", 3)


def test_cut_spans_composes_with_marking(spark):
    # cutting all marked spans leaves no length-L duplicate windows
    docs = [
        (1, "prefix SHARED-SEGMENT-HERE suffix one"),
        (2, "other SHARED-SEGMENT-HERE ending two"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from qb_data_pipeline_backfill_spark.operators import suffix as SX

    spans = SX.exact_substring_spans(df, min_len=12)
    clean = SX.cut_spans(df, spans).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    respans = SX.exact_substring_spans(clean, min_len=12).collect()
    assert respans == []


def test_incremental_substring_equals_one_shot_restricted(spark):
    """The cross-run contract (VERDICT r13 #7): marking a new batch
    against the persisted window index must equal the one-shot
    exact_substring_spans over history ∪ batch RESTRICTED to the
    batch's documents — covering a cross-batch duplicate, a
    within-batch self-repeat, a whole-doc duplicate of history, and a
    clean doc. Also pins the first-run case (empty index ≡ one-shot
    on the batch alone) and index appendability (union of per-batch
    index rows probes identically to the index of the union)."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "nothing in common with anything else here at all really!"),
        (3, "zz the quick brown fox jumps over the lazy dog zz ok fine"),
        (4, "abcabcabcabcabcabcabcabcabcabc"),
        (5, "totally novel text that matches nothing anywhere honestly"),
        (6, "nothing in common with anything else here at all really!"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    hist = df.filter(F.col("doc_id") <= 2)
    batch = df.filter(F.col("doc_id") >= 3)
    for L in (8, 12, 20):
        idx = SX.substring_window_index(hist, min_len=L)
        inc = sorted(
            (r.doc_id, r.start, r.end)
            for r in SX.incremental_substring_spans(
                idx, batch, min_len=L
            ).collect()
        )
        full = sorted(
            (r.doc_id, r.start, r.end)
            for r in SX.exact_substring_spans(df, min_len=L).collect()
            if r.doc_id >= 3
        )
        assert inc == full, L
    empty = SX.substring_window_index(
        hist.filter(F.lit(False)), min_len=8
    )
    first_run = sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.incremental_substring_spans(
            empty, batch, min_len=8
        ).collect()
    )
    solo = sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.exact_substring_spans(batch, min_len=8).collect()
    )
    assert first_run == solo
    appended = SX.substring_window_index(
        hist.filter(F.col("doc_id") == 1), min_len=8
    ).unionByName(
        SX.substring_window_index(
            hist.filter(F.col("doc_id") == 2), min_len=8
        )
    )
    via_append = sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.incremental_substring_spans(
            appended, batch, min_len=8
        ).collect()
    )
    via_union = sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.incremental_substring_spans(
            SX.substring_window_index(hist, min_len=8), batch, min_len=8
        ).collect()
    )
    assert via_append == via_union
