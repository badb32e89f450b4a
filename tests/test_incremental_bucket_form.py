"""r16 optimization: the incremental band-index probes were
restructured from two hash joins to one bucket groupBy
(OPTIMIZATION_r16.md §7). The incremental ≡ one-shot contracts are
already pinned by the existing oracle/pytest suite; this file covers
the NEW code paths the restructure introduced:

- the touches-new filter (all-history buckets emit nothing),
- the self-pair guard (an id present in BOTH the index and the new
  batch meets itself in its bucket and must not pair with itself —
  the join form dropped that via ``hid != nid``),
- the skew cap still counting TOTAL membership (history + new).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import multimodal as M
from qb_data_pipeline_backfill_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_index,
)


@pytest.fixture(scope="module")
def hashes(spark):
    # 0b...0001 vs 0b...0011: Hamming 1 — a near-dup pair
    rows = [("a", 1), ("b", 3), ("c", 1 << 40)]
    return spark.createDataFrame(rows, ["media_id", "dhash"]).withColumn(
        "dhash", F.col("dhash").cast("long")
    )


def test_hash64_self_overlap_no_self_pair(spark, hashes):
    """An id in BOTH index and new batch must not pair with itself,
    and must still pair with its genuine near-dups."""
    index = M.hash64_band_index(hashes, max_hamming=2)
    new = hashes.filter(F.col("media_id").isin("a", "b"))  # 'a','b' also in index
    out = M.incremental_hash64_pairs(index, new, max_hamming=2, max_bucket=10)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in out.collect()}
    assert ("a", "a", 0) not in got and ("b", "b", 0) not in got
    assert ("a", "b", 1) in got


def test_hash64_all_history_bucket_emits_nothing(spark):
    """History-only near-dups must NOT appear — only pairs touching
    the new batch. 'c' is all-ones, Hamming 63-64 from both history
    hashes and sharing no band value with them."""
    rows = [("a", 1), ("b", 3), ("c", -1)]
    hashes = spark.createDataFrame(rows, ["media_id", "dhash"]).withColumn(
        "dhash", F.col("dhash").cast("long")
    )
    index = M.hash64_band_index(
        hashes.filter(F.col("media_id").isin("a", "b")), max_hamming=2
    )
    new = hashes.filter(F.col("media_id") == "c")
    out = M.incremental_hash64_pairs(index, new, max_hamming=2, max_bucket=10)
    assert out.count() == 0  # (a,b) is history-history; c matches nothing


def test_hash64_skew_cap_counts_total_membership(spark):
    """Cap counts history + new together: 3 history + 1 new identical
    hashes with max_bucket=3 → every band bucket holds 4 > cap →
    no pairs (the one-shot run over the union would skip them too)."""
    hist = spark.createDataFrame(
        [(f"h{i}", 5) for i in range(3)], ["media_id", "dhash"]
    ).withColumn("dhash", F.col("dhash").cast("long"))
    new = spark.createDataFrame([("n0", 5)], ["media_id", "dhash"]).withColumn(
        "dhash", F.col("dhash").cast("long")
    )
    index = M.hash64_band_index(hist, max_hamming=1)
    out = M.incremental_hash64_pairs(index, new, max_hamming=1, max_bucket=3)
    assert out.count() == 0
    ok = M.incremental_hash64_pairs(index, new, max_hamming=1, max_bucket=4)
    assert ok.count() == 3  # n0 vs each of h0..h2 at Hamming 0


def test_minhash_incremental_within_batch_pairs_kept(spark):
    """Two identical NEW docs must pair with each other (within-batch
    pairs survive the touches-new filter)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (10, "completely different historical content here now"),
        ],
        ["doc_id", "text"],
    )
    index = minhash_band_index(docs.filter(F.col("doc_id") >= 10))
    new = docs.filter(F.col("doc_id") < 10)
    out = incremental_minhash_pairs(index, new, threshold=0.7)
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (1, 2) in got and len(got) == 1
