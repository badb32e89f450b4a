"""Property-based tests (hypothesis): the deterministic operators must
agree EXACTLY with a plain-Python recomputation of their spec on
arbitrary inputs — not just on the fixture corpus the oracle gate
uses. Each example runs one small Spark job; example counts are kept
low because the properties are exact (any divergence fails on the
first counterexample hypothesis shrinks to).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import curation as C
from qb_data_pipeline_backfill_spark.operators.bloom import bloom_build, bloom_probe

_SETTINGS = dict(max_examples=10, deadline=None)

_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\tx"),
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(texts=_texts, size=st.integers(2, 20), overlap=st.integers(0, 10))
def test_chunking_matches_python_spec(spark, texts, size, overlap):
    if overlap >= size:
        overlap = size - 1
    step = size - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_chars)
        for r in C.chunk_documents(df, size=size, overlap=overlap).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for ci, start in enumerate(range(0, len(t), step)):
            want[(i, ci)] = (start, len(t[start : start + size]))
    assert got == want


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(1, 50), min_size=1, max_size=20),
    budget=st.integers(1, 100),
)
def test_packing_matches_python_spec(spark, sizes, budget):
    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(sizes)], "doc_id long, lang string, n int"
    )
    got = {
        r.doc_id: r.pack_bin
        for r in C.pack_greedy(
            df, size_col=F.col("n"), budget=budget,
            partition_col="lang", order_col="doc_id",
        ).collect()
    }
    cum = 0
    want = {}
    for i, n in enumerate(sizes):
        want[i] = cum // budget
        cum += n
    assert got == want


@settings(**_SETTINGS)
@given(
    texts=_texts,
    min_count=st.integers(1, 4),
)
def test_vocab_matches_python_spec(spark, texts, min_count):
    from collections import Counter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.term: (r.term_id, r.n)
        for r in C.build_vocab(df, min_count=min_count).collect()
    }
    counts = Counter()
    for t in texts:
        norm = " ".join(t.lower().strip().split())
        counts.update(tok for tok in norm.split(" ") if tok)
    kept = sorted(
        ((term, n) for term, n in counts.items() if n >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )
    want = {term: (i + 1, n) for i, (term, n) in enumerate(kept)}
    assert got == want


@settings(**_SETTINGS)
@given(
    dim_keys=st.sets(st.integers(-(2**40), 2**40), min_size=1, max_size=50),
    fact_keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=100),
)
def test_bloom_soundness_property(spark, dim_keys, fact_keys):
    dim = spark.createDataFrame([(k,) for k in dim_keys], "key long")
    fact = spark.createDataFrame([(k,) for k in fact_keys], "key long")
    kept = {r.key for r in bloom_probe(fact, "key", bloom_build(dim, "key")).collect()}
    members = set(fact_keys) & dim_keys
    assert members <= kept
