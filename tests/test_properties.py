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


# --------------------------------------------------------------------------
# media codecs (pure functions — no Spark in the loop, so hypothesis
# can afford hundreds of examples)
# --------------------------------------------------------------------------
@settings(**{**_SETTINGS, "max_examples": 200})
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31),
    comment=st.booleans(),
)
def test_ppm_bmp_roundtrip_property(w, h, seed, comment):
    """ANY pixel content survives encode→decode through both container
    formats, and the two decoders agree byte-for-byte."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    hdr = b"P6\n" + (b"# c\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    got_w, got_h, got = M._decode_ppm(hdr + px.tobytes())
    assert (got_w, got_h) == (w, h) and np.array_equal(got, px)
    # BMP: reuse the encoder's layout machinery with arbitrary pixels
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px.reshape(h, w, 3)[:, :, ::-1].reshape(h, w * 3)
    payload = rows[::-1].tobytes()
    header = (
        b"BM" + (54 + len(payload)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    got_w2, got_h2, got2 = M._decode_bmp(header + payload)
    assert (got_w2, got_h2) == (w, h) and np.array_equal(got2, px)


@settings(**{**_SETTINGS, "max_examples": 200})
@given(
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, rate, seed):
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype="<i2")
    data = samples.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = fmt + b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        body += b"\x00"
    buf = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    got_rate, got = M._decode_wav(buf)
    assert got_rate == rate and np.array_equal(got, samples)


# --------------------------------------------------------------------------
# txn bloom index: driver-side Python positions == Spark-side positions
# --------------------------------------------------------------------------
_bloom_keys = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA1),
        max_size=40,
    ),
)


@settings(**_SETTINGS)
@given(value=_bloom_keys, m=st.sampled_from([1024, 8192]), k=st.integers(1, 6))
def test_bloom_positions_python_matches_spark(spark, value, m, k):
    """read_table_point's soundness rests on the driver's pure-Python
    hash family producing the SAME bit positions Spark set at write
    time — for any key value, not just the fixtures."""
    from pyspark.sql import functions as FF

    from qb_data_pipeline_backfill_spark.operators.txn import _bloom_positions_py

    expected = _bloom_positions_py(value, m, k)
    df = spark.createDataFrame(
        [(value,)], "c long" if isinstance(value, int) else "c string"
    )
    got = df.select(
        *[
            (
                FF.conv(
                    FF.substring(
                        FF.sha2(
                            FF.concat_ws("|", FF.col("c").cast("string"), FF.lit(str(i))),
                            256,
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % m
            ).alias(f"p{i}")
            for i in range(k)
        ]
    ).collect()[0]
    assert [got[f"p{i}"] for i in range(k)] == expected


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.integers(-50, 50), st.none()), min_size=1, max_size=60
    ),
    lo=st.integers(-60, 60),
    span=st.integers(0, 60),
    n_files=st.integers(1, 5),
    del_mod=st.one_of(st.none(), st.integers(2, 7)),
)
def test_count_where_matches_naive_filter(
    spark, tmp_path_factory, vals, lo, span, n_files, del_mod
):
    """count_where == the naive full-scan BETWEEN count on arbitrary
    layouts: any file count, NULLs anywhere in the stats column, any
    predicate range (incl. empty/degenerate), with and without MoR
    deletes — the metadata classification must never change the
    answer, only how it is produced."""
    from qb_data_pipeline_backfill_spark.operators import txn

    hi = lo + span
    path = str(tmp_path_factory.mktemp("cwprop") / "t")
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    txn.commit_append_with_stats(
        spark,
        df.repartitionByRange(n_files, "k"),
        path,
        key="k",
        extra_cols=["v"],
    )
    if del_mod is not None:
        txn.commit_delete_mor(
            spark,
            df.filter(F.col("k") % del_mod == 0).select("k"),
            path,
            key="k",
        )
    surviving = [
        (k, v) for k, v in rows if del_mod is None or k % del_mod != 0
    ]
    want_v = sum(1 for _, v in surviving if v is not None and lo <= v <= hi)
    want_k = sum(1 for k, _ in surviving if lo <= k <= hi)
    assert txn.count_where(spark, path, lo, hi, col="v") == want_v
    assert txn.count_where(spark, path, lo, hi) == want_k


# --------------------------------------------------------------------------
# URL canonicalization: idempotence + totality (round 12)
# --------------------------------------------------------------------------
_URL_PIECES = st.text(
    alphabet="abXY19.:/?&=#@_-%~", min_size=0, max_size=24
)


@settings(max_examples=25, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS", ""]),
    host=st.sampled_from(
        ["E.com", "www.Ex.org:8080", "a.b.C.net:443", "x.io:80", ""]
    ),
    rest=_URL_PIECES,
)
def test_canonicalize_url_is_idempotent_and_total(spark, scheme, host, rest):
    """canon(canon(u)) == canon(u) for arbitrary URL-ish strings, and
    canon never returns NULL for non-NULL input — the two properties a
    dedup key function must have (a non-idempotent canonicalizer
    splits re-processed corpora into distinct keys)."""
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        canonicalize_url,
    )

    u = (f"{scheme}://{host}" if scheme and host else "") + rest
    df = spark.createDataFrame([(u,)], "url string")
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(F.col("c"), canonicalize_url("c").alias("cc"))
    row = twice.collect()[0]
    assert row.cc == row.c, (u, row.c, row.cc)
    assert row.c is not None


@settings(max_examples=20, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcé19 ", min_size=0, max_size=12), max_size=6
    )
)
def test_nfc_is_idempotent_and_fold_is_nfc_stable(spark, words):
    """NFC(NFC(x)) == NFC(x), and accent folding's output is already
    NFC (folding then normalizing changes nothing) — so running a
    corpus through ingest normalization twice is a no-op."""
    from qb_data_pipeline_backfill_spark.operators.text import (
        fold_accents_text,
        nfc_text,
    )

    t = " ".join(words) + " café Ω"
    df = spark.createDataFrame([(t,)], "t string")
    row = df.select(
        nfc_text("t").alias("n1"),
        nfc_text(nfc_text("t")).alias("n2"),
        fold_accents_text("t").alias("f1"),
        nfc_text(fold_accents_text("t")).alias("f2"),
    ).collect()[0]
    assert row.n1 == row.n2
    assert row.f1 == row.f2


# --------------------------------------------------------------------------
# WARC round trip: build records from arbitrary text, parse, recover
# --------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    bodies=st.lists(
        st.text(
            alphabet=st.sampled_from("aé中\r\n <>:/W"),
            max_size=40,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_warc_roundtrip_matches_inputs(bodies):
    from qb_data_pipeline_backfill_spark.operators.webtext import parse_warc

    blob = ""
    for i, body in enumerate(bodies):
        payload = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
        )
        blob += (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:p:{i}>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload.encode('utf-8'))}\r\n"
            "\r\n" + payload + "\r\n\r\n"
        )
    recs = parse_warc(blob)
    assert [r["body"] for r in recs] == bodies
    assert [r["record_id"] for r in recs] == [
        f"<urn:p:{i}>" for i in range(len(bodies))
    ]


# --------------------------------------------------------------------------
# global_shuffle: partitioning-invariant permutation
# --------------------------------------------------------------------------
@settings(max_examples=5, deadline=None)
@given(n=st.integers(1, 60), shards=st.integers(1, 5), parts=st.integers(1, 7))
def test_global_shuffle_is_partitioning_invariant(spark, n, shards, parts):
    from qb_data_pipeline_backfill_spark.operators import sample as SA

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    base = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in SA.global_shuffle(df, ["doc_id"], shards, salt="s").collect()
    )
    re = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in SA.global_shuffle(
            df.repartition(parts), ["doc_id"], shards, salt="s"
        ).collect()
    )
    assert base == re
    # shard ids in range; positions are a permutation of 1..n overall
    assert all(0 <= s < shards for _, s, _ in base)
    assert sorted(p for *_, p in base) == sorted(
        p
        for sh in range(shards)
        for p in range(1, sum(1 for _, s, _ in base if s == sh) + 1)
    )


# --------------------------------------------------------------------------
# DSIR: λ fit matches a plain-Python recomputation of the spec
# --------------------------------------------------------------------------
@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from("ab é "), max_size=20),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_dsir_fit_matches_python_spec(spark, docs):
    import math

    from qb_data_pipeline_backfill_spark.operators import curation as C
    from qb_data_pipeline_backfill_spark.operators.text import CLS_HASH_MOD

    nb = 32
    df = spark.createDataFrame(
        [(i, t, tgt) for i, (t, tgt) in enumerate(docs)],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r.bucket: (r.raw_n, r.tgt_n, r.lr_micro)
        for r in C.dsir_fit(df, F.col("tgt"), n_buckets=nb).collect()
    }
    # python spec
    def fold(tok):
        h = 0
        for ch in tok:
            h = (h * 31 + ord(ch)) % CLS_HASH_MOD
        return h

    raw = [0] * nb
    tgt = [0] * nb
    for t, is_t in docs:
        toks = [x for x in " ".join(t.lower().strip().split()).split(" ") if x]
        hs = [fold(x) for x in toks]
        bs = [h % nb for h in hs] + [
            ((a * 8191 + b) % CLS_HASH_MOD) % nb
            for a, b in zip(hs, hs[1:])
        ]
        for b in bs:
            raw[b] += 1
            if is_t:
                tgt[b] += 1
    rt, tt = sum(raw), sum(tgt)
    for b in range(nb):
        num = (tgt[b] + 1) * (rt + nb)
        den = (raw[b] + 1) * (tt + nb)
        lr = round(math.log(num / den) * 1e6)
        assert got[b] == (raw[b], tgt[b], lr), b


# --------------------------------------------------------------------------
# budget_fill_scalable ≡ budget_fill (the scale path is exact)
# --------------------------------------------------------------------------
@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.integers(1, 40),       # tok
            st.integers(-3, 3),       # quantized score level
        ),
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(0, 200),
)
def test_budget_fill_scalable_equals_exact(spark, rows, budget):
    from qb_data_pipeline_backfill_spark.operators import curation as C

    df = spark.createDataFrame(
        [(i, g, t, q) for i, (g, t, q) in enumerate(rows)],
        "doc_id long, lang string, tok int, q int",
    )
    def canon(out):
        return sorted(
            (r.doc_id, r.lang, r.tok, r.score_micro, r.cum_tok)
            for r in out.collect()
        )
    exact = canon(
        C.budget_fill(df, budget=budget, score=F.col("q"), tok=F.col("tok"))
    )
    scale = canon(
        C.budget_fill_scalable(
            df, budget=budget, score=F.col("q"), tok=F.col("tok")
        )
    )
    assert scale == exact


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("ab c.é"), max_size=40),
        min_size=1,
        max_size=5,
    ),
    min_len=st.integers(2, 10),
)
def test_exact_substring_spans_match_brute_force(spark, texts, min_len):
    from collections import Counter

    from qb_data_pipeline_backfill_spark.operators import suffix as SX

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.start, r.end)
        for r in SX.exact_substring_spans(df, min_len=min_len).collect()
    )
    cnt = Counter()
    for _, t in docs:
        for p in range(len(t) - min_len + 1):
            cnt[t[p : p + min_len]] += 1
    want = []
    for d, t in docs:
        merged: list[list[int]] = []
        for p in range(len(t) - min_len + 1):
            if cnt[t[p : p + min_len]] < 2:
                continue
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + min_len)
            else:
                merged.append([p, p + min_len])
        want.extend((d, s, e) for s, e in merged)
    assert got == sorted(want)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("abc d"), max_size=30),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(2, 6),
    w=st.integers(1, 5),
)
def test_winnow_fingerprints_match_reference(spark, texts, k, w):
    import hashlib

    from qb_data_pipeline_backfill_spark.operators import text as X

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in X.winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = set()
    for d, t in docs:
        if len(t) < k:
            continue
        hs = [
            hashlib.md5(t[p : p + k].encode()).hexdigest()
            for p in range(len(t) - k + 1)
        ]
        for j in range(len(hs) - w + 1):
            m = min(hs[j : j + w])
            pos = max(p for p in range(j, j + w) if hs[p] == m)
            want.add((d, pos, m))
    assert got == want
