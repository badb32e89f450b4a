"""Unit tests for the LLM-pipeline operators: dedup, similarity, text,
multimodal. Uses small constructed inputs so expected values are known
in closed form; the synthetic-table oracle queries are covered by
tests/test_queries_vs_oracle.py."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import dedup as D
from qb_data_pipeline_backfill_spark.operators import multimodal as M
from qb_data_pipeline_backfill_spark.operators import similarity as S
from qb_data_pipeline_backfill_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "  the QUICK brown   fox jumps over the lazy dog near the river bank today "),
        (3, "The quick brown fox jumps over the lazy cat near the river bank today"),
        (4, "completely different content about spark query engines and shuffles here"),
        (5, "le chat est sur la table et le chien est dans le jardin pour la nuit"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------
def test_exact_dedup_collapses_whitespace_and_case(docs):
    out = {r["doc_id"]: r["n_copies"] for r in D.exact_dedup(docs).collect()}
    # docs 1 and 2 normalize to the same content → one survivor (min id)
    assert out[1] == 2
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_lsh_finds_near_dup_and_skips_unrelated(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after normalize
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5  # one-word edit
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_minhash_lsh_plan_has_no_cartesian_product(docs):
    plan = D.minhash_lsh_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_signature_expression_form(docs):
    """The narrow expression form of the signature (used where an extra
    shuffle is unwanted) must agree with itself across rows: identical
    normalized texts → identical signatures; near-dups agree on most
    positions."""
    from pyspark.sql import functions as F

    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id",
            D.minhash_signature(D.char_shingles("text", 5), 32).alias("sig"),
        ).collect()
    }
    assert sigs[1] == sigs[2]  # whitespace/case variants normalize equal
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    agree_14 = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert agree_13 > 16  # one-word edit: high signature agreement
    assert agree_14 < 8  # unrelated doc: low agreement


def test_simhash_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0  # identical normalized tokens
    assert (1, 3) in pairs  # one-word edit stays within hamming 10
    assert (1, 4) not in pairs


def test_simhash_pigeonhole_banding_is_exhaustive_at_hamming_3(spark):
    """With 4 chunks, any pair within Hamming ≤ 3 must agree on at
    least one whole chunk — so the banded join may not drop ANY such
    pair. Certify against a brute-force Hamming over the full
    signature set (the property the contract_simhash_recall floor
    relies on)."""
    import itertools

    rows = [
        (i, f"shared common prefix tokens for everyone plus word{i % 4} and word{i % 7}")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {
        r["doc_id"]: r["sig"]
        for r in D._simhash_chunks_agg(df, "text", "doc_id").collect()
    }
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if sum(bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b])) <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert brute, "fixture must produce at least one Hamming ≤ 3 pair"
    assert brute == banded


def test_simhash_banding_narrow_radii(spark):
    # max_hamming=1 packs two 32-bit chunks (values to 2^32-1) and
    # max_hamming=0 one 64-bit chunk (bit 63 folds into the long sign
    # bit) — both previously overflowed the int chunk cast / the long
    # literal at plan time (r7 advice); chunks are bigint now
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "totally different unrelated words here instead"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for mh in (0, 1):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in D.simhash_near_dup_pairs(df, max_hamming=mh).collect()
        }
        assert pairs.get((1, 2)) == 0, f"max_hamming={mh}: {pairs}"
        assert all(a == 1 and b == 2 for a, b in pairs)


def test_ngram_jaccard_exact_value(spark):
    # doc1: tokens a b c d → bigrams {ab, bc, cd}; doc2: a b c e → {ab, bc, ce}
    # shared = 2, union = 4 → jaccard = 0.5
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"])
    rows = D.ngram_jaccard_pairs(df, n=2, threshold=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["shared"], r["jaccard"]) == (1, 2, 2, 0.5)


# --------------------------------------------------------------------------
# similarity
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [1.0, 0.0, 0.0]),   # duplicate of 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_ordering(vectors):
    out = S.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=3).collect()
    ranked = [(r["rank"], r["neighbor_id"], r["cos"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == (1, 4, 1.0)       # exact duplicate first
    assert ranked[1][1] == 1              # then the near vector
    assert ranked[2] == (3, 2, 0.0)       # then orthogonal
    assert all(r["query_id"] == 0 for r in out)


def test_embedding_near_dup_pairs(vectors):
    pairs = {(r["vec_a"], r["vec_b"]): r["cos"] for r in
             S.embedding_near_dup_pairs(vectors, threshold=0.999).collect()}
    assert pairs == {(0, 4): 1.0}


def test_ivf_finds_exact_duplicate_in_probed_cell(spark):
    # 12 vectors; stride 6 → centroids {0, 6}. vec 11 duplicates vec 1,
    # so both quantize into the SAME cell — IVF must find it at rank 1.
    import math

    rows = [
        (i, [math.cos(i * 0.5), math.sin(i * 0.5), 0.1 * (i % 3)])
        for i in range(11)
    ]
    rows.append((11, rows[1][1]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.ivf_ann_topk(
        df, df.filter(F.col("vec_id") == 1), k=2, stride=6, nprobe=1
    ).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 11 and best["cos"] == 1.0


def test_rp_lsh_finds_exact_duplicates(vectors):
    out = S.rp_lsh_ann_topk(
        vectors, vectors.filter(F.col("vec_id") == 0), k=2, dim=3
    ).collect()
    # an identical vector has an identical signature in every table —
    # it MUST collide and rank first.
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 4 and best["cos"] == 1.0


# --------------------------------------------------------------------------
# text
# --------------------------------------------------------------------------
def test_token_stats_known_counts(spark):
    df = spark.createDataFrame([(1, "Hello world, hello Spark 3!")], ["doc_id", "text"])
    r = X.token_stats(df).collect()[0]
    assert r["n_tokens"] == 5
    # normalized tokens: hello world, hello spark 3! → "hello" repeats
    assert r["n_unique_tokens"] == 4
    # BPE-ish: Hello | world | , | hello | Spark | 3 | ! → 7
    assert r["n_bpe_tokens"] == 7


def test_tokens_empty_and_whitespace_docs_have_no_phantom_token(spark):
    # split("", " ") yields [''] — tokens() must drop it so an empty or
    # whitespace-only document reports 0 tokens, not 1 (r7 latent bug)
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, " a  b ")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in X.token_stats(df).collect()}
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert out[1]["avg_token_len"] is None
    assert out[3]["n_tokens"] == 2 and out[3]["avg_token_len"] == 1.0


def test_language_scores_null_for_empty_docs(spark):
    # a 0-token document has no evidence: scores and prediction NULL
    # (not 'de', the alphabetical tie-break over four 0.0 scores)
    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, None), (4, "the cat is here")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in X.language_scores(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["predicted_lang"] is None
        assert out[i]["score_en"] is None
    assert out[4]["predicted_lang"] == "en"


def test_quality_scores_unicode_letters_are_not_punctuation(spark):
    # é/CJK are \p{L} letters: a clean French/Chinese sentence must not
    # be scored as punctuation-heavy (r7 latent corpus-selection bias)
    df = spark.createDataFrame(
        [
            (1, "Élan déjà vu naïve café rêve"),   # 0 punctuation chars
            (2, "中文文档 测试 数据"),                 # 0 punctuation chars
            (3, "plain words here now"),
            (4, "!!! ??? ,,,"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.quality_scores(df).collect()}
    assert out[1]["punct_ratio"] == 0.0
    assert out[2]["punct_ratio"] == 0.0
    assert out[3]["punct_ratio"] == 0.0
    assert out[4]["punct_ratio"] > 0.5


def test_language_scores_prefers_matching_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is happy"),
            (2, "le chien est dans le jardin et la maison est grande"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.language_scores(df).collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "fr"
    assert out[1]["score_en"] > out[1]["score_fr"]


def test_quality_scores_bounds_and_monotonicity(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in is it that for a " * 5), (2, "!!! ??? ***")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.quality_scores(df).collect()}
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0
    assert out[1]["quality"] > out[2]["quality"]
    assert out[2]["punct_ratio"] > 0.5


def test_repetition_scores_known_values(spark):
    rows = [
        (1, "a b a b a b"),   # bigrams: ab ba ab ba ab → 5 grams, 2 distinct, top=3
        (2, "w x y z"),       # 3 grams, all distinct
        (3, "solo"),          # < 2 tokens → excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in X.repetition_scores(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_ngrams"] == 5
    assert got[1]["dup_ngram_bp"] == (5 - 2) * 10000 // 5
    assert got[1]["top_ngram_bp"] == 3 * 10000 // 5
    assert got[2]["dup_ngram_bp"] == 0 and got[2]["top_ngram_bp"] == 10000 // 3


def test_ngram_contamination_flags_shared_grams_only(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally unrelated training text goes here now"),
        ],
        ["doc_id", "text"],
    )
    holdout = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon eta theta")],
        ["doc_id", "text"],
    )
    got = {r["train_doc_id"]: r for r in D.ngram_contamination(train, holdout, n=5).collect()}
    # doc 1 shares exactly one distinct 5-gram: "alpha beta gamma delta epsilon"
    assert set(got) == {1}
    assert got[1]["n_shared_grams"] == 1
    assert got[1]["n_eval_docs"] == 1


def test_fingerprints_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, " ALPHA  beta gamma delta epsilon zeta ")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.fingerprints(df).collect()}
    assert out[1]["content_fp"] == out[2]["content_fp"]
    assert out[1]["shingle_fp"] == out[2]["shingle_fp"]
    expected = hashlib.md5(b"alpha beta gamma delta epsilon zeta").hexdigest()
    assert out[1]["content_fp"] == expected


# --------------------------------------------------------------------------
# multimodal
# --------------------------------------------------------------------------
def test_synthesize_media_schema_and_determinism(docs):
    media = M.synthesize_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "content", "meta",
    ]
    rows = {r["media_id"]: r for r in media.collect()}
    text1 = docs.filter(F.col("doc_id") == 1).collect()[0]["text"]
    expected = (
        hashlib.md5(text1.encode()).digest()
        + hashlib.md5(text1[::-1].encode()).digest()
        + hashlib.md5(f"salt:{text1}".encode()).digest()
    )
    assert bytes(rows[1]["content"]) == expected
    assert rows[1]["meta"]["n_bytes"] == 48
    assert 1 <= rows[1]["meta"]["width"] <= 1920


def test_byte_features_match_python(docs):
    media = M.synthesize_media(docs)
    feats = {r["media_id"]: r for r in M.byte_features(media).collect()}
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, b in raw.items():
        r = feats[mid]
        assert r["n_bytes"] == len(b) == 48
        assert r["byte_mean"] == round(sum(b) / len(b), 4)
        hist = [0] * 16
        for byte in b:
            hist[byte * 16 // 256] += 1
        assert list(r["byte_histogram"]) == hist


def test_sample_frames_fan_out(docs):
    media = M.synthesize_media(docs)  # 48 bytes → 3 frames of 16
    frames = M.sample_frames(media, frame_bytes=16, every_nth=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, rs in by_media.items():
        assert sorted(r["frame_idx"] for r in rs) == [0, 2]  # every 2nd of 3
        for r in rs:
            start = r["frame_idx"] * 16
            assert bytes(r["frame"]) == raw[mid][start : start + 16]


def test_decode_ppm_matches_formula(docs):
    """The pure-Python P6 decoder recovers exactly the formula pixels
    the encoder wrote (header comments included for id % 4 == 0)."""
    decoded = {
        r["media_id"]: r
        for r in M.decode_media(M.synthesize_images(docs, fmt="ppm")).collect()
    }
    import numpy as np

    for mid, r in decoded.items():
        w, h = mid % 8 + 2, mid % 5 + 2
        assert (r["width"], r["height"]) == (w, h)
        expect = ((np.arange(w * h * 3) + mid * 31) % 256).astype("float32")
        assert np.array_equal(np.array(r["pixels"], dtype="float32"), expect)


def test_decode_bmp_equals_ppm_decode(docs):
    """Same logical image through both container formats (BMP's BGR
    bottom-up padded rows vs PPM's straight RGB payload) decodes to
    the identical pixel array — the codec handles real layout quirks,
    not just the happy path."""
    ppm = M.decode_media(M.synthesize_images(docs, fmt="ppm")).collect()
    bmp = M.decode_media(M.synthesize_images(docs, fmt="bmp")).collect()
    p = {r["media_id"]: list(r["pixels"]) for r in ppm}
    b = {r["media_id"]: list(r["pixels"]) for r in bmp}
    assert p == b and len(p) > 0


def test_mp4_demux_round_trip_and_mixed_containers(spark, docs):
    """ISO BMFF driver-side pins: decode(encode) recovers every
    formula frame across both stsz forms (per-sample table on odd
    ids, fixed field on even) and both chunk layouts; a mixed
    AVI+MP4 batch demuxes per-row through the sniffing demux_video;
    unsupported codec fourccs and non-BMFF bytes fail loudly."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_mp4,
        _encode_mp4,
        _formula_frame,
    )

    for mid in (2, 3, 5, 8, 11):  # covers n_frames 2..6, both parities
        w, h, n = mid % 6 + 2, mid % 4 + 2, mid % 5 + 2
        dw, dh, frames = _decode_mp4(_encode_mp4(mid, w, h, n))
        assert (dw, dh, len(frames)) == (w, h, n)
        for f, px in enumerate(frames):
            assert np.array_equal(px, _formula_frame(mid, f, w, h))
    with pytest.raises(ValueError, match="ftyp"):
        _decode_mp4(b"\x00\x00\x00\x08abcdefgh")
    bad = bytearray(_encode_mp4(3, 4, 3, 4))
    i = bytes(bad).index(b"rgb ")
    bad[i : i + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1"):
        _decode_mp4(bytes(bad))
    # mixed containers in one batch
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    mixed = M.synthesize_videos(half).unionByName(M.synthesize_mp4s(other))
    out = M.demux_video(mixed)
    assert out.count() == (
        M.demux_video(M.synthesize_videos(docs)).count()
    )


def test_decode_png_equals_ppm_decode(docs):
    """The stdlib PNG codec (filtered + deflated scanlines, CRC'd
    chunk walk) decodes to the identical pixels as the raw PPM payload
    of the same logical image — for BOTH pixel recipes, covering every
    scanline filter type ((id + y) % 5 spans 0..4 over the fixture)."""
    for noise in (False, True):
        ppm = M.decode_media(
            M.synthesize_images(docs, fmt="ppm", noise=noise)
        ).collect()
        png = M.decode_media(
            M.synthesize_images(docs, fmt="png", noise=noise)
        ).collect()
        p = {r["media_id"]: list(r["pixels"]) for r in ppm}
        g = {r["media_id"]: list(r["pixels"]) for r in png}
        assert p == g and len(p) > 0


def test_png_codec_round_trip_and_structure():
    """Driver-side codec pins: (a) encode->decode is the identity on
    the formula pixels for every fixture dimension; (b) the encoder
    really emits the structures the decoder must handle — all five
    filter types, a two-IDAT split (id % 3 == 0), an ancillary tEXt
    (id % 4 == 0); (c) corruption fails loudly (bad signature, bad
    chunk CRC, truncation, unsupported color type)."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _PNG_SIG,
        _decode_png,
        _encode_png,
        _formula_pixels,
    )

    for mid in range(0, 60):
        w, h = mid % 8 + 2, mid % 5 + 2
        buf = _encode_png(mid, w, h)
        dw, dh, px = _decode_png(buf)
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, _formula_pixels(mid, w, h))
    # structure: chunk-type sequence for a two-IDAT + tEXt image
    def chunk_types(buf):
        out, pos = [], len(_PNG_SIG)
        while pos < len(buf):
            n = int.from_bytes(buf[pos : pos + 4], "big")
            out.append(buf[pos + 4 : pos + 8])
            pos += 12 + n
        return out
    assert chunk_types(_encode_png(12, 6, 4)) == [
        b"IHDR", b"tEXt", b"IDAT", b"IDAT", b"IEND",
    ]
    assert chunk_types(_encode_png(7, 9, 4)) == [b"IHDR", b"IDAT", b"IEND"]
    # error paths
    with pytest.raises(ValueError, match="signature"):
        _decode_png(b"\x89PNX" + b"\x00" * 16)
    good = _encode_png(7, 9, 4)
    bad = bytearray(good)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        _decode_png(good[: len(good) - 15])
    # unsupported: flip IHDR bit depth to 16, refresh its CRC (color
    # type 6 is now SUPPORTED — see test_png_color_types... below)
    import zlib as _z

    deep = bytearray(good)
    deep[8 + 8 + 8] = 16
    crc = _z.crc32(bytes(deep[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    deep[8 + 8 + 13 : 8 + 8 + 17] = crc.to_bytes(4, "big")
    with pytest.raises(ValueError, match="8-bit"):
        _decode_png(bytes(deep))


def test_jpeg_codec_round_trip_and_rejections():
    """Driver-side JPEG pins: (a) decode(encode) equals the
    decoder-independent integer ground truth (_jpeg_expected_pixels:
    formula coefficients -> pinned integer IDCT -> integer color) for
    every fixture dimension — certifying the marker walk, DHT Huffman
    build, byte unstuffing, DC prediction, EXTEND, and run/EOB/ZRL
    handling end to end — for 4:4:4 AND the web-dominant 4:2:0
    (interleaved MCUs, chroma upsample, non-MCU-multiple crops);
    (b) the supported-subset guards fail loudly (bad SOI, progressive
    SOF2, DRI, sampling factors > 2, truncation)."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
        _jpeg_expected_pixels,
    )

    for mid in range(0, 80):
        w, h = mid % 8 + 2, mid % 5 + 2
        dw, dh, px = _decode_jpeg(_encode_jpeg(mid, w, h))
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, _jpeg_expected_pixels(mid, w, h)), mid
    # 4:2:0: interleaved-MCU entropy walk (4 luma + Cb + Cr per MCU,
    # per-component DC prediction) + nearest chroma upsample; sizes
    # deliberately not MCU multiples (crop + odd-edge upsample paths)
    for mid in range(0, 26):
        w, h = mid % 13 + 10, mid % 9 + 10
        dw, dh, px = _decode_jpeg(_encode_jpeg(mid, w, h, subsampling="420"))
        assert (dw, dh) == (w, h)
        assert np.array_equal(
            px, _jpeg_expected_pixels(mid, w, h, subsampling="420")
        ), mid
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x00\x00rubbish")
    good = bytearray(_encode_jpeg(5, 6, 4))
    # SOF0 (0xFFC0) -> SOF3 (lossless) must fail loudly; SOF2 is
    # now SUPPORTED (see the progressive round trips below)
    i = bytes(good).index(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC3
    with pytest.raises(ValueError, match="unsupported SOF"):
        _decode_jpeg(bytes(prog))
    # progressive: the 10-scan SOF2 schedule (DC first/refine, split
    # spectral bands, EOB runs, correction bits) decodes to pixels
    # BIT-IDENTICAL to the sequential encoding of the same
    # coefficients — 444 and 420, incl. frames where the
    # non-interleaved real block grid diverges from the MCU-padded
    # one (w=17 luma: 3 real vs 4 padded columns)
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _encode_jpeg_progressive,
    )

    for mid in range(0, 12):
        w, h = mid % 8 + 2, mid % 5 + 2
        dw, dh, px = _decode_jpeg(_encode_jpeg_progressive(mid, w, h))
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, _jpeg_expected_pixels(mid, w, h)), mid
    for w, h, sub in ((17, 10, "420"), (33, 17, "444"), (17, 10, "444")):
        dw, dh, px = _decode_jpeg(
            _encode_jpeg_progressive(7, w, h, subsampling=sub)
        )
        assert np.array_equal(
            px, _jpeg_expected_pixels(7, w, h, subsampling=sub)
        ), (w, h, sub)
    # progressive + restart intervals: per-scan RSTn chains with EOB
    # runs flushed at each boundary, all ten scans
    for ri in (1, 2):
        dw, dh, px = _decode_jpeg(
            _encode_jpeg_progressive(3, 80, 40, restart_interval=ri)
        )
        assert np.array_equal(px, _jpeg_expected_pixels(3, 80, 40)), ri
    # grayscale (1-component): no color transform, luma replicated;
    # DRI path included
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _jpeg_block_pixels,
    )

    for mid, w, h, ri in ((5, 6, 4, None), (7, 9, 6, 1), (3, 40, 20, 2)):
        dw, dh, px = _decode_jpeg(
            _encode_jpeg(mid, w, h, gray=True, restart_interval=ri)
        )
        assert (dw, dh) == (w, h)
        nbx = (w + 7) // 8
        for r in range(h):
            for c2 in range(w):
                y = _jpeg_block_pixels(
                    mid, 0, (r // 8) * nbx + c2 // 8
                )[r % 8][c2 % 8]
                p0 = (r * w + c2) * 3
                assert list(px[p0 : p0 + 3]) == [y, y, y], (mid, r, c2)
    # restart intervals: byte-aligned RSTn chain, DC reset, modulo-8
    # sequence (an 80x40 frame at Ri=1 runs 49 markers through the
    # wraparound), identical pixels to the unrestarted stream — and a
    # wrong-sequence marker fails loudly
    for mid, w, h, ri in ((5, 6, 4, 1), (7, 9, 6, 2), (3, 80, 40, 1)):
        dw, dh, px = _decode_jpeg(
            _encode_jpeg(mid, w, h, restart_interval=ri)
        )
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, _jpeg_expected_pixels(mid, w, h)), (mid, ri)
        ddw, ddh, px420 = _decode_jpeg(
            _encode_jpeg(mid, w, h, subsampling="420", restart_interval=ri)
        )
        assert np.array_equal(
            px420, _jpeg_expected_pixels(mid, w, h, subsampling="420")
        ), (mid, ri)
    rst = bytearray(_encode_jpeg(3, 40, 8, restart_interval=1))
    k = bytes(rst).index(b"\xff\xd0")
    rst[k + 1] = 0xD6
    with pytest.raises(ValueError, match="restart marker"):
        _decode_jpeg(bytes(rst))
    # flip component 0 sampling to 0x33 (3x3 — outside the 1-2 range)
    sub = bytearray(good)
    sub[i + 11] = 0x33  # SOF payload: [len2][prec][h2][w2][nc][cid,hv,tq]
    with pytest.raises(ValueError, match="sampling factors"):
        _decode_jpeg(bytes(sub))
    with pytest.raises(Exception):
        _decode_jpeg(bytes(good[: len(good) // 2]))


def test_png_color_types_round_trip_and_rejections():
    """All five 8-bit PNG color types decode to the stated RGB
    conversion (gray replicated, palette looked up, alpha dropped);
    palette-without-PLTE and out-of-range indexes fail loudly."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
        _formula_pixels,
        _gif_palette,
        _png_chunk,
    )

    for mid in range(15):
        w, h = mid % 8 + 2, mid % 5 + 2
        n = w * h
        g = np.repeat(((np.arange(n) + mid * 31) % 256), 3).astype(np.uint8)
        for ct in (0, 4):
            assert np.array_equal(
                _decode_png(_encode_png(mid, w, h, color_type=ct))[2], g
            ), (mid, ct)
        pal = _gif_palette(False)
        idx = (mid * 31 + np.arange(n) * 17) % 256
        exp = np.array(
            [pal[3 * int(i) + c] for i in idx for c in range(3)],
            dtype=np.uint8,
        )
        assert np.array_equal(
            _decode_png(_encode_png(mid, w, h, color_type=3))[2], exp
        ), mid
        assert np.array_equal(
            _decode_png(_encode_png(mid, w, h, color_type=6))[2],
            _formula_pixels(mid, w, h),
        ), mid
    # palette image with its PLTE chunk stripped must fail loudly
    buf = _encode_png(7, 6, 4, color_type=3)
    i = buf.index(b"PLTE") - 4
    ln = int.from_bytes(buf[i : i + 4], "big")
    stripped = buf[:i] + buf[i + 12 + ln :]
    with pytest.raises(ValueError, match="without PLTE"):
        _decode_png(stripped)
    # Adam7 interlace: seven independently-filtered passes decode to
    # pixels identical to the sequential encoding, every color type
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _adam7_pass_dims,
    )

    assert sum(
        pw * ph for pw, ph in _adam7_pass_dims(23, 17) if pw > 0
    ) == 23 * 17
    for ct in (0, 2, 3, 4, 6):
        seq = _decode_png(_encode_png(7, 23, 17, color_type=ct))[2]
        inter = _decode_png(
            _encode_png(7, 23, 17, color_type=ct, interlace=True)
        )[2]
        assert np.array_equal(seq, inter), ct
    # md5-noise pixels (adversarial for the filters) through Adam7
    for mid in range(4):
        seq = _decode_png(_encode_png(mid, 23, 17, noise=True))[2]
        inter = _decode_png(
            _encode_png(mid, 23, 17, noise=True, interlace=True)
        )[2]
        assert np.array_equal(seq, inter), mid
    # short PLTE -> out-of-range index
    short = (
        buf[:i]
        + _png_chunk(b"PLTE", bytes(_gif_palette(False)[:30]))
        + buf[i + 12 + ln :]
    )
    with pytest.raises(ValueError, match="out of range"):
        _decode_png(short)


def test_jpeg_codec_fuzz_random_coefficients(monkeypatch):
    """Randomized-coefficient fuzz: the formula fixtures only span
    coefficient values -9..9; wild JPEGs carry magnitudes to the
    Huffman table's size-10 capacity (|v| <= 1023) with long zero
    runs. Patch the coefficient source with seeded random sparse
    blocks and require decode(encode) == the decoder-independent
    ground truth across sequential/420/DRI/progressive — exercising
    ZRL chains, large EXTEND sizes, DC swings, and EOB-run shapes the
    pinned formula never produces."""
    import random

    import numpy as np

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    rng = random.Random(20250816)
    cache: dict = {}

    def fuzz_coef(media_id: int, c: int, b: int, k: int) -> int:
        key = (media_id, c, b, k)
        hit = cache.get(key)
        if hit is None:
            r = rng.random()
            if r < 0.65:
                hit = 0  # sparse: real blocks are mostly zeros
            elif r < 0.9:
                hit = rng.randint(-30, 30)
            else:
                hit = rng.randint(-1000, 1000)
            cache[key] = hit
        return hit

    monkeypatch.setattr(M, "_jpeg_coef", fuzz_coef)
    for mid in (1, 2, 3):
        w, h = 20 + mid, 15 + mid
        exp = M._jpeg_expected_pixels(mid, w, h)
        for enc in (
            lambda: M._encode_jpeg(mid, w, h),
            lambda: M._encode_jpeg(mid, w, h, restart_interval=2),
            lambda: M._encode_jpeg_progressive(mid, w, h),
        ):
            dw, dh, px = M._decode_jpeg(enc())
            assert (dw, dh) == (w, h)
            assert np.array_equal(px, exp), mid
        exp420 = M._jpeg_expected_pixels(mid, w, h, "420")
        for enc in (
            lambda: M._encode_jpeg(mid, w, h, "420", restart_interval=1),
            lambda: M._encode_jpeg_progressive(mid, w, h, "420"),
        ):
            dw, dh, px = M._decode_jpeg(enc())
            assert np.array_equal(px, exp420), mid


def test_tiff_codec_round_trip_and_rejections():
    """TIFF pins: (a) II/MM x gray/RGB x two-strip round trips vs the
    closed-form bytes, uncompressed AND LZW AND PackBits AND
    LZW+predictor-2; (b) loud rejection of unsupported compression,
    16-bit, tiles, multi-IFD, bad magic, truncation."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_tiff,
        _encode_tiff,
        _formula_pixels,
    )

    for mid in range(16):
        w, h = mid % 8 + 2, mid % 5 + 2
        if mid % 4 < 2:
            exp = np.repeat(
                ((np.arange(w * h) + mid * 31) % 256).astype(np.uint8), 3
            )
        else:
            exp = _formula_pixels(mid, w, h)
        for comp, pred in ((1, 1), (5, 1), (32773, 1), (5, 2)):
            dw, dh, px = _decode_tiff(
                _encode_tiff(mid, w, h, compression=comp, predictor=pred)
            )
            assert (dw, dh) == (w, h)
            assert np.array_equal(px, exp), (mid, comp, pred)
    with pytest.raises(ValueError, match="byte-order|magic"):
        _decode_tiff(b"XX\x00*rubbish")
    good = bytearray(_encode_tiff(2, 6, 4))  # II, gray
    # Compression tag (259) entry: find by tag id in the IFD
    n = int.from_bytes(good[8:10], "little")
    for i in range(n):
        e = 10 + i * 12
        tag = int.from_bytes(good[e : e + 2], "little")
        if tag == 259:
            comp = bytearray(good)
            comp[e + 8] = 7  # JPEG-in-TIFF: still unsupported
            with pytest.raises(ValueError, match="compression"):
                _decode_tiff(bytes(comp))
        if tag == 258:
            deep = bytearray(good)
            deep[e + 8] = 16
            with pytest.raises(ValueError, match="8-bit"):
                _decode_tiff(bytes(deep))
    # non-zero next-IFD pointer -> multi-page rejection
    multi = bytearray(good)
    nxt_off = 10 + n * 12
    multi[nxt_off : nxt_off + 4] = (8).to_bytes(4, "little")
    with pytest.raises(ValueError, match="multi-IFD"):
        _decode_tiff(bytes(multi))
    with pytest.raises(ValueError, match="truncated|strips"):
        _decode_tiff(bytes(good[: len(good) - 10]))


def test_tiff_multipage_chain():
    """Multi-page pins: 3-IFD chains round trip per page (page p
    keyed id+1000p, per-page compression rotation), the single-image
    face rejects multi-IFD files loudly (no silent page-1 crops),
    and a cyclic IFD chain fails instead of looping."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_tiff,
        _decode_tiff_pages,
        _encode_tiff,
        _formula_pixels,
    )

    for mid in (0, 1, 2, 3, 7, 10):
        w, h = mid % 8 + 2, mid % 5 + 2
        buf = _encode_tiff(mid, w, h, pages=3)
        pages = _decode_tiff_pages(buf)
        assert len(pages) == 3
        gray = mid % 4 < 2
        for pg, (pw, ph, px) in enumerate(pages):
            src = mid + 1000 * pg
            assert (pw, ph) == (w, h)
            if gray:
                exp = np.repeat(
                    ((np.arange(w * h) + src * 31) % 256).astype(np.uint8),
                    3,
                )
            else:
                exp = _formula_pixels(src, w, h)
            assert np.array_equal(px, exp), (mid, pg)
        with pytest.raises(ValueError, match="multi-IFD"):
            _decode_tiff(buf)
    # cyclic chain: point the first IFD's next pointer back at itself
    buf = bytearray(_encode_tiff(0, 4, 3, pages=2))
    n = int.from_bytes(buf[8:10], "little")
    nxt_off = 10 + n * 12
    buf[nxt_off : nxt_off + 4] = (8).to_bytes(4, "little")
    with pytest.raises(ValueError, match="cyclic"):
        _decode_tiff_pages(bytes(buf))


def test_tiff_lzw_packbits_primitives():
    """Strip-codec pins: (a) LZW round trips across data shapes that
    force the early-change 9->10->11 width switches, KwKwK chains,
    and the full-table clear; (b) the width switch really FIRES for
    a tiffc-sized strip (not just small streams that stay 9-bit);
    (c) PackBits round trips literals + runs and both codecs fail
    loudly on truncation."""
    import random

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        _tiff_packbits_decode,
        _tiff_packbits_encode,
    )

    rng = random.Random(7)
    cases = [
        b"",
        b"\x00",
        bytes(range(256)) * 6,                      # width growth
        bytes([0]) * 5000,                          # KwKwK chain
        bytes(rng.randrange(4) for _ in range(8000)),   # deep table
        bytes(rng.randrange(256) for _ in range(6000)),  # noise
    ]
    for data in cases:
        enc = _tiff_lzw_encode(data)
        assert _tiff_lzw_decode(enc, len(data)) == data
    # (b) a 520-byte gray tiffc strip crosses 511 table entries, so a
    # decoder WITHOUT early change desyncs and cannot reproduce it
    strip = bytes((5 * 31 + p) % 256 for p in range(520))
    assert _tiff_lzw_decode(_tiff_lzw_encode(strip), 520) == strip
    with pytest.raises(ValueError, match="truncated"):
        _tiff_lzw_decode(_tiff_lzw_encode(strip)[:-4], 520)
    for data in (b"", b"abc", b"aaaaaaabcd" * 40, bytes(range(256))):
        enc = _tiff_packbits_encode(data)
        assert _tiff_packbits_decode(enc, len(data)) == data
    assert _tiff_packbits_encode(b"x" * 300)[0] >= 128  # run-coded
    with pytest.raises(ValueError, match="truncated"):
        _tiff_packbits_decode(b"\x05ab", 6)


def test_gif_frames_compositing():
    """Animated-GIF pins: composited canvases equal an independent
    reference compositor for (a) animate fixtures — sub-rects,
    transparent index 7, disposal-2 restore between frames 1 and 2,
    interlaced every 3rd id — and (b) gifseq fixtures (full-screen
    opaque frames == their own noise images). The first-frame face
    (_decode_gif) stays stable on animated files, and rect overflow
    fails loudly."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_gif,
        _decode_gif_frames,
        _encode_gif,
        _gif_indices,
        _gif_palette,
    )

    def pal_rgb(noise):
        return np.frombuffer(_gif_palette(noise), np.uint8).reshape(-1, 3)

    def ref_frames(mid, w, h, noise, animate):
        pal = pal_rgb(noise)
        canvas = np.tile(pal[0], (h, w, 1)).astype(np.uint8)
        outs, prev = [], None
        for fr in range(3):
            if prev is not None and prev[4] == 2:
                pl, pt, pw2, ph2, _ = prev
                canvas[pt : pt + ph2, pl : pl + pw2] = pal[0]
            if animate and fr >= 1:
                fw, fh = w // 2 + 1, h // 2 + 1
                left = (mid + fr) % (w - fw + 1)
                top = (mid + 2 * fr) % (h - fh + 1)
                tidx, disp = 7, 2 if fr == 1 else 1
            else:
                fw, fh, left, top, tidx, disp = w, h, 0, 0, None, 1
            idx = np.array(
                _gif_indices(mid + 1000 * fr, fw, fh, noise), np.int64
            ).reshape(fh, fw)
            rgb = pal[idx]
            region = canvas[top : top + fh, left : left + fw]
            if tidx is not None:
                m = idx != tidx
                region[m] = rgb[m]
            else:
                region[:] = rgb
            outs.append(canvas.reshape(-1).copy())
            prev = (left, top, fw, fh, disp)
        return outs

    for mid in range(12):
        w, h = mid % 8 + 2, mid % 5 + 2
        for noise, animate in ((False, True), (True, False)):
            buf = _encode_gif(
                mid, w, h, noise=noise, frames=3, animate=animate,
                interlace=(mid % 3 == 1 and animate),
            )
            sw, sh, frames = _decode_gif_frames(buf)
            assert (sw, sh) == (w, h) and len(frames) == 3
            for f, want in enumerate(ref_frames(mid, w, h, noise, animate)):
                assert np.array_equal(frames[f], want), (mid, animate, f)
        # first-frame face: still the frame's own rect, animation ignored
        buf = _encode_gif(mid, w, h, frames=3, animate=True)
        dw, dh, px = _decode_gif(buf)
        pal = pal_rgb(False)
        idx = np.array(_gif_indices(mid, w, h, False), np.int64)
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, pal[idx].reshape(-1))
    # rect overflow: hand-build a frame whose rect exceeds the screen
    bad = bytearray(_encode_gif(0, 4, 4, frames=2, animate=True))
    # the second image descriptor follows the LAST 8-byte GCE; bump
    # its left coordinate past the screen edge
    pos = bad.rfind(b"\x21\xf9\x04") + 8
    assert bad[pos] == 0x2C
    bad[pos + 1] = 4
    with pytest.raises(ValueError, match="exceeds"):
        _decode_gif_frames(bytes(bad))


def test_gif_codec_round_trip_and_rejections():
    """Driver-side GIF pins: (a) decode(encode) equals
    palette[index-formula] for formula AND md5-noise fixtures — the
    LZW fixture streams have runs, so dictionary entries and KwKwK
    really occur; (b) a multi-frame (animated) file decodes to its
    FIRST frame; (c) 4-pass interlace de-interlaces to identical
    pixels; (d) the loud-failure guards: bad header, truncated LZW
    stream, out-of-range code; (e) the raw LZW pair stays
    synchronized through width growth AND a 12-bit table-full
    clear."""
    import numpy as np

    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_gif,
        _encode_gif,
        _gif_indices,
        _gif_lzw_compress,
        _gif_lzw_decode,
        _gif_palette,
    )

    def expected(mid, w, h, noise):
        idx = _gif_indices(mid, w, h, noise)
        pal = _gif_palette(noise)
        return np.array(
            [pal[3 * i + c] for i in idx for c in range(3)], dtype=np.uint8
        )

    for mid in range(0, 40):
        w, h = mid % 8 + 2, mid % 5 + 2
        for noise in (False, True):
            gw, gh, px = _decode_gif(_encode_gif(mid, w, h, noise=noise))
            assert (gw, gh) == (w, h)
            assert np.array_equal(px, expected(mid, w, h, noise)), (mid, noise)
    # animated: first frame only
    gw, gh, px = _decode_gif(_encode_gif(5, 6, 4, frames=3))
    assert (gw, gh, px.tolist()) == (6, 4, expected(5, 6, 4, False).tolist())
    with pytest.raises(ValueError, match="bad header"):
        _decode_gif(b"NOTGIF" + b"\x00" * 20)
    good = bytearray(_encode_gif(5, 6, 4))
    # interlace: the 4-pass row order de-interlaces to identical
    # pixels (a 37-row image exercises all four passes)
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _gif_interlace_rows,
    )

    assert sorted(_gif_interlace_rows(37)) == list(range(37))
    gw, gh, px = _decode_gif(_encode_gif(2, 5, 37, interlace=True))
    assert (gw, gh, px.tolist()) == (5, 37, expected(2, 5, 37, False).tolist())
    with pytest.raises(ValueError, match="truncated|trailer|ended"):
        _decode_gif(bytes(good[: len(good) - 8]))
    # LZW pair survives width growth to 12 bits and the full-table clear
    stream = [(i * 7 + (i // 5)) % 256 for i in range(50000)]
    assert _gif_lzw_decode(_gif_lzw_compress(stream, 8), 8) == stream
    with pytest.raises(ValueError, match="beyond table|bad"):
        _gif_lzw_decode(bytes([0xFF, 0xFF, 0xFF]), 2)


def test_g711_wav_decode_reference_values():
    """G.711 pins: the four canonical extremes of each law (SUN
    g711.c reference), a byte-stream round trip, and the rejection
    guards (unknown fmt tag, G.711 at 16 bits)."""
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav_g711,
        _g711_alaw_to_linear,
        _g711_bytes,
        _g711_ulaw_to_linear,
    )

    assert _g711_ulaw_to_linear(0xFF) == 0
    assert _g711_ulaw_to_linear(0x80) == 32124
    assert _g711_ulaw_to_linear(0x00) == -32124
    assert _g711_alaw_to_linear(0xD5) == 8
    assert _g711_alaw_to_linear(0x55) == -8
    assert _g711_alaw_to_linear(0xAA) == 32256
    assert _g711_alaw_to_linear(0x2A) == -32256
    for law, fn in (("ulaw", _g711_ulaw_to_linear), ("alaw", _g711_alaw_to_linear)):
        rate, samples = _decode_wav(_encode_wav_g711(9, 40, 8000, law))
        assert rate == 8000
        assert samples.tolist() == [fn(b) for b in _g711_bytes(9, 40)]
    bad = bytearray(_encode_wav_g711(9, 40, 8000, "ulaw"))
    i = bytes(bad).index(b"fmt ")
    bad[i + 8] = 2  # fmt tag 2 (ADPCM)
    with pytest.raises(ValueError, match="PCM / G.711"):
        _decode_wav(bytes(bad))
    bad = bytearray(_encode_wav_g711(9, 40, 8000, "alaw"))
    bad[i + 22] = 16  # bits field
    with pytest.raises(ValueError, match="8-bit"):
        _decode_wav(bytes(bad))


def test_decode_mixed_format_batch_sniffs_per_row(spark, docs):
    mixed = M.synthesize_images(docs.filter(F.col("doc_id") % 2 == 0), fmt="ppm").unionByName(
        M.synthesize_images(docs.filter(F.col("doc_id") % 2 == 1), fmt="bmp")
    )
    out = M.decode_media(mixed)
    assert out.count() == docs.count()


def test_decode_resize_nearest_is_deterministic(docs):
    out = M.decode_media(M.synthesize_images(docs, fmt="ppm"), 4, 4).collect()
    import numpy as np

    for r in out:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(r["pixels"]) == 4 * 4 * 3
        mid = r["media_id"]
        w, h = mid % 8 + 2, mid % 5 + 2
        src = ((np.arange(w * h * 3) + mid * 31) % 256).reshape(h, w, 3)
        ys = [min(h - 1, y * h // 4) for y in range(4)]
        xs = [min(w - 1, x * w // 4) for x in range(4)]
        expect = src[ys][:, xs].reshape(-1).astype("float32")
        assert np.array_equal(np.array(r["pixels"], dtype="float32"), expect)


def test_decode_rejects_undecodable_payload(spark, docs):
    """synthesize_media's hash bytes are NOT an image; the decoder
    fails loudly instead of emitting garbage (no-silent-partial)."""
    with pytest.raises(Exception, match="undecodable|PPM|BMP"):
        M.decode_media(M.synthesize_media(docs)).collect()


def test_decode_wav_matches_formula(docs):
    """RIFF chunk walk (including the LIST chunk the fixture plants
    before data) recovers exactly the formula samples."""
    import numpy as np

    out = {r["media_id"]: r for r in M.decode_audio(M.synthesize_audio(docs)).collect()}
    for mid, r in out.items():
        n = mid % 50 + 20
        assert r["sample_rate"] == 8000 + (mid % 3) * 4000
        expect = ((np.arange(n) * 31 + mid * 17) % 65536) - 32768
        assert np.array_equal(np.array(r["samples"]), expect)


def test_decode_wav_rejects_non_pcm(spark, docs):
    from qb_data_pipeline_backfill_spark.operators.multimodal import _decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"nope" * 10)
    # stereo/8-bit and compressed tags fail loudly, not garbage out
    good = M.synthesize_audio(docs).limit(1).collect()[0]
    buf = bytearray(bytes(good["content"]))
    fmt_at = buf.index(b"fmt ")
    buf[fmt_at + 8 : fmt_at + 10] = (3).to_bytes(2, "little")  # float tag
    with pytest.raises(ValueError, match="PCM"):
        _decode_wav(bytes(buf))


def test_demux_avi_matches_formula(docs):
    """The RIFF/AVI demux (hdrl parse + movi walk + bottom-up DIB
    frames) recovers every frame's formula pixels."""
    import numpy as np

    frames = M.demux_video(M.synthesize_videos(docs)).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        w, h, n = mid % 6 + 2, mid % 4 + 2, mid % 5 + 2
        assert sorted(r["frame_idx"] for r in rs) == list(range(n))
        for r in rs:
            assert (r["width"], r["height"]) == (w, h)
            expect = (
                (np.arange(w * h * 3) + mid * 31 + r["frame_idx"] * 7) % 256
            ).astype("float32")
            assert np.array_equal(np.array(r["pixels"], dtype="float32"), expect)


def test_demux_avi_rejects_garbage(docs):
    from qb_data_pipeline_backfill_spark.operators.multimodal import _decode_avi

    with pytest.raises(ValueError, match="RIFF/AVI"):
        _decode_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_incremental_minhash_equals_full_restricted(spark):
    """The incremental probe against a persisted index must emit
    EXACTLY the full-corpus run's pairs restricted to pairs touching
    the new batch — same candidates, same estimates, same skew cap."""
    base = (
        "the quick brown fox jumps over the lazy dog near the wide river "
        "bank on a calm morning with scattered clouds overhead"
    )
    rows = []
    for i in range(30):
        # doc i and doc i+15 are near-identical (one token differs), so
        # near-dup pairs cross the history (id<15) / new (id>=15) split
        variant = base.replace("calm", f"calm{i % 15}")
        rows.append((i, variant if i < 15 else variant + " again"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    restricted = {p: e for p, e in full.items() if p[0] >= 15 or p[1] >= 15}
    assert restricted, "fixture must produce cross-split near-dup pairs"
    index = D.minhash_band_index(docs.filter(F.col("doc_id") < 15))
    incr = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in D.incremental_minhash_pairs(
            index, docs.filter(F.col("doc_id") >= 15), threshold=0.5
        ).collect()
    }
    assert incr == restricted


def test_bpe_word_pieces_agrees_with_encode(spark):
    """The BPE fit/apply-split artifact must reproduce bpe_encode's
    per-doc n_subwords when applied by explode + join + aggregate —
    the streaming face's algebra — and a novel word must coalesce to
    length(word) single-char pieces (the deploy convention: no
    applicable merge)."""
    from qb_data_pipeline_backfill_spark.operators import text as X

    train = spark.createDataFrame(
        [(0, "low lower lowest low"), (1, "newest newer new")],
        ["doc_id", "text"],
    )
    merges = [
        (r["left"], r["right"])
        for r in X.train_bpe(train, n_merges=5).orderBy("rank").collect()
    ]
    # apply corpus includes a word absent from training ("zq"): its
    # letters share no trained merge, so char-split is exact here
    docs = spark.createDataFrame(
        [(0, "low newest zq"), (1, "lowest new new")], ["doc_id", "text"]
    )
    direct = {
        r["doc_id"]: r["n_subwords"]
        for r in X.bpe_encode(docs, merges).collect()
    }
    table = X.bpe_word_pieces(train, merges)
    inst = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    via_table = {
        r["doc_id"]: r["n"]
        for r in inst.join(table, "word", "left")
        .select("doc_id", F.coalesce("cnt", F.length("word")).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    assert via_table == direct


def test_wordpiece_word_pieces_agrees_with_encode(spark):
    """The fit/apply-split artifact (word -> pieces with counts) must
    reproduce wordpiece_encode's per-doc n_subwords and n_unk when
    applied by explode + join + aggregate — the streaming face's
    algebra — including a word NOT segmentable by the vocab ([UNK])."""
    from qb_data_pipeline_backfill_spark.operators import text as X

    docs = spark.createDataFrame(
        [(0, "aba bab abab zzz"), (1, "ab ab ba zzz zzz")],
        ["doc_id", "text"],
    )
    vocab = ["a", "b", "##a", "##b", "##ab", "ab"]
    direct = {
        r["doc_id"]: (r["n_subwords"], r["n_unk"])
        for r in X.wordpiece_encode(docs, vocab).collect()
    }
    table = X.wordpiece_word_pieces(docs, vocab)
    inst = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    joined = inst.join(table, "word", "left").select(
        "doc_id",
        F.coalesce("cnt", F.lit(1)).alias("cnt"),
        F.coalesce("piece", F.lit("[UNK]")).alias("piece"),
    )
    via_table = {
        r["doc_id"]: (r["n"], r["u"])
        for r in joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(
                F.when(F.col("piece") == "[UNK]", F.col("cnt")).otherwise(0)
            ).alias("u"),
        )
        .collect()
    }
    assert via_table == direct
    assert direct[0][1] > 0  # the zzz word really exercises [UNK]


def test_incremental_hash64_equals_full_restricted(spark):
    """The image-hash analog of the minhash test above: probing a
    persisted hash64_band_index with a new batch's hashes must emit
    EXACTLY hash64_band_pairs over the full corpus restricted to
    pairs touching the new batch — same banding, same exact Hamming,
    same cap population."""
    rows = []
    for i in range(24):
        base = (i * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
        rows.append((i, base))
        # i+24 is a 1-bit-flipped near-dup of i: pairs cross the
        # history (id<12) / new (id>=12) split both ways
        rows.append((i + 24, base ^ (1 << (i % 60))))
    hashes = spark.createDataFrame(rows, ["media_id", "dhash"])
    full = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.hash64_band_pairs(hashes, 2, 1000).collect()
    }
    restricted = {p: d for p, d in full.items() if p[0] >= 12 or p[1] >= 12}
    assert restricted, "fixture must produce cross-split pairs"
    index = M.hash64_band_index(
        hashes.filter(F.col("media_id") < 12), max_hamming=2
    )
    incr = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.incremental_hash64_pairs(
            index, hashes.filter(F.col("media_id") >= 12), 2, 1000
        ).collect()
    }
    assert incr == restricted


def test_incremental_audio_pairs_equals_full_restricted(spark):
    """The audio face of the format-generic hash64 band index
    (VERDICT r15 missing #2): decoding + waveform-dHashing only the
    NEW clip batch and probing a persisted index must emit exactly
    the one-shot audio_near_dup_pairs result restricted to pairs
    touching the new batch — history clips never re-decoded."""
    ids = spark.range(16).withColumnRenamed("id", "doc_id")
    media = M.synthesize_audio(ids, noise=True)
    copies = media.withColumn("media_id", F.col("media_id") + F.lit(100))
    corpus = media.unionByName(copies)
    full = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.audio_near_dup_pairs(corpus, 2, 1000).collect()
    }
    # history = originals, new = the re-keyed copies
    restricted = {p: d for p, d in full.items() if p[0] >= 100 or p[1] >= 100}
    assert restricted, "fixture must produce cross-split pairs"
    index = M.hash64_band_index(M.audio_dhash(media), max_hamming=2)
    incr = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.incremental_audio_pairs(index, copies, 2, 1000).collect()
    }
    assert incr == restricted


def test_ann_from_persisted_index_equals_direct(spark, vectors):
    """Probing a persisted rp_bucket_index must give bit-identical
    top-k to the direct corpus+queries run (same planes, same
    candidates, same ranking)."""
    queries = vectors.filter(F.col("vec_id") == 0)
    direct = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in S.rp_lsh_ann_topk(vectors, queries, k=3, dim=3).collect()
    )
    index = S.rp_bucket_index(vectors, dim=3)
    via_index = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in S.ann_topk_from_index(index, queries, k=3, dim=3).collect()
    )
    assert direct == via_index and direct


# --------------------------------------------------------------------------
# IVFADC (IVF + product-quantization ANN)
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pq_vectors(spark):
    # dim=4, m=2 subspaces of 2; codebook = vecs 0,1; centroids = 0,4.
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.0, 1.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.1, 0.9]),
        (3, [0.1, 0.9, 0.8, 0.2]),
        (4, [-1.0, 0.0, 0.0, -1.0]),
        (5, [0.8, 0.2, 0.3, 0.7]),
        (6, [-0.9, -0.1, 0.1, -0.8]),
        (7, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivfpq_full_probe_full_refine_equals_exact(pq_vectors):
    """With every cell probed and the whole corpus in the refine
    shortlist, IVFADC degrades to exact search: both approximation
    dials (cell pruning, ADC shortlist) are wide open, so the output
    must be bit-identical to the brute-force baseline."""
    q = pq_vectors.filter(F.col("vec_id") == 0)
    exact = {
        (r["rank"], r["neighbor_id"], r["cos"])
        for r in S.cosine_topk(pq_vectors, q, k=3).collect()
    }
    ann = {
        (r["rank"], r["neighbor_id"], r["score"])
        for r in S.ivfpq_ann_topk(
            pq_vectors, q, k=3, stride=4, nprobe=2, m=2, n_centroids=2,
            refine_k=8, dim=4,
        ).collect()
    }
    assert ann == exact


def test_ivfpq_adc_distances_match_numpy(pq_vectors):
    """No-refine path: the engine's ADC distances must equal a numpy
    replay of PQ encode (argmin-L2² per subspace vs codebook = first
    2 vectors) + lookup-table summation."""
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in pq_vectors.collect()}
    cb = {c: vecs[c] for c in (0, 1)}
    q = vecs[0]

    def code(v, s):
        lo, hi = 2 * s, 2 * s + 2
        d = {c: float(((v[lo:hi] - cv[lo:hi]) ** 2).sum()) for c, cv in cb.items()}
        return min(sorted(d), key=lambda c: (d[c], c))

    expect = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        adc = sum(
            float(((q[2 * s : 2 * s + 2] - cb[code(v, s)][2 * s : 2 * s + 2]) ** 2).sum())
            for s in range(2)
        )
        expect[vid] = round(-adc, 4)

    out = S.ivfpq_ann_topk(
        pq_vectors,
        pq_vectors.filter(F.col("vec_id") == 0),
        k=7, stride=4, nprobe=2, m=2, n_centroids=2, refine_k=None, dim=4,
    ).collect()
    got = {r["neighbor_id"]: r["score"] for r in out}
    assert got == expect
    # ranking ascending in ADC distance, ties to smaller id
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == sorted(expect, key=lambda v: (-expect[v], v))


def test_ivfpq_probe_limits_candidates(pq_vectors):
    """nprobe=1 must restrict candidates to the query's own cell:
    with centroids 0 and 4, vec 0's cell holds the +-side vectors, so
    the opposite-side vectors (4, 6) cannot appear at any k."""
    out = S.ivfpq_ann_topk(
        pq_vectors,
        pq_vectors.filter(F.col("vec_id") == 0),
        k=7, stride=4, nprobe=1, m=2, n_centroids=2, refine_k=None, dim=4,
    ).collect()
    ids = {r["neighbor_id"] for r in out}
    assert ids and not ids & {4, 6}


# --------------------------------------------------------------------------
# corpus-level duplicate n-grams + BPE pair counts
# --------------------------------------------------------------------------
def test_dup_gram_fraction_hand_case(spark):
    rows = [
        (0, "a b c d e f"),      # grams: "a b c d e", "b c d e f"
        (1, "a b c d e zzz"),    # shares "a b c d e" with doc 0
        (2, "p q r s t u"),      # all grams unique to doc 2
        (3, "x y"),              # shorter than n → no grams, no output row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_fraction"])
        for r in D.dup_gram_doc_fraction(df, n=5).collect()
    }
    assert out == {0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (2, 0, 0.0)}


def test_dup_gram_counts_documents_not_occurrences(spark):
    # a gram repeated INSIDE one doc must not count as duplicated
    rows = [(0, "a b c d e a b c d e"), (1, "z z z z z z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["dup_grams"] for r in D.dup_gram_doc_fraction(df, n=5).collect()}
    assert out[0] == 0
    # doc 1's single distinct gram "z z z z z" occurs in one doc only
    assert out[1] == 0


def test_repeated_substring_spans_hand_case(spark):
    """A shared passage of L tokens must surface as ONE maximal span of
    exactly L tokens (its L-k+1 duplicated grams merge into a single
    island); non-shared text must produce no span."""
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"  # 10 tokens, k=4
    rows = [
        (0, f"aaa bbb {shared} ccc ddd"),
        (1, f"{shared} eee fff ggg"),
        (2, "unrelated words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["span_start"], r["span_tokens"], r["n_dup_grams"])
        for r in D.repeated_substring_spans(df, k=4).collect()
    }
    # doc 0: passage starts at token offset 2; doc 1: at offset 0;
    # both spans are the full 10 tokens = 7 duplicated 4-grams
    assert got == {0: (2, 10, 7), 1: (0, 10, 7)}


def test_repeated_substring_spans_splits_disjoint_runs(spark):
    """Two shared passages separated by unshared text in the same doc
    must come back as TWO spans, not one merged blob."""
    a, b = "p1 p2 p3 p4", "q1 q2 q3 q4"
    rows = [
        (0, f"{a} gap1 gap2 gap3 {b}"),
        (1, f"{a} other text entirely {b}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = [
        (r["span_start"], r["span_tokens"])
        for r in D.repeated_substring_spans(df, k=4)
        .filter(F.col("doc_id") == 0)
        .orderBy("span_start")
        .collect()
    ]
    assert spans == [(0, 4), (7, 4)]


def test_bigram_lm_scores_hand_case(spark):
    """Closed-form check of the self-trained bigram LM: corpus
    c(a,b)=3, c(b,a)=1, c(b,c)=1; histories a·=3, b·=2; V=3 →
    P(b|a)=4/6, P(a|b)=P(c|b)=2/5; scores in integer micro-units."""
    import math

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"], r["nll_micro_avg"])
        for r in X.bigram_lm_scores(df).collect()
    }
    ab = round(-math.log(4 / 6) * 1e6)   # 405465
    ba = round(-math.log(2 / 5) * 1e6)   # 916291
    assert got[0] == (3, 2 * ab + ba, math.floor((2 * ab + ba) / 3 + 0.5))
    assert got[1] == (2, ab + ba, math.floor((ab + ba) / 2 + 0.5))
    # a single-token document yields no bigrams and no row
    solo = spark.createDataFrame([(9, "hello")], ["doc_id", "text"])
    assert X.bigram_lm_scores(solo).count() == 0


def test_bpe_pair_counts_hand_case(spark):
    # words: low ×3, lower ×1 → pairs weighted by word freq:
    # lo: 3+1=4, ow: 3+1=4, we: 1, er: 1
    df = spark.createDataFrame(
        [(0, "low low lower"), (1, "low")], ["doc_id", "text"]
    )
    out = [(r["pair"], r["pair_count"]) for r in
           sorted(X.bpe_pair_counts(df).collect(), key=lambda r: r["rnk"])]
    assert out == [("lo", 4), ("ow", 4), ("er", 1), ("we", 1)]


def test_bpe_pair_counts_ignores_single_char_words(spark):
    df = spark.createDataFrame([(0, "a b c ab")], ["doc_id", "text"])
    out = {r["pair"] for r in X.bpe_pair_counts(df).collect()}
    assert out == {"ab"}


# --------------------------------------------------------------------------
# PassJoin edit-distance pairs
# --------------------------------------------------------------------------
def test_edit_distance_pairs_hand_case(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumped over the lazy dog"),   # +2 edits
        (2, "the quick brown fox jumps over the lazy cat"),    # 3 subs
        (3, "a completely different sentence about nothing"),
        (4, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in D.edit_distance_pairs(df, k=3).collect()
    }
    # (1,2) is distance 5 (jumped→jumps is 2, dog→cat is 3): outside k=3
    assert got == {(0, 1): 2, (0, 2): 3, (0, 4): 0, (2, 4): 3, (1, 4): 2}


def test_edit_distance_pairs_matches_quadratic_python(spark):
    """Blocking completeness on adversarial lengths: every pair the
    quadratic reference finds, the segment-blocked join must find."""
    import itertools

    texts = [
        "abcdefgh", "abcdefghx", "abxdefgh", "zbcdefgz",
        "abcd", "abcde", "qrstuvwx", "abcdefghijkl", "", "a",
    ]

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    k = 3
    expect = {
        (i, j): ed(texts[i], texts[j])
        for i, j in itertools.combinations(range(len(texts)), 2)
        if ed(texts[i], texts[j]) <= k
    }
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in D.edit_distance_pairs(df, k=k).collect()
    }
    assert got == expect


# --------------------------------------------------------------------------
# distributed BPE trainer
# --------------------------------------------------------------------------
def _bpe_reference(word_freqs, n_merges):
    """Sennrich et al. 2016 reference trainer: greedy left-to-right
    merge application, lexicographic tie-break, word-frequency
    weighting."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (s1, s2), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, s1, s2, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == s1 and x == s2:
                    out[-1] = s1 + s2
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference_on_classic_corpus(spark):
    # the corpus from the BPE paper's running example
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(i, " ".join([w] * f)) for i, (w, f) in enumerate(freqs.items())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in X.train_bpe(df, n_merges=6).orderBy("rank").collect()
    ]
    assert got == _bpe_reference(freqs, 6)
    # sanity: the famous first merges — 'es' (9) then 'est' (9)
    assert got[0][1:] == ("e", "s", 9)
    assert got[1][1:] == ("es", "t", 9)


def test_train_bpe_matches_reference_on_fixture_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    freqs = {}
    for r in docs.collect():
        for w in " ".join(r["text"].lower().strip().split()).split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in X.train_bpe(docs, n_merges=8).orderBy("rank").collect()
    ]
    assert got == _bpe_reference(freqs, 8)


def test_train_bpe_overlapping_pairs_greedy_left_to_right(spark):
    # 'aaa' under merge (a,a): greedy gives [aa, a], so the next round
    # counts pair (aa, a) — the reference-imposed behavior
    df = spark.createDataFrame([(0, "aaa aaa")], ["doc_id", "text"])
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in X.train_bpe(df, n_merges=2).orderBy("rank").collect()
    ]
    assert got == [("a", "a", 4), ("aa", "a", 2)]


def _bpe_apply_reference(word, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        r, _ = min(cand)
        s1, s2 = merges[r]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == (s1, s2):
                out.append(s1 + s2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_apply(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    trained = X.train_bpe(docs, n_merges=8).orderBy("rank").collect()
    merges = [(r["left"], r["right"]) for r in trained]
    got = {
        r["doc_id"]: (r["n_subwords"], r["n_distinct_subwords"])
        for r in X.bpe_encode(docs, merges).collect()
    }
    for r in docs.collect():
        words = " ".join(r["text"].lower().strip().split()).split(" ")
        subs = []
        for w in words:
            if w:
                subs.extend(_bpe_apply_reference(w, merges))
        assert got[r["doc_id"]] == (len(subs), len(set(subs)))


def test_bpe_encode_no_merges_is_char_count(spark):
    df = spark.createDataFrame([(0, "ab  c")], ["doc_id", "text"])
    [r] = X.bpe_encode(df, []).collect()
    # chars of 'ab' + 'c' = 3 subwords, distinct {a, b, c} = 3
    assert (r["n_subwords"], r["n_distinct_subwords"]) == (3, 3)


def test_train_wordpiece_matches_exact_fraction_reference(spark):
    """The distributed WordPiece trainer's full trajectory vs an
    independent exact-Fraction reference on 60 fixture docs — pinning
    the likelihood objective count(pair)/(count(l)·count(r)), the
    ##-continuation bookkeeping, and the deterministic tie-break.
    Also pins that the objective genuinely differs from BPE's
    frequency argmax on the same corpus, and that greedy
    longest-match encode matches a reference (incl. [UNK] for a word
    whose characters left the vocab... none here — UNK pinned via a
    crafted vocab below)."""
    from fractions import Fraction

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"], r["denom"])
        for r in X.train_wordpiece(docs, n_merges=8).orderBy("rank").collect()
    ]

    words: dict = {}
    for r in docs.collect():
        for w in r["text"].lower().strip().split():
            words[w] = words.get(w, 0) + 1
    segs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in words}
    want = []
    for rank in range(8):
        pc: dict = {}
        sc: dict = {}
        for w, f in words.items():
            syms = segs[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + f
        best = None
        for (s1, s2), c in pc.items():
            score = Fraction(c, sc[s1] * sc[s2])
            if (
                best is None
                or score > best[0]
                or (score == best[0] and (s1, s2) < (best[1], best[2]))
            ):
                best = (score, s1, s2, c, sc[s1] * sc[s2])
        _, s1, s2, c, denom = best
        want.append((rank, s1, s2, c, denom))
        merged = s1 + (s2[2:] if s2.startswith("##") else s2)
        for w in segs:
            syms, out, i = segs[w], [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == (s1, s2):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    assert got == want
    bpe_first = X.train_bpe(docs, n_merges=1).collect()[0]
    assert (bpe_first["left"], bpe_first["right"]) != (got[0][1], got[0][2])


def test_wordpiece_encode_greedy_and_unk(spark):
    df = spark.createDataFrame(
        [(0, "unbearable unbearable zap")], ["doc_id", "text"]
    )
    # crafted vocab: 'unbear' wins over 'un' (longest match first);
    # 'zap' has no 'z' so the whole word collapses to one [UNK]
    vocab = [
        "un", "unbear", "##able", "##bear", "##a", "##b", "##e", "##l",
        "##n", "##r", "##u", "u", "##p",
    ]
    [r] = X.wordpiece_encode(df, vocab).collect()
    # unbearable -> [unbear, ##able] x2; zap -> [UNK]
    assert (r["n_subwords"], r["n_distinct_subwords"], r["n_unk"]) == (
        5, 3, 1,
    )


def _pdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_paragraph_dedup_first_occurrence_wins(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in D.dedup_paragraphs(
            _pdocs(
                spark,
                [(1, "alpha\nbeta"), (2, "beta\ngamma"), (3, "alpha\nbeta")],
            )
        ).collect()
    }
    assert out[1]["text"] == "alpha\nbeta"
    assert (out[1]["n_paragraphs"], out[1]["n_kept"]) == (2, 2)
    # doc 2 loses the beta already seen in doc 1, keeps order
    assert out[2]["text"] == "gamma"
    assert (out[2]["n_paragraphs"], out[2]["n_kept"]) == (2, 1)
    # doc 3 is entirely duplicate: dropped, not an empty shell
    assert 3 not in out


def test_paragraph_dedup_within_doc_repeats_collapse(spark):
    out = D.dedup_paragraphs(
        _pdocs(spark, [(1, "x\ny\nx\nz\ny")])
    ).collect()[0]
    assert out["text"] == "x\ny\nz"
    assert (out["n_paragraphs"], out["n_kept"]) == (5, 3)


def test_paragraph_dedup_separator_is_literal(spark):
    # '|' is a regex alternation: an unquoted split would explode the
    # text into single characters
    out = D.dedup_paragraphs(
        _pdocs(spark, [(1, "aa|bb"), (2, "bb|cc")]), sep="|"
    ).collect()
    got = {r["doc_id"]: r["text"] for r in out}
    assert got == {1: "aa|bb", 2: "cc"}


# --------------------------------------------------------------------------
# unigram-LM tokenizer: independent reference implementation
# --------------------------------------------------------------------------
# Written against Kudo 2018 + the operator's documented determinism
# spec (integer micro-unit quantization points), sharing NO code with
# operators/text.py — the certification mirror the BPE trainer has.
import math


def ref_unigram_seed(freq: dict[str, int], max_len: int, seed_size: int):
    cnt: dict[str, int] = {}
    for w, f in freq.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                p = w[i : i + ln]
                cnt[p] = cnt.get(p, 0) + f
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:seed_size]} | {
        p for p in cnt if len(p) == 1
    }
    tot = sum(c for p, c in cnt.items() if p in kept)
    return {
        p: (cnt[p], round(math.log(cnt[p] / tot) * 1e6)) for p in kept
    }


def ref_unigram_expected(word: str, lp: dict[str, float], max_len: int):
    n = len(word)
    NEG = float("-inf")

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log1p(math.exp(min(a, b) - m))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            v = lp.get(word[j:i])
            if v is not None and alpha[j] != NEG:
                alpha[i] = lse(alpha[i], alpha[j] + v)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        for i in range(j + 1, min(n, j + max_len) + 1):
            v = lp.get(word[j:i])
            if v is not None and beta[i] != NEG:
                beta[j] = lse(beta[j], v + beta[i])
    z = alpha[n]
    out: dict[str, float] = {}
    if z == NEG:
        return out
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            p = word[j:i]
            v = lp.get(p)
            if v is None or alpha[j] == NEG or beta[i] == NEG:
                continue
            ll = alpha[j] + v + beta[i] - z
            if ll > -60.0:
                out[p] = out.get(p, 0.0) + math.exp(ll)
    return out


def ref_unigram_train(
    freq: dict[str, int],
    *,
    vocab_size: int,
    max_len: int,
    seed_size: int,
    em_rounds: int,
    shrink: float = 0.75,
):
    seed = ref_unigram_seed(freq, max_len, seed_size)
    pieces = {p: lpm for p, (_, lpm) in seed.items()}
    e_final: dict[str, int] = {}
    for rnd in range(em_rounds):
        lp = {p: m / 1e6 for p, m in pieces.items()}
        e: dict[str, int] = {}
        for w, f in freq.items():
            for p, ec in ref_unigram_expected(w, lp, max_len).items():
                m = int(round(ec * f * 1e6))
                if m:
                    e[p] = e.get(p, 0) + m
        for p in pieces:  # model-seeded single-char floor (r13)
            if len(p) == 1:
                e.setdefault(p, 1)
        multi = sorted(
            ((p, m) for p, m in e.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep_multi = max(
            vocab_size - sum(1 for p in e if len(p) == 1),
            int(len(multi) * shrink) if rnd < em_rounds - 1 else 0,
        )
        keep_multi = max(keep_multi, 0)
        kept = {p for p, _ in multi[:keep_multi]} | {
            p for p in e if len(p) == 1
        }
        e = {p: (max(m, 1) if len(p) == 1 else m) for p, m in e.items()}
        total = sum(m for p, m in e.items() if p in kept)
        pieces = {
            p: int(round(math.log(m / total) * 1e6))
            for p, m in e.items()
            if p in kept and m > 0
        }
        e_final = {p: m for p, m in e.items() if p in pieces}
    return {p: (e_final.get(p, 0), lpm) for p, lpm in pieces.items()}


def ref_unigram_viterbi(word: str, lpm: dict[str, int], max_len: int, unk: int):
    n = len(word)
    dp = [None] * (n + 1)
    dp[0] = (0, 0, -1)  # score, -pieces, back
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_len), i):
            if dp[j] is None:
                continue
            v = lpm.get(word[j:i])
            if v is None:
                if i - j == 1:
                    v = unk
                else:
                    continue
            cand = (dp[j][0] + v, dp[j][1] - 1, -j, j)
            if best is None or cand[:3] > best[:3]:
                best = cand
        dp[i] = (best[0], best[1], best[3]) if best else None
    segs = []
    i = n
    while i > 0:
        j = dp[i][2]
        segs.append(word[j:i])
        i = j
    segs.reverse()
    return segs


def _word_freq_py(texts):
    freq: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().strip().split()).split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def test_unigram_train_matches_reference_exactly(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    texts = [
        "ab ab ab abc bc",
        "bc c a ab ab",
        "abc abc b ca cab",
        "ab ca ca c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.piece: (r.e_micro, r.lp_micro)
        for r in X.train_unigram(
            df, vocab_size=6, max_len=3, seed_size=8, em_rounds=3
        ).collect()
    }
    want = ref_unigram_train(
        _word_freq_py(texts),
        vocab_size=6,
        max_len=3,
        seed_size=8,
        em_rounds=3,
    )
    assert got == want


def test_unigram_encode_matches_reference_and_handles_unk(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    lpm = {
        "a": -1_000_000,
        "b": -1_500_000,
        "c": -2_000_000,
        "ab": -1_800_000,
        "bc": -2_200_000,
        "abc": -3_100_000,
    }
    texts = ["ab abc xbc", "", "cccc abab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_pieces, r.n_distinct_pieces, r.n_unk, r.score_micro)
        for r in X.unigram_encode(df, lpm, max_len=3).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        segs = []
        for w in " ".join(t.lower().strip().split()).split(" "):
            if w:
                segs.extend(
                    ref_unigram_viterbi(w, lpm, 3, X.UNIGRAM_UNK_MICRO)
                )
        want[i] = (
            len(segs),
            len(set(segs)),
            sum(1 for p in segs if p not in lpm),
            sum(lpm.get(p, X.UNIGRAM_UNK_MICRO) for p in segs),
        )
    assert got == want
    # the unk char really surfaced
    assert got[0][2] == 1


def test_unigram_viterbi_tiebreaks_prefer_fewer_then_longer(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    # 'ab' exactly equals 'a'+'b' in score -> fewer pieces wins
    lpm = {"a": -1_000_000, "b": -2_000_000, "ab": -3_000_000}
    assert X.unigram_viterbi("ab", lpm, 2) == ["ab"]
    # equal score AND equal piece count -> longer LAST piece wins
    # (a genuine tie: 'aab' as aa+b vs a+ab, both 2 pieces, equal
    # score — the review found the previous fixture never tied)
    lpm2 = {"a": -1_000_000, "b": -1_000_000, "ab": -1_000_000,
            "aa": -1_000_000}
    assert X.unigram_viterbi("aab", lpm2, 2) == ["a", "ab"]


def test_unigram_mstep_floor_is_seeded_from_model_not_counts():
    """Review r13: a single char in the CURRENT model whose every
    per-word expectation rounded below half a micro-unit (so the
    E-step's `if m:` guard dropped it from the aggregated dict
    entirely) must still survive the M-step at the one-micro-unit
    floor — otherwise every word containing it becomes unsegmentable
    in later rounds."""
    from qb_data_pipeline_backfill_spark.operators.text import (
        _unigram_mstep,
    )

    pieces = {"a": -100, "z": -15_000_000, "ab": -50}
    # 'z' got zero aggregated mass — absent from e altogether
    e = {"a": 4_000_000, "ab": 9_000_000}
    new_pieces, e_final = _unigram_mstep(
        e, pieces, vocab_size=3, shrink=0.75, final_round=True
    )
    assert "z" in new_pieces and e_final["z"] == 1
    # and the floor still applies to chars that aggregated to zero
    e2 = {"a": 4_000_000, "z": 0, "ab": 9_000_000}
    np2, ef2 = _unigram_mstep(
        e2, pieces, vocab_size=3, shrink=0.75, final_round=True
    )
    assert np2 == new_pieces and ef2 == e_final


# --------------------------------------------------------------------------
# BM25 ranked retrieval
# --------------------------------------------------------------------------
def test_bm25_rare_term_outranks_common_and_length_normalizes(spark):
    import pytest as _pytest

    from qb_data_pipeline_backfill_spark.operators import text as X

    docs = [
        (1, "zebra apple"),            # rare term, short doc
        (2, "apple apple apple apple"),  # common term, repeated
        (3, "apple banana cherry date egg fig grape"),  # long, one hit
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = X.bm25_topk(df, ["zebra", "apple"], k=4).collect()
    ranks = [r.doc_id for r in got]
    # doc 4 never hits; zebra's idf dominates apple's
    assert 4 not in ranks and ranks[0] == 1
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_hit_terms == 2
    # length normalization: one 'apple' in a long doc scores below
    # one-ish apples in shorter docs
    assert by_id[3].score_micro < by_id[2].score_micro
    with _pytest.raises(ValueError, match="non-empty"):
        X.bm25_topk(df, [])


def test_bm25_query_terms_dedupe_and_case_fold(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    df = spark.createDataFrame(
        [(1, "Apple pie"), (2, "no fruit")], "doc_id long, text string"
    )
    a = X.bm25_topk(df, ["APPLE", "apple", "Apple"], k=2).collect()
    b = X.bm25_topk(df, ["apple"], k=2).collect()
    assert [(r.doc_id, r.score_micro) for r in a] == [
        (r.doc_id, r.score_micro) for r in b
    ]


def test_sentence_stats_segmentation_and_greedy_chunks(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    df = spark.createDataFrame(
        [
            (1, "One. Two two! Three?? Unterminated tail"),
            (2, ""),
            (3, "x" * 450 + ". short."),  # oversized sentence chunks alone
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_sentences, r.max_sentence_chars, r.n_chunks_200)
        for r in X.sentence_stats(df).collect()
    }
    assert got[1] == (4, 17, 1)      # all fit one 200-char chunk
    assert got[2] == (0, 0, 0)
    assert got[3] == (2, 451, 2)     # giant sentence alone, then 'short.'


def test_ivf_index_append_is_bit_identical_to_fresh_build(spark):
    """Appending a new vector batch to a persisted inverted file under
    the FROZEN codebook must search bit-identically to a fresh build
    over the full corpus with the same centroids."""
    import random

    from qb_data_pipeline_backfill_spark.operators import similarity as S

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = df.filter("vec_id % 2 = 0")
    new = df.filter("vec_id % 2 = 1")
    queries = df.filter("vec_id % 17 = 0")
    cents = S.deterministic_centroids(old, stride=10)

    appended = S.ivf_assign(old, cents).unionByName(S.ivf_assign(new, cents))
    via_index = S.ivf_topk_from_index(appended, cents, queries, k=3, nprobe=2)
    fresh = S.ivf_ann_topk(df, queries, k=3, nprobe=2, centroids=cents)
    a = sorted(map(tuple, via_index.collect()))
    b = sorted(map(tuple, fresh.collect()))
    assert a == b and len(a) > 0


# --------------------------------------------------------------------------
# perceptual image near-dup (r13): dHash + banded Hamming
# --------------------------------------------------------------------------
def test_image_dhash_matches_formula_reference(spark):
    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    df = spark.range(12).withColumnRenamed("id", "doc_id")
    got = {
        r.media_id: r.dhash
        for r in M.image_dhash(M.synthesize_images(df)).collect()
    }

    def ref(mid):
        w, h = mid % 8 + 2, mid % 5 + 2

        def gray(sy, sx):
            i0 = (sy * w + sx) * 3
            return sum((mid * 31 + i0 + c) % 256 for c in range(3))

        val = 0
        for ty in range(8):
            sy = min(h - 1, ty * h // 8)
            g = [gray(sy, min(w - 1, tx * w // 9)) for tx in range(9)]
            for tx in range(8):
                if g[tx] > g[tx + 1]:
                    b = ty * 8 + tx
                    val += -(1 << 63) if b == 63 else 1 << b
        return val

    assert got == {m: ref(m) for m in range(12)}


def test_image_near_dup_finds_perturbed_copy_not_unrelated(spark):
    """A one-byte brightness bump moves at most a couple of gradient
    bits: the perturbed copy must pair with its source within radius
    2 while md5-noise strangers stay unpaired."""
    import pandas as pd

    from qb_data_pipeline_backfill_spark.operators import multimodal as M
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _encode_ppm,
        _noise_pixels,
    )

    base = _encode_ppm(7, 9, 6, noise=True)  # largest fixture dims
    px_off = len(base) - 9 * 6 * 3
    # bump ONE channel byte a little (clamped): a tiny brightness edit
    tweak = bytearray(base)
    idx = px_off + (3 * 9 + 4) * 3
    tweak[idx] = min(255, tweak[idx] + 8)
    rows = [
        (1, "image/ppm", bytes(base)),
        (2, "image/ppm", bytes(tweak)),
        (3, "image/ppm", _encode_ppm(1001, 9, 6, noise=True)),
        (4, "image/ppm", _encode_ppm(1002, 9, 6, noise=True)),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "media_type", "content"])
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.image_near_dup_pairs(media, max_hamming=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_image_near_dup_radius_zero_uses_whole_hash_band(spark):
    from pyspark.sql import functions as F

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    df = spark.range(6).withColumnRenamed("id", "doc_id")
    media = M.synthesize_images(df, noise=True)
    copies = media.withColumn("media_id", F.col("media_id") + 100)
    pairs = M.image_near_dup_pairs(
        media.unionByName(copies), max_hamming=0
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert {(i, i + 100) for i in range(6)} <= found
    assert all(r.hamming == 0 for r in pairs)


def test_image_dhash_validates_grid_and_synthesize_noise_guard(spark):
    import pytest as _pytest

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    df = spark.range(2).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="64 bits"):
        M.image_dhash(M.synthesize_images(df), grid_w=9, grid_h=8)
    with _pytest.raises(ValueError, match="ppm"):
        M.synthesize_images(df, fmt="bmp", noise=True)


def test_trigram_lm_scores_match_python_reference_and_rank_garbled(spark):
    import math

    from qb_data_pipeline_backfill_spark.operators import text as X

    rows = [
        (1, "the cat sat on the mat and the cat sat on the rug"),
        (2, "the cat sat on the mat and the cat sat on the rug"),
        (3, "rug mat zz cat qq on xx the sat"),  # garbled word salad
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in X.trigram_lm_scores(df).collect()}

    # independent reference: same recursion, plain dicts
    toks = {
        d: [w for w in t.lower().split() if w] for d, t in rows
    }
    tri, bi = {}, {}
    for ts in toks.values():
        for i in range(len(ts) - 2):
            tri[ts[i], ts[i + 1], ts[i + 2]] = (
                tri.get((ts[i], ts[i + 1], ts[i + 2]), 0) + 1
            )
        for i in range(len(ts) - 1):
            bi[ts[i], ts[i + 1]] = bi.get((ts[i], ts[i + 1]), 0) + 1
    c12, n12, c2, n2, np3 = {}, {}, {}, {}, {}
    for (a, b, _), c in tri.items():
        c12[a, b] = c12.get((a, b), 0) + c
        n12[a, b] = n12.get((a, b), 0) + 1
    for (a, b), c in bi.items():
        c2[a] = c2.get(a, 0) + c
        n2[a] = n2.get(a, 0) + 1
        np3[b] = np3.get(b, 0) + 1
    nb = len(bi)

    def nll(a, b, c):
        pc = np3[c] / nb
        p2 = (bi[b, c] - 0.75) / c2[b] + 0.75 * n2[b] / c2[b] * pc
        p3 = (tri[a, b, c] - 0.75) / c12[a, b] + 0.75 * n12[a, b] / c12[
            a, b
        ] * p2
        return round(-math.log(p3) * 1e6)

    for d, ts in toks.items():
        inst = [tuple(ts[i : i + 3]) for i in range(len(ts) - 2)]
        want_sum = sum(nll(*g) for g in inst)
        assert got[d].n_trigrams == len(inst)
        assert got[d].nll_micro == want_sum, d
        assert got[d].nll_micro_avg == math.floor(want_sum / len(inst) + 0.5)
    # duplicate docs score identically; garbled scores strictly worse
    assert got[1].nll_micro_avg == got[2].nll_micro_avg
    assert got[3].nll_micro_avg > got[1].nll_micro_avg


def test_trigram_lm_short_docs_produce_no_row(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    df = spark.createDataFrame(
        [(1, "one two"), (2, "solo"), (3, "a b c")], ["doc_id", "text"]
    )
    got = {r.doc_id for r in X.trigram_lm_scores(df).collect()}
    assert got == {3}


def test_fivegram_lm_scores_match_python_reference(spark):
    """Order-5 instance of the generalized KN recursion vs an
    independent plain-dict reference running all four interpolation
    levels; also pins the short-doc cutoff (< 5 tokens → no row) and
    the duplicate-doc / garbled-doc ranking invariants."""
    import math

    from qb_data_pipeline_backfill_spark.operators import text as X

    rows = [
        (1, "the cat sat on the mat and the cat sat on the rug again"),
        (2, "the cat sat on the mat and the cat sat on the rug again"),
        (3, "rug mat zz cat qq on xx the sat again and"),  # garbled
        (4, "too few words here"),  # 4 tokens: below order, no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in X.ngram_lm_scores(df, order=5).collect()}
    assert set(got) == {1, 2, 3}

    toks = {d: [w for w in t.lower().split() if w] for d, t in rows}
    cnt = {k: {} for k in (2, 3, 4, 5)}
    for ts in toks.values():
        for k in (2, 3, 4, 5):
            for i in range(len(ts) - k + 1):
                g = tuple(ts[i : i + k])
                cnt[k][g] = cnt[k].get(g, 0) + 1
    ch, nh = {k: {} for k in (2, 3, 4, 5)}, {k: {} for k in (2, 3, 4, 5)}
    for k in (2, 3, 4, 5):
        for g, c in cnt[k].items():
            h = g[:-1]
            ch[k][h] = ch[k].get(h, 0) + c
            nh[k][h] = nh[k].get(h, 0) + 1
    npn = {}
    for (_, b), _c in cnt[2].items():
        npn[b] = npn.get(b, 0) + 1
    nb = len(cnt[2])

    def nll(g5):
        p = npn[g5[-1]] / nb  # KN continuation base
        for k in (2, 3, 4, 5):
            g, h = g5[-k:], g5[-k:-1]
            p = (cnt[k][g] - 0.75) / ch[k][h] + 0.75 * nh[k][h] / ch[k][
                h
            ] * p
        return round(-math.log(p) * 1e6)

    for d in (1, 2, 3):
        ts = toks[d]
        inst = [tuple(ts[i : i + 5]) for i in range(len(ts) - 4)]
        want = sum(nll(g) for g in inst)
        assert got[d].n_ngrams == len(inst)
        assert got[d].nll_micro == want, d
        assert got[d].nll_micro_avg == math.floor(want / len(inst) + 0.5)
    assert got[1].nll_micro_avg == got[2].nll_micro_avg
    assert got[3].nll_micro_avg > got[1].nll_micro_avg
    with pytest.raises(ValueError, match="order"):
        X.ngram_lm_scores(df, order=1)


def test_gopher_quality_rules_trigger_individually(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    good = (
        "The quick brown fox jumps over the lazy dog and runs far away "
        "to be with all of that good company which they have found near "
        "the river bank today while many other animals watch with great "
        "interest and some measure of quiet amusement in the afternoon "
        "sun before they all head home for a warm evening meal"
    )
    rows = [
        (1, good),                                   # passes everything
        (2, "short text only"),                      # word count < 50
        (3, good + " ####### ## ### ## # # # # ##"), # symbol ratio
        (4, good + "\n" + "\n".join("- item" for _ in range(200))),  # bullets
        (5, good + "\n" + "\n".join(f"line {i}..." for i in range(200))),  # ellipses
        (6, good + "\n" + "same line\n" * 100),      # dup lines
        (7, " ".join("zq9" for _ in range(60))),     # no stopwords+alpha ok
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in X.gopher_quality(df).collect()}
    assert got[1].keep
    assert not got[2].ok_word_count and not got[2].keep
    assert not got[3].ok_symbol_ratio and got[3].ok_word_count
    assert not got[4].ok_bullet_lines
    assert not got[5].ok_ellipsis_lines
    assert not got[6].ok_dup_lines
    assert not got[7].ok_stopwords and got[7].ok_alpha_words
    # metric sanity on the clean doc
    assert 30_000 <= got[1].mean_word_len_bp <= 100_000
    assert got[1].n_stopwords >= 2 and got[1].dup_line_bp == 0


def test_winnow_fingerprints_match_reference_and_guarantee(spark):
    import hashlib

    from qb_data_pipeline_backfill_spark.operators import text as X

    docs = [
        (1, "the winnowing algorithm picks local minima deterministically"),
        (2, "zz the winnowing algorithm zz something else entirely here"),
        (3, "short"),
        (4, ""),
        (5, "aaaaaaaaaaaaaaaa"),  # identical grams: rightmost-tie path
    ]
    k, w = 8, 4
    df = spark.createDataFrame(docs, ["doc_id", "text"])
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
    # published guarantee: docs 1 and 2 share a >= w+k-1 char
    # substring ("the winnowing algorithm") -> shared fingerprint
    fp1 = {f for d, _, f in got if d == 1}
    fp2 = {f for d, _, f in got if d == 2}
    assert fp1 & fp2
    # doc 3 ("short") and doc 4 ("") emit nothing
    assert not any(d in (3, 4) for d, _, _ in got)


def test_winnow_validates_params(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="k and w"):
        X.winnow_fingerprints(df, k=0, w=4)


def test_winnow_overlap_pairs_rank_heavy_overlap(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    shared = "this exact long passage is copied between two documents"
    docs = [
        (1, "intro text. " + shared + " outro one."),
        (2, "different opening. " + shared + " and a different close."),
        (3, "no overlap with anything else at all in this one"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in X.winnow_overlap_pairs(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_perplexity_buckets_terciles_and_tie_rule(spark):
    from qb_data_pipeline_backfill_spark.operators import text as X

    # 9 docs in one lang: clean prose to garbled word salads; the
    # per-lang terciles must 3/3/3 them head/middle/tail
    base = "the cat sat on the mat and the dog lay by the door"
    rows = []
    for i in range(9):
        salt = " ".join(f"w{i}x{j}" for j in range(i))  # increasing noise
        rows.append((i, (base + " " + salt).strip(), "en"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.doc_id: r for r in X.perplexity_buckets(df).collect()}
    assert len(got) == 9
    counts = {"head": 0, "middle": 0, "tail": 0}
    for r in got.values():
        counts[r.ppl_bucket] += 1
    assert counts == {"head": 3, "middle": 3, "tail": 3}
    # bucket order must follow NLL order
    by_nll = sorted(got.values(), key=lambda r: r.nll_micro_avg)
    labels = [r.ppl_bucket for r in by_nll]
    assert labels == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_audio_dhash_matches_reference_and_finds_copies(spark):
    import hashlib

    import numpy as np

    from qb_data_pipeline_backfill_spark.operators import multimodal as M

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    media = M.synthesize_audio(df, noise=True)
    got = {
        r.media_id: (r.n_samples, r.dhash)
        for r in M.audio_dhash(media).collect()
    }

    def ref(mid):
        n = mid % 50 + 20
        dig = b"".join(
            hashlib.md5(f"{mid}:{b}".encode()).digest()
            for b in range((2 * n + 15) // 16)
        )
        s = np.frombuffer(dig[: 2 * n], dtype="<i2")
        pts = [int(s[min(n - 1, j * n // 65)]) for j in range(65)]
        v = 0
        for j in range(64):
            if pts[j] > pts[j + 1]:
                v += -(1 << 63) if j == 63 else 1 << j
        return (n, v)

    assert got == {m: ref(m) for m in range(10)}
    copies = media.withColumn("media_id", F.col("media_id") + 1000)
    pairs = M.audio_near_dup_pairs(
        media.unionByName(copies), max_hamming=1
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {
        (i, i + 1000) for i in range(10)
    }
    assert all(r.hamming == 0 for r in pairs)


def test_audio_dhash_gain_invariance_and_validation(spark):
    """Sign-of-difference is invariant to uniform positive gain: a
    clip scaled by 2 (clipped to int16) hashes within small Hamming
    of the original, while md5-noise strangers stay far."""
    import pandas as pd

    from qb_data_pipeline_backfill_spark.operators import multimodal as M
    from qb_data_pipeline_backfill_spark.operators.multimodal import (
        _encode_wav,
        _noise_samples,
    )

    import numpy as np

    n, rate = 69, 8000
    base = _noise_samples(7, n)
    # halve instead of double: no clipping, ORDER preserved exactly
    scaled = (base.astype(np.int32) // 2).astype("<i2")

    def wav(samples):
        data = samples.tobytes()
        fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
        if len(data) & 1:
            chunks += b"\x00"
        return (
            b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks
        )

    rows = [
        (1, "audio/wav", wav(base)),
        (2, "audio/wav", wav(scaled)),
        (3, "audio/wav", _encode_wav(501, 69, rate, noise=True)),
    ]
    mdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "media_type", "content"])
    )
    h = {r.media_id: r.dhash for r in M.audio_dhash(mdf).collect()}
    # halving preserves strict inequalities except ties created by
    # integer floor — allow a small Hamming drift, require closeness
    drift = bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")
    far = bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1")
    assert drift <= 8 < far

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_points"):
        M.audio_dhash(mdf, n_points=33)


# --------------------------------------------------------------------------
# r16 optimization: trainer driver fast path ≡ distributed round loop
# --------------------------------------------------------------------------
def test_trainer_driver_fast_path_matches_distributed_loop(spark):
    # a corpus with score ties, ##-continuations, and repeated symbols
    rows = [
        (0, "low low low lower lowest"),
        (1, "newest newest widest wide wide"),
        (2, "aaa abab baba aa bb"),
        (3, "mixed CASE Mixed case"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for fn in (X.train_bpe, X.train_wordpiece):
        fast = [tuple(r) for r in fn(df, n_merges=6).orderBy("rank").collect()]
        slow = [
            tuple(r)
            for r in fn(df, n_merges=6, driver_fit_max_rows=0)
            .orderBy("rank")
            .collect()
        ]
        assert fast == slow, fn.__name__
    fast_u = [
        tuple(r) for r in X.train_unigram(df).orderBy("piece").collect()
    ]
    slow_u = [
        tuple(r)
        for r in X.train_unigram(df, driver_fit_max_rows=0)
        .orderBy("piece")
        .collect()
    ]
    assert fast_u == slow_u


def test_nll_table_driver_replay_matches_distributed_chain(spark):
    """r17: the size-gated driver replay of the KN fit (integer half
    in Python dicts, float recursion as the same Spark expressions)
    must be BIT-identical to the distributed rollup/join chain —
    including the padded-null levels and the continuation base."""
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat on the mat"),
        (2, "a dog sat"),
        (3, "tiny"),
        (4, "the the the the the"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for order in (2, 3, 5):
        fast = sorted(
            tuple(r) for r in X.ngram_nll_table(df, order).collect()
        )
        slow = sorted(
            tuple(r)
            for r in X.ngram_nll_table(
                df, order, driver_fit_max_rows=0
            ).collect()
        )
        assert fast == slow, f"order={order}"
        assert len(fast) > 0
