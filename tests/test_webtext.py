"""Raw-web extraction (operators/webtext.py) — the markup edges the
oracle gate's clean template can't exercise: comments, uppercase and
unclosed tags, attributes containing '>', CDATA script bodies, void
elements, nested drop containers, NULL input, and the link-density
threshold boundary itself.
"""

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.webtext import (
    extract_html,
    html_extract,
)


def test_script_style_and_comments_never_leak():
    t, x, nb, nd = extract_html(
        "<head><title>T</title><style>p{}</style>"
        "<script>if(1<2){document.write('<p>fake</p>');}</script></head>"
        "<!-- <p>also fake</p> --><p>real</p>"
    )
    assert (t, x, nb, nd) == ("T", "real", 1, 0)


def test_uppercase_unclosed_and_attr_gt():
    t, x, nb, nd = extract_html(
        '<P>Hello <B>world</B><p>second<DIV data-x="a>b">third'
    )
    assert t is None
    assert x == "Hello world\nsecond\nthird"
    assert (nb, nd) == (3, 0)


def test_entities_decode_and_whitespace_collapses():
    _, x, nb, _ = extract_html(
        "<p>  AT&amp;T   &lt;tag&gt;\n\t &#39;q&#39;  </p>"
    )
    assert x == "AT&T <tag> 'q'"
    assert nb == 1


def test_br_is_inline_not_a_block_boundary():
    _, x, nb, _ = extract_html("<p>one<br>two<br/>three</p>")
    assert x == "one two three"
    assert nb == 1


def test_link_density_threshold_is_exact():
    # 2 anchor words of 4: 3*2 > 4 -> dropped
    _, x, nb, nd = extract_html(
        '<p><a href="a">like</a> <a href="b">share</a> subscribe now</p>'
    )
    assert (x, nb, nd) == ("", 0, 1)
    # 1 anchor word of 3: 3*1 <= 3 -> kept (boundary case, not >)
    _, x, nb, nd = extract_html('<p><a href="a">see</a> full report</p>')
    assert (x, nb, nd) == ("see full report", 1, 0)
    # adjacent anchors with no whitespace node still count as 2 words
    _, x, nb, nd = extract_html(
        '<p><a href="a">like</a><a href="b">share</a> subscribe now</p>'
    )
    assert (nb, nd) == (0, 1)


def test_drop_containers_take_chrome_not_prose():
    # short/linky blocks inside <nav>: boilerplate by markup
    _, x, nb, nd = extract_html(
        '<nav><a href="/">Home</a> docs</nav><p>content</p>'
    )
    assert (x, nb, nd) == ("content", 1, 1)
    # nested containers: short blocks dropped after the inner closes
    _, x, nb, nd = extract_html(
        "<footer><div><p>a b c d e</p></div><p>f g h</p></footer>"
    )
    assert (x, nb, nd) == ("", 0, 2)
    # >= 10 words of plain prose survives even inside a container —
    # the bounded-damage rule (an unconditional container drop would
    # let one unclosed <nav> swallow the page)
    _, x, nb, nd = extract_html(
        "<nav><p>this perfectly normal long sentence lives in the "
        "navigation chrome today</p></nav><p>content</p>"
    )
    assert nb == 2 and nd == 0 and x.endswith("\ncontent")


def test_unclosed_container_does_not_swallow_the_page():
    # the common real-web malformation: <header> never closed. The
    # page's real paragraphs must survive; only the chrome-like
    # heading is dropped.
    t, x, nb, nd = extract_html(
        "<header><h1>Site</h1><p>real content paragraph with many "
        "plain words standing right here</p><p>and a second real "
        "paragraph with plenty of words in it</p>"
    )
    assert nb == 2 and nd == 1
    assert x.startswith("real content") and "second real paragraph" in x


def test_text_after_last_block_is_flushed():
    _, x, nb, _ = extract_html("<p>first</p>trailing tail words")
    assert x == "first\ntrailing tail words"
    assert nb == 2


def test_html_extract_dataframe_face(spark):
    df = spark.createDataFrame(
        [
            (1, "<title>A</title><p>one two</p>"),
            (2, None),
            (3, "<nav><a href='/'>x</a></nav><p>kept text</p>"),
        ],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in html_extract(df, "html").collect()}
    assert rows[1].title == "A" and rows[1].text == "one two"
    assert rows[2].title is None and rows[2].text is None
    assert rows[2].n_blocks == 0 and rows[2].n_dropped == 0
    assert rows[3].text == "kept text" and rows[3].n_dropped == 1
    # passthrough column survives with its type
    assert set(rows) == {1, 2, 3}


def test_classifier_plan_is_one_narrow_projection(spark):
    """No shuffle, no Python: the classifier must stay a codegen'd
    projection over the scan (the 100 TB contract of the operator)."""
    from qb_data_pipeline_backfill_spark.operators.text import (
        classifier_scores,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], "doc_id long, text string"
    )
    out = classifier_scores(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan  # JVM-side only
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[2].n_feats == 0 and rows[2].score_micro == 0  # bias=0
    assert rows[2].prob_micro == 500_000 and rows[2].label is False
    assert rows[1].n_feats == 5  # 3 unigrams + 2 bigrams
    # hard sigmoid is the exact integer form
    s = rows[1].score_micro
    expected = min(1_000_000, max(0, 500_000 + int(s / 4 if s >= 0 else -(-s // 4))))
    assert rows[1].prob_micro == expected


# --------------------------------------------------------------------------
# URL curation
# --------------------------------------------------------------------------
def test_canonicalize_url_edges(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        canonicalize_url,
        url_host,
    )

    cases = [
        # authority lowered, path case preserved, default port dropped
        ("HTTP://WWW.Example.COM:80/Path/X?a=1#frag", "http://www.example.com/Path/X?a=1"),
        # https default port
        ("https://a.example.com:443/", "https://a.example.com/"),
        # non-default port kept
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # tracking params stripped, order of the rest preserved
        (
            "http://e.com/p?utm_source=x&b=2&fbclid=abc&a=1&gclid=9",
            "http://e.com/p?b=2&a=1",
        ),
        # ALL params tracking -> no '?'
        ("http://e.com/p?utm_a=1&ref=x", "http://e.com/p"),
        # tracking params match case-insensitively and value-less...
        ("http://e.com/p?UTM_SOURCE=feed&a=1&fbclid", "http://e.com/p?a=1"),
        # ...but only as the whole name: reference= is not ref=
        ("http://e.com/p?reference=5", "http://e.com/p?reference=5"),
        # userinfo keeps its CASE (RFC 3986: only scheme/host are
        # case-insensitive); host still lowers, default port drops
        ("http://User@E.com/p", "http://User@e.com/p"),
        ("https://U:Pw@E.com:443/x", "https://U:Pw@e.com/x"),
        # no authority: best-effort cleanup only, never NULL
        ("not a url#frag", "not a url"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    out = df.select("want", canonicalize_url("url").alias("got")).collect()
    for r in out:
        assert r.got == r.want, (r.want, r.got)
    hosts = spark.createDataFrame(
        [("http://User:pw@WWW.E.com:8080/p",), ("nope",)], "url string"
    ).select(url_host("url").alias("h")).collect()
    assert hosts[0].h == "www.e.com" and hosts[1].h is None


def test_host_suffix_chain_is_label_safe(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        host_suffixes,
    )
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(host_suffixes(F.lit("www.a.example.com")).alias("s"))
        .collect()[0]
    )
    assert row.s == ["www.a.example.com", "a.example.com", "example.com", "com"]


def test_blocklist_flag_subdomains_not_substrings(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        host_blocklist_flag,
    )

    df = spark.createDataFrame(
        [
            (1, "http://spam.example/x"),        # exact host match
            (2, "http://sub.spam.example/x"),    # subdomain -> blocked
            (3, "http://notspam.example/x"),     # substring only -> clean
            (4, "http://src11.org/x"),           # label-safe vs src1.org
            (5, None),                           # NULL url -> clean
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame(
        [("spam.example",), ("src1.org",)], "domain string"
    )
    got = {
        r.doc_id: r.blocked
        for r in host_blocklist_flag(df, "url", blocked).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_url_canonicalize_plan_is_narrow_jvm(spark):
    """The canonicalization must ride the scan: no shuffle, no Python."""
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        canonicalize_url,
    )

    df = spark.createDataFrame([("http://e.com/p?a=1",)], "url string")
    plan = (
        df.select(canonicalize_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_line_quality_filter_rules(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        line_quality_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "good long line here\nSHOUTING AT EVERYONE NOW\nno\n"
                "route 66 is fine\n123 456 789 0"),
            (2, None),
            (3, "12:30 PM — 3 of 4 lines\n\n...\na b c"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in line_quality_filter(df, "text").collect()
    }
    # caps dropped, 'no' (1 word) dropped, digit-only dropped; a line
    # with SOME digits ('route 66 is fine': 2 of 16 chars) survives
    assert out[1].text_clean == "good long line here\nroute 66 is fine"
    assert (out[1].n_lines, out[1].n_kept) == (5, 2)
    assert out[2].text_clean is None
    assert (out[2].n_lines, out[2].n_kept) == (0, 0)
    # '12:30 PM — 3 of 4 lines': digits 4 of 23 -> kept; empty line and
    # '...' have 0/1 words -> dropped; 'a b c' = 3 words, no caps -> kept
    assert out[3].text_clean == "12:30 PM — 3 of 4 lines\na b c"
    assert (out[3].n_lines, out[3].n_kept) == (4, 2)


def test_line_quality_filter_plan_is_narrow_jvm(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        line_quality_filter,
    )

    df = spark.createDataFrame([(1, "a b c\nd")], "doc_id long, text string")
    plan = (
        line_quality_filter(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_html_extract_rejects_output_column_collisions(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, "prior text", "<p>x</p>")], "doc_id long, text string, html string"
    )
    with _pt.raises(ValueError, match="collide"):
        from qb_data_pipeline_backfill_spark.operators.webtext import (
            html_extract,
        )

        html_extract(df, "html")


def test_line_filter_counts_whitespace_words(spark):
    from qb_data_pipeline_backfill_spark.operators.webtext import (
        line_quality_filter,
    )

    df = spark.createDataFrame(
        [(1, "foo\tbar baz")], "doc_id long, text string"
    )
    row = line_quality_filter(df, "text").collect()[0]
    # 3 whitespace-delimited words: survives min_words=3
    assert row.n_kept == 1 and row.text_clean == "foo\tbar baz"


def test_unicode_normalization_ops(spark):
    from qb_data_pipeline_backfill_spark.operators.text import (
        fold_accents_text,
        nfc_text,
    )

    df = spark.createDataFrame(
        [
            (1, "café Ω Å"),  # decomposed + singleton
            (2, "Élan déjà"),                   # precomposed
            (3, "中文 ok"),                      # CJK passthrough
            (4, None),
        ],
        "doc_id long, t string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            nfc_text("t").alias("nfc"),
            fold_accents_text("t").alias("fold"),
        ).collect()
    }
    assert rows[1].nfc == "café Ω Å"  # composed forms
    assert rows[1].fold == "cafe Ω A"
    assert rows[2].nfc == "Élan déjà" and rows[2].fold == "Elan deja"
    assert rows[3].nfc == "中文 ok" and rows[3].fold == "中文 ok"
    assert rows[4].nfc is None and rows[4].fold is None


# --------------------------------------------------------------------------
# WARC record parsing
# --------------------------------------------------------------------------
def _warc_record(body: str, *, rid: str = "<urn:doc:1>", http: bool = True) -> str:
    if http:
        payload = (
            "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" + body
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = "text/plain"
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        "WARC-Target-URI: http://x.test/\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload.encode('utf-8'))}\r\n"
        "\r\n" + payload + "\r\n\r\n"
    )


def test_warc_parse_trap_body_stays_one_payload():
    from qb_data_pipeline_backfill_spark.operators.webtext import parse_warc

    trap = "before\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    recs = parse_warc(_warc_record(trap) + _warc_record("second", rid="<urn:doc:2>"))
    assert [r["record_id"] for r in recs] == ["<urn:doc:1>", "<urn:doc:2>"]
    assert recs[0]["body"] == trap
    assert recs[0]["http_status"] == 404


def test_warc_parse_non_http_and_unicode_octets():
    from qb_data_pipeline_backfill_spark.operators.webtext import parse_warc

    body = "café — 中文"  # multi-byte: Content-Length must count octets
    recs = parse_warc(_warc_record(body, http=False))
    assert recs[0]["http_status"] is None
    assert recs[0]["body"] == body
    assert recs[0]["content_length"] == len(body.encode("utf-8"))


def test_warc_parse_fails_loudly_on_malformed_input():
    import pytest as _pytest

    from qb_data_pipeline_backfill_spark.operators.webtext import parse_warc

    good = _warc_record("x")
    with _pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-10])
    with _pytest.raises(ValueError, match="no version line"):
        parse_warc("HTTP/1.1 200 OK\r\n\r\n")
    with _pytest.raises(ValueError, match="Content-Length"):
        parse_warc(
            "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
        )


def test_warc_parse_distributed_fanout_and_null_blob(spark):
    from qb_data_pipeline_backfill_spark.operators import webtext as W

    blob = _warc_record("a") + _warc_record("b", rid="<urn:doc:2>")
    df = spark.createDataFrame(
        [(1, blob), (2, None)], "file_id long, warc string"
    )
    got = W.warc_parse(df, "warc").collect()
    assert [(r.file_id, r.body) for r in got] == [(1, "a"), (1, "b")]


def test_badword_matches_words_not_substrings(spark):
    from qb_data_pipeline_backfill_spark.operators import webtext as W

    df = spark.createDataFrame(
        [(1, "the CLASS is great"), (2, "an ass appears twice ass"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bad_tokens, r.flagged)
           for r in W.badword_stats(df, ["ass"]).collect()}
    assert got == {1: (0, False), 2: (2, True), 3: (0, False)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        W.badword_stats(df, [])


def test_badword_null_text_stays_null(spark):
    """NULL text is missingness, not a clean page: counts and flag
    surface NULL (the line_quality_filter convention) so a downstream
    keep-filter must decide the NULL policy explicitly."""
    from qb_data_pipeline_backfill_spark.operators import webtext as W

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = W.badword_stats(df, ["x"]).collect()[0]
    assert r.n_bad_tokens is None and r.flagged is None


# --------------------------------------------------------------------------
# fast tokenizer parity (r13): _fast_tokenize must either produce the
# HTMLParser-identical callback sequence or decline the document
# --------------------------------------------------------------------------
def _stdlib_extract(html):
    from qb_data_pipeline_backfill_spark.operators import webtext as W

    p = W._BoilerpipeExtractor()
    p.feed(html)
    p.close()
    return p.result()


def _fast_extract(html):
    from qb_data_pipeline_backfill_spark.operators import webtext as W

    p = W._BoilerpipeExtractor()
    return (W._fast_tokenize(html, p), p)


_PARITY_TRAPS = [
    # clean prose + chrome
    '<html><head><title>T</title></head><body><nav><a href="/">x</a>'
    "</nav><p>real prose with many plain words here okay</p></body></html>",
    # CDATA script with tags and angle brackets inside
    "<script>if(1<2){document.write('<p>fake</p>');}</script><p>kept</p>",
    "<SCRIPT TYPE=\"a\">x</SCRIPT ><p>after</p>",
    "<style>p{content:'<'}</style><p>s</p>",
    # unterminated script swallows the tail (parser cdata semantics)
    "<p>head</p><script>var x = 1;",
    # attributes: quoted '>' inside value, unquoted values, empty vals
    '<div data-x="a>b">third</div>',
    "<a href=/about title='hi there'>link words</a><p>many plain words "
    "to beat the density rule okay</p>",
    "<input value=\"a>b\" disabled><p>q</p>",
    "<p class=>bare empty</p>",
    # self-closing forms
    "<p>one<br>two<br/>three<br />four</p><hr/><p>five</p>",
    # comments incl. tricky closers
    "<!-- <p>fake</p> --><p>real</p>",
    "<!-- double -- dash --><p>r</p>",
    "<!-- spaced close -- ><p>in comment</p> --><p>out</p>",
    # doctype / PI / bogus comments / marked sections
    "<!DOCTYPE html><p>d</p>",
    "<!doctype html><?php echo 1 ?><p>pi</p>",
    "</><p>empty endtag</p>",
    "</ bogus ><p>b</p>",
    "<!weird decl><p>w</p>",
    "<![CDATA[raw <p>stuff</p>]]><p>m</p>",
    # stray '<' and entities in text
    "<p>1 < 2 and x <3 and AT&amp;T &lt;tag&gt; &#39;q&#39;</p>",
    "<p>truncated entity &am</p>",
    "<p>tail<",
    "<p>tail< ",
    # uppercase, unclosed blocks, nesting
    "<P>Hello <B>world</B><p>second<DIV>third",
    "<ul><li>a<li>b<li>c</ul>",
    # end tag with attributes (tolerant junk path -> must fall back)
    "<p>x</p attr='1'><p>y</p>",
    # EOF-truncated constructs
    "<p>x<div class='open",
    "<p>x<!-- open comment",
    "<p>x<?php open",
    "<p>x</div",
    # NUL and weird chars in tags
    "<p\x00junk>x</p>",
    "<p a==b>double eq</p>",
    "<p =x>eq attr</p>",
    "<p a/b>slash attr</p>",
    "<p/ >spaced slash</p>",
    # non-ASCII letter after '<' is data, not a tag
    "<p>a <é b</p>",
    # title fragments and head traps
    "<title>A &amp; B</title><p>body words</p>",
]


def test_fast_tokenizer_parity_on_trap_corpus():
    n_fast = 0
    for doc in _PARITY_TRAPS:
        ok, p = _fast_extract(doc)
        if ok:
            n_fast += 1
            assert p.result() == _stdlib_extract(doc), doc
    # the fast path must actually cover most of the corpus, or the
    # speedup is fiction
    assert n_fast >= len(_PARITY_TRAPS) * 2 // 3, n_fast


def test_fast_tokenizer_handles_the_common_shape():
    # the gate corpus template (plans side) and probe synth shape
    doc = (
        "<html><head><title>t &amp; u</title><style>p{}</style></head>"
        "<body><nav><a href='/'>home</a> <a href='/a'>a</a></nav>"
        "<div id='main'><p>plain prose " + "word " * 40 + "</p>"
        "<p>more prose " + "word " * 40 + "</p></div>"
        "<footer><a href='/x'>x</a></footer></body></html>"
    )
    ok, p = _fast_extract(doc)
    assert ok and p.result() == _stdlib_extract(doc)


def test_fast_tokenizer_fuzz_parity():
    """Random markup soup: whenever the fast path accepts, the result
    must equal the stdlib parser's bit-for-bit."""
    import random

    atoms = [
        "<p>", "</p>", "<div class='a'>", "</div>", "<br>", "<br/>",
        "<a href=\"/x\">", "</a>", "<nav>", "</nav>", "<script>",
        "</script>", "<style>", "</style>", "<!-- c -->", "<!-- ",
        "<!DOCTYPE html>", "<![CDATA[x]]>", "<?pi?>", "</>", "</ x>",
        "<p a=1 b='2' c=\"3>4\">", "<P>", "</P attr>", "<", ">", "&amp;",
        "&lt;", "&#39;", "&bogus;", "&am", "word", " ", "\n", "1<2",
        "<p\x00>", "<p/ >", "<p a/b>", "x", "<title>", "</title>",
        "<li>", "<hr/>", "<td>", "</td>", "é<é", "<b>", "</b>",
    ]
    rng = random.Random(13)
    n_fast = 0
    for _ in range(400):
        doc = "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 40)))
        ok, p = _fast_extract(doc)
        if ok:
            n_fast += 1
            assert p.result() == _stdlib_extract(doc), repr(doc)
    assert n_fast > 50  # fast path engages on a real fraction


def test_gunzip_members_multi_member_and_rejections():
    """RFC 1952 multi-member stream handling (the .warc.gz layout):
    concatenated members inflate in order; a non-gzip prefix, a
    mid-stream non-gzip byte, and a truncated final member each fail
    loudly with the stream offset."""
    import gzip

    import pytest as _pytest

    from qb_data_pipeline_backfill_spark.operators.webtext import (
        gunzip_members,
    )

    parts = [b"alpha " * 10, b"beta", b"", b"gamma!"]
    stream = b"".join(gzip.compress(p, mtime=0) for p in parts)
    assert gunzip_members(stream) == b"".join(parts)
    assert gunzip_members(b"") == b""
    with _pytest.raises(ValueError, match="offset 0"):
        gunzip_members(b"not-gzip")
    one = gzip.compress(b"payload", mtime=0)
    with _pytest.raises(ValueError, match="not a gzip member"):
        gunzip_members(one + b"junk-after-member")
    with _pytest.raises(ValueError, match="truncated"):
        gunzip_members(stream[: len(stream) - 5])


def test_warc_parse_gz_equals_uncompressed(spark):
    """The compressed face yields the identical record rows as
    warc_parse on the inflated text — per-record members AND one
    whole-blob member both round-trip."""
    import gzip

    from qb_data_pipeline_backfill_spark.operators import webtext as W2

    payload = "HTTP/1.1 200 OK\r\n\r\nbody text with trailing words"
    rec = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:doc:7>\r\n"
        "WARC-Target-URI: http://x.test/a\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )
    blob = rec + rec.replace("urn:doc:7", "urn:doc:8")
    plain = spark.createDataFrame([(1, blob)], ["fid", "warc"])
    want = sorted(
        (r["record_id"], r["body"], r["content_length"])
        for r in W2.warc_parse(plain, "warc").collect()
    )
    for members in ([rec, rec.replace("urn:doc:7", "urn:doc:8")], [blob]):
        content = b"".join(
            gzip.compress(m.encode(), mtime=0) for m in members
        )
        gz = spark.createDataFrame([(1, bytearray(content))], "fid int, warc_gz binary")
        got = sorted(
            (r["record_id"], r["body"], r["content_length"])
            for r in W2.warc_parse_gz(gz, "warc_gz").collect()
        )
        assert got == want and len(got) == 2
