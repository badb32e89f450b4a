"""Raw-web text extraction: markup -> clean text, the front end of the
LLM training-data pipeline.

Every curation operator in this repo (dedup, quality, language-ID,
packing) consumes CLEAN text; the web corpus a 100 TB pipeline starts
from is HTML. This module is the missing first stage: strip markup,
decode entities, drop boilerplate (navigation, footers, link farms),
keep the content blocks — the published density heuristics of
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features" (WSDM 2010, the boilerpipe line of work) reduced to their
deterministic core:

- the page is segmented into BLOCKS at block-level element boundaries
  (``p``/``div``/``h*``/``li``/...);
- a block inside a semantic boilerplate container (``nav``/``footer``/
  ``aside``/``header``) is boilerplate when it also LOOKS like chrome
  (under 10 words, or link-dense) — container-only dropping would let
  one unclosed ``<nav>`` silently swallow the rest of the page;
- otherwise a block whose LINK DENSITY exceeds 1/3 (anchor-text words
  x3 > total words — boilerpipe's classic threshold, kept in exact
  integer form so the classification is replayable in SQL) is
  boilerplate: link farms, "share/subscribe" bars, related-article
  strips;
- everything else is content, emitted in document order joined by
  newlines, entities decoded, whitespace collapsed per block.

Execution shape: one Arrow-batched ``mapInPandas`` pass (the same
vectorized-Python boundary policy as the media codecs in
``multimodal.py`` — parsing HTML is inherently sequential per
document, exactly the case the module docstring of ``text.py``
reserves for Python), narrow (no shuffle), parser = the stdlib
``html.parser`` state machine (tolerant of unclosed tags, uppercase
tags, attributes containing ``>``, CDATA script bodies with ``<``).
At 100 TB this is a single map stage over the raw-web table; the
output feeds straight into ``operators/text.py`` / ``dedup.py``.

Reference parity: generalizes the reference's semi-structured payload
extraction (SURVEY.md §2 op 8 — nested-field extraction from API
envelopes, reference transformers/transform_customers_py.py) from
JSON envelopes to web markup, the same way ``decode_media``
generalized it to binary envelopes.
"""

from __future__ import annotations

import re
import sys
from collections.abc import Iterator
from html import unescape
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Block-level elements: entering OR leaving one ends the current text
# block (the boilerpipe segmentation grain). br is NOT here — a lone
# line break is an in-block separator, not a block boundary.
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table thead "
    "tbody tfoot section article blockquote pre figure figcaption "
    "form fieldset hr main body html header footer nav aside "
    "address center".split()
)
# Content inside these never reaches the text stream (code, styling,
# embedded documents). head is handled separately so <title> survives.
_SKIP_TAGS = frozenset(
    "script style noscript template svg iframe object canvas".split()
)
# Semantic boilerplate containers (HTML5): any block opened while one
# of these is on the stack is boilerplate by markup, before the
# density rule even looks at it.
_DROP_CONTAINERS = frozenset("nav footer aside header".split())
# Elements the HTML spec defines as void (never closed): only the ones
# that matter to text flow are handled specially.
_VOID_BREAKS = frozenset(("br", "hr"))
# A block inside a drop container is boilerplate only when it also
# LOOKS like chrome: fewer words than this, or link-dense. Bounds the
# damage of the common unclosed-<nav>/<header> malformation to the
# chrome itself instead of the whole remaining page.
_CONTAINER_PROSE_WORDS = 10
# Union of every tag the callbacks react to — the one-lookup gate for
# the (common) unknown-tag case.
_ANY_SPECIAL = (
    _BLOCK_TAGS | _SKIP_TAGS | _VOID_BREAKS | frozenset(("a", "title"))
)


class _BoilerpipeExtractor(HTMLParser):
    """One-pass block segmenter + density classifier.

    Collects ``(text, n_words, n_anchor_words, in_drop_container)``
    per block; classification happens in :meth:`result` so the rule
    stays in one place. ``convert_charrefs=True`` decodes entities
    (``&amp;`` ``&#39;`` ...) before ``handle_data`` — script/style
    bodies are exempt per the parser's CDATA handling, and we skip
    them anyway.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._frags: list[tuple[str, bool]] = []  # (fragment, in_anchor)
        self._blocks: list[tuple[str, int, int, bool]] = []
        self._skip_depth = 0
        self._drop_depth = 0
        self._anchor_depth = 0
        self._in_title = False
        self._title_frags: list[str] = []

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        frags = self._frags
        if not frags:
            return
        self._frags = []
        if len(frags) == 1:
            # the overwhelmingly common block shape (one text node):
            # same words either way, skip the generator joins
            f0, a0 = frags[0]
            words = f0.split()
            if not words:
                return
            self._blocks.append(
                (
                    " ".join(words),
                    len(words),
                    len(words) if a0 else 0,
                    self._drop_depth > 0,
                )
            )
            return
        text = " ".join("".join(f for f, _ in frags).split())
        # anchors joined WITH a separator: two adjacent <a> texts are
        # two words for the density rule even when no whitespace node
        # sits between them (the full text uses raw concatenation so
        # entity-split words stay whole)
        anchor = " ".join(f for f, a in frags if a)
        n_words = len(text.split())
        if n_words == 0:
            return  # inter-tag whitespace, not a block
        self._blocks.append(
            (text, n_words, len(anchor.split()), self._drop_depth > 0)
        )

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag not in _ANY_SPECIAL:
            return  # unknown tags never change state
        if tag in _VOID_BREAKS:
            # <br>/<hr> written without the self-closing slash
            self.handle_startendtag(tag, attrs)
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _DROP_CONTAINERS:
                self._drop_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag not in _ANY_SPECIAL:
            return
        if tag in _SKIP_TAGS and self._skip_depth:
            self._skip_depth -= 1
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _DROP_CONTAINERS and self._drop_depth:
                self._drop_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br":
            self._frags.append((" ", self._anchor_depth > 0))
        elif tag in _BLOCK_TAGS:  # e.g. <hr/>
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self._title_frags.append(data)
            return
        if data:
            self._frags.append((data, self._anchor_depth > 0))

    # -- result ------------------------------------------------------------
    def result(self) -> tuple[str | None, str, int, int]:
        self._flush()  # text after the last closed block
        kept: list[str] = []
        dropped = 0
        for text, n_words, n_anchor, in_container in self._blocks:
            # integer forms — exact, SQL-replayable. A boilerplate
            # container drops only blocks that LOOK like chrome (short
            # or link-dense): real-web pages routinely leave <nav>/
            # <header> unclosed, and an unconditional container drop
            # would then silently zero the whole remaining document
            # (review r12) — long prose survives wherever the markup
            # says it sits, which is also the density-first spirit of
            # the boilerpipe heuristics.
            chrome_like = (
                n_words < _CONTAINER_PROSE_WORDS or 3 * n_anchor > n_words
            )
            if (in_container and chrome_like) or 3 * n_anchor > n_words:
                dropped += 1
            else:
                kept.append(text)
        title = " ".join("".join(self._title_frags).split())
        return (title or None, "\n".join(kept), len(kept), dropped)


# --------------------------------------------------------------------------
# Fast tokenizer (r13): the stdlib html.parser floor measured at
# ~5.7 MB/s/core (SCALING §13) is the 100 TB front-end wall, and the
# sandbox has no C parser (selectolax/lxml both absent — measured, see
# SCALING §13). This whole-document scanner drives the SAME extractor
# callbacks with the SAME tokenization semantics as HTMLParser
# (CPython 3.11 html/parser.py goahead + parse_* — each branch below
# cites the behavior it mirrors) for the constructs that cover
# essentially all real markup, and returns False — caller falls back
# to the stdlib parser on a fresh extractor — the moment it meets
# anything whose tolerant-mode handling it cannot prove equivalent
# (quoted junk in tags, EOF-truncated constructs, marked sections,
# attribute-bearing end tags). Exactness is therefore by
# construction: the fast path either produces the identical callback
# sequence or declines the document. Parity is pinned by the trap
# corpus + a hypothesis fuzz in tests/test_webtext.py.
#
# A start tag is eligible iff it matches this regex, a strict SUBSET
# of locatestarttagend_tolerant's grammar that provably ends at the
# same '>' and yields end-token '>' or '/>' (attrs whitespace-
# separated, values absent / bare / fully quoted — quoted values may
# contain '>'):
_FAST_TAG = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"(?:\s+[^\s/=>'\"]+(?:\s*=\s*(?:'[^']*'|\"[^\"]*\"|[^>\s'\"]*))?)*"
    r"\s*(/?)>"
)
# verbatim pattern texts from html.parser (endtagfind / commentclose /
# set_cdata_mode's interesting) so boundaries match bit-for-bit:
_FAST_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_FAST_COMMENT_CLOSE = re.compile(r"--\s*>")
_FAST_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}

# The fast path mirrors CPython's html/parser.py tokenization branch by
# branch, and that module's tolerant-mode details do change across
# CPython releases (e.g. `<!-->` / bogus-comment handling). Parity is
# therefore certified PER INTERPRETER LINE: the trap corpus + hypothesis
# fuzz in tests/test_webtext.py compare against the RUNNING stdlib, so a
# version goes in this set only after that suite passes on it. On an
# uncertified interpreter the fast path self-disables and every document
# takes the stdlib parser — slower, never divergent.
_FAST_PATH_CERTIFIED = sys.version_info[:2] in {(3, 11)}


def _fast_tokenize(s: str, p: _BoilerpipeExtractor) -> bool:
    """Emit the HTMLParser-identical callback sequence for ``s`` into
    ``p``; return False (partial state — discard ``p``) if any
    construct falls outside the proven-equivalent subset."""
    n = len(s)
    i = 0
    hd, hs, he = p.handle_data, p.handle_starttag, p.handle_endtag
    hse = p.handle_startendtag
    find = s.find
    while i < n:
        j = find("<", i)
        if j < 0:
            # goahead: trailing text, charref-decoded
            hd(unescape(s[i:]))
            return True
        if j > i:
            hd(unescape(s[i:j]))
        c = s[j + 1 : j + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):  # starttagopen
            m = _FAST_TAG.match(s, j)
            if not m:
                return False  # tolerant-grammar tag or EOF-truncated
            tag = m.group(1).lower()
            i = m.end()
            if m.group(2):
                hse(tag, ())  # parse_starttag end=='/>'
            else:
                hs(tag, ())
                if tag in _FAST_CDATA_CLOSE:  # CDATA_CONTENT_ELEMENTS
                    cm = _FAST_CDATA_CLOSE[tag].search(s, i)
                    if not cm:
                        # unterminated CDATA: goahead(1) drops the
                        # tail when cdata_elem is set — emit nothing
                        return True
                    # body would be handle_data'd raw, but script and
                    # style are both _SKIP_TAGS: provably dropped
                    he(tag)
                    i = cm.end()
        elif c == "/":
            m = _FAST_ENDTAG.match(s, j)
            if m:
                he(m.group(1).lower())
                i = m.end()
                continue
            c2 = s[j + 2 : j + 3]
            if ("a" <= c2 <= "z") or ("A" <= c2 <= "Z"):
                return False  # '</tag junk>' tolerant path
            if s.startswith("</>", j):
                i = j + 3  # parse_endtag: silently consumed
                continue
            pos = find(">", j + 2)
            if pos < 0:
                return False  # EOF bogus comment
            i = pos + 1  # parse_bogus_comment: no-op callback
        elif c == "!":
            if s.startswith("<!--", j):
                cm = _FAST_COMMENT_CLOSE.search(s, j + 4)
                if not cm:
                    return False  # EOF comment
                i = cm.end()  # handle_comment: no-op
            elif s.startswith("<![", j):
                return False  # marked section: tolerant machinery
            elif s[j : j + 9].lower() == "<!doctype":
                pos = find(">", j + 9)
                if pos < 0:
                    return False
                i = pos + 1  # handle_decl: no-op
            else:
                pos = find(">", j + 2)
                if pos < 0:
                    return False
                i = pos + 1  # parse_bogus_comment: no-op
        elif c == "?":
            pos = find(">", j + 2)  # piclose
            if pos < 0:
                return False  # EOF PI
            i = pos + 1  # handle_pi: no-op
        elif c == "":
            hd("<")  # lone '<' at EOF: goahead end-branch
            return True
        else:
            hd("<")  # '<' not opening a construct: literal data
            i = j + 1
    return True


def extract_html(html: str) -> tuple[str | None, str, int, int]:
    """Extract one document: ``(title, text, n_blocks, n_dropped)``.

    ``text`` is the kept content blocks in document order, one per
    line, entities decoded, whitespace collapsed. Driver-side helper
    and the unit under test; the distributed face is
    :func:`html_extract`.

    Tries the fast whole-document tokenizer first (identical callback
    sequence by construction, ~3x the stdlib parser); any document it
    declines is re-run through the stdlib ``html.parser`` machinery
    on a fresh extractor, so output never depends on which path ran.
    """
    p = _BoilerpipeExtractor()
    if _FAST_PATH_CERTIFIED and _fast_tokenize(html, p):
        return p.result()
    p = _BoilerpipeExtractor()
    p.feed(html)
    p.close()
    return p.result()


def html_extract(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Markup -> clean text over a DataFrame: every column except
    ``html_col`` passes through; ``title`` / ``text`` / ``n_blocks``
    / ``n_dropped`` are appended (see module docstring for the block
    and boilerplate semantics).

    One narrow ``mapInArrow`` stage — no shuffle, no driver
    involvement; NULL html yields NULL title/text and zero counts
    (missingness, not an empty page). Arrow RecordBatches are consumed
    and produced directly (r13): the values leave Arrow only as the
    Python strings the parser needs anyway, skipping the
    pandas object-array round trip on both sides — measured ~1.2x on
    the probe over the mapInPandas form it replaces (SCALING §13).

    Carried columns may not be named ``title``/``text``/``n_blocks``/
    ``n_dropped`` — the appended outputs would silently shadow them in
    pandas and then crash the Arrow schema check mid-job (review r12);
    rename before extracting (raw-web tables often carry a prior
    ``text``).
    """
    carry = [f for f in df.schema.fields if f.name != html_col]
    reserved = {"title", "text", "n_blocks", "n_dropped"}
    clash = sorted(reserved & {f.name for f in carry})
    if clash:
        raise ValueError(
            f"input columns collide with html_extract outputs: {clash} — "
            "rename them before extraction"
        )
    out_schema = T.StructType(
        [
            *carry,
            T.StructField("title", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("n_blocks", T.IntegerType(), True),
            T.StructField("n_dropped", T.IntegerType(), True),
        ]
    )
    carry_names = [f.name for f in carry]

    def run(batches):
        import pyarrow as pa

        for b in batches:
            titles, texts, nb, nd = [], [], [], []
            for h in b.column(html_col).to_pylist():
                if h is None:
                    titles.append(None)
                    texts.append(None)
                    nb.append(0)
                    nd.append(0)
                    continue
                t, x, blk, d = extract_html(h)
                titles.append(t)
                texts.append(x)
                nb.append(blk)
                nd.append(d)
            yield pa.RecordBatch.from_arrays(
                [
                    *(b.column(c) for c in carry_names),
                    pa.array(titles, pa.string()),
                    pa.array(texts, pa.string()),
                    pa.array(nb, pa.int32()),
                    pa.array(nd, pa.int32()),
                ],
                names=[*carry_names, "title", "text", "n_blocks", "n_dropped"],
            )

    return df.mapInArrow(run, out_schema)


# --------------------------------------------------------------------------
# URL curation: canonicalization, host blocklists, URL-level dedup
# --------------------------------------------------------------------------
# The step BEFORE fetch/extract in a web pipeline (C4, RefinedWeb
# §3.1 "URL filtering"): canonicalize every URL, drop blocklisted
# hosts, dedup exact canonical URLs. All pure codegen expressions —
# at 100 TB this must ride the scan, not a UDF.
#
# Canonicalization = RFC 3986 §6.2 safe normalizations + tracking-
# param removal: lowercase scheme and authority (path/query stay
# case-significant per the RFC), drop the fragment, drop default
# ports (:80 http / :443 https), drop tracking query parameters
# (utm_*, fbclid, gclid, msclkid, ref). Path and parameter ORDER are
# preserved — reordering is not semantics-preserving in general.

# Case-insensitive (crawls carry UTM_SOURCE=...), and matched with or
# without a value (bare ?fbclid occurs) — but only as the WHOLE name:
# `reference=5` must not match `ref`.
_TRACKING_PARAM_RE = r"^(?i:utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL (see block comment above).
    NULL-safe; a string with no ``scheme://`` authority is returned
    with only fragment/tracking cleanup (best effort, never NULL).
    Userinfo keeps its case — RFC 3986 §6.2.2.1 makes only the scheme
    and host case-insensitive (review r12)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")  # fragment never reaches a server
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    tail = F.substr(u, F.length(head) + 1)
    # lowercase scheme and host:port, preserve userinfo verbatim (the
    # host cannot contain '@', so the LAST '@' in the authority ends
    # the userinfo)
    scheme = F.lower(F.regexp_extract(head, r"^([^:]+)://", 1))
    auth = F.regexp_extract(head, r"^[^:]+://(.*)$", 1)
    user = F.regexp_extract(auth, r"^(.*@)", 1)  # greedy: up to last @
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    head = F.when(
        head == "", head
    ).otherwise(F.concat(scheme, F.lit("://"), user, hostport))
    head = F.regexp_replace(
        head, r"^(https://(?:[^/?#]*@)?[^/:?#]+):443$", r"$1"
    )
    head = F.regexp_replace(
        head, r"^(http://(?:[^/?#]*@)?[^/:?#]+):80$", r"$1"
    )
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    qs = F.regexp_extract(tail, r"^[^?]*\?(.*)$", 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    q2 = F.array_join(kept, "&")
    base = F.concat(head, path)
    return F.when(q2 == "", base).otherwise(
        F.concat(base, F.lit("?"), q2)
    )


def url_host(col: Column | str) -> Column:
    """Lowercased host of an absolute URL (userinfo and port
    stripped); NULL when the string has no authority."""
    u = F.col(col) if isinstance(col, str) else col
    h = F.lower(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1
        )
    )
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def host_suffixes(host: Column) -> Column:
    """All registrable-suffix candidates of a host, most-specific
    first: ``www.a.example.com`` -> ``[www.a.example.com,
    a.example.com, example.com, com]``. The scale trick for blocklist
    matching: exploding these turns "host equals OR is a subdomain
    of a blocked domain" into an EQUI-join (hash join, broadcastable)
    instead of a broadcast nested-loop ``endswith`` join."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def host_blocklist_flag(
    df: DataFrame, url_col: str, blocked: DataFrame, flag_col: str = "blocked"
) -> DataFrame:
    """Append a boolean ``flag_col``: the URL's host equals or is a
    subdomain of any domain in ``blocked`` (one ``domain`` string
    column; RefinedWeb's curated-blocklist step).

    Plan, chosen for the 100 TB fact side (review r12 — the first cut
    exploded every fact row's suffix chain and grouped the FULL rows
    back, a corpus-wide shuffle): the match is decided per HOST, and
    distinct hosts are orders of magnitude fewer than rows, so (1)
    aggregate the pruned host column to its distinct set (map-side
    partial; the rescan reads ONE parquet column), (2) explode only
    those hosts' suffix chains into a semi-join against the broadcast
    blocklist — the blocklist is a caller-curated dimension, bounded
    by construction, so the hint is safe — and (3) join the resulting
    bad-host set back on the host VALUE (deterministic key, no
    synthetic row id). The bad-host side is data-dependent, so step 3
    carries NO broadcast hint: AQE measures it (micro-batches and
    typical corpora broadcast; an adversarial list degrades to a hash
    join, never a nested loop)."""
    from pyspark.sql.functions import broadcast

    host = url_host(url_col)
    hosts = (
        df.select(host.alias("__host"))
        .where(F.col("__host").isNotNull())
        .distinct()
    )
    sfx = hosts.select(
        "__host", F.explode(host_suffixes(F.col("__host"))).alias("__sfx")
    )
    b = broadcast(
        blocked.select(F.lower("domain").alias("__sfx")).dropDuplicates()
    )
    bad = (
        sfx.join(b, "__sfx", "left_semi")
        .select("__host")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    out = df.withColumn("__host", host).join(bad, "__host", "left")
    return out.withColumn(
        flag_col, F.coalesce("__hit", F.lit(False))
    ).drop("__host", "__hit")


def url_dedup(
    df: DataFrame, url_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Exact URL-level dedup on the canonical form: one row per
    canonical URL with the smallest-id keeper and the duplicate count
    (smallest-id-wins is the explicit policy, same as the text dedup
    family). One hash shuffle on the canonical string."""
    canon = canonicalize_url(url_col).alias("url_canon")
    return (
        df.select(canon, F.col(id_col))
        .groupBy("url_canon")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_dupes"),
        )
    )


# --------------------------------------------------------------------------
# line-level quality filters (RefinedWeb §3.3 / Dolma line-wise rules)
# --------------------------------------------------------------------------
def line_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    out_col: str = "text_clean",
) -> DataFrame:
    """Line-wise cleanup of extracted text — the published line rules
    between extraction and document-level filtering, in deterministic
    integer form so the whole pass is SQL-replayable:

    a line SURVIVES iff it has at least ``min_words`` whitespace
    words, is not ALL-CAPS shouting (equal to its uppercase while
    differing from its lowercase — a line with no letters is exempt),
    and is not digit-heavy (digit count x2 > length). Survivors
    rejoin in order under ``out_col``; ``n_lines`` / ``n_kept``
    report the pass. NULL text stays NULL with zero counts.

    Pure higher-order-function expressions (split / filter /
    array_join) — codegen, narrow, rides the scan like
    :func:`canonicalize_url`; at 100 TB this must never be a UDF.
    """
    nl = "\n"

    def _words(line: Column) -> Column:
        # WHITESPACE words, as documented — a tab-separated line must
        # count every column, not one word per space run (review r12)
        return F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))

    def _keep(line: Column) -> Column:
        digits = F.length(line) - F.length(
            F.regexp_replace(line, "[0-9]", "")
        )
        shouting = (line == F.upper(line)) & (line != F.lower(line))
        return (
            (_words(line) >= F.lit(int(min_words)))
            & ~shouting
            & ~(digits * 2 > F.length(line))
        )

    lines = F.split(F.col(text_col), nl)
    kept = F.filter(lines, _keep)
    is_null = F.col(text_col).isNull()

    def _count(arr: Column) -> Column:
        # explicit NULL guard: under ANSI, size(NULL) is NULL, and the
        # contract is "missing text -> zero lines", not unknown
        return F.when(is_null, F.lit(0)).otherwise(F.size(arr)).cast("long")

    return df.select(
        "*",
        F.array_join(kept, nl).alias(out_col),
        _count(lines).alias("n_lines"),
        _count(kept).alias("n_kept"),
    )


# --------------------------------------------------------------------------
# WARC record parsing — the container format upstream of HTML extraction
# --------------------------------------------------------------------------
# Web crawls ship as WARC/1.0 files (ISO 28500: CommonCrawl's format) —
# concatenated records, each a version line, CRLF-terminated named
# headers, a blank line, then exactly Content-Length payload octets,
# then two CRLFs. The parser below is the strict core of that grammar:
#
# - record boundaries are found by ADVANCING Content-Length bytes,
#   never by searching for the next "WARC/1.0" marker — a payload that
#   CONTAINS a record-start line (trap pinned in the gate) must stay
#   one payload. All offset arithmetic runs on UTF-8 octets, matching
#   the octet semantics of Content-Length;
# - `application/http` response payloads split once more at the first
#   blank line into status line + HTTP headers vs body (the part the
#   extraction pipeline wants); other record kinds (warcinfo, request,
#   metadata) pass their payload through with a NULL http_status;
# - malformed input (missing version line, unterminated header block,
#   truncated payload, unparseable Content-Length) raises ValueError —
#   the engine's fail-loudly convention; a crawl shard that parses
#   halfway is a silent-partial extract, the reference bug this repo
#   deliberately does not replicate.
#
# Execution shape: one narrow Arrow-batched ``mapInPandas`` pass, one
# input blob -> many record rows, no shuffle, no driver involvement.
# At 100 TB the unit of work is a WARC FILE (CommonCrawl: ~1 GB each,
# read whole via binaryFile/wholetext so records never straddle a task
# boundary — the same per-file guarantee real WARC readers rely on);
# the gate's fixture assembles blob "files" from the corpus at ingest,
# which stands in for that file layout, not for the operator.

_WARC_VERSION = b"WARC/1.0\r\n"


def parse_warc(blob: str) -> list[dict]:
    """Parse one WARC blob into record dicts — driver-side unit and
    the single implementation the distributed face wraps. Keys:
    ``record_id, warc_type, target_uri, warc_date, http_status,
    content_length, body``."""
    b = blob.encode("utf-8")
    n = len(b)
    out: list[dict] = []
    i = 0
    while i < n:
        while b.startswith(b"\r\n", i):  # inter-record CRLFs
            i += 2
        if i >= n:
            break
        if not b.startswith(_WARC_VERSION, i):
            raise ValueError(f"malformed WARC: no version line at offset {i}")
        i += len(_WARC_VERSION)
        end = b.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError("malformed WARC: unterminated header block")
        headers: dict[str, str] = {}
        for line in b[i:end].split(b"\r\n"):
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"malformed WARC header line: {line[:80]!r}"
                )
            headers[name.strip().lower().decode("utf-8")] = value.strip().decode(
                "utf-8"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("malformed WARC: bad Content-Length") from exc
        payload = b[end + 4 : end + 4 + clen]
        if len(payload) != clen:
            raise ValueError(
                f"truncated WARC payload: want {clen}, have {len(payload)}"
            )
        i = end + 4 + clen
        status: int | None = None
        body = payload
        if headers.get("content-type", "").startswith("application/http"):
            hb_end = payload.find(b"\r\n\r\n")
            line_end = payload.find(b"\r\n")
            if hb_end < 0 or line_end < 0:
                raise ValueError("malformed HTTP payload in WARC record")
            parts = payload[:line_end].split(b" ")
            if len(parts) < 2 or not parts[1].isdigit():
                raise ValueError("malformed HTTP status line in WARC record")
            status = int(parts[1])
            body = payload[hb_end + 4 :]
        out.append(
            {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "http_status": status,
                "content_length": clen,
                "body": body.decode("utf-8"),
            }
        )
    return out


def warc_parse(df: DataFrame, blob_col: str = "warc") -> DataFrame:
    """WARC blobs -> record rows (one input row fans out to its record
    count). Every column except ``blob_col`` carries through; the seven
    record fields are appended (NULL blob yields zero records — a
    missing file, matching ``html_extract``'s missingness convention).

    One narrow Arrow-batched ``mapInPandas`` stage; see the section
    comment for grammar, strictness, and the 100 TB file-unit layout.
    """
    carry = [f for f in df.schema.fields if f.name != blob_col]
    reserved = {
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date",
        "http_status",
        "content_length",
        "body",
    }
    clash = sorted(reserved & {f.name for f in carry})
    if clash:
        raise ValueError(
            f"input columns collide with warc_parse outputs: {clash} — "
            "rename them before parsing"
        )
    out_schema = T.StructType(
        [
            *carry,
            T.StructField("record_id", T.StringType(), True),
            T.StructField("warc_type", T.StringType(), True),
            T.StructField("target_uri", T.StringType(), True),
            T.StructField("warc_date", T.StringType(), True),
            T.StructField("http_status", T.IntegerType(), True),
            T.StructField("content_length", T.LongType(), True),
            T.StructField("body", T.StringType(), True),
        ]
    )
    carry_names = [f.name for f in carry]
    rec_names = [
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date",
        "http_status",
        "content_length",
        "body",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list] = []
            for idx in range(len(pdf)):
                blob = pdf[blob_col].iloc[idx]
                if blob is None or (
                    isinstance(blob, float) and pd.isna(blob)
                ):
                    continue
                carried = [pdf[c].iloc[idx] for c in carry_names]
                for rec in parse_warc(blob):
                    rows.append(carried + [rec[k] for k in rec_names])
            yield pd.DataFrame(
                rows, columns=carry_names + rec_names
            ).astype(object)

    return df.mapInPandas(run, out_schema)


def gunzip_members(buf: bytes) -> bytes:
    """Decompress a MULTI-MEMBER gzip stream (RFC 1952 allows any
    number of concatenated members; CommonCrawl's ``.warc.gz`` files
    compress each record as its own member so readers can
    random-access records). stdlib zlib: one decompressobj per
    member, ``unused_data`` carries the next member's offset. Fails
    loudly on a non-gzip prefix or a truncated member — a shard that
    inflates halfway is a silent-partial crawl extract."""
    import zlib

    out: list[bytes] = []
    pos_total = 0
    while buf:
        if buf[:2] != b"\x1f\x8b":
            raise ValueError(
                f"not a gzip member at stream offset {pos_total} "
                f"(magic {buf[:2]!r})"
            )
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        if not d.eof:
            raise ValueError(
                f"truncated gzip member at stream offset {pos_total}"
            )
        consumed = len(buf) - len(d.unused_data)
        pos_total += consumed
        buf = d.unused_data
    return b"".join(out)


def warc_parse_gz(df: DataFrame, blob_col: str = "warc_gz") -> DataFrame:
    """``.warc.gz`` → record rows: inflate the multi-member gzip
    stream (the CommonCrawl on-disk layout — one member per record or
    per record group), then the SAME strict ``parse_warc`` grammar as
    the uncompressed face. Two narrow Arrow stages (inflate →
    fan-out); nothing but the inflated text crosses between them. At
    100 TB the unit stays the whole ``.warc.gz`` file (binaryFile
    read), so members never straddle a task boundary."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def gunzip(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else gunzip_members(bytes(b)).decode("utf-8")
        )

    return warc_parse(
        df.withColumn(blob_col, gunzip(F.col(blob_col))), blob_col
    )


# --------------------------------------------------------------------------
# blocklist-word filtering (C4 §2.2's "bad words" page filter)
# --------------------------------------------------------------------------
def badword_stats(
    df: DataFrame,
    badwords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document blocklist-word accounting: ``(id, n_bad_tokens,
    flagged)`` — C4 drops any page containing a blocklisted word;
    the count supports softer policies (thresholds, per-domain
    overrides) from the same pass.

    Matching is on lowercased WHITESPACE TOKENS (word boundaries),
    never substrings — "class" must not trip a blocklist containing
    "ass". Pure codegen: the blocklist rides as an array literal and
    the count is one higher-order filter over the token array — no
    UDF, no shuffle, no join; at 100 TB this is a free rider on
    whatever scan already tokenizes the document.
    """
    if not badwords:
        raise ValueError("badwords must be non-empty")
    bw = sorted({w.lower() for w in badwords})
    from qb_data_pipeline_backfill_spark.operators.text import tokens

    toks = tokens(text_col)
    n_bad = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(bw), t))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_bad.alias("n_bad_tokens"),
        (n_bad > 0).alias("flagged"),
    )
