"""Web-corpus preprocessing: HTML -> text extraction, link-density
boilerplate removal, and URL canonicalization — the step between a raw web
crawl (WARC/HTML payloads) and every other operator in ``llm/``
(dedup, quality rules, LM scoring all assume extracted text).

Reference surface: TransmogrifAI tokenizes and vectorizes *already-clean*
text (core/src/main/scala/com/salesforce/op/stages/impl/feature/
TextTokenizer.scala, OpStopWordsRemover) and parses URLs only for
validity/domain (features/src/main/scala/com/salesforce/op/features/types/
OPVector.scala siblings: URL type's ``domain``/``protocol`` in
features/.../types/Text.scala). It has no crawl-cleaning layer — at 100 TB
the cleaning IS the pipeline's first bottleneck, so this module provides it
Spark-first.

Design (100 TB):

* Everything is a pure Catalyst column expression — regexp_replace /
  split / transform / filter / aggregate. One linear scan per document,
  whole-stage codegen, NO Python in the hot path, no shuffle at all for
  extraction (a document's blocks are processed as an in-row array, not
  exploded).
* The regex subset is deliberately engine-portable (no lookarounds, no
  backreferences): the same patterns run under Java regex (Spark), RE2
  (DuckDB/Go), and Python ``re`` — which is what lets the whole
  extraction pipeline be oracle-gated op-for-op against DuckDB and
  law-tested against a pure-Python mirror.
* Boilerplate removal is jusText-lite (Pomikalek 2011): a block is kept
  iff its extracted text is long enough AND its link density (anchor-text
  chars / text chars) is under a threshold. The full jusText algorithm
  adds stopword-density classes and context smoothing; this is the
  documented delta (PARITY.md).
* Entity decoding covers the named entities that dominate real HTML
  (nbsp, amp, lt, gt, quot, apos + their numeric forms); arbitrary
  ``&#NNN;`` code points would need a per-match chr() (not expressible as
  a fixed replace chain) and are left encoded — documented delta.

Limitations (documented, shared with every regex-based extractor):
unclosed ``<script>``/``<style>`` blocks leak their source as text;
CDATA sections are treated as text; ``<`` in plain text followed by ``>``
within the document is eaten as a tag. Real-world rates are low and the
failure is local to the document.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "strip_html_noise", "extract_html_text", "html_blocks",
    "remove_boilerplate", "canonicalize_url", "url_host", "url_domain",
    "extract_links", "resolve_href", "html_meta", "domain_authority", "BLOCK_TAGS", "TRACKING_PARAMS",
    "ENTITY_PAIRS",
]

# tags that terminate a text block (block-level or line-breaking)
BLOCK_TAGS = ("p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|tr|td|th|"
              "table|thead|tbody|blockquote|pre|section|article|header|"
              "footer|nav|aside|form|figure|figcaption|main|title")
_BLOCK_RE = r"(?i)</?(?:%s)\b[^>]*>" % BLOCK_TAGS
_TAG_RE = r"(?s)<[^>]*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"

# query parameters that never change page content (tracking/attribution)
TRACKING_PARAMS = ("fbclid", "gclid", "gclsrc", "dclid", "msclkid",
                   "mc_cid", "mc_eid", "igshid", "yclid", "wbraid",
                   "gbraid", "_ga", "_gl")

# decoded entity table, in application order (&amp; LAST — see
# _decode_entities); public so the SQL oracle mirrors the exact chain
ENTITY_PAIRS = (("&nbsp;", " "), ("&#160;", " "),
                ("&lt;", "<"), ("&#60;", "<"),
                ("&gt;", ">"), ("&#62;", ">"),
                ("&quot;", '"'), ("&#34;", '"'),
                ("&apos;", "'"), ("&#39;", "'"),
                ("&amp;", "&"), ("&#38;", "&"))

# two-part public suffixes common enough to matter for registrable-domain
# grouping; a full Public Suffix List is a data asset, not logic — delta
# documented in PARITY.md
_TWO_LEVEL_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def strip_html_noise(c: Column) -> Column:
    """Remove comments, ``<script>`` and ``<style>`` elements (tags AND
    content). Run before any text extraction so script bodies never leak
    into block text."""
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    return c


def _decode_entities(c: Column) -> Column:
    """Decode the dominant HTML entities. ``&amp;`` is decoded LAST so
    double-encoded forms (``&amp;lt;``) resolve in one pass exactly like
    a single-level decoder: ``&amp;lt;`` -> ``&lt;`` stays as the literal
    the author wrote."""
    for src, dst in ENTITY_PAIRS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _clean_ws(c: Column) -> Column:
    """Collapse runs of spaces/tabs, trim around newlines, collapse newline
    runs, strip leading/trailing whitespace."""
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def _block_text(b: Column) -> Column:
    """Extracted text of one block: strip tags, decode entities, collapse
    whitespace."""
    t = F.regexp_replace(b, _TAG_RE, " ")
    t = _decode_entities(t)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def extract_html_text(c: Column) -> Column:
    """Plain text of an HTML document: noise stripped, block tags become
    newlines, inline tags become spaces, entities decoded, whitespace
    normalized. Pure expression — one codegen'd scan per document."""
    c = strip_html_noise(c)
    c = F.regexp_replace(c, _BLOCK_RE, "\n")
    c = F.regexp_replace(c, _TAG_RE, " ")
    c = _decode_entities(c)
    return _clean_ws(c)


def html_blocks(c: Column) -> Column:
    """Split an HTML document into text blocks with link-density metadata:
    ``array<struct<text string, link_density double>>``, empty blocks
    dropped. Link density = (chars of text inside ``<a>`` elements) /
    (chars of the block's whole text) — the jusText boilerplate signal.
    In-row array processing: NO explode, NO shuffle."""
    from ..util import bind_once

    raw = F.split(strip_html_noise(c), _BLOCK_RE)

    def per_block(b):
        anchors = F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1)
        alen = F.aggregate(anchors, F.lit(0),
                           lambda acc, a: acc + F.length(_block_text(a)))

        # the block's stripped text is referenced three times (two
        # lengths + the output field) — bound once per block, or the
        # whole _block_text regex chain re-runs per reference
        def with_text(text):
            ld = F.when(F.length(text) > 0,
                        alen.cast("double") / F.length(text).cast("double")) \
                  .otherwise(F.lit(0.0))
            return F.struct(text.alias("text"), ld.alias("link_density"))

        return bind_once(_block_text(b), with_text)

    return F.filter(F.transform(raw, per_block),
                    lambda s: s["text"] != "")


def remove_boilerplate(c: Column, max_link_density: float = 0.5,
                       min_chars: int = 10) -> Column:
    """jusText-lite boilerplate removal:
    ``struct<text string, n_blocks int, n_kept int>`` where ``text`` is the
    newline-joined content of blocks that are long enough
    (``>= min_chars``) and link-sparse (``link_density <=
    max_link_density``). Nav bars, footers, and link farms drop; body
    paragraphs stay. Pure expression, no shuffle."""
    from ..util import bind_once

    # blocks bound once, kept blocks bound once: ``bl`` (the whole
    # split + per-block regex machinery) was referenced twice and
    # ``kept`` twice more — four re-evaluations per row in interpreted
    # HOF mode
    def with_blocks(bl: Column) -> Column:
        kept = F.filter(
            bl, lambda s: (F.length(s["text"]) >= min_chars)
            & (s["link_density"] <= F.lit(float(max_link_density))))
        return bind_once(kept, lambda k: F.struct(
            F.array_join(F.transform(k, lambda s: s["text"]), "\n")
             .alias("text"),
            F.size(bl).alias("n_blocks"),
            F.size(k).alias("n_kept")))

    return bind_once(html_blocks(c), with_blocks)


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------


def _authority(c: Column) -> Column:
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    return F.regexp_extract(rest, r"^([^/?#]*)", 1)


def canonicalize_url(c: Column) -> Column:
    """Canonical form of an absolute URL for dedup/grouping:

    * scheme and host lowercased; default ports (``:80`` http, ``:443``
      https) stripped; fragment stripped;
    * empty path becomes ``/``;
    * query parameters: tracking params removed (``utm_*`` prefixes and
      ``TRACKING_PARAMS``), the rest SORTED so param order cannot split a
      URL's identity; an emptied query drops its ``?``.

    URLs without a ``scheme://`` are returned trimmed but otherwise
    untouched (relative links carry no canonical authority). Pure
    expression; idempotent (law-tested)."""
    u = F.regexp_replace(F.trim(c), r"(?s)#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://",
                                      1))
    auth = F.lower(_authority(u))
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")) \
            .when(scheme == "https", F.regexp_replace(auth, r":443$", "")) \
            .otherwise(auth)
    pathq = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""),
        r"^[^/?#]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"(?s)\?(.*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).startswith("utm_")
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(
            *TRACKING_PARAMS))
    q2 = F.array_join(F.array_sort(params), "&")
    canon = F.concat(scheme, F.lit("://"), auth, path,
                     F.when(q2 == "", F.lit(""))
                      .otherwise(F.concat(F.lit("?"), q2)))
    return F.when(scheme == "", F.trim(c)).otherwise(canon)


def url_host(c: Column) -> Column:
    """Lowercased host of an absolute URL (userinfo and port stripped);
    NULL-safe: non-URLs yield ''."""
    u = F.trim(c)
    auth = F.lower(_authority(u))
    host = F.regexp_extract(auth, r"^(?:[^@]*@)?([^:]*)", 1)
    has_scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://",
                                  1) != ""
    return F.when(has_scheme, host).otherwise(F.lit(""))


def url_domain(c: Column) -> Column:
    """Registrable-domain approximation of a URL's host: the last two
    labels, or three when the second-to-last is a common second-level
    suffix under a 2-letter ccTLD (``bbc.co.uk`` -> ``bbc.co.uk``,
    ``a.b.example.com`` -> ``example.com``). A full Public Suffix List is
    a data asset; this covers the dominant cases (delta in PARITY.md)."""
    host = url_host(c)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    three = (n >= 3) & (F.length(last) == 2) & second.isin(*_TWO_LEVEL_SLD)
    tail = F.when(three, F.slice(labels, n - 2, 3)) \
            .otherwise(F.when(n >= 2, F.slice(labels, n - 1, 2))
                       .otherwise(labels))
    return F.array_join(tail, ".")


# ---------------------------------------------------------------------------
# Links — the web-graph layer (feeds operators/graph.pagerank)
# ---------------------------------------------------------------------------

_HREF_DQ = r'(?is)<a\b[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
_HREF_SQ = r"(?is)<a\b[^>]*?href\s*=\s*'([^']*)'[^>]*>(.*?)</a>"
# schemes that are links but not documents
_NON_HTTP = r"(?i)^(javascript|mailto|tel|data):"


def resolve_href(href: Column, base: Column) -> Column:
    """Resolve an href against its page URL, RFC-3986-lite:

    * absolute (``scheme://…``) -> unchanged;
    * protocol-relative (``//host/x``) -> base scheme + href;
    * root-relative (``/x``) -> base ``scheme://authority`` + href;
    * plain relative -> base directory (last path segment dropped) + href
      — WITHOUT ``..`` normalization (documented delta; dot-segments
      survive into the URL and hash as distinct, never wrong-host).
    """
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    auth = _authority(base)
    origin = F.concat(scheme, F.lit("://"), auth)
    b = F.regexp_replace(base, r"(?s)[?#].*", "")
    # base directory: everything through the last '/' AFTER the authority
    # (a bare 'scheme://host' gains its trailing '/')
    bdir = F.when(
        F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*$", 0) != "",
        F.concat(b, F.lit("/"))) \
        .otherwise(F.regexp_replace(b, r"[^/]*$", ""))
    return (F.when(F.regexp_extract(href, r"^[A-Za-z][A-Za-z0-9+.\-]*://",
                                    0) != "", href)
            .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
            .when(href.startswith("/"), F.concat(origin, href))
            .otherwise(F.concat(bdir, href)))


def extract_links(c: Column, base: Column | None = None) -> Column:
    """Hyperlinks of an HTML document:
    ``array<struct<url string, anchor string>>`` from ``<a href=…>``
    elements (double- AND single-quoted attributes), anchor text extracted
    like a block (tags stripped, entities decoded). ``javascript:`` /
    ``mailto:`` / ``tel:`` / ``data:`` and empty/fragment-only hrefs are
    dropped. With ``base``, urls are resolved via ``resolve_href``.
    Pure expression — no explode, no shuffle; feed the result to
    ``operators/graph.pagerank`` via a host-level groupBy."""
    from ..util import bind_once

    # the noise-stripped document is referenced four times (two regex
    # pulls per quoting style) — bound once per row, or the whole
    # strip_html_noise regex chain re-runs per reference
    def with_cleaned(cleaned: Column) -> Column:
        def pairs(pat):
            urls = F.regexp_extract_all(cleaned, F.lit(pat), 1)
            anchors = F.regexp_extract_all(cleaned, F.lit(pat), 2)
            return F.zip_with(
                urls, anchors,
                lambda u, a: F.struct(F.trim(u).alias("url"),
                                      _block_text(a).alias("anchor")))

        links = F.concat(pairs(_HREF_DQ), pairs(_HREF_SQ))
        links = F.filter(
            links, lambda s: (s["url"] != "") & ~s["url"].startswith("#")
            & (F.regexp_extract(s["url"], _NON_HTTP, 0) == ""))
        if base is not None:
            links = F.transform(
                links, lambda s: F.struct(
                    resolve_href(s["url"], base).alias("url"),
                    s["anchor"].alias("anchor")))
        return links

    return bind_once(strip_html_noise(c), with_cleaned)


def _attr_meta(c: Column, tag: str, key_attr: str, key: str,
               val_attr: str) -> Column:
    """First ``<tag … key_attr="key" … val_attr="…">`` value, tolerating
    either attribute order (double-quoted attributes — delta documented
    in html_meta)."""
    fwd = (rf'(?is)<{tag}\b[^>]*\b{key_attr}\s*=\s*"{key}"'
           rf'[^>]*\b{val_attr}\s*=\s*"([^"]*)"')
    rev = (rf'(?is)<{tag}\b[^>]*\b{val_attr}\s*=\s*"([^"]*)"'
           rf'[^>]*\b{key_attr}\s*=\s*"{key}"')
    f = F.regexp_extract(c, fwd, 1)
    return F.when(f != "", f).otherwise(F.regexp_extract(c, rev, 1))


def html_meta(c: Column) -> Column:
    """Document metadata from the HTML head:
    ``struct<title, description, canonical, charset, lang, robots>``
    (absent fields are ``''``). Title text is block-normalized (tags
    stripped, entities decoded); meta/link attributes match in either
    order. Delta: double-quoted attribute values only (the dominant form;
    single-quoted/unquoted attributes yield ''). Pure expression."""
    title = _block_text(
        F.regexp_extract(c, r"(?is)<title\b[^>]*>(.*?)</title>", 1))
    return F.struct(
        title.alias("title"),
        _attr_meta(c, "meta", "name", "description", "content")
        .alias("description"),
        _attr_meta(c, "link", "rel", "canonical", "href").alias("canonical"),
        F.lower(F.regexp_extract(
            c, r'(?is)<meta\b[^>]*\bcharset\s*=\s*"?([A-Za-z0-9_\-]+)', 1))
        .alias("charset"),
        F.lower(F.regexp_extract(
            c, r'(?is)<html\b[^>]*\blang\s*=\s*"([^"]*)"', 1)).alias("lang"),
        F.lower(_attr_meta(c, "meta", "name", "robots", "content"))
        .alias("robots"))


def domain_authority(docs, id_col: str, url_col: str, html_col: str,
                     iterations: int = 10, damping: float = 0.85,
                     portable: bool = False):
    """Per-document domain-authority prior from the corpus's own link
    graph (the CommonCrawl-ranking recipe, packaged): extract_links over
    every page -> host-level weighted edges -> operators/graph.pagerank ->
    each document joined to its host's rank. Returns
    ``(id_col, host, host_rank)`` — feed ``host_rank`` to
    llm/curation.weighted_sample or quality-weighted mixtures.

    Scale shape: link extraction rides the scan (pure expression); the
    edge aggregation is one groupBy of (src_host, dst_host); PageRank
    iterates over the HOST graph (millions of nodes at web scale, not
    documents); the final join broadcasts the rank table when hosts fit,
    else hash-joins on host."""
    from ..operators.graph import pagerank
    u = F.col(url_col)
    ldf = docs.select(F.col(id_col), u.alias("_u"),
                      F.explode(extract_links(F.col(html_col), u))
                      .alias("_l"))
    edges = ldf.select(url_host(F.col("_u")).alias("src"),
                       url_host(F.col("_l.url")).alias("dst")) \
               .where((F.col("src") != "") & (F.col("dst") != ""))
    ranks = pagerank(edges, iterations=iterations, damping=damping,
                     portable=portable) \
        .select(F.col("node").alias("host"), F.col("rank").alias("host_rank"))
    return (docs.select(F.col(id_col), url_host(u).alias("host"))
            .join(ranks, "host", "left")
            .select(id_col, "host",
                    F.coalesce("host_rank", F.lit(0.0)).alias("host_rank")))
