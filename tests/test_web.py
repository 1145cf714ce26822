"""Web preprocessing: HTML extraction vs a pure-Python regex mirror over
real documents, boilerplate block laws, URL canonicalization fixtures."""
import re

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm import web

_ENTITIES = (("&nbsp;", " "), ("&#160;", " "), ("&lt;", "<"), ("&#60;", "<"),
             ("&gt;", ">"), ("&#62;", ">"), ("&quot;", '"'), ("&#34;", '"'),
             ("&apos;", "'"), ("&#39;", "'"), ("&amp;", "&"), ("&#38;", "&"))
_BLOCK_RE = r"(?i)</?(?:%s)\b[^>]*>" % web.BLOCK_TAGS


def _py_noise(h):
    h = re.sub(r"(?s)<!--.*?-->", " ", h)
    h = re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", h)
    return re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", h)


def _py_decode(t):
    for s, d in _ENTITIES:
        t = t.replace(s, d)
    return t


def _py_extract(h):
    h = _py_noise(h)
    h = re.sub(_BLOCK_RE, "\n", h)
    h = re.sub(r"(?s)<[^>]*>", " ", h)
    h = _py_decode(h)
    h = re.sub(r"[ \t\r\f]+", " ", h)
    h = re.sub(r" ?\n ?", "\n", h)
    h = re.sub(r"\n+", "\n", h)
    return re.sub(r"^\s+|\s+$", "", h)


def _py_block_text(b):
    t = re.sub(r"(?s)<[^>]*>", " ", b)
    t = _py_decode(t)
    return re.sub(r"\s+", " ", t).strip()


def _py_boiler(h, max_ld=0.5, min_chars=10):
    blocks = []
    for b in re.split(_BLOCK_RE, _py_noise(h)):
        text = _py_block_text(b)
        if not text:
            continue
        alen = sum(len(_py_block_text(a))
                   for a in re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", b))
        blocks.append((text, alen / len(text)))
    kept = [t for t, ld in blocks
            if len(t) >= min_chars and ld <= max_ld]
    return "\n".join(kept), len(blocks), len(kept)


_WRAP = ('<html><head><title>Doc</title><script>if (1 < 2) alert("x");'
         '</script><style>.n{color:red}</style></head><body><h1>{H}</h1>'
         '<p>{T}</p><div><a href="/h">home page link</a> &middot; '
         '<a href="/a">about</a></div><p>&amp; &lt;raw&gt; &quot;quoted'
         '&quot; &nbsp;tail of this paragraph</p><!-- c --></body></html>')


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "source").persist())


def test_extract_matches_python_mirror_on_real_docs(spark, docs):
    rows = docs.select(
        "doc_id",
        F.concat(F.lit(_WRAP.split("{H}")[0]), F.col("source"),
                 F.lit(_WRAP.split("{H}")[1].split("{T}")[0]), F.col("text"),
                 F.lit(_WRAP.split("{T}")[1])).alias("html"))
    got = rows.select(
        "doc_id", "html",
        web.extract_html_text(F.col("html")).alias("clean"),
        web.remove_boilerplate(F.col("html")).alias("boiler")).collect()
    assert got
    for r in got:
        assert r["clean"] == _py_extract(r["html"])
        text, nb, nk = _py_boiler(r["html"])
        assert (r["boiler"]["text"], r["boiler"]["n_blocks"],
                r["boiler"]["n_kept"]) == (text, nb, nk)
        # the nav div (high link density) must actually be boilerplate
        assert "home page link" in r["clean"]
        assert "home page link" not in r["boiler"]["text"]


def test_html_blocks_link_density(spark):
    html = ('<body><p>A paragraph that is definitely long enough.</p>'
            '<div><a href="x">all of this text is one link</a></div>'
            '<p>half <a href="y">linked tail here</a></p></body>')
    bl = (spark.createDataFrame([(html,)], "h string")
          .select(F.explode(web.html_blocks(F.col("h"))).alias("b"))
          .collect())
    by_text = {r["b"]["text"]: r["b"]["link_density"] for r in bl}
    assert by_text["A paragraph that is definitely long enough."] == 0.0
    assert by_text["all of this text is one link"] == 1.0
    half = by_text["half linked tail here"]
    assert 0.5 < half < 1.0  # "linked tail here" / "half linked tail here"


def test_extract_edge_cases(spark):
    cases = [
        ("", ""),
        ("no markup at all", "no markup at all"),
        ("<p>a</p><p></p><p>b</p>", "a\nb"),
        ("&amp;lt; stays encoded once", "&lt; stays encoded once"),
        ("<SCRIPT>gone()</SCRIPT>ok", "ok"),
        ("<br>x<BR/>y", "x\ny"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r[0] for r in
           df.select(web.extract_html_text(F.col("h"))).collect()]
    assert got == [e for _, e in cases]


def test_canonicalize_url_fixtures(spark):
    cases = [
        ("HTTP://Example.COM:80/a/b?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://WWW.BBC.CO.UK:443", "https://www.bbc.co.uk/"),
        ("https://site.com/p?fbclid=abc", "https://site.com/p"),
        ("https://site.com/p?", "https://site.com/p"),
        ("https://h.io:8080/x?b=1&a=2", "https://h.io:8080/x?a=2&b=1"),
        ("  https://pad.io/x  ", "https://pad.io/x"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(web.canonicalize_url(F.col("u"))).collect()]
    assert got == [e for _, e in cases]
    # idempotence law: canon(canon(u)) == canon(u)
    twice = [r[0] for r in df.select(
        web.canonicalize_url(web.canonicalize_url(F.col("u")))).collect()]
    assert twice == got


def test_url_host_and_domain(spark):
    cases = [
        ("https://user@Host.co.uk:444/p", "host.co.uk", "host.co.uk"),
        ("http://a.b.Example.com/x", "a.b.example.com", "example.com"),
        ("https://WWW.BBC.CO.UK/news", "www.bbc.co.uk", "bbc.co.uk"),
        ("http://localhost:8080/", "localhost", "localhost"),
        ("nonsense", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "u string")
    got = df.select(web.url_host(F.col("u")).alias("h"),
                    web.url_domain(F.col("u")).alias("d")).collect()
    assert [(r["h"], r["d"]) for r in got] == \
        [(h, d) for _, h, d in cases]


def test_no_python_udf_in_plans(spark, docs):
    from transmogrifai_spark.util import plan_audit
    out = docs.select(
        web.canonicalize_url(F.col("text")).alias("c"),
        web.extract_html_text(F.col("text")).alias("t"),
        web.remove_boilerplate(F.col("text")).alias("b"))
    issues = plan_audit(out)
    assert not [i for i in issues if "udf" in i.lower()]


def test_html_meta(spark):
    html = ('<!DOCTYPE html><html lang="en-GB"><head><meta charset="UTF-8">'
            '<title> The &amp; Title </title>'
            '<meta content="swapped order desc" name="description">'
            '<link rel="canonical" href="https://ex.com/x">'
            '<meta name="robots" content="NOINDEX, nofollow"></head>'
            '<body></body></html>')
    got = (spark.createDataFrame([(html,), ("<p>no head</p>",)], "h string")
           .select(web.html_meta(F.col("h")).alias("m")).collect())
    m = got[0]["m"]
    assert m["title"] == "The & Title"
    assert m["description"] == "swapped order desc"
    assert m["canonical"] == "https://ex.com/x"
    assert m["charset"] == "utf-8"
    assert m["lang"] == "en-gb"
    assert m["robots"] == "noindex, nofollow"
    assert tuple(got[1]["m"]) == ("", "", "", "", "", "")
