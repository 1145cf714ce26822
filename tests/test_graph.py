"""pagerank vs an exact pure-Python mirror (portable decimal mode) +
extract_links fixtures."""
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from transmogrifai_spark.llm import web
from transmogrifai_spark.operators.graph import pagerank

EDGES = [  # hub a; dangling d; weighted multi-edges
    ("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0),
    ("c", "d", 3.0), ("b", "d", 1.0), ("e", "a", 1.0),
]


def _round9(x):
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"),
                                           rounding=ROUND_HALF_UP))


def _py_pagerank(edges, iterations, damping=0.85):
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0.0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for (s, _), w in agg.items():
        outw[s] = outw.get(s, 0.0) + w
    frac = {k: w / outw[k[0]] for k, w in agg.items()}
    base = (1.0 - damping) / n
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dang = float(sum(Decimal(repr(_round9(rank[v])))
                         for v in nodes if v not in outw))
        s = {v: Decimal(0) for v in nodes}
        for (u, v), f in frac.items():
            s[v] += Decimal(repr(_round9(rank[u] * f)))
        rank = {v: base + damping * (float(s[v]) + dang / n)
                for v in nodes}
    return rank


def test_pagerank_portable_matches_python_mirror_bitwise(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight_col="w", iterations=5,
                             portable=True).collect()}
    exp = _py_pagerank(EDGES, iterations=5)
    assert got == exp  # bit-exact, incl. the dangling-mass path
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # 'a' receives from b, c, e -> must outrank the pure sink 'd'... both
    # collect mass; check ordering of source-only node instead
    assert got["e"] == min(got.values())  # nothing links to e


def test_pagerank_default_mode_close_and_sums_to_one(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    fast = {r["node"]: r["rank"]
            for r in pagerank(df, weight_col="w", iterations=5).collect()}
    exp = _py_pagerank(EDGES, iterations=5)
    assert abs(sum(fast.values()) - 1.0) < 1e-9
    assert all(abs(fast[k] - exp[k]) < 1e-7 for k in exp)


def test_pagerank_unweighted_uniform_cycle(spark):
    cyc = [("x", "y", None), ("y", "z", None), ("z", "x", None)]
    df = spark.createDataFrame([(s, d) for s, d, _ in cyc],
                               "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=7, portable=True).collect()}
    # portable mode rounds contributions at 9 dp, so the fixed point sits
    # within ~1e-9 of the exact 1/3
    assert all(abs(v - 1.0 / 3) < 1e-8 for v in got.values())


def test_extract_links_fixtures(spark):
    html = ('<body><a href="https://A.com/x?utm_source=s">one</a>'
            "<a href='/rel'>two <b>bold</b></a>"
            '<a href="//cdn.b.net/y">three</a>'
            '<a href="mailto:a@b.c">no</a>'
            '<a href="#frag">no</a>'
            '<a href="sub/page.html">four</a>'
            '<script><a href="https://evil.com/">gone</a></script></body>')
    df = spark.createDataFrame([(html, "https://host.org/dir/index.html")],
                               "h string, base string")
    rows = (df.select(F.explode(web.extract_links(
        F.col("h"), F.col("base"))).alias("l"))
            .select("l.url", "l.anchor").collect())
    got = {(r["url"], r["anchor"]) for r in rows}
    assert got == {
        ("https://A.com/x?utm_source=s", "one"),
        ("https://host.org/rel", "two bold"),
        ("https://cdn.b.net/y", "three"),
        ("https://host.org/dir/sub/page.html", "four"),
    }
    # without base: raw hrefs, same filtering
    raw = {r[0]["url"] for r in
           df.select(F.explode(web.extract_links(F.col("h")))).collect()}
    assert raw == {"https://A.com/x?utm_source=s", "/rel",
                   "//cdn.b.net/y", "sub/page.html"}


def test_resolve_href_bare_host_base(spark):
    df = spark.createDataFrame([("p.html", "https://h.io")], "h string, b string")
    assert df.select(web.resolve_href(F.col("h"), F.col("b"))).first()[0] \
        == "https://h.io/p.html"


def _py_hits(edges, iterations):
    import math
    E = sorted({(s, d) for s, d, _ in edges})
    nodes = sorted({s for s, _ in E} | {d for _, d in E})

    def dsum(vals):
        return float(sum(Decimal(repr(_round9(v))) for v in vals))

    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iterations):
        a = {v: dsum(hub[s] for s, d in E if d == v) for v in nodes}
        na = math.sqrt(dsum(a[v] * a[v] for v in nodes) or 1.0)
        auth = {v: a[v] / na for v in nodes}
        h = {v: dsum(auth[d] for s, d in E if s == v) for v in nodes}
        nh = math.sqrt(dsum(h[v] * h[v] for v in nodes) or 1.0)
        hub = {v: h[v] / nh for v in nodes}
    return hub, auth


def test_hits_portable_matches_python_mirror_bitwise(spark):
    from transmogrifai_spark.operators.graph import hits
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=4, portable=True).collect()}
    hub, auth = _py_hits(EDGES, iterations=4)
    assert got == {v: (hub[v], auth[v]) for v in hub}
    # 'a' is cited by b, c, e -> top authority; 'd' cites nothing -> 0 hub
    assert got["a"][1] == max(v[1] for v in got.values())
    assert got["d"][0] == 0.0


def test_connected_components_string_nodes(spark):
    from transmogrifai_spark.operators.graph import connected_components
    edges = [("a.com", "b.com"), ("b.com", "c.com"), ("x.org", "y.org"),
             ("lone1.net", "lone1.net")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
                   "x.org": "x.org", "y.org": "x.org",
                   "lone1.net": "lone1.net"}


def test_domain_authority_composition(spark, sf_dir):
    from transmogrifai_spark.llm.web import domain_authority
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source", "lang")
            .withColumn("url", F.concat(F.lit("https://"), F.col("source"),
                                        F.lit(".ex.com/p/"), F.col("doc_id")))
            .withColumn("html", F.concat(
                F.lit('<p><a href="https://hub-'), F.col("lang"),
                F.lit('.ex.org/">h</a> <a href="/self">s</a></p>'))))
    out = domain_authority(docs, "doc_id", "url", "html", iterations=3)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_host = {r["host"]: r["host_rank"] for r in rows}
    # every doc host has out-links -> positive rank; ranks from ONE graph:
    # a doc's rank equals its host's rank everywhere
    assert all(r["host_rank"] > 0 for r in rows)
    assert all(r["host_rank"] == by_host[r["host"]] for r in rows)
