"""curate_corpus: composed recipe == manually chained stages; dedup laws."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.decontam import decontaminate
from transmogrifai_spark.llm.dedup import exact_dedup
from transmogrifai_spark.llm.lm_score import fit_char_lm
from transmogrifai_spark.llm.pipeline import curate_corpus, dedup_keep_one
from transmogrifai_spark.llm.quality_rules import quality_filter


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


def test_dedup_keep_one_exact(spark, docs):
    # duplicate the corpus under new ids: every original must survive, every
    # clone must be dropped (representative = min id)
    n = docs.count()
    cloned = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10**6))
    kept = dedup_keep_one(cloned, "doc_id", "text", method="exact")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept.count() == n
    assert all(i < 10**6 for i in ids)


def test_dedup_keep_one_minhash_collapses_exact_copies(spark, docs):
    small = docs.limit(60)
    n = small.count()
    cloned = small.union(small.withColumn("doc_id", F.col("doc_id") + 10**6))
    kept = dedup_keep_one(cloned, "doc_id", "text", method="minhash")
    # identical docs share every band -> clones always collapse; near-dup
    # merges may collapse more, never fewer
    assert kept.count() <= n
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(i < 10**6 for i in ids)


def test_curate_corpus_equals_manual_chain(spark, docs):
    eval_df = docs.where(F.col("doc_id") % 17 == 0)
    out = curate_corpus(docs, rules="gopher", eval_df=eval_df, decontam_n=8,
                        dedup="exact", mixture={"en": 1.0, "fr": 0.5})
    # manual chain, same order
    m = docs.join(quality_filter(docs, "doc_id", "text").where("keep")
                  .select("doc_id"), "doc_id", "left_semi")
    m = decontaminate(m, eval_df, "doc_id", "text", n=8)
    m = dedup_keep_one(m, "doc_id", "text", "exact")
    from transmogrifai_spark.llm.curation import mix_corpora
    m = mix_corpora(m, "doc_id", "lang", {"en": 1.0, "fr": 0.5})
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in m.select("doc_id").collect())


def test_curate_corpus_report_monotone(spark, docs):
    eval_df = docs.where(F.col("doc_id") % 17 == 0)
    model = fit_char_lm(docs, "text", n=2)
    out, rep = curate_corpus(docs, eval_df=eval_df, decontam_n=8,
                             lm_model=model, max_perplexity=1e9,
                             report=True)
    names = list(rep)
    assert names[0] == "input" and rep["input"] == docs.count()
    vals = list(rep.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # stages only shrink
    assert out.count() == vals[-1]


def test_curate_corpus_stages_optional(spark, docs):
    out = curate_corpus(docs, rules=None, eval_df=None, dedup=None)
    assert out.count() == docs.count()


def test_diversity_sample_quota_and_determinism(spark):
    from transmogrifai_spark.llm.curation import diversity_sample
    from transmogrifai_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    id_col, vec_col = "vec_id", "embedding"
    out = diversity_sample(emb, id_col, vec_col, n_clusters=4,
                           per_cluster=10, keep_cluster_col=True)
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["_cell"]] = per.get(r["_cell"], 0) + 1
    assert per and all(n <= 10 for n in per.values())
    # count law: every cluster contributes min(size, quota)
    sizes = {r["_cell"]: r["n"] for r in
             diversity_sample(emb, id_col, vec_col, n_clusters=4,
                              per_cluster=10**9, keep_cluster_col=True)
             .groupBy("_cell").agg(F.count("*").alias("n")).collect()}
    assert sum(per.values()) == sum(min(s, 10) for s in sizes.values())
    # determinism across layouts
    again = diversity_sample(emb.repartition(7), id_col, vec_col,
                             n_clusters=4, per_cluster=10)
    assert sorted(r[id_col] for r in again.select(id_col).collect()) == \
        sorted(r[id_col] for r in out.select(id_col).collect())


def test_curate_corpus_blocklist_and_boilerplate_stages(spark, docs):
    from transmogrifai_spark.llm.pipeline import curate_corpus
    from pyspark.sql import functions as F

    footer = "Subscribe to our excellent newsletter today friends."
    noisy = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(f"\n\n{footer}")))
    out, rep = curate_corpus(noisy, rules=None, eval_df=None, dedup=None,
                             boilerplate_min_doc_freq=2, report=True)
    assert "boilerplate_paragraphs" in rep
    assert out.filter(F.col("text").contains("Subscribe to our")).count() == 0
    assert rep["boilerplate_paragraphs"] == rep["input"]  # docs kept

    out2 = curate_corpus(noisy, rules=None, eval_df=None, dedup=None,
                         blocklist=["zzzunseen"])
    assert out2.count() == noisy.count()                 # no hits -> no drops


def test_curate_corpus_quality_and_semantic_stages(spark, docs, sf_dir):
    """The supervised quality head and SemDeDup stages compose into the
    recipe == manually chained equivalents."""
    from transmogrifai_spark.llm.dedup import semantic_dedup
    from transmogrifai_spark.llm.quality_classifier import (
        pareto_quality_sample, train_quality_classifier)

    pos = docs.where(F.col("doc_id") % 3 == 0)
    neg = docs.where(F.col("doc_id") % 3 == 1)
    clf = train_quality_classifier(pos, neg, num_features=1 << 12)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    with_vec = docs.join(emb, "doc_id")

    out = curate_corpus(with_vec, rules=None, dedup=None,
                        quality_model=clf, pareto_alpha=9.0,
                        embedding_col="embedding", semantic_eps=0.9,
                        semantic_clusters=4)
    got = {r["doc_id"] for r in out.select("doc_id").collect()}

    manual = pareto_quality_sample(clf.score(with_vec, "text"),
                                   "doc_id", "quality_prob", alpha=9.0) \
        .drop("quality_prob")
    manual = semantic_dedup(manual, "doc_id", "embedding",
                            n_clusters=4, eps=0.9)
    want = {r["doc_id"] for r in manual.select("doc_id").collect()}
    assert got == want and got
    assert "quality_prob" not in out.columns
    # hard-threshold variant also composes
    out2 = curate_corpus(with_vec, rules=None, dedup=None,
                         quality_model=clf, min_quality_prob=0.5)
    want2 = clf.score(with_vec, "text") \
        .where(F.col("quality_prob") >= 0.5).drop("quality_prob")
    assert out2.count() == want2.count()


# ---------------------------------------------------------------------------
# expand_epochs / domain_reweight (epochs-per-domain mixture reweighting)
# ---------------------------------------------------------------------------

def _bucket(i, seed=42):
    return ((i % 1_000_000 + seed) * 2654435761) % 1_000_000


def _expected_epochs(ids, r, seed=42):
    """Python replica of the expand_epochs rule."""
    import math
    out = {}
    for i in ids:
        n = int(math.floor(r))
        thr = int(math.floor((r - math.floor(r)) * 1_000_000))
        if _bucket(i, seed) < thr:
            n += 1
        out[i] = n
    return out


def test_expand_epochs_exact_replication(spark):
    from transmogrifai_spark.llm.curation import expand_epochs
    ids = list(range(200))
    for r in (0.0, 0.37, 1.0, 2.0, 2.5, 3.999):
        df = spark.createDataFrame([(i, r) for i in ids], "id long, r double")
        rows = expand_epochs(df, "id", "r").select("id", "epoch", "n_epochs") \
            .collect()
        want = _expected_epochs(ids, r)
        got = {}
        for row in rows:
            got.setdefault(row.id, []).append(row.epoch)
            assert row.n_epochs == want[row.id]
        for i, n in want.items():
            assert sorted(got.get(i, [])) == list(range(1, n + 1)), (r, i)


def test_expand_epochs_fractional_matches_weighted_sample(spark):
    from transmogrifai_spark.llm.curation import expand_epochs, weighted_sample
    df = spark.createDataFrame([(i, 0.42) for i in range(500)],
                               "id long, w double")
    kept_ws = {r.id for r in weighted_sample(df, "id", "w").collect()}
    kept_ee = {r.id for r in expand_epochs(df, "id", "w").collect()}
    assert kept_ee == kept_ws


def test_expand_epochs_caps_runaway_factor(spark):
    from transmogrifai_spark.llm.curation import expand_epochs
    df = spark.createDataFrame([(1, 1e9)], "id long, r double")
    rows = expand_epochs(df, "id", "r", max_repeat=5).collect()
    assert len(rows) == 5 and all(r.repeat_factor == 5.0 for r in rows)


def test_domain_reweight_hits_target_shares(spark):
    from transmogrifai_spark.llm.curation import domain_reweight
    # observed: a=600, b=300, c=100 (+ dropped domain z)
    rows = [(i, "a") for i in range(600)] + \
           [(600 + i, "b") for i in range(300)] + \
           [(900 + i, "c") for i in range(100)] + \
           [(1000 + i, "z") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = domain_reweight(df, "id", "dom",
                          {"a": 1.0, "b": 1.0, "c": 2.0}, scale=1.0)
    counts = {r["dom"]: r["n"] for r in
              out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "z" not in counts
    total = sum(counts.values())
    # target shares 0.25/0.25/0.5 — deterministic-hash noise only
    assert abs(counts["a"] / total - 0.25) < 0.03
    assert abs(counts["b"] / total - 0.25) < 0.03
    assert abs(counts["c"] / total - 0.50) < 0.03
    # exact law: per-domain count == python replication of the rule
    import math
    for dom, n_d, ids in (("a", 600, range(600)),
                          ("b", 300, range(600, 900)),
                          ("c", 100, range(900, 1000))):
        r = (1.0 * ({"a": 1.0, "b": 1.0, "c": 2.0}[dom] / 4.0) * 1000) / n_d
        want = sum(_expected_epochs(ids, r).values())
        assert counts[dom] == want, dom


def test_domain_reweight_rejects_bad_shares(spark):
    import pytest as _pytest
    from transmogrifai_spark.llm.curation import domain_reweight
    df = spark.createDataFrame([(1, "a")], "id long, dom string")
    with _pytest.raises(ValueError):
        domain_reweight(df, "id", "dom", {})
    with _pytest.raises(ValueError):
        domain_reweight(df, "id", "dom", {"a": 0.0})


def test_curate_corpus_web_extract_stage(spark, docs):
    """html_col= runs llm/web extraction first: text_col is replaced by the
    boilerplate-free extraction, empty extractions drop, and the result
    equals manually chaining remove_boilerplate then the same recipe."""
    from transmogrifai_spark.llm.web import remove_boilerplate

    wrapped = docs.select(
        "doc_id", "lang",
        F.concat(F.lit('<body><p>'), F.col("text"),
                 F.lit('</p><div><a href="/x">nav link row</a></div>'
                       '</body>')).alias("html"))
    out, rep = curate_corpus(wrapped, html_col="html", rules="c4",
                             eval_df=None, dedup="exact", report=True)
    manual = wrapped.withColumn(
        "text", remove_boilerplate(F.col("html"))["text"]) \
        .where(F.length("text") > 0).drop("html")
    manual = curate_corpus(manual, rules="c4", eval_df=None, dedup="exact")
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in manual.select("doc_id").collect())
    assert "html" not in out.columns and "text" in out.columns
    assert rep["web_extract"] <= rep["input"]
    # the nav boilerplate never reaches the curated text
    assert not out.where(F.col("text").contains("nav link row")).count()


def test_curate_corpus_url_dedup_stage(spark, docs):
    """url_col=: one survivor (min id) per CANONICAL url — tracking params
    and fragments collapse; distinct pages survive."""
    withurl = docs.withColumn(
        "url",
        F.concat(F.lit("https://ex.com/p/"), (F.col("doc_id") % 100),
                 F.when(F.col("doc_id") % 2 == 0,
                        F.lit("?utm_source=a#x")).otherwise(F.lit(""))))
    out, rep = curate_corpus(withurl, url_col="url", rules=None,
                             eval_df=None, dedup=None, report=True)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # doc_id % 100 partitions docs into 100 canonical urls -> min id each
    import collections
    groups = collections.defaultdict(list)
    for r in docs.select("doc_id").collect():
        groups[r["doc_id"] % 100].append(r["doc_id"])
    assert ids == sorted(min(v) for v in groups.values())
    assert rep["url_dedup"] == len(ids)


def test_temperature_reweight_laws(spark, docs):
    from transmogrifai_spark.llm.curation import (domain_reweight,
                                                  temperature_reweight,
                                                  temperature_shares)
    # T=1: natural proportions -> every repeat factor == scale exactly
    t1 = temperature_reweight(docs, "doc_id", "lang", temperature=1.0)
    assert t1.select("repeat_factor").distinct().collect()[0][0] == 1.0
    assert t1.count() == docs.count()
    # higher T flattens: scarce-domain share rises, bulk-domain share falls
    s1 = temperature_shares(docs, "lang", 1.0)
    s5 = temperature_shares(docs, "lang", 5.0)
    scarce = min(s1, key=s1.get)
    bulk = max(s1, key=s1.get)
    assert s5[scarce] > s1[scarce] and s5[bulk] < s1[bulk]
    assert abs(sum(s5.values()) - 1.0) < 1e-12
    # flattening is monotone toward uniform
    spread = lambda s: max(s.values()) / min(s.values())
    assert spread(s5) < spread(s1)
    # composition law: temperature_reweight == domain_reweight(shares)
    a = temperature_reweight(docs, "doc_id", "lang", temperature=3.0)
    b = domain_reweight(docs, "doc_id", "lang",
                        temperature_shares(docs, "lang", 3.0))
    assert sorted(map(tuple, a.select("doc_id", "epoch").collect())) == \
        sorted(map(tuple, b.select("doc_id", "epoch").collect()))


def test_curate_corpus_url_dedup_null_urls_pass_through(spark, docs):
    """Advisory r6: documents whose canonical URL is NULL (missing WARC
    target_uri / unparseable scheme) must NOT be collapsed into one
    null-group survivor — they pass through the URL-dedup stage unchanged."""
    withurl = docs.withColumn(
        "url",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://ex.com/p/"),
                            (F.col("doc_id") % 10))))
    out, rep = curate_corpus(withurl, url_col="url", rules=None,
                             eval_df=None, dedup=None, report=True)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    null_ids = sorted(i for i in all_ids if i % 3 == 0)
    import collections
    groups = collections.defaultdict(list)
    for i in all_ids:
        if i % 3 != 0:
            groups[i % 10].append(i)
    want = sorted(null_ids + [min(v) for v in groups.values()])
    assert ids == want
    assert len(null_ids) > 1  # the regression is only visible with >1


def test_diversity_sample_explicit_centroids_python_mirror(spark):
    """r7: centroids= skips the KMeans fit — cells and the per-cell quota
    draw must match a pure-python replica (nearest centroid, ties to the
    lower cell; (hash_bucket, id) order; quota cut)."""
    from transmogrifai_spark.llm.curation import diversity_sample

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet") \
        .where(F.col("vec_id") < 200)
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    cents = [rows[0], rows[1], rows[2]]
    out = diversity_sample(emb, "vec_id", "embedding", per_cluster=20,
                           centroids=cents, keep_cluster_col=True)
    got = {(r["vec_id"], r["_cell"]) for r in out.collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def hb(i):
        return ((i % 1_000_000 + 42) * 2654435761) % 1_000_000

    cells = {}
    for i, v in rows.items():
        cells.setdefault(min(range(3), key=lambda c: (d2(v, cents[c]), c)),
                         []).append(i)
    want = {(i, c) for c, members in cells.items()
            for i in sorted(members, key=lambda i: (hb(i), i))[:20]}
    assert got == want and len(want) == sum(min(20, len(m))
                                            for m in cells.values())
