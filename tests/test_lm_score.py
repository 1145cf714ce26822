"""Char n-gram LM scorer: python-oracle equality, ranking sanity, plan law."""
import math
import re

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.lm_score import (
    fit_char_lm, lm_log_prob, perplexity, perplexity_filter)


def _norm(t):
    return re.sub(r"\s+", " ", (t or "").lower())


def _py_ngrams(t, n):
    t = _norm(t)
    return [t[i:i + n] for i in range(len(t) - n + 1)]


def _py_log_prob(t, model):
    k, v, n = model["add_k"], model["vocab_size"], model["n"]
    floor = math.log(k / (k * v))
    gs = _py_ngrams(t, n)
    if not gs:
        return floor
    tot = 0.0
    for g in gs:
        c = model["gram_counts"].get(g)
        if c is None:
            tot += floor
        else:
            tot += math.log((c + k) / (model["ctx_counts"][g[:n - 1]] + k * v))
    return tot / len(gs)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").persist()


def test_fit_matches_python_counts(spark, docs):
    model = fit_char_lm(docs, "text", n=2, max_vocab=100000)
    from collections import Counter
    cnt = Counter()
    for r in docs.collect():
        cnt.update(_py_ngrams(r["text"], 2))
    assert model["gram_counts"] == dict(cnt)


def test_log_prob_matches_python_oracle(spark, docs):
    model = fit_char_lm(docs, "text", n=2, max_vocab=100000)
    got = {r["doc_id"]: r["lp"] for r in docs.select(
        "doc_id", lm_log_prob(F.col("text"), model).alias("lp")).collect()}
    for r in docs.limit(50).collect():
        assert got[r["doc_id"]] == pytest.approx(
            _py_log_prob(r["text"], model), rel=1e-9), r["doc_id"]


def test_reference_like_text_scores_better_than_noise(spark, docs):
    model = fit_char_lm(docs, "text", n=2)
    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "xq zvv jjkw qqqx zzzp wvxz kkqj xxzz")],
        "i long, t string")
    ppl = {r["i"]: r["p"] for r in probe.select(
        "i", perplexity(F.col("t"), model).alias("p")).collect()}
    assert ppl[1] < ppl[2]


def test_perplexity_filter_keeps_head(spark, docs):
    model = fit_char_lm(docs, "text", n=2)
    with_ppl = docs.select(perplexity(F.col("text"), model).alias("p"))
    cutoff = with_ppl.agg(F.expr("percentile(p, 0.5)")).first()[0]
    kept = perplexity_filter(docs, model, max_perplexity=cutoff).count()
    assert 0 < kept <= docs.count()
    assert kept >= docs.count() * 0.4  # ~half the corpus is below the median


def test_trigram_order_works(spark, docs):
    model = fit_char_lm(docs.limit(50), "text", n=3, max_vocab=50000)
    row = docs.limit(5).select(
        "doc_id", lm_log_prob(F.col("text"), model).alias("lp")).collect()
    for r in row:
        assert r["lp"] == pytest.approx(
            _py_log_prob(docs.where(F.col("doc_id") == r["doc_id"])
                         .first()["text"], model), rel=1e-9)


def test_scoring_is_codegen_only(spark, docs):
    model = fit_char_lm(docs.limit(20), "text", n=2, max_vocab=2000)
    out = docs.select(lm_log_prob(F.col("text"), model).alias("lp"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ascii_fold_and_normalize_unicode(spark):
    from pyspark.sql import functions as F

    from transmogrifai_spark.llm.textqual import (ascii_fold,
                                                  normalize_unicode)
    rows = [("Café “naïve” — œuvre…",),
            ("ZERO​WIDTH   SPACE",),
            ("straße ﬁne",),
            ("plain ascii stays",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    got = [r[0] for r in df.select(ascii_fold(F.col("t"))).collect()]
    assert got[0] == 'Cafe "naive" - oeuvre...'
    assert got[1] == "ZEROWIDTH   SPACE"
    assert got[2] == "strasse fine"
    assert got[3] == "plain ascii stays"
    assert got[4] is None
    # idempotence law
    twice = [r[0] for r in
             df.select(ascii_fold(ascii_fold(F.col("t")))).collect()]
    assert twice == got
    # full NFKC via the Arrow boundary == CPython unicodedata
    import unicodedata
    nk = normalize_unicode(df, "t", "NFKC", out_col="n")
    for r in nk.collect():
        exp = None if r["t"] is None else unicodedata.normalize("NFKC", r["t"])
        assert r["n"] == exp
    import pytest
    with pytest.raises(ValueError):
        normalize_unicode(df, "t", "NFX")
