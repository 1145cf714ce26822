"""Statistical NB language-ID: accuracy, python mirror, determinism.

Reference: core/src/main/scala/com/salesforce/op/utils/text/
OptimaizeLanguageDetector.scala:33 (n-gram Naive Bayes) — same model
family, trained from the labeled corpus instead of shipped profiles.

The testdata documents table's ``lang`` label is uncorrelated with its
synthetic English-ish text (verified: identical vocabulary across
labels), so predictive accuracy is asserted on a REAL multilingual
fixture built here; the python-mirror law runs on the real table (it
gates arithmetic, not separability).
"""
import math
import re

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.langid_nb import (nb_language_id,
                                               nb_language_scores,
                                               train_language_classifier)

_SENTS = {
    "en": "the quick brown fox jumps over the lazy dog and runs through "
          "the green fields while children watch from their windows",
    "fr": "le renard brun saute par dessus le chien paresseux et court à "
          "travers les champs verts pendant que les enfants regardent",
    "de": "der schnelle braune fuchs springt über den faulen hund und "
          "läuft durch die grünen felder während die kinder zuschauen",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y corre "
          "por los campos verdes mientras los niños miran desde casa",
}


def _corpus(spark, n_per_lang=120):
    rows = []
    i = 0
    for lang, sent in _SENTS.items():
        words = sent.split()
        for k in range(n_per_lang):
            # rotate + resample the sentence so docs differ but stay
            # in-language; deterministic, no RNG
            start = (k * 7) % len(words)
            take = 8 + (k % 9)
            w = [words[(start + j) % len(words)] for j in range(take)]
            rows.append((i, " ".join(w), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_heldout_accuracy_on_real_languages(spark):
    """>= 95% held-out accuracy on genuinely distinct languages — the
    Cavnar–Trenkle result a char-bigram NB must reproduce."""
    corpus = _corpus(spark)
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    m = train_language_classifier(train, "text", "lang", n=2,
                                  max_vocab=3000)
    assert m["langs"] == ["de", "en", "es", "fr"]
    out = test.select("lang", nb_language_id(F.col("text"), m)
                      .alias("pred")).collect()
    acc = sum(r["lang"] == r["pred"] for r in out) / len(out)
    assert acc >= 0.95, acc


def test_python_mirror_exact(spark, sf_dir):
    """Portable mode on the REAL documents table: engine scores equal a
    pure-python replica of the fit arithmetic and the decimal fold, doc
    for doc, and the argmax follows (score, first-lang-wins ties)."""
    from decimal import Decimal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    train = docs.where(F.col("doc_id") < 100)
    m = train_language_classifier(train, "text", "lang", n=2,
                                  max_vocab=500, portable=True)
    rows = docs.where(F.col("doc_id").between(100, 120)) \
        .select("doc_id", "text",
                nb_language_scores(F.col("text"), m).alias("scores"),
                nb_language_id(F.col("text"), m).alias("pred")).collect()

    def grams(text):
        norm = re.sub(r"\s+", " ", text.lower())
        return [norm[i:i + 2] for i in range(len(norm) - 1)]

    for r in rows:
        gs = grams(r["text"])
        assert gs, "fixture docs are non-trivial"
        want = {}
        for lang in m["langs"]:
            s = Decimal(0)
            for g in gs:
                lp = m["log_prob"].get(g, {}).get(lang, m["unk"][lang])
                s += Decimal(f"{lp:.6f}")
            want[lang] = (float(s) + m["log_prior"][lang]) / len(gs)
        got = dict(r["scores"])
        for lang in m["langs"]:
            assert got[lang] == pytest.approx(want[lang], abs=1e-12), lang
        assert r["pred"] == max(
            m["langs"], key=lambda l: (want[l], -m["langs"].index(l)))


def test_fit_collects_are_config_bounded(spark, monkeypatch):
    """The fit must never collect the full (lang, gram) count table —
    on CJK/unicode corpora distinct grams are unbounded. Every collect
    during fit is <= max(max_vocab * n_langs, max_vocab) rows: the vocab
    draw (max_vocab), the per-lang gram totals (n_langs), doc priors
    (n_langs), and the vocab-semi-joined counts (<= max_vocab * langs)."""
    corpus = _corpus(spark, n_per_lang=40)
    # patch the CONCRETE DataFrame class (pyspark 4 splits the abstract
    # pyspark.sql.DataFrame from the classic implementation)
    _DF = type(corpus)
    max_vocab, n_langs = 50, 4
    sizes = []
    real_collect = _DF.collect

    def spy(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_DF, "collect", spy)
    m = train_language_classifier(corpus, "text", "lang", n=2,
                                  max_vocab=max_vocab)
    bound = max_vocab * n_langs
    assert sizes and all(s <= bound for s in sizes), sizes
    # and the model is still full-total-normalized: unk uses the TRUE
    # per-language gram total (from the langs-row aggregate), not the
    # vocab-restricted sum, so vocab truncation must NOT shift it
    assert len(m["log_prob"]) == max_vocab
    assert set(m["langs"]) == set(_SENTS)


def test_empty_determinism_and_model_shape(spark):
    corpus = _corpus(spark, n_per_lang=40)
    m = train_language_classifier(corpus, "text", "lang", n=2,
                                  max_vocab=2000)
    df = spark.createDataFrame([("",), ("   ",), ("the lazy dog runs",)],
                               "t string")
    out = {r["t"]: r["p"] for r in df.select(
        "t", nb_language_id(F.col("t"), m).alias("p")).collect()}
    assert out[""] == "und"
    # whitespace-only normalizes to ' ' -> one char, no bigram -> und
    assert out["   "] == "und"
    assert out["the lazy dog runs"] == "en"
    # refit on the same data = same model dict (collections exact/sorted)
    assert train_language_classifier(corpus, "text", "lang", n=2,
                                     max_vocab=2000) == m
    # priors: equal doc counts -> equal priors; log-probs normalize
    assert len(set(m["log_prior"].values())) == 1
    for lang in m["langs"]:
        tot = sum(math.exp(per[lang]) for per in m["log_prob"].values())
        tot += math.exp(m["unk"][lang])  # one unseen bucket
        # vocab covers every observed gram here, so the smoothed mass over
        # vocab + one unseen bucket is exactly 1 (up to fp summation)
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_langdetect_profile_loader_round_trip(spark, tmp_path):
    """PUBLIC-format profile ingestion (PARITY delta 2's data half):
    profiles GENERATED from a labeled corpus's gram counts (the
    langdetect/Optimaize JSON shape — name/freq/n_words), loaded back,
    must assemble EXACTLY the model train_language_classifier fits on
    that corpus (equal per-language doc counts -> uniform priors), and
    classify held-out text identically."""
    import json

    from transmogrifai_spark.llm.langid_nb import load_langdetect_profiles
    from transmogrifai_spark.llm.lm_score import _char_ngrams

    corpus = _corpus(spark)  # equal docs per language
    trained = train_language_classifier(corpus, "text", "lang", n=2)

    # emit one profile file per language from the corpus's OWN counts
    rows = (corpus.select(F.col("lang").alias("_l"),
                          F.explode(_char_ngrams(F.col("text"), 2))
                          .alias("_g"))
            .groupBy("_l", "_g").count().collect())
    freq: dict = {}
    for r in rows:
        freq.setdefault(r["_l"], {})[r["_g"]] = r["count"]
    pdir = tmp_path / "profiles"
    pdir.mkdir()
    for lang, f in freq.items():
        (pdir / lang).write_text(json.dumps(
            {"name": lang, "freq": f,
             "n_words": [0, sum(f.values()), 0]}), encoding="utf-8")

    loaded = load_langdetect_profiles(spark, str(pdir), n=2)
    assert loaded == trained

    probe = spark.createDataFrame(
        [(0, "the children watch the brown fox"),
         (1, "les enfants regardent le renard"),
         (2, "die kinder zuschauen der hund"),
         (3, "los niños miran el perro")], "i long, t string")
    got = {r["i"]: r["p"] for r in probe.select(
        "i", nb_language_id(F.col("t"), loaded).alias("p")).collect()}
    assert got == {0: "en", 1: "fr", 2: "de", 3: "es"}


def test_langdetect_profile_loader_caps_and_errors(spark, tmp_path):
    import json

    import pytest as _pytest

    from transmogrifai_spark.llm.langid_nb import load_langdetect_profiles
    pdir = tmp_path / "p2"
    pdir.mkdir()
    for lang in ("aa", "bb", "cc"):
        (pdir / lang).write_text(json.dumps(
            {"name": lang, "freq": {"ab": 3, "bc": 2},
             "n_words": [0, 5, 0]}), encoding="utf-8")
    with _pytest.raises(ValueError, match="capped"):
        load_langdetect_profiles(spark, str(pdir), max_profiles=2)
    with _pytest.raises(ValueError, match="no profile"):
        load_langdetect_profiles(spark, str(tmp_path / "missing_dir_x"))


def test_nb_model_save_load_round_trip(spark, tmp_path):
    """Persisted NB models reload EQUAL (floats round-trip via repr) and
    score identically; unknown files raise a clean ValueError."""
    import pytest as _pytest

    from transmogrifai_spark.nbmodel import load_nb_model, save_nb_model
    corpus = _corpus(spark, n_per_lang=40)
    model = train_language_classifier(corpus, "text", "lang", n=2)
    p = str(tmp_path / "langid.json")
    save_nb_model(model, p)
    loaded = load_nb_model(p)
    assert loaded == model
    probe = spark.createDataFrame([(0, "the quick brown fox")], "i long, t string")
    a = probe.select(nb_language_id(F.col("t"), model).alias("p")).first()["p"]
    b = probe.select(nb_language_id(F.col("t"), loaded).alias("p")).first()["p"]
    assert a == b == "en"
    bad = tmp_path / "bad.json"
    bad.write_text('{"x": 1}', encoding="utf-8")
    with _pytest.raises(ValueError, match="nbmodel/1"):
        load_nb_model(str(bad))
