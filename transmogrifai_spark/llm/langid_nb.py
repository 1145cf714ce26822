"""Trainable statistical language identification — multinomial Naive
Bayes over character n-grams.

This is the STATISTICAL counterpart to the heuristic script-first
detector in ``operators/detectors.py``, closing (most of) the depth
delta against the reference's Optimaize detector
(core/src/main/scala/com/salesforce/op/utils/text/
OptimaizeLanguageDetector.scala:33 — itself n-gram Naive Bayes per
Cavnar & Trenkle 1994 / Shuyo's langdetect): same model family, but
TRAINED from the user's own labeled corpus in one distributed pass
instead of shipping 70 pre-baked profile assets (the remaining delta —
profiles are data, not code).

Fit (``train_language_classifier``): one ``groupBy(lang, gram)`` count
over the corpus (map-side combined), top ``max_vocab`` grams overall,
per-language Laplace-smoothed log probabilities and doc-count log
priors. The model is a bounded driver-side dict (vocab × langs doubles)
— the estimator-stage collection pattern used everywhere else.

Score (``nb_language_scores`` / ``nb_language_id``): pure Catalyst
expressions — per language, ``log_prior/|grams| + mean(logP(g|lang))``
folded over the doc's n-grams with the model inlined as map literals
(the lm_score plan shape: no joins, no Python; scoring 100 TB is one
projection). ``nb_language_id`` is the deterministic argmax (ties to
the alphabetically first language); texts with no n-grams return
``'und'``. Confidences are the softmax over per-gram-mean scores.

``portable=True`` rounds every model log-probability to 6 dp at FIT
time (the BM25 determinism contract): the per-doc DECIMAL(18,6) fold is
then order-independent and SQL-replicable, which is how the driver
oracle value-gates the whole train-then-classify path.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm_score import _char_ngrams

__all__ = ["train_language_classifier", "nb_language_scores",
           "nb_language_id"]


def train_language_classifier(df: DataFrame, text_col: str, lang_col: str,
                              n: int = 2, max_vocab: int = 4000,
                              add_k: float = 0.5,
                              portable: bool = False) -> dict:
    """Fit the NB model: ``{"n", "add_k", "portable", "langs",
    "log_prior": {lang: lp}, "unk": {lang: logP_unseen},
    "log_prob": {gram: {lang: logP}}}``. One aggregation pass for the
    (lang, gram) counts, one for doc priors; vocabulary = the
    ``max_vocab`` most frequent grams corpus-wide (ties by gram asc), so
    every language scores over the SAME vocab (absent (gram, lang) pairs
    take that language's smoothed-zero probability)."""
    grams = df.select(F.col(lang_col).alias("_l"),
                      F.explode(_char_ngrams(F.col(text_col), n))
                      .alias("_g"))
    lg = grams.groupBy("_l", "_g").agg(F.count("*").alias("_c"))
    vocab_rows = (lg.groupBy("_g").agg(F.sum("_c").alias("_t"))
                  .orderBy(F.col("_t").desc(), F.col("_g"))
                  .limit(max_vocab).collect())
    vocab = [r["_g"] for r in vocab_rows]
    # Every driver collect here is config-bounded: lang_tot is one row
    # per language (NOT the full (lang, gram) table — distinct grams are
    # corpus-vocabulary-sized and unbounded on CJK/unicode text), and
    # the count rows are semi-joined to the broadcast vocab first, so at
    # most max_vocab * langs rows cross the wire.
    lang_tot = {r["_l"]: r["_c"] for r in
                grams.groupBy("_l").agg(F.count("*").alias("_c"))
                .collect()}
    vocab_df = df.sparkSession.createDataFrame(
        [(g,) for g in vocab], "_g string")
    counts: dict[str, dict[str, int]] = {}
    for r in lg.join(F.broadcast(vocab_df), "_g").collect():
        counts.setdefault(r["_l"], {})[r["_g"]] = r["_c"]
    docs = {r["_l"]: r["_d"] for r in
            df.groupBy(F.col(lang_col).alias("_l"))
            .agg(F.count("*").alias("_d")).collect()}
    langs = sorted(lang_tot)
    n_docs = sum(docs.values())
    v = len(vocab)

    def rnd(x: float) -> float:
        return round(x, 6) if portable else x

    log_prior = {l: rnd(math.log(docs.get(l, 0) / n_docs)) for l in langs}
    unk = {l: rnd(math.log(add_k / (lang_tot[l] + add_k * (v + 1))))
           for l in langs}
    log_prob = {
        g: {l: rnd(math.log(
            (counts.get(l, {}).get(g, 0) + add_k)
            / (lang_tot[l] + add_k * (v + 1))))
            for l in langs}
        for g in vocab}
    return {"n": n, "add_k": add_k, "portable": portable, "langs": langs,
            "log_prior": log_prior, "unk": unk, "log_prob": log_prob}


def _per_lang_score(grams: Column, model: dict, lang: str) -> Column:
    """mean over grams of logP(g|lang) (unseen grams take the smoothed
    zero) plus log_prior/|grams| — i.e. (log prior + sum logP)/|grams|,
    a length-normalized NB log-posterior numerator. Portable mode folds
    the 6dp-rounded terms through DECIMAL(18,6), so the sum (hence the
    mean and every comparison on it) is partition- and engine-stable."""
    mp = F.create_map(*[x for g, per in sorted(model["log_prob"].items())
                        for x in (F.lit(g), F.lit(per[lang]))])
    unk = F.lit(model["unk"][lang])
    terms = F.transform(grams, lambda g: F.coalesce(
        F.try_element_at(mp, g), unk))
    if model.get("portable"):
        # re-cast each step: decimal addition widens (18,6)+(28,6)->(29,6)
        # and folds demand a fixed accumulator type. (28,6) holds any
        # realistic sum (|logP| <= ~40 per gram) exactly.
        s = F.aggregate(terms, F.lit(0).cast("decimal(28,6)"),
                        lambda a, x: (a + x.cast("decimal(18,6)"))
                        .cast("decimal(28,6)"))
        total = (s.cast("double") + F.lit(model["log_prior"][lang]))
    else:
        s = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)
        total = s + F.lit(model["log_prior"][lang])
    return total / F.size(grams)


def nb_language_scores(c: Column, model: dict) -> Column:
    """map<lang, double> of length-normalized NB scores (higher = more
    likely); empty-gram texts map every language to NULL."""
    grams = _char_ngrams(c, model["n"])
    pairs = []
    for lang in model["langs"]:
        pairs.append(F.lit(lang))
        pairs.append(F.when(F.size(grams) > 0,
                            _per_lang_score(grams, model, lang)))
    return F.create_map(*pairs)


def nb_language_id(c: Column, model: dict) -> Column:
    """Best language by NB score, ties to the alphabetically first
    language; ``'und'`` when the text has no n-grams. Derived from the
    SAME ``nb_language_scores`` map expression, so a projection selecting
    both the scores and the prediction evaluates the per-lang folds ONCE
    (Spark's subexpression elimination dedups the identical subtree —
    the folds over a 500-gram map literal are this operator's whole
    cost). Argmax = ascending struct sort on (-score, lang), first
    element: -score asc is score desc, ties take the smallest lang."""
    grams = _char_ngrams(c, model["n"])
    ent = F.map_entries(nb_language_scores(c, model))
    best = F.element_at(F.array_sort(F.transform(
        ent, lambda e: F.struct((-e["value"]).alias("ns"),
                                e["key"].alias("l")))), 1)["l"]
    return F.when(F.size(grams) > 0, best).otherwise(F.lit("und"))
