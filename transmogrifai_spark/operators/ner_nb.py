"""Trainable statistical named-entity classification — multinomial Naive
Bayes over chunk feature bags.

The STATISTICAL counterpart to the gazetteer/affix chunk classifier in
``operators/detectors.py``, narrowing the depth delta against the
reference's NameEntityRecognizer
(core/src/main/scala/com/salesforce/op/stages/impl/feature/
NameEntityRecognizer.scala:56 — OpenNLP TokenNameFinder, GIS maxent
models shipped as binary assets): same train-then-classify shape, but
the model is TRAINED from the user's own labeled chunks in one
distributed aggregation pass instead of shipping pre-baked model files
(the langid_nb pattern — ``llm/langid_nb.py``). Model-family delta vs
the reference is stated honestly: OpenNLP fits GIS maximum-entropy;
this fits multinomial NB over the same kind of sparse indicator
features (first/last token identity, affix, shape, context) — the
classic statistical-NER feature set (Borthwick 1999; Zhou & Su 2002).

Fit (``train_ner_classifier``): explode each chunk's feature bag, one
``groupBy(label, feature)`` count (map-side combined), top ``max_vocab``
features corpus-wide, Laplace-smoothed per-label log probabilities +
log priors. Every driver collect is config-bounded (≤ max_vocab × labels
rows — the langid_nb r8 contract).

Score (``ner_nb_label`` / ``ner_nb_scores``): pure Catalyst expressions
— the feature bag is rebuilt by the same expression, each feature looks
up its per-label log-prob in a map literal, absent features take the
smoothed-zero; argmax with ties to the alphabetically first label;
``portable=True`` folds 6dp-rounded terms through DECIMAL(18,6) so the
whole train→classify path is order-stable and SQL-replicable (the
langid_nb oracle contract). Scoring 100 TB of chunks is one projection.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_features", "train_ner_classifier", "ner_nb_scores",
           "ner_nb_label", "typed_entities_statistical",
           "train_bag_classifier", "bag_nb_scores", "bag_nb_label"]


def chunk_features(chunk: Column, context: Column | None = None) -> Column:
    """array<string> sparse indicator features for one capitalized chunk:

    * ``first=<w>`` / ``last=<w>`` — lowercased boundary-token identity
      (the gazetteer/given-name signal, learned instead of listed)
    * ``suf3=<s>`` — last token's 3-char suffix (``-Corp``/``-sity``
      affixes)
    * ``shape=acro|multi|single`` — all-caps acronym / multi-word / one
      word
    * ``nw=<n>`` — word count
    * ``ctx=<c>`` — caller-supplied context tag (e.g. ``hon`` when an
      honorific precedes, the preceding lowercased token, or absent)

    NULL chunks yield an empty bag (scored as NULL/abstain downstream).
    """
    first = F.element_at(F.split(chunk, " "), 1)
    last = F.element_at(F.split(chunk, " "), -1)
    shape = F.when(chunk.rlike(r"^[A-Z]{2,6}$"), F.lit("acro")) \
        .when(chunk.contains(" "), F.lit("multi")) \
        .otherwise(F.lit("single"))
    feats = [
        F.concat(F.lit("first="), F.lower(first)),
        F.concat(F.lit("last="), F.lower(last)),
        F.concat(F.lit("suf3="), F.lower(F.substring(last, -3, 3))),
        F.concat(F.lit("shape="), shape),
        F.concat(F.lit("nw="), F.size(F.split(chunk, " ")).cast("string")),
    ]
    if context is not None:
        feats.append(F.concat(F.lit("ctx="),
                              F.lower(F.coalesce(context, F.lit("^")))))
    bag = F.array(*feats)
    return F.when(chunk.isNull(), F.array().cast("array<string>")) \
        .otherwise(bag)


def train_bag_classifier(df: DataFrame, bag: Column, label_col: str,
                         max_vocab: int = 4000, add_k: float = 0.5,
                         portable: bool = False) -> dict:
    """Generic multinomial-NB fit over an ``array<string>`` feature-bag
    EXPRESSION — the shared trainer behind the NER chunk classifier and
    the charset byte-bigram classifier (and any future bag model).
    Returns ``{"labels", "log_prior": {l: lp}, "unk": {l: logP_unseen},
    "log_prob": {feat: {l: logP}}, "add_k", "portable"}``. One
    aggregation pass for (label, feature) counts, one for label priors;
    vocabulary = the ``max_vocab`` most frequent features corpus-wide
    (ties by feature asc) so every label scores over the SAME vocab. All
    collects are bounded by max(max_vocab × n_labels, max_vocab) rows
    (the langid_nb r8 contract — never the full distinct-feature
    table)."""
    feats = df.select(F.col(label_col).alias("_l"),
                      F.explode(bag).alias("_g"))
    lf = feats.groupBy("_l", "_g").agg(F.count("*").alias("_c"))
    vocab = [r["_g"] for r in
             lf.groupBy("_g").agg(F.sum("_c").alias("_t"))
             .orderBy(F.col("_t").desc(), F.col("_g"))
             .limit(max_vocab).collect()]
    lab_tot = {r["_l"]: r["_c"] for r in
               feats.groupBy("_l").agg(F.count("*").alias("_c")).collect()}
    vocab_df = df.sparkSession.createDataFrame(
        [(g,) for g in vocab], "_g string")
    counts: dict[str, dict[str, int]] = {}
    for r in lf.join(F.broadcast(vocab_df), "_g").collect():
        counts.setdefault(r["_l"], {})[r["_g"]] = r["_c"]
    docs = {r["_l"]: r["_d"] for r in
            df.groupBy(F.col(label_col).alias("_l"))
            .agg(F.count("*").alias("_d")).collect()}
    labels = sorted(lab_tot)
    n_docs = sum(docs.values())
    v = len(vocab)

    def rnd(x: float) -> float:
        return round(x, 6) if portable else x

    log_prior = {l: rnd(math.log(docs.get(l, 0) / n_docs)) for l in labels}
    unk = {l: rnd(math.log(add_k / (lab_tot[l] + add_k * (v + 1))))
           for l in labels}
    log_prob = {
        g: {l: rnd(math.log(
            (counts.get(l, {}).get(g, 0) + add_k)
            / (lab_tot[l] + add_k * (v + 1))))
            for l in labels}
        for g in vocab}
    return {"labels": labels, "log_prior": log_prior, "unk": unk,
            "log_prob": log_prob, "add_k": add_k, "portable": portable}


def train_ner_classifier(df: DataFrame, chunk_col: str, label_col: str,
                         context_col: str | None = None,
                         max_vocab: int = 4000, add_k: float = 0.5,
                         portable: bool = False) -> dict:
    """Fit the NB chunk classifier (``train_bag_classifier`` over
    ``chunk_features`` bags); the returned model additionally records
    ``context`` so scorers know whether to build the ctx feature."""
    ctx = F.col(context_col) if context_col else None
    model = train_bag_classifier(
        df, chunk_features(F.col(chunk_col), ctx), label_col,
        max_vocab=max_vocab, add_k=add_k, portable=portable)
    model["context"] = context_col is not None
    return model


def bag_nb_scores(bag: Column, model: dict) -> Column:
    """map<label, double> NB log-posteriors (unnormalized — log prior +
    sum over features of logP(f|label), absent features at the smoothed
    zero) for one feature bag; NULL/empty bags map every label to NULL.
    Portable mode folds 6dp-rounded terms through DECIMAL(18,6) (fixed
    order, engine-stable). Scoring rides the shared bucketed-table
    scorer (``nbmodel`` — one per-row-bound table for ALL labels)."""
    from ..nbmodel import nb_scores_map
    return nb_scores_map(bag, model, model["labels"], normalize=False)


def bag_nb_label(bag: Column, model: dict) -> Column:
    """Best label by NB score, ties to the alphabetically first label;
    NULL for NULL/empty bags (all score values NULL — the scores-map
    contract — so first-value-NULL is the abstain test). The scores map
    is bound once; argmax = ascending struct sort on (-score, label),
    first element (the langid_nb rule)."""
    scores = bag_nb_scores(bag, model)

    def pick(mm: Column) -> Column:
        best = F.element_at(F.array_sort(F.transform(
            F.map_entries(mm),
            lambda e: F.struct((-e["value"]).alias("ns"),
                               e["key"].alias("l")))), 1)["l"]
        return F.when(F.element_at(F.map_values(mm), 1).isNull(),
                      F.lit(None).cast("string")).otherwise(best)

    return F.get(F.transform(F.array(scores), pick), 0)


def ner_nb_scores(chunk: Column, model: dict,
                  context: Column | None = None) -> Column:
    """map<label, double> NB log-posteriors (unnormalized); NULL chunks
    map every label to NULL."""
    return bag_nb_scores(
        chunk_features(chunk, context if model.get("context") else None),
        model)


def ner_nb_label(chunk: Column, model: dict,
                 context: Column | None = None) -> Column:
    """Best label by NB score, ties to the alphabetically first label;
    NULL for NULL/empty chunks."""
    return bag_nb_label(
        chunk_features(chunk, context if model.get("context") else None),
        model)


def typed_entities_statistical(c: Column, model: dict) -> Column:
    """``typed_entities``'s output shape (map<entity_type, tokens>) with
    the TRAINED chunk classifier in place of the gazetteer CASE: same
    chunk mining (capitalized runs, honorific stripping, function-word
    filtering — detectors.typed_entities), each chunk classified by
    ``ner_nb_label`` with context='hon' when an honorific preceded it.
    Drop-in swap: a model trained on gazetteer-labeled chunks reproduces
    the gazetteer path (the law test); a model trained on real labeled
    spans upgrades quality with zero plan-shape change."""
    from .detectors import HONORIFICS, _CHUNK_RE

    hon_pat = "(?:%s)\\.? (%s)" % ("|".join(HONORIFICS), _CHUNK_RE)
    hon_people = F.regexp_extract_all(c, F.lit(hon_pat), 1)
    raw_chunks = F.regexp_extract_all(c, F.lit(f"({_CHUNK_RE})"), 1)
    lead_strip = "^(?:%s)\\.? |^(?:The|A|An|This|That|In|On|At|And|But|Or) " \
        % "|".join(HONORIFICS)
    chunks = F.array_distinct(F.transform(
        raw_chunks, lambda ch: F.regexp_replace(ch, lead_strip, "")))
    chunks = F.filter(chunks, lambda ch: (F.length(ch) > 0) &
        ~F.array_contains(F.array(*[F.lit(h) for h in HONORIFICS]), ch) &
        ~F.lower(ch).isin("the", "a", "an", "this", "that", "it", "he",
                          "she", "they", "we", "i", "in", "on", "at"))
    tagged = F.transform(
        chunks, lambda ch: F.struct(
            ner_nb_label(
                ch, model,
                context=F.when(F.array_contains(hon_people, ch),
                               F.lit("hon")).otherwise(F.lit("^")))
            .alias("t"),
            ch.alias("e")))
    return F.map_from_arrays(
        F.array(*[F.lit(t) for t in model["labels"]]),
        F.array(*[F.transform(F.filter(tagged, _eq_type(t)),
                              lambda s: s["e"])
                  for t in model["labels"]]))


def _eq_type(t: str):
    return lambda s: s["t"] == t
