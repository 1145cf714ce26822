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
           "train_bag_classifier", "bag_nb_scores", "bag_nb_label",
           "token_window_features", "train_token_tagger",
           "tag_token_entities", "mine_entity_chunks"]

# token mining for the boundary tagger: keeps case (shape features need
# it), apostrophes stay word-internal; \p{L} so non-ASCII mentions
# ("crédit agricole", "münchner bank") tokenize whole instead of
# splitting at the accent (r9 review finding — ASCII classes here made
# the lowercase-entity path silently ASCII-only)
_TOKEN_RE = r"[\p{L}][\p{L}']*"


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


def _token_shape(t: Column) -> Column:
    # \p{Lu}/\p{Ll} so accented capitals ("Émile") shape as title/caps,
    # not "other"
    return F.when(t.rlike(r"^[\p{Lu}][\p{Lu}']+$"), F.lit("caps")) \
        .when(t.rlike(r"^[\p{Lu}]"), F.lit("title")) \
        .when(t.rlike(r"^[\p{Ll}]"), F.lit("lower")) \
        .otherwise(F.lit("other"))


def token_window_features(tokens: Column, i: Column) -> Column:
    """array<string> window features for the token at 1-based index ``i``
    of ``tokens`` — the per-token analogue of ``chunk_features`` behind
    the BOUNDARY tagger (PARITY delta 3b: the shared title-case chunk
    regex structurally misses lowercase entities; a trained tagger sees
    identity/suffix/shape and one token of context either side, so
    'acme corp' is learnable):

    ``w=<tok>`` ``suf3=<s>`` ``shape=caps|title|lower|other``
    ``prev=<tok or ^>`` ``next=<tok or $>`` ``pshape=`` ``nshape=``."""
    tok = F.element_at(tokens, i)
    # index 0 is INVALID for (try_)element_at (1-based, SQLSTATE 22003) —
    # the boundary case needs an explicit guard, not just try_
    prev = F.when(i > 1, F.try_element_at(tokens, i - 1))
    nxt = F.try_element_at(tokens, i + 1)
    return F.array(
        F.concat(F.lit("w="), F.lower(tok)),
        F.concat(F.lit("suf3="), F.lower(F.substring(tok, -3, 3))),
        F.concat(F.lit("shape="), _token_shape(tok)),
        F.concat(F.lit("prev="), F.lower(F.coalesce(prev, F.lit("^")))),
        F.concat(F.lit("next="), F.lower(F.coalesce(nxt, F.lit("$")))),
        F.concat(F.lit("pshape="),
                 F.coalesce(F.when(prev.isNotNull(), _token_shape(prev)),
                            F.lit("^"))),
        F.concat(F.lit("nshape="),
                 F.coalesce(F.when(nxt.isNotNull(), _token_shape(nxt)),
                            F.lit("$"))))


def train_token_tagger(df: DataFrame, text_col: str, entities_col: str,
                       max_vocab: int = 4000, add_k: float = 0.5,
                       portable: bool = False) -> dict:
    """Fit the entity BOUNDARY tagger from labeled entity phrases:
    ``entities_col`` holds array<string> gold entity mentions per row;
    every token of the text covered by a mention token
    (case-insensitive whole-token match — weak supervision, the usual
    span-to-token projection) is tagged ``E``, the rest ``O``; the NB
    model then fits over ``token_window_features`` bags
    (``train_bag_classifier`` — bounded collects, shared machinery).
    Unlike the chunk classifier this learns WHERE entities are, not just
    what type a pre-mined chunk is, so lowercase mentions survive."""
    toks = F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                F.lit(f"({_TOKEN_RE})"), 1)
    ent_toks = F.transform(
        F.flatten(F.transform(
            F.coalesce(F.col(entities_col),
                       F.array().cast("array<string>")),
            lambda e: F.split(e, " "))),
        F.lower)
    tags = F.transform(
        toks, lambda t: F.when(F.array_contains(ent_toks, F.lower(t)),
                               F.lit("E")).otherwise(F.lit("O")))
    base = df.select(toks.alias("_toks"), tags.alias("_tags"))
    ex = base.select("_toks", F.posexplode("_tags").alias("_i", "_lab"))
    bag = token_window_features(F.col("_toks"), F.col("_i") + 1)
    return train_bag_classifier(ex, bag, "_lab", max_vocab=max_vocab,
                                add_k=add_k, portable=portable)


def tag_token_entities(c: Column, model: dict) -> Column:
    """array<struct<token:string, tag:string>>: every token of ``c``
    tagged E/O by the boundary tagger. The NB table is bound once per
    row (``nbmodel.nb_best_labels`` — never per token)."""
    from ..nbmodel import nb_best_labels
    toks = F.regexp_extract_all(F.coalesce(c, F.lit("")),
                                F.lit(f"({_TOKEN_RE})"), 1)

    def with_toks(ts: Column) -> Column:
        bags = F.transform(F.sequence(F.lit(1), F.size(ts)),
                           lambda i: token_window_features(ts, i))
        tags = nb_best_labels(bags, model, model["labels"])
        return F.zip_with(ts, tags,
                          lambda t, g: F.struct(t.alias("token"),
                                                g.alias("tag")))

    empty = F.array().cast("array<struct<token:string,tag:string>>")
    return F.when(F.size(toks) == 0, empty).otherwise(
        F.get(F.transform(F.array(toks), with_toks), 0))


def mine_entity_chunks(c: Column, model: dict) -> Column:
    """array<string> entity chunks: consecutive ``E``-tagged tokens
    joined with single spaces — the TRAINED opt-in replacement for the
    title-case chunk regex (detectors._CHUNK_RE), able to mine
    lowercase entities the regex structurally cannot."""
    tagged = tag_token_entities(c, model)

    def merge(tg: Column) -> Column:
        state = F.aggregate(
            tg,
            F.struct(F.array().cast("array<string>").alias("chunks"),
                     F.lit("").alias("cur")),
            lambda acc, e: F.when(
                e["tag"] == "E",
                F.struct(acc["chunks"].alias("chunks"),
                         F.when(acc["cur"] == "", e["token"])
                         .otherwise(F.concat(acc["cur"], F.lit(" "),
                                             e["token"])).alias("cur"))
            ).otherwise(
                F.struct(F.when(acc["cur"] == "", acc["chunks"])
                         .otherwise(F.concat(acc["chunks"],
                                             F.array(acc["cur"])))
                         .alias("chunks"),
                         F.lit("").alias("cur"))),
            lambda acc: F.when(acc["cur"] == "", acc["chunks"])
            .otherwise(F.concat(acc["chunks"], F.array(acc["cur"]))))
        return state

    return F.get(F.transform(F.array(tagged), merge), 0)


def typed_entities_statistical(c: Column, model: dict,
                               tagger: dict | None = None) -> Column:
    """``typed_entities``'s output shape (map<entity_type, tokens>) with
    the TRAINED chunk classifier in place of the gazetteer CASE: same
    chunk mining (capitalized runs, honorific stripping, function-word
    filtering — detectors.typed_entities), each chunk classified by
    ``ner_nb_label`` with context='hon' when an honorific preceded it.
    Drop-in swap: a model trained on gazetteer-labeled chunks reproduces
    the gazetteer path (the law test); a model trained on real labeled
    spans upgrades quality with zero plan-shape change.

    ``tagger`` (r9, opt-in — PARITY delta 3b): a ``train_token_tagger``
    model; when supplied, chunks come from ``mine_entity_chunks``
    (trained E/O boundary tagging, lowercase entities included) instead
    of the title-case regex. Honorific context still derives from the
    regex scan (an honorific is itself title-case).

    ``model`` may also be a loaded OpenNLP GIS maxent model
    (``operators/maxent.load_opennlp_gis_model`` — ``type='GIS'``
    marker, PARITY delta 3a's data tier): chunks are then classified by
    ``ner_maxent_label`` over the same indicator features, OpenNLP's
    first-max-in-outcome-order tie rule included."""
    from .detectors import HONORIFICS, _CHUNK_RE
    if model.get("type") == "GIS":
        from .maxent import ner_maxent_label as _label_fn
    else:
        _label_fn = ner_nb_label

    hon_pat = "(?:%s)\\.? (%s)" % ("|".join(HONORIFICS), _CHUNK_RE)
    hon_people = F.regexp_extract_all(c, F.lit(hon_pat), 1)
    if tagger is not None:
        raw_chunks = mine_entity_chunks(c, tagger)
    else:
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
            _label_fn(
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
