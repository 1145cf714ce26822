"""Trainable statistical NER (operators/ner_nb.py): agreement with the
gazetteer path, bounded fit collects, portable determinism.

Reference: core/src/main/scala/com/salesforce/op/stages/impl/feature/
NameEntityRecognizer.scala:56 (OpenNLP TokenNameFinder, GIS maxent) —
same train-then-classify shape, NB over indicator features, trained from
the corpus instead of shipped model assets (the langid_nb pattern).
"""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.detectors import (_classify_chunk,
                                                     typed_entities)
from transmogrifai_spark.operators.ner_nb import (chunk_features,
                                                  ner_nb_label,
                                                  train_ner_classifier,
                                                  typed_entities_statistical)

_PERSON_FIRST = ["James", "Mary", "John", "Patricia", "Robert", "Jennifer",
                 "Michael", "Linda", "William", "Elizabeth", "David",
                 "Barbara", "Richard", "Susan", "Maria", "Anna"]
_SURNAMES = ["Smith", "Jones", "Miller", "Davis", "Wilson", "Moore",
             "Taylor", "Clark", "Hall", "Young"]
_LOCATIONS = ["London", "Paris", "Berlin", "Madrid", "Rome", "Tokyo",
              "Chicago", "Boston", "Seattle", "Texas", "California",
              "Germany", "France", "Japan", "Canada", "Brazil"]
_ORG_STEMS = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
              "Hooli", "Vandelay"]
_ORG_SUFFIX = ["Inc", "Corp", "Ltd", "LLC", "Bank", "University", "Labs",
               "Group"]
_MONTHS = ["January", "February", "March", "April", "June", "July",
           "August", "September", "October", "November", "December"]


def _chunk_corpus(spark):
    """Labeled (chunk, label) rows where the label comes from the
    GAZETTEER classifier itself — the agreement fixture: a model trained
    on gazetteer-labeled chunks must reproduce the gazetteer path."""
    chunks = []
    for i, f in enumerate(_PERSON_FIRST):
        for s in _SURNAMES:
            chunks.append((len(chunks), f"{f} {s}"))
    for loc in _LOCATIONS:
        for _ in range(8):
            chunks.append((len(chunks), loc))
    for st in _ORG_STEMS:
        for su in _ORG_SUFFIX:
            chunks.append((len(chunks), f"{st} {su}"))
    for m in _MONTHS:
        for d in (1, 5, 12, 28):
            chunks.append((len(chunks), f"{m} {d}"))
    df = spark.createDataFrame(chunks, "cid long, chunk string")
    return df.withColumn("label", _classify_chunk(F.col("chunk")))


def test_agreement_with_gazetteer_path(spark):
    """>= 95% held-out agreement with the gazetteer classifier after
    training ONLY on gazetteer-labeled chunks — the OpenNLP-replacement
    law: the statistical path reproduces the rule path it was taught."""
    corpus = _chunk_corpus(spark)
    train = corpus.where(F.col("cid") % 5 != 0)
    test = corpus.where(F.col("cid") % 5 == 0)
    m = train_ner_classifier(train, "chunk", "label", max_vocab=3000)
    assert set(m["labels"]) <= {"PERSON", "LOCATION", "ORGANIZATION",
                                "DATE", "MISC"}
    out = test.select("label",
                      ner_nb_label(F.col("chunk"), m).alias("pred")).collect()
    acc = sum(r["label"] == r["pred"] for r in out) / len(out)
    assert acc >= 0.95, acc
    # generalization the gazetteer CAN'T do and NB can: an unseen stem
    # with a trained org suffix still classifies ORGANIZATION via last=
    unseen = spark.createDataFrame([("Cyberdyne Corp",), ("Tyrell Inc",)],
                                   "chunk string")
    preds = [r["p"] for r in unseen.select(
        ner_nb_label(F.col("chunk"), m).alias("p")).collect()]
    assert preds == ["ORGANIZATION", "ORGANIZATION"]


def test_fit_collects_are_config_bounded(spark, monkeypatch):
    """The langid_nb r8 contract: no collect during fit may exceed
    max(max_vocab * n_labels, max_vocab) rows."""
    corpus = _chunk_corpus(spark)
    _DF = type(corpus)
    max_vocab = 40
    sizes = []
    real_collect = _DF.collect

    def spy(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_DF, "collect", spy)
    m = train_ner_classifier(corpus, "chunk", "label", max_vocab=max_vocab)
    bound = max_vocab * max(len(m["labels"]), 1)
    assert sizes and all(s <= bound for s in sizes), sizes
    assert len(m["log_prob"]) == max_vocab


def test_portable_determinism_and_null_handling(spark):
    corpus = _chunk_corpus(spark)
    m1 = train_ner_classifier(corpus, "chunk", "label", max_vocab=500,
                              portable=True)
    m2 = train_ner_classifier(corpus, "chunk", "label", max_vocab=500,
                              portable=True)
    assert m1 == m2
    df = spark.createDataFrame([("James Smith",), (None,)], "chunk string")
    out = [r["p"] for r in df.select(
        ner_nb_label(F.col("chunk"), m1).alias("p")).collect()]
    assert out[0] == "PERSON" and out[1] is None
    # feature bag shape: context feature appears only when trained with one
    bag = df.where(F.col("chunk").isNotNull()).select(
        chunk_features(F.col("chunk")).alias("b")).first()["b"]
    assert "first=james" in bag and "last=smith" in bag \
        and "shape=multi" in bag and "nw=2" in bag


def test_typed_entities_statistical_matches_gazetteer_map(spark):
    """Drop-in law: on sentences over trained vocabulary, the statistical
    typed-entities map agrees with the gazetteer map on every non-MISC
    type (same chunk mining; only the classifier differs)."""
    corpus = _chunk_corpus(spark)
    m = train_ner_classifier(corpus, "chunk", "label", max_vocab=3000,
                             context_col=None)
    sents = spark.createDataFrame([
        (0, "James Smith met Barbara Jones in London last March."),
        (1, "Acme Corp and Globex Bank opened offices in Berlin."),
        (2, "Dr Mary Davis joined Stark Labs on January 5."),
    ], "sid long, text string")
    both = sents.select(
        "sid",
        typed_entities(F.col("text")).alias("gaz"),
        typed_entities_statistical(F.col("text"), m).alias("nb")).collect()
    for r in both:
        for t in ("PERSON", "LOCATION", "ORGANIZATION"):
            gaz = set(r["gaz"].get(t) or [])
            nb = set(r["nb"].get(t) or [])
            # the NB path must find every gazetteer entity of that type
            # (it may ADD correct ones the gazetteer missed)
            assert gaz <= nb, (r["sid"], t, gaz, nb)


def test_nbmodel_hostile_gram_bytes_roundtrip(spark):
    """The shared scorer's lookup table is a PARSED SQL literal — grams
    containing quotes, backslashes, and control bytes (possible in raw
    corpora) must survive the escaping round-trip with exact scores."""
    from transmogrifai_spark.nbmodel import nb_scores_map

    model = {"labels": ["a", "b"],
             "log_prior": {"a": -0.5, "b": -0.9},
             "unk": {"a": -9.0, "b": -9.0},
             "log_prob": {"x\x00y": {"a": -1.0, "b": -2.0},
                          "p\tq": {"a": -3.0, "b": -0.5},
                          "it's\\": {"a": -0.25, "b": -4.0}},
             "portable": False}
    df = spark.createDataFrame([(["x\x00y", "p\tq", "it's\\"],)],
                               "g array<string>")
    r = df.select(nb_scores_map(F.col("g"), model, model["labels"],
                                normalize=False).alias("m")).first()["m"]
    assert r["a"] == pytest.approx(-0.5 - 1.0 - 3.0 - 0.25, abs=1e-12)
    assert r["b"] == pytest.approx(-0.9 - 2.0 - 0.5 - 4.0, abs=1e-12)


# ---------------------------------------------------------------------------
# boundary tagger (r9, PARITY delta 3b): lowercase entities
# ---------------------------------------------------------------------------

_LC_ORGS = ["acme corp", "globex inc", "initech ltd", "umbrella labs",
            "hooli group", "vandelay bank"]
_LC_PEOPLE = ["van gogh", "de niro", "von neumann", "da vinci"]
_FILLER = ["the quarterly report from", "we met with", "a filing by",
           "according to", "new offices of", "the board of"]
_TAIL = ["was published today", "closed the round", "signed the deal",
         "opened in spring", "grew fast"]


def _tagger_corpus(spark):
    """Sentences with LOWERCASE entity mentions + gold mention lists —
    the fixture the title-case chunk regex structurally cannot mine."""
    rows = []
    ents = _LC_ORGS + _LC_PEOPLE
    for i, e in enumerate(ents):
        for j, f in enumerate(_FILLER):
            t = _TAIL[(i + j) % len(_TAIL)]
            rows.append((len(rows), f"{f} {e} {t}", [e]))
    return spark.createDataFrame(rows, "i long, text string, ents array<string>")


def test_token_tagger_mines_lowercase_entities(spark):
    """THE delta-3b law: on held-out sentences the trained boundary
    tagger recovers lowercase entity chunks; the title-case regex
    chunker finds nothing on the same text."""
    import re

    from transmogrifai_spark.operators.detectors import _CHUNK_RE
    from transmogrifai_spark.operators.ner_nb import (mine_entity_chunks,
                                                      train_token_tagger)
    corpus = _tagger_corpus(spark)
    train = corpus.where(F.col("i") % 4 != 3)
    test = corpus.where(F.col("i") % 4 == 3)
    model = train_token_tagger(train, "text", "ents")
    assert sorted(model["labels"]) == ["E", "O"]
    got = test.select("text", "ents",
                      mine_entity_chunks(F.col("text"), model).alias("ch")) \
        .collect()
    assert got
    hits = sum(1 for r in got if list(r["ch"]) == list(r["ents"]))
    assert hits / len(got) >= 0.9, \
        [(r["text"], list(r["ch"])) for r in got if
         list(r["ch"]) != list(r["ents"])][:5]
    # the regex chunker finds NO chunks in these all-lowercase sentences
    for r in got:
        assert re.findall(_CHUNK_RE, r["text"]) == []


def test_nb_best_labels_matches_bag_nb_label(spark):
    """Batch-vs-single law: nb_best_labels over an array of bags equals
    bag_nb_label applied to each bag (same scores, same tie rule),
    empty bags -> NULL."""
    from transmogrifai_spark.nbmodel import nb_best_labels
    from transmogrifai_spark.operators.ner_nb import (bag_nb_label,
                                                      train_bag_classifier)
    rows = [(i, ["w=%d" % (i % 5), "s=%d" % (i % 3)],
             "A" if i % 2 == 0 else "B") for i in range(60)]
    df = spark.createDataFrame(rows, "i long, bag array<string>, lab string")
    model = train_bag_classifier(df, F.col("bag"), "lab")
    probe = spark.createDataFrame(
        [(0, [["w=0", "s=0"], ["w=1"], [], ["zzz"]])],
        "i long, bags array<array<string>>")
    batch = probe.select(
        nb_best_labels(F.col("bags"), model, model["labels"]).alias("t")
    ).first()["t"]
    singles = probe.select(F.transform(
        F.col("bags"), lambda b: bag_nb_label(b, model)).alias("t")
    ).first()["t"]
    assert list(batch) == list(singles)
    assert batch[2] is None


def test_typed_entities_statistical_with_tagger(spark):
    """Opt-in chunker: typed_entities_statistical(tagger=...) types the
    lowercase chunks the tagger mines."""
    from transmogrifai_spark.operators.ner_nb import (
        train_ner_classifier, train_token_tagger,
        typed_entities_statistical)
    corpus = _tagger_corpus(spark)
    tagger = train_token_tagger(corpus, "text", "ents")
    # chunk classifier: orgs end in a company suffix, people don't
    labeled = []
    for e in _LC_ORGS:
        labeled.append((len(labeled), e, "ORGANIZATION"))
    for p in _LC_PEOPLE:
        labeled.append((len(labeled), p, "PERSON"))
    cdf = spark.createDataFrame(labeled, "i long, chunk string, label string")
    clf = train_ner_classifier(cdf, "chunk", "label")
    df = spark.createDataFrame(
        [(0, "we met with acme corp yesterday"),
         (1, "a filing by van gogh was published today")],
        "i long, text string")
    out = {r["i"]: r["m"] for r in df.select(
        "i", typed_entities_statistical(F.col("text"), clf,
                                        tagger=tagger).alias("m")).collect()}
    assert "acme corp" in list(out[0]["ORGANIZATION"])
    assert "van gogh" in list(out[1]["PERSON"])


def test_token_tagger_non_ascii_entities(spark):
    """r9 review fix: \\p{L} tokenization — accented lowercase mentions
    ('crédit agricole') tokenize whole, train, and mine; the old ASCII
    classes split at the accent and silently lost them."""
    from transmogrifai_spark.operators.ner_nb import (mine_entity_chunks,
                                                      train_token_tagger)
    ents = ["crédit agricole", "münchner bank", "société générale",
            "acme corp"]
    rows = []
    for i, e in enumerate(ents):
        for j, f in enumerate(_FILLER):
            rows.append((len(rows), f"{f} {e} {_TAIL[(i + j) % len(_TAIL)]}",
                         [e]))
    df = spark.createDataFrame(rows, "i long, text string, ents array<string>")
    model = train_token_tagger(df, "text", "ents")
    got = df.where(F.col("i") % 4 == 1).select(
        "ents", mine_entity_chunks(F.col("text"), model).alias("ch")).collect()
    hits = sum(1 for r in got if list(r["ch"]) == list(r["ents"]))
    assert hits / len(got) >= 0.9, \
        [(list(r["ents"]), list(r["ch"])) for r in got][:4]
