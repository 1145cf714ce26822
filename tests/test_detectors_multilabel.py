"""Detectors, multilabel utilities, custom monoids, full raw-feature filter."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.detectors import (candidate_entities,
                                                     is_human_name,
                                                     language_scores, name_stats)
from transmogrifai_spark.operators.multilabel import (drop_indices_by,
                                                      multi_label_joiner,
                                                      register_monoid,
                                                      top_n_label_joiner,
                                                      top_n_label_prob_map)
from transmogrifai_spark.operators.preparators import raw_feature_filter_full


def test_human_name_detection(spark):
    df = spark.createDataFrame([("James Smith",), ("Widget Factory Ltd",), (None,)],
                               "name string")
    out = [r["n"] for r in df.select(is_human_name(F.col("name")).alias("n")).collect()]
    assert out == [True, False, False]
    stats = df.select(name_stats(F.col("name")).alias("s")).first()["s"]
    assert stats["isName"] == "true" and float(stats["nameRatio"]) == 0.5


def test_language_scores_map(spark):
    df = spark.createDataFrame([("the cat and the dog",)], "t string")
    m = df.select(language_scores(F.col("t")).alias("m")).first()["m"]
    assert set(m) == {"de", "en", "es", "fr"}
    assert m["en"] > 0 and m["de"] == 0.0


def test_candidate_entities(spark):
    df = spark.createDataFrame([("Alice met Bob in New York",)], "t string")
    ents = df.select(candidate_entities(F.col("t")).alias("e")).first()["e"]
    assert "Alice" in ents and "Bob" in ents and "New" in ents
    assert "met" not in ents


def test_multilabel_joiners(spark):
    df = spark.createDataFrame([([0.1, 0.7, 0.2],)], "p array<double>")
    labels = ["x", "y", "z"]
    m = df.select(multi_label_joiner(labels, F.col("p")).alias("m")).first()["m"]
    assert m == {"x": 0.1, "y": 0.7, "z": 0.2}
    top2 = df.select(top_n_label_prob_map(labels, F.col("p"), 2).alias("m")).first()["m"]
    assert top2 == {"y": 0.7, "z": 0.2}
    names = df.select(top_n_label_joiner(labels, F.col("p"), 2).alias("l")).first()["l"]
    assert names == ["y", "z"]


def test_top_n_tie_break(spark):
    df = spark.createDataFrame([([0.5, 0.5, 0.1],)], "p array<double>")
    names = df.select(top_n_label_joiner(["b", "a", "c"], F.col("p"), 1).alias("l")).first()["l"]
    assert names == ["a"]  # tie -> label ascending


def test_drop_indices_by(spark):
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.operators.vectorizers import VectorSlot
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<double>")
    f = from_dataframe(df, overrides={"v": "OPVector"})["v"]
    slots = [VectorSlot("a", descriptor="value"),
             VectorSlot("a", indicator_value="NullIndicatorValue"),
             VectorSlot("b", descriptor="value")]
    st = drop_indices_by(f, lambda s: s.indicator_value == "NullIndicatorValue", slots)
    assert df.select(st.expr()).first()["v_dropped"] == [1.0, 3.0]
    assert len(st.slots) == 2


def test_custom_monoid(spark):
    from transmogrifai_spark.sources.readers import AggSpec, CutOffTime, aggregate_events
    register_monoid("sum_squares", lambda c: F.sum(c * c))
    df = spark.createDataFrame([("k", 2.0), ("k", 3.0)], "key string, x double") \
        .withColumn("ts", F.current_timestamp())
    out = aggregate_events(df, "key", "ts", CutOffTime(),
                           [AggSpec("ss", "x", "sum_squares")])
    assert out.first()["ss"] == 13.0


def test_raw_feature_filter_full(spark):
    import random
    rng = random.Random(3)
    train = spark.createDataFrame([(rng.gauss(0, 1), rng.random()) for _ in range(500)],
                                  "stable double, shifted double")
    score = spark.createDataFrame([(rng.gauss(0, 1), rng.random() + 50.0) for _ in range(500)],
                                  "stable double, shifted double")
    res = raw_feature_filter_full(train, score, ["stable", "shifted"],
                                  max_js_divergence=0.5)
    assert "shifted" in res.dropped and res.reasons["shifted"] == "js_divergence"
    assert "stable" not in res.dropped
    assert res.js_divergence["stable"] < 0.2


def test_text_token_histograms_match_hashingtf(spark):
    """The text-bins histogram is Spark ML HashingTF's (the reference's
    hasher, FeatureDistribution.scala:326) summed over rows, per column —
    verified against a manual HashingTF + vector-sum on the same frame."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.stat import Summarizer

    from transmogrifai_spark.functions.text import tokenize
    from transmogrifai_spark.operators.preparators import text_token_histograms

    df = spark.createDataFrame(
        [("the quick brown fox", "alpha beta"),
         ("jumps over the lazy dog", "beta gamma gamma"),
         (None, "alpha"),
         ("the end", None)],
        "a string, b string")
    hists, widths = text_token_histograms(df, ["a", "b"], bins=16)
    assert widths == {"a": 16, "b": 16}
    for c in ("a", "b"):
        manual = (HashingTF(inputCol="toks", outputCol="v", numFeatures=16)
                  .transform(df.select(tokenize(F.col(c)).alias("toks")))
                  .agg(Summarizer.sum(F.col("v")).alias("s"))
                  .first()["s"].toArray())
        assert hists[c] == list(manual), c
    assert sum(hists["a"]) == 11.0 and sum(hists["b"]) == 6.0


def test_text_bins_formula_override(spark):
    """textBinsFormula (RawFeatureFilter.scala:588): the override sees the
    token-count Summary and sets per-column widths; the scoring pass reuses
    the train widths via bins_by_col."""
    from transmogrifai_spark.operators.preparators import text_token_histograms

    df = spark.createDataFrame(
        [("one two three four five six", "hi")] * 10, "long string, short string")
    hists, widths = text_token_histograms(
        df, ["long", "short"], bins=32,
        text_bins_formula=lambda s, b: 8 if s["max"] < 3 else b)
    assert widths == {"long": 32, "short": 8}
    assert len(hists["long"]) == 32 and len(hists["short"]) == 8
    h2, w2 = text_token_histograms(df, ["long", "short"], bins_by_col=widths)
    assert h2 == hists and w2 == widths


def test_rff_text_divergence_drops_shifted_vocab(spark):
    """Free-text raws go through the hashed-token JS check: identical vocab
    passes, disjoint vocab exceeds max_js_divergence and is dropped."""
    base = [("the cat sat on the mat", "common words here") for _ in range(200)]
    shifted = [("zorp blik quux flarn wibble", "common words here")
               for _ in range(200)]
    train = spark.createDataFrame(base, "drifting string, stable string")
    score = spark.createDataFrame(shifted, "drifting string, stable string")
    res = raw_feature_filter_full(train, score, [], max_js_divergence=0.5,
                                  text_cols=["drifting", "stable"])
    assert "drifting" in res.dropped
    assert res.reasons["drifting"] == "js_divergence"
    assert "stable" not in res.dropped
    assert res.js_divergence["stable"] < 0.05
    assert res.js_divergence["drifting"] > 0.5


def test_workflow_rff_routes_free_text(spark):
    """Workflow(raw_feature_filter={scoring_df}) sends free-Text raws through
    the hashed-token JS check: a vocab-drifted text raw is excluded and the
    vector combiner rebuilds over the survivors."""
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.operators.vectorizers import transmogrify
    from transmogrifai_spark.workflow import Workflow

    train = spark.createDataFrame(
        [(i, "the cat sat here", "stable text", float(i)) for i in range(100)],
        "key long, drift string, keep string, x double")
    score = spark.createDataFrame(
        [(i, "zorp blik quux xyzzy", "stable text", float(i))
         for i in range(100)],
        "key long, drift string, keep string, x double")
    feats = from_dataframe(train, overrides={"drift": "Text", "keep": "Text"})
    vec = transmogrify([feats["drift"], feats["keep"], feats["x"]],
                       top_k=5, min_support=1)
    model = Workflow([vec],
                     raw_feature_filter={"scoring_df": score,
                                         "max_js_divergence": 0.5}).fit(train)
    assert "drift" in model.rff.dropped
    assert model.rff.reasons["drift"] == "js_divergence"
    assert "keep" not in model.rff.dropped and "x" not in model.rff.dropped
    assert model.score(train).count() == 100


def test_language_id_extended_scripts_and_latin(spark):
    """Script-first ID: non-Latin scripts decide directly (kana outranks han
    for Japanese); Latin text falls back to the extended stopword profiles."""
    from transmogrifai_spark.llm.textqual import language_id_extended
    cases = [
        ("これはテストです", "ja"),          # kana
        ("日本語のテキストです", "ja"),      # kanji + kana -> ja, not zh
        ("这是一个简单的中文测试文本", "zh"),
        ("안녕하세요 한국어 텍스트입니다", "ko"),
        ("Это простой русский текст для проверки", "ru"),
        ("هذا نص عربي بسيط للاختبار", "ar"),
        ("यह एक सरल हिंदी पाठ है", "hi"),
        ("Αυτό είναι ένα απλό ελληνικό κείμενο", "el"),
        ("the quick brown fox and the lazy dog for a test", "en"),
        ("il gatto e il cane sono che un per del testo", "it"),
        ("o gato e um texto de teste para que os gatos", "pt"),
        ("de kat en de hond is een tekst met het huis", "nl"),
        # round-4 script breadth
        ("এটি একটি সহজ বাংলা লেখা", "bn"),
        ("இது ஒரு எளிய தமிழ் உரை", "ta"),
        ("ఇది ఒక సాధారణ తెలుగు వచనం", "te"),
        ("นี่คือข้อความภาษาไทยง่ายๆ", "th"),
        ("ეს არის მარტივი ქართული ტექსტი", "ka"),
        ("ይህ ቀላል የአማርኛ ጽሑፍ ነው", "am"),
        ("đây là một văn bản tiếng việt đơn giản cho những thử nghiệm", "vi"),
        ("", "und"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "t string")
    out = [r["l"] for r in
           df.select(language_id_extended(F.col("t")).alias("l")).collect()]
    assert out == [want for _, want in cases]


def test_language_id_confusable_pairs(spark):
    """r6 discriminators: same-script confusable groups (no/da, id/ms,
    hr/sr/bs) separate by their discriminator lexicons; text with shared
    function words only (zero discriminator hits) keeps the base guess."""
    from transmogrifai_spark.llm.textqual import language_id_extended
    cases = [
        # Norwegian vs Danish: spelling doublets av/af, etter/efter,
        # språk/sprog, mellom/mellem
        ("og det er en god dag etter regnet kom språk av folket mellom",
         "no"),
        ("og det er en god dag efter regnen kom sprog af folket mellem",
         "da"),
        # Indonesian vs Malay: karena/kerana, uang/wang, bisa/boleh
        ("yang dan di itu dengan untuk tidak karena uang bisa ini", "id"),
        ("yang dan di itu dengan untuk tidak kerana wang boleh ini", "ms"),
        # BCS: tjedan/tisuća/kava (hr), nedelja/hleb/kafa (sr ekavica),
        # sedmica/kahva (bs)
        ("je i u se na za su od kao tjedan kava tisuća ljudi", "hr"),
        ("je i u se na za su od kao nedelja kafa hleb ljudi", "sr"),
        ("je i u se na za su od kao sedmica kahva mahala ljudi", "bs"),
        # shared-words-only BCS text: zero discriminator hits -> base
        # guess (hr profile carries the group)
        ("je i u se na za su od kao ljudi", "hr"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "t string")
    out = [r["l"] for r in
           df.select(language_id_extended(F.col("t")).alias("l")).collect()]
    assert out == [want for _, want in cases]


def test_name_stats_gender(spark):
    from transmogrifai_spark.operators.detectors import name_stats
    df = spark.createDataFrame(
        [("john michael smith",), ("mary anna jones",), ("wei chen",),
         ("john mary",), ("qwerty asdf",)], "t string")
    out = [r["m"] for r in
           df.select(name_stats(F.col("t"), include_gender=True).alias("m")).collect()]
    assert [m["genderValue"] for m in out] == ["M", "F", "U", "U", "U"]
    # default shape unchanged: no genderValue key
    base = df.select(name_stats(F.col("t")).alias("m")).first()["m"]
    assert set(base.keys()) == {"isName", "nameRatio"}


def test_typed_entities(spark):
    """NER output-shape parity (map<entity_type, tokens>): honorific-led
    person, given-name person, org suffix + acronym, gazetteer location,
    month-led date; multi-word chunks stay together; NULL -> empty map."""
    from transmogrifai_spark.operators.detectors import typed_entities
    texts = [
        "Dr Jane Roe met John Smith at Acme Corp in Berlin on January 5.",
        "The IBM and NASA teams visited Stanford University near California.",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = [dict(r["m"]) for r in
            df.select(typed_entities(F.col("t")).alias("m")).collect()]
    assert rows[0]["PERSON"] == ["Jane Roe", "John Smith"]
    assert rows[0]["ORGANIZATION"] == ["Acme Corp"]
    assert rows[0]["LOCATION"] == ["Berlin"]
    assert rows[0]["DATE"] == ["January"]
    assert rows[0]["MISC"] == []
    assert set(rows[1]["ORGANIZATION"]) == {"IBM", "NASA",
                                            "Stanford University"}
    assert rows[1]["LOCATION"] == ["California"]
    assert rows[2] == {}


def test_typed_entities_is_python_free(spark):
    from transmogrifai_spark.operators.detectors import typed_entities
    df = spark.createDataFrame([("Acme Corp in Berlin",)], "t string")
    plan = df.select(typed_entities(F.col("t"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
