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
