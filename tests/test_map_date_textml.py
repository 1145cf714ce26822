"""Map vectorizers, date-list vectorizer, ml-wrapped text stages, runner."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.feature import from_dataframe
from transmogrifai_spark.operators.date_ops import (date_list_vectorizer,
                                                    date_map_days_ago)
from transmogrifai_spark.operators.map_vectorizers import (
    binary_map_vectorizer, real_map_vectorizer, text_map_len_vectorizer,
    text_map_pivot_vectorizer)


def test_real_map_vectorizer(spark):
    df = spark.createDataFrame(
        [({"a": 1.0, "b": 10.0},), ({"a": 3.0},), ({"b": 20.0},)],
        "m map<string,double>")
    f = from_dataframe(df, overrides={"m": "RealMap"})["m"]
    fitted = real_map_vectorizer(f).fit(df)
    rows = [r["m_vec"] for r in df.select(fitted.expr()).collect()]
    # keys [a, b]; fills: mean(a)=2, mean(b)=15; layout [a, b, a_null, b_null]
    assert rows[0] == [1.0, 10.0, 0.0, 0.0]
    assert rows[1] == [3.0, 15.0, 0.0, 1.0]
    assert rows[2] == [2.0, 20.0, 1.0, 0.0]


def test_real_map_vectorizer_allowlist(spark):
    df = spark.createDataFrame([({"a": 1.0, "junk": 9.0},)], "m map<string,double>")
    f = from_dataframe(df, overrides={"m": "RealMap"})["m"]
    fitted = real_map_vectorizer(f, allow_keys=["a"]).fit(df)
    assert fitted.params["keys"] == ["a"]


def test_binary_map_vectorizer(spark):
    df = spark.createDataFrame([({"x": True},), ({"x": False, "y": True},)],
                               "m map<string,boolean>")
    f = from_dataframe(df, overrides={"m": "BinaryMap"})["m"]
    fitted = binary_map_vectorizer(f).fit(df)
    rows = [r["m_vec"] for r in df.select(fitted.expr()).collect()]
    assert rows[0] == [1.0, 0.0, 0.0, 1.0]  # x=1, y missing; nulls: x=0,y=1
    assert rows[1] == [0.0, 1.0, 0.0, 0.0]


def test_text_map_pivot_vectorizer(spark):
    df = spark.createDataFrame(
        [({"color": "red"},), ({"color": "red", "size": "L"},), ({"color": "blue"},)],
        "m map<string,string>")
    f = from_dataframe(df, overrides={"m": "PickListMap"})["m"]
    fitted = text_map_pivot_vectorizer(f, top_k=1).fit(df)
    # color: top1=red(+OTHER+null) ; size: top1=L(+OTHER+null)
    assert fitted.params["pivots"] == {"color": ["red"], "size": ["L"]}
    rows = [r["m_vec"] for r in df.select(fitted.expr()).collect()]
    assert rows[0] == [1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
    assert rows[2] == [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]  # blue -> OTHER


def test_text_map_len(spark):
    df = spark.createDataFrame([({"k": "abc"},), ({},)], "m map<string,string>")
    f = from_dataframe(df, overrides={"m": "TextMap"})["m"]
    fitted = text_map_len_vectorizer(f).fit(df)
    rows = [r["m_len_vec"] for r in df.select(fitted.expr()).collect()]
    assert rows == [[3.0], [0.0]]


def test_date_list_vectorizer(spark):
    jan1 = 1704067200000  # 2024-01-01 UTC
    jan10 = jan1 + 9 * 86400000
    df = spark.createDataFrame([([jan1, jan10],), ([],)], "d array<bigint>")
    f = from_dataframe(df, overrides={"d": "DateTimeList"})["d"]
    st = date_list_vectorizer(f, reference_date="2024-01-15 00:00:00")
    rows = [r["d_vec"] for r in df.select(st.expr()).collect()]
    assert rows[0] == [14.0, 5.0]  # since first (jan1), since last (jan10)
    assert rows[1] == [0.0, 0.0]


def test_date_list_mode_pivot(spark):
    jan1 = 1704067200000
    days = [jan1, jan1 + 86400000, jan1 + 86400000]  # Mon, Tue, Tue
    df = spark.createDataFrame([(days,)], "d array<bigint>")
    f = from_dataframe(df, overrides={"d": "DateTimeList"})["d"]
    st = date_list_vectorizer(f, reference_date="2024-01-15 00:00:00",
                              pivots=("ModeDay",))
    assert df.select(st.expr()).first()["d_vec"] == [3.0]  # Tuesday = 3 (Spark dayofweek)


def test_date_map_days_ago(spark):
    jan1 = 1704067200000
    df = spark.createDataFrame([({"signup": jan1},)], "m map<string,bigint>")
    f = from_dataframe(df, overrides={"m": "DateMap"})["m"]
    st = date_map_days_ago(f, ["signup", "churn"], "2024-01-11 00:00:00")
    assert df.select(st.expr()).first()["m_vec"] == [10.0, 0.0]


def test_count_vectorizer_and_tfidf(spark):
    from transmogrifai_spark.operators.text_ml import count_vectorizer, tfidf
    df = spark.createDataFrame([(["a", "b", "a"],), (["b", "c"],)], "toks array<string>")
    f = from_dataframe(df, overrides={"toks": "TextList"})["toks"]
    cv = count_vectorizer(f, vocab_size=10).fit(df)
    out = cv.transform(df)
    rows = [r["toks_counts"] for r in out.collect()]
    assert len(rows[0]) == 3  # vocab a,b,c
    assert sum(rows[0]) == 3.0
    ti = tfidf(f, num_features=16).fit(df)
    tf_rows = ti.transform(df).collect()
    assert len(tf_rows[0]["toks_tfidf"]) == 16


def test_word2vec(spark):
    from transmogrifai_spark.operators.text_ml import word2vec
    df = spark.createDataFrame([(["hello", "world"],), (["hello", "spark"],)],
                               "toks array<string>")
    f = from_dataframe(df, overrides={"toks": "TextList"})["toks"]
    fitted = word2vec(f, vector_size=8).fit(df)
    rows = fitted.transform(df).collect()
    assert len(rows[0]["toks_w2v"]) == 8


def test_runner_train_score_roundtrip(spark, tmp_path, monkeypatch):
    import sys
    import types
    from transmogrifai_spark.runner import RunParams, run

    mod = types.ModuleType("fixture_pipeline")

    def build(sp, params):
        df = sp.createDataFrame([("a", 1.0), ("b", 2.0), ("a", None)],
                                "cat string, x double")
        from transmogrifai_spark.feature import from_dataframe
        from transmogrifai_spark.operators.vectorizers import transmogrify
        feats = from_dataframe(df, overrides={"cat": "PickList"})
        vec = transmogrify([feats["cat"], feats["x"]], top_k=3, min_support=1)
        return df, [vec]

    mod.build = build
    monkeypatch.setitem(sys.modules, "fixture_pipeline", mod)

    model_dir = str(tmp_path / "model")
    run(RunParams(mode="train", pipeline="fixture_pipeline",
                  data_dir="unused", model_dir=model_dir), spark=spark)
    scores = run(RunParams(mode="score", pipeline="fixture_pipeline",
                           data_dir="unused", model_dir=model_dir), spark=spark)
    assert scores.count() == 3 and "features" in scores.columns


def test_smart_text_map_vectorizer(spark):
    from transmogrifai_spark.operators.map_vectorizers import smart_text_map_vectorizer
    rows = []
    for i in range(40):
        rows.append(({"color": ["red", "blue"][i % 2],
                      "note": f"unique text number {i} with words"},))
    df = spark.createDataFrame(rows, "m map<string,string>")
    f = from_dataframe(df, overrides={"m": "TextMap"})["m"]
    fitted = smart_text_map_vectorizer(f, max_cardinality=5, top_k=3,
                                       hash_features=16).fit(df)
    assert fitted.params["strategies"] == {"color": "pivot", "note": "hash"}
    v = df.select(fitted.expr()).first()["m_vec"]
    # color: red,blue,OTHER,null (4) + note: 16 hash + null (17)
    assert len(v) == 4 + 17
    assert len(v) == len(fitted.slots)
    assert sum(v[:3]) == 1.0  # exactly one pivot indicator hot


def test_null_tracking_vectorizers(spark):
    from transmogrifai_spark.operators.map_vectorizers import (
        text_list_null_vectorizer, text_map_null_vectorizer)
    df = spark.createDataFrame([(["a"], {"k": "v"}), (None, {})],
                               "l array<string>, m map<string,string>")
    feats = from_dataframe(df, overrides={"l": "TextList", "m": "TextMap"})
    lst = text_list_null_vectorizer(feats["l"])
    assert [r[lst.output_name] for r in df.select(lst.expr()).collect()] == [[0.0], [1.0]]
    fitted = text_map_null_vectorizer(feats["m"]).fit(df)
    assert [r[fitted.output_name] for r in df.select(fitted.expr()).collect()] == [[0.0], [1.0]]
