"""Vectorizers: one-hot TopK+other+null, numeric fills, hashing,
transmogrify dispatch, slot metadata, pruning estimators."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.feature import from_dataframe, raw_feature
from transmogrifai_spark.operators.preparators import (min_variance_filter,
                                                       raw_feature_filter,
                                                       sanity_checker)
from transmogrifai_spark.operators.vectorizers import (binary_vectorizer,
                                                       hashing_vectorizer,
                                                       integral_vectorizer,
                                                       one_hot_estimator,
                                                       real_vectorizer,
                                                       transmogrify)
from transmogrifai_spark.workflow import Workflow


@pytest.fixture(scope="module")
def cat_df(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [(None,)] * 2
    return spark.createDataFrame(rows, "cat string")


def test_one_hot_topk_other_null(spark, cat_df):
    f = from_dataframe(cat_df, overrides={"cat": "PickList"})["cat"]
    est = one_hot_estimator(f, top_k=2, min_support=1)
    fitted = est.fit(cat_df)
    vals = [s.indicator_value for s in fitted.slots]
    assert vals == ["a", "b", "OTHER", "NullIndicatorValue"]
    out = cat_df.select(F.col("cat"), fitted.expr()).collect()
    by_cat = {r["cat"]: r["cat_vec"] for r in out}
    assert by_cat["a"] == [1.0, 0.0, 0.0, 0.0]
    assert by_cat["c"] == [0.0, 0.0, 1.0, 0.0]   # below topK -> OTHER
    assert by_cat[None] == [0.0, 0.0, 0.0, 1.0]  # null indicator


def test_one_hot_min_support(spark, cat_df):
    f = from_dataframe(cat_df, overrides={"cat": "PickList"})["cat"]
    fitted = one_hot_estimator(f, top_k=10, min_support=3).fit(cat_df)
    vals = [s.indicator_value for s in fitted.slots]
    assert "c" not in vals  # support 2 < 3


def test_real_vectorizer_mean_fill(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    f = from_dataframe(df)["x"]
    fitted = real_vectorizer(f).fit(df)
    rows = df.select(fitted.expr()).collect()
    assert [r["x_vec"] for r in rows] == [[1.0, 0.0], [3.0, 0.0], [2.0, 1.0]]


def test_integral_vectorizer_mode_fill(spark):
    df = spark.createDataFrame([(7,), (7,), (9,), (None,)], "x bigint")
    f = from_dataframe(df)["x"]
    fitted = integral_vectorizer(f).fit(df)
    assert df.select(fitted.expr()).collect()[-1]["x_vec"] == [7.0, 1.0]


def test_binary_vectorizer(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "x boolean")
    f = from_dataframe(df)["x"]
    rows = df.select(binary_vectorizer(f).expr()).collect()
    assert [r["x_vec"] for r in rows] == [[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]


def test_hashing_vectorizer_counts(spark):
    df = spark.createDataFrame([(["a", "b", "a"],), ([],)], "toks array<string>")
    f = from_dataframe(df, overrides={"toks": "TextList"})["toks"]
    rows = df.select(hashing_vectorizer(f, num_features=8).expr()).collect()
    v0, v_empty = rows[0]["toks_vec"], rows[1]["toks_vec"]
    assert sum(v0) == 3.0 and max(v0) == 2.0  # 'a' twice, 'b' once
    assert sum(v_empty) == 0.0 and len(v_empty) == 8


def test_transmogrify_mixed(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 5, True), ("b", None, 7, None)],
        "cat string, real double, n bigint, b boolean")
    feats = from_dataframe(df, overrides={"cat": "PickList"})
    vec = transmogrify(list(feats.values()), top_k=5, min_support=1)
    out = Workflow([vec]).fit(df).score(df, keep_intermediate=True)
    v = out.select("features").first()["features"]
    # 2 cat values + OTHER + null  |  real value+null  |  n value+null  |  b value+null
    assert len(v) == 4 + 2 + 2 + 2


def test_min_variance_filter(spark):
    df = spark.createDataFrame([([1.0, 5.0],), ([1.0, 7.0],)], "v array<double>")
    f = from_dataframe(df, overrides={"v": "OPVector"})["v"]
    fitted = min_variance_filter(f).fit(df)
    assert df.select(fitted.expr()).first()["v_pruned"] == [5.0]  # constant slot dropped


def test_sanity_checker_drops_leaky_slot(spark):
    import random
    rng = random.Random(7)
    rows = []
    for _ in range(100):
        y = float(rng.randint(0, 1))
        rows.append(([y, rng.random()], y))  # slot0 == label (leak), slot1 noise
    df = spark.createDataFrame(rows, "v array<double>, label double")
    feats = from_dataframe(df, overrides={"v": "OPVector"})
    fitted = sanity_checker(feats["v"], feats["label"], max_correlation=0.95).fit(df)
    assert len(fitted.slots) == 1  # leaky slot gone, noise slot kept


def test_raw_feature_filter(spark):
    df = spark.createDataFrame([(1.0, None), (2.0, None), (None, 1.0)], "a double, b double")
    res = raw_feature_filter(df, ["a", "b"], min_fill_rate=0.5)
    assert res.dropped == ["b"]
    assert res.fill_rates["a"] == pytest.approx(2 / 3)


def test_cramers_v_association(spark):
    from transmogrifai_spark.operators.preparators import cramers_v
    # perfectly associated: V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "c string, l string")
    assert cramers_v(df, "c", "l") == pytest.approx(1.0)
    # independent-ish: V near 0
    rows2 = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 10
    df2 = spark.createDataFrame(rows2, "c string, l string")
    assert cramers_v(df2, "c", "l") == pytest.approx(0.0, abs=1e-9)


def test_spearman_corr(spark):
    from transmogrifai_spark.operators.preparators import spearman_corr
    # monotone relationship -> 1.0 exactly (rank-based)
    df = spark.createDataFrame([(float(i), float(i * i)) for i in range(50)], "a double, b double")
    assert spearman_corr(df, "a", "b") == pytest.approx(1.0)
    # anti-monotone -> -1.0
    df2 = spark.createDataFrame([(float(i), float(-i)) for i in range(50)], "a double, b double")
    assert spearman_corr(df2, "a", "b") == pytest.approx(-1.0)
