"""Fluent DSL + testkit generators (Rich*Feature and testkit parity)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark import testkit as tk
from transmogrifai_spark.dsl import F_, fluent
from transmogrifai_spark.feature import from_dataframe
from transmogrifai_spark.workflow import Workflow


def test_dsl_arithmetic_chain(spark):
    df = spark.createDataFrame([(10.0, 2.0)], "price double, qty double")
    feats = fluent(from_dataframe(df))
    total = (feats.price * feats.qty).alias("total")
    ratio = (feats.price / feats.qty)
    plus5 = feats.price + 5.0
    out = Workflow([total.f, ratio.f, plus5.f]).fit(df).score(df)
    row = out.first()
    assert row["total"] == 20.0
    assert row[ratio.f.name] == 5.0
    assert row[plus5.f.name] == 15.0


def test_dsl_text_and_filters(spark):
    df = spark.createDataFrame([("bob@corp.io",), ("junk",)], "email string")
    feats = fluent(from_dataframe(df, overrides={"email": "Email"}))
    dom = feats.email.to_email_domain().alias("dom")
    valid = feats.email.is_valid_email().alias("ok")
    out = Workflow([dom.f, valid.f]).fit(df).score(df).collect()
    assert out[0]["dom"] == "corp.io" and out[0]["ok"] is True
    assert out[1]["dom"] is None and out[1]["ok"] is False


def test_dsl_fitted_chain(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    feats = fluent(from_dataframe(df))
    z = feats.x.fill_missing_with_mean().z_normalize()
    out = Workflow([z.f]).fit(df).score(df, keep_intermediate=True)
    vals = [r[z.f.name] for r in out.collect()]
    assert vals[2] == 0.0  # imputed to mean -> z = 0


def test_dsl_one_hot(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "cat string")
    feats = fluent(from_dataframe(df, overrides={"cat": "PickList"}))
    vec = feats.cat.one_hot(top_k=2, min_support=1)
    out = Workflow([vec.f]).fit(df).score(df, keep_intermediate=True)
    assert len(out.first()[vec.f.name]) == 4  # a, b, OTHER, null


def test_dsl_unknown_feature_errors():
    feats = fluent({})
    with pytest.raises(AttributeError, match="no feature"):
        feats.nope


def test_testkit_determinism():
    a = tk.random_real(seed=7).take(5)
    b = tk.random_real(seed=7).take(5)
    assert a == b
    c = tk.random_real(seed=8).take(5)
    assert a != c


def test_testkit_null_injection():
    vals = tk.random_text(prob_empty=0.5, seed=3).take(200)
    nulls = sum(1 for v in vals if v is None)
    assert 60 < nulls < 140


def test_testkit_build_dataframe(spark):
    df, feats = tk.build_dataframe(spark, 50, {
        "amount": tk.random_real(prob_empty=0.2),
        "n": tk.random_integral(),
        "flag": tk.random_binary(),
        "seg": tk.random_picklist(("x", "y")),
        "email": tk.random_email(),
        "tags": tk.random_multipicklist(),
        "props": tk.random_map(),
        "vec": tk.random_vector(dim=4),
        "loc": tk.random_geolocation(),
    }, response="flag")
    assert df.count() == 50
    assert feats["flag"].is_response
    assert feats["seg"].type_tag.name == "PickList"
    assert feats["props"].type_tag.name == "RealMap"
    # null injection materialized
    assert df.where(F.col("amount").isNull()).count() > 0


def test_testkit_through_transmogrify(spark):
    from transmogrifai_spark.operators.vectorizers import transmogrify
    df, feats = tk.build_dataframe(spark, 100, {
        "amount": tk.random_real(prob_empty=0.1),
        "seg": tk.random_picklist(("a", "b", "c"), prob_empty=0.1),
        "flag": tk.random_binary(prob_empty=0.1),
    })
    vec = transmogrify([feats["amount"], feats["seg"], feats["flag"]],
                       top_k=5, min_support=1)
    out = Workflow([vec]).fit(df).score(df, keep_intermediate=True)
    lens = {len(r["features"]) for r in out.collect()}
    assert len(lens) == 1  # fixed-width vectors


def test_dsl_map_ops(spark):
    df = spark.createDataFrame([({"k": 5.0, "j": 1.0},), ({"k": 7.0},)],
                               "m map<string,double>")
    feats = fluent(from_dataframe(df, overrides={"m": "RealMap"}))
    k = feats.m.map_get("k").alias("k_val")
    filtered = feats.m.filter_map(allow=["k"])
    vec = feats.m.map_vectorize()
    out = Workflow([k.f, filtered.f, vec.f]).fit(df).score(df, keep_intermediate=True)
    rows = out.collect()
    assert [r["k_val"] for r in rows] == [5.0, 7.0]
    assert rows[0][filtered.f.name] == {"k": 5.0}
    assert len(rows[0][vec.f.name]) == 4  # j,k values + null slots
