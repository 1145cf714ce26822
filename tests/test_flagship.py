"""Flagship AutoML flow + selector extensions."""
import pytest
from pyspark.sql import functions as F


def test_flagship_end_to_end(spark, sf_dir):
    from transmogrifai_spark.flagship import automl_flagship
    scores, report = automl_flagship(spark, sf_dir)
    rows = scores.collect()
    assert len(rows) == 150
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    assert report.metric_value > 0.5          # better than random
    assert len(report.features) > 0
    assert all(f.weight is not None for f in report.features)
    assert "leaderboard" in report.to_json()


def test_random_param_builder_deterministic():
    from transmogrifai_spark.ml.selectors import random_param_builder
    a = random_param_builder("LogisticRegression",
                             {"regParam": (1e-4, 1.0), "maxIter": [10, 20]}, 5, seed=9)
    b = random_param_builder("LogisticRegression",
                             {"regParam": (1e-4, 1.0), "maxIter": [10, 20]}, 5, seed=9)
    assert a == b
    assert len({p["regParam"] for _, p in a}) == 5   # log-uniform sampling varies
    assert all(p["maxIter"] in (10, 20) for _, p in a)


def test_combine_top_models(spark):
    import random
    from pyspark.ml.functions import array_to_vector
    from transmogrifai_spark.ml.selectors import (combine_top_models,
                                                  default_binary_candidates,
                                                  select_binary_model)
    rng = random.Random(2)
    rows = [(i, [rng.random()], 1.0 if rng.random() < 0.5 else 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, arr array<double>, y double") \
        .withColumn("fv", array_to_vector("arr"))
    sel = select_binary_model(df, "fv", "y", "k",
                              candidates=default_binary_candidates(small=True), k=2)
    ens = combine_top_models(sel, df, "fv", "y", "k", top_n=2)
    out = ens.collect()
    assert len(out) == 200
    assert all(0.0 <= r["ensemble_score"] <= 1.0 for r in out)


def test_xgboost_gate():
    from transmogrifai_spark.ml.selectors import xgboost_classifier
    try:
        import xgboost  # noqa: F401
        pytest.skip("xgboost installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="xgboost"):
        xgboost_classifier("f", "y")
