"""Flagship AutoML flow + selector extensions."""
import pytest
from pyspark.sql import functions as F


def test_flagship_end_to_end(spark, sf_dir):
    from transmogrifai_spark.flagship import automl_flagship
    scores, report = automl_flagship(spark, sf_dir)
    rows = scores.collect()
    assert len(rows) == 150
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    metric = next(iter(report["selected_model"]["validation_metric"].values()))
    assert metric > 0.5                        # better than random
    assert len(report["features"]) > 0
    assert all(f["weight"] is not None for f in report["features"])
    assert len(report["leaderboard"]) >= 1


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


def test_cv_equals_manual_folds(spark):
    """OpWorkflowCVTest parity: the selector's fold metrics equal manually
    computed per-fold AUROCs for the same deterministic folds."""
    import random
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector
    from transmogrifai_spark.ml.evaluators import auroc
    from transmogrifai_spark.ml.selectors import (kfold_by_key,
                                                  select_binary_model,
                                                  _binary_score_col)
    rng = random.Random(12)
    rows = [(i, [x := rng.random()], 1.0 if x + rng.gauss(0, 0.2) > 0.5 else 0.0)
            for i in range(300)]
    df = spark.createDataFrame(rows, "k bigint, arr array<double>, y double") \
        .withColumn("fv", array_to_vector("arr"))
    params = {"regParam": 0.01, "maxIter": 20, "elasticNetParam": 0.0}
    sel = select_binary_model(df, "fv", "y", "k",
                              candidates=[("LogisticRegression", params)], k=3)
    manual = []
    for train, valid in kfold_by_key(df, "k", k=3, seed=42):
        m = LogisticRegression(featuresCol="fv", labelCol="y", **params).fit(train)
        manual.append(auroc(_binary_score_col(m.transform(valid)), "score", "y"))
    assert sel.leaderboard[0].fold_metrics == pytest.approx(manual)


def test_runner_evaluate_mode(spark, tmp_path, monkeypatch):
    import json
    import sys
    import types
    from pyspark.sql import functions as F
    from transmogrifai_spark.runner import RunParams, run

    mod = types.ModuleType("fixture_pipeline_eval")

    def build(sp, params):
        df = sp.createDataFrame(
            [(float(i % 2), 0.9 if i % 2 else 0.1) for i in range(40)],
            "label double, raw double")
        from transmogrifai_spark.feature import from_dataframe
        from transmogrifai_spark.operators.filters import alias
        feats = from_dataframe(df)
        return df, [alias(feats["raw"], "score")]

    mod.build = build
    monkeypatch.setitem(sys.modules, "fixture_pipeline_eval", mod)

    model_dir, out_dir = str(tmp_path / "m"), str(tmp_path / "out")
    run(RunParams(mode="train", pipeline="fixture_pipeline_eval",
                  data_dir="x", model_dir=model_dir), spark=spark)
    metrics = run(RunParams(mode="evaluate", pipeline="fixture_pipeline_eval",
                            data_dir="x", model_dir=model_dir, output_dir=out_dir),
                  spark=spark)
    assert metrics["auroc"] == 1.0  # perfectly separable by construction
    on_disk = json.load(open(f"{out_dir}/metrics.json"))
    assert on_disk["auroc"] == 1.0


def test_flagship_merged_insights_report(spark):
    """The flagship's report is the MERGED document (ModelInsights.scala:74):
    provenance + sanity stats + leaderboard + holdout evaluation, JSON-able."""
    import json
    from transmogrifai_spark.flagship import automl_flagship
    _, report = automl_flagship(spark, "/root/testdata/sf0.001")
    assert set(report) >= {"label", "selected_model", "leaderboard",
                           "features", "evaluation"}
    assert report["label"]["train_rows"] > 0
    assert report["selected_model"]["name"]
    assert len(report["leaderboard"]) >= 2
    assert report["evaluation"]["auroc"] > 0.5
    # per-feature sanity stats merged in
    assert any(f.get("label_corr") is not None for f in report["features"])
    json.dumps(report, default=str)  # serializable end-to-end

