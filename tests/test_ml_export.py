"""Spark-free scoring across the ML boundary (OpWorkflowModelLocal parity):
exported predictor params must reproduce the fitted Spark ML model through
the registry's triple paths — Spark Column expr == local row fn ==
model.transform — and LOCO must work for any model via one exploded pass."""
import math

import pytest
from pyspark.sql import functions as F
from pyspark.ml.functions import array_to_vector, vector_to_array

from transmogrifai_spark.serving import registry
from transmogrifai_spark.serving.ml_export import export_model_params


def _fit_df(spark, n=200, classify=True):
    import random
    rng = random.Random(9)
    rows = []
    for _ in range(n):
        x0, x1 = rng.uniform(-2, 2), rng.uniform(-2, 2)
        y = (1.0 if x0 + 0.5 * x1 + rng.gauss(0, 0.3) > 0 else 0.0) if classify \
            else x0 * 2 + x1 + rng.gauss(0, 0.1)
        rows.append(([x0, x1], y))
    df = spark.createDataFrame(rows, "arr array<double>, label double")
    return df.withColumn("fv", array_to_vector(F.col("arr")))


def _check_export(spark, df, model, spark_score_col, tol=1e-9):
    """model.transform score == registry expr == local fn, row by row."""
    params = export_model_params(model)
    expr = registry.expr_for("mlPredictor", params)
    local = registry.local_for("mlPredictor", params)
    scored = model.transform(df).select("arr", spark_score_col.alias("want"),
                                        expr(F.col("arr")).alias("got_expr"))
    for r in scored.collect():
        assert r["got_expr"] == pytest.approx(r["want"], rel=tol, abs=tol)
        assert local(r["arr"]) == pytest.approx(r["want"], rel=tol, abs=tol)


def test_logistic_export(spark):
    from pyspark.ml.classification import LogisticRegression
    df = _fit_df(spark)
    m = LogisticRegression(featuresCol="fv", labelCol="label", maxIter=20).fit(df)
    _check_export(spark, df, m, vector_to_array(F.col("probability"))[1])


def test_linear_export(spark):
    from pyspark.ml.regression import LinearRegression
    df = _fit_df(spark, classify=False)
    m = LinearRegression(featuresCol="fv", labelCol="label", maxIter=20).fit(df)
    _check_export(spark, df, m, F.col("prediction"))


def test_decision_tree_export(spark):
    """Classifier trees export leaf CLASS DISTRIBUTIONS (via the Java node
    walk), so the exported score equals Spark's probability[1], not just the
    argmax prediction."""
    from pyspark.ml.classification import DecisionTreeClassifier
    df = _fit_df(spark)
    m = DecisionTreeClassifier(featuresCol="fv", labelCol="label",
                               maxDepth=4, seed=7).fit(df)
    _check_export(spark, df, m, vector_to_array(F.col("probability"))[1])


def test_gbt_regressor_export(spark):
    from pyspark.ml.regression import GBTRegressor
    df = _fit_df(spark, classify=False)
    m = GBTRegressor(featuresCol="fv", labelCol="label", maxIter=5,
                     maxDepth=3, seed=7).fit(df)
    _check_export(spark, df, m, F.col("prediction"))


def test_gbt_classifier_export(spark):
    from pyspark.ml.classification import GBTClassifier
    df = _fit_df(spark)
    m = GBTClassifier(featuresCol="fv", labelCol="label", maxIter=5,
                      maxDepth=3, seed=7).fit(df)
    _check_export(spark, df, m, vector_to_array(F.col("probability"))[1])


def test_rf_regressor_export(spark):
    from pyspark.ml.regression import RandomForestRegressor
    df = _fit_df(spark, classify=False)
    m = RandomForestRegressor(featuresCol="fv", labelCol="label", numTrees=5,
                              maxDepth=3, seed=7).fit(df)
    _check_export(spark, df, m, F.col("prediction"))


def test_rf_classifier_export(spark):
    """RF probability = mean over trees of per-leaf class distributions —
    exportable only through the Java node walk (toDebugString lacks the
    distributions)."""
    from pyspark.ml.classification import RandomForestClassifier
    df = _fit_df(spark)
    m = RandomForestClassifier(featuresCol="fv", labelCol="label", numTrees=5,
                               maxDepth=3, seed=7).fit(df)
    _check_export(spark, df, m, vector_to_array(F.col("probability"))[1])


def test_loco_any_model_matches_linear_loco(spark):
    """For a logistic model, loco_any_model's zeroed-slot deltas must equal
    loco_linear's closed-form deltas (same definition, two computations)."""
    from pyspark.ml.classification import LogisticRegression
    from transmogrifai_spark.ml.insights import loco_any_model, loco_linear
    df = _fit_df(spark, n=40).withColumn("id", F.monotonically_increasing_id())
    m = LogisticRegression(featuresCol="fv", labelCol="label", maxIter=20).fit(df)
    any_out = {r["id"]: r for r in
               loco_any_model(df, m, "arr", ["id"], top_k=2).collect()}
    lin_out = {r["id"]: r for r in
               loco_linear(df, "arr", float(m.intercept),
                           list(m.coefficients.toArray()), top_k=2).collect()}
    assert set(any_out) == set(lin_out)
    for k in any_out:
        a, l = any_out[k], lin_out[k]
        assert a["base_score"] == pytest.approx(l["base_score"], rel=1e-9)
        assert [e["slot"] for e in a["loco"]] == [e["slot"] for e in l["loco"]]
        for ea, el in zip(a["loco"], l["loco"]):
            assert ea["delta"] == pytest.approx(el["delta"], rel=1e-6, abs=1e-9)


def test_loco_any_model_works_on_trees(spark):
    """Model-agnostic path: LOCO over a GBT classifier (no closed form)."""
    from pyspark.ml.classification import GBTClassifier
    from transmogrifai_spark.ml.insights import loco_any_model
    df = _fit_df(spark, n=60).withColumn("id", F.monotonically_increasing_id())
    m = GBTClassifier(featuresCol="fv", labelCol="label", maxIter=3,
                      maxDepth=2, seed=7).fit(df)
    out = loco_any_model(df, m, "arr", ["id"], top_k=2).collect()
    assert len(out) == 60
    for r in out:
        assert 0.0 <= r["base_score"] <= 1.0
        assert len(r["loco"]) == 2
        assert {e["slot"] for e in r["loco"]} <= {0, 1}


def test_predictor_stage_full_persistence_roundtrip(spark, tmp_path):
    """Workflow + model persist together and score Spark-free: transmogrify
    -> exported LR predictor stage -> save -> load -> identical scores, and
    the local compiled form agrees row by row."""
    from pyspark.ml.classification import LogisticRegression
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.serving.ml_export import predictor_stage
    from transmogrifai_spark.serving.persistence import load_model, save_model
    from transmogrifai_spark.serving.local import compile_local
    from transmogrifai_spark.operators.vectorizers import to_ml_vector, transmogrify_batched
    from transmogrifai_spark.workflow import Workflow

    df = _fit_df(spark)
    feats = from_dataframe(df.select("arr", "label"), response="label")
    lr = LogisticRegression(featuresCol="fv", labelCol="label", maxIter=10).fit(df)
    st = predictor_stage(lr, feats["arr"], output_name="score")
    model = Workflow([st.output]).fit(df)
    path = str(tmp_path / "m")
    save_model(model, path)
    loaded = load_model(path)
    a = [r["score"] for r in model.score(df, keep_intermediate=True).select("score").collect()]
    b = [r["score"] for r in loaded.score(df, keep_intermediate=True).select("score").collect()]
    assert a == b
    local = compile_local(loaded)
    rows = df.select("arr").collect()
    for r, want in zip(rows, a):
        got = local({"arr": list(r["arr"])})["score"]
        assert got == pytest.approx(want, rel=1e-9)


def test_model_selector_stage_in_workflow(spark, tmp_path):
    """ModelSelector as a workflow stage: CV selection happens inside
    Workflow.fit, the winner persists WITH the workflow (manifest carries the
    exported params + leaderboard), and the loaded model scores unlabeled
    frames identically — including Spark-free via compile_local."""
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.ml.selectors import model_selector_stage
    from transmogrifai_spark.serving.local import compile_local
    from transmogrifai_spark.serving.persistence import load_model, save_model
    from transmogrifai_spark.workflow import Workflow

    df = _fit_df(spark).withColumn("k", F.monotonically_increasing_id())
    feats = from_dataframe(df.select("k", "arr", "label"), response="label")
    st = model_selector_stage(
        feats["arr"], feats["label"], feats["k"],
        candidates=[("LogisticRegression", {"regParam": 0.01, "maxIter": 15}),
                    ("RandomForestClassifier",
                     {"maxDepth": 3, "numTrees": 5, "seed": 7})],
        k=2)
    model = Workflow([st.output]).fit(df)
    path = str(tmp_path / "wf")
    save_model(model, path)
    loaded = load_model(path)

    unlabeled = df.select("k", "arr")  # label/key are fit-time-only
    a = {r["k"]: r["score"] for r in
         model.score(df, keep_intermediate=True).select("k", "score").collect()}
    b = {r["k"]: r["score"] for r in
         loaded.score(unlabeled, keep_intermediate=True).select("k", "score").collect()}
    assert a == b and len(a) == 200
    assert all(0.0 <= v <= 1.0 for v in a.values())

    # the selection leaderboard survives the manifest round-trip
    fitted = loaded.layers[-1][-1]
    sel = fitted.params["selection"]
    assert {c["name"] for c in sel["leaderboard"]} == \
        {"LogisticRegression", "RandomForestClassifier"}
    assert sel["best_metric"] > 0.5

    # Spark-free local scoring agrees row by row
    local = compile_local(loaded)
    for r in df.select("k", "arr").collect():
        got = local({"k": r["k"], "arr": list(r["arr"])})["score"]
        assert got == pytest.approx(a[r["k"]], rel=1e-9)


def _multi_df(spark, n=240):
    import random
    rng = random.Random(13)
    rows = []
    for _ in range(n):
        x0, x1 = rng.uniform(-2, 2), rng.uniform(-2, 2)
        y = 0.0 if x0 + x1 < -0.5 else (1.0 if x0 + x1 < 0.5 else 2.0)
        rows.append(([x0, x1], y))
    df = spark.createDataFrame(rows, "arr array<double>, label double")
    return df.withColumn("fv", array_to_vector(F.col("arr")))


def _check_multi_export(spark, df, model, tol=1e-9):
    """Exported probability ARRAY == Spark's probability vector, both paths."""
    params = export_model_params(model)
    expr = registry.expr_for("mlPredictor", params)
    local = registry.local_for("mlPredictor", params)
    scored = model.transform(df).select(
        "arr", vector_to_array(F.col("probability")).alias("want"),
        expr(F.col("arr")).alias("got"))
    for r in scored.collect():
        assert list(r["got"]) == pytest.approx(list(r["want"]), rel=tol, abs=tol)
        assert local(r["arr"]) == pytest.approx(list(r["want"]), rel=tol, abs=tol)


def test_multinomial_logistic_export(spark):
    from pyspark.ml.classification import LogisticRegression
    df = _multi_df(spark)
    m = LogisticRegression(featuresCol="fv", labelCol="label", maxIter=25).fit(df)
    assert m.numClasses == 3
    _check_multi_export(spark, df, m)


def test_multiclass_dt_export(spark):
    from pyspark.ml.classification import DecisionTreeClassifier
    df = _multi_df(spark)
    m = DecisionTreeClassifier(featuresCol="fv", labelCol="label",
                               maxDepth=4, seed=7).fit(df)
    _check_multi_export(spark, df, m, tol=0.0)


def test_multiclass_rf_export(spark):
    from pyspark.ml.classification import RandomForestClassifier
    df = _multi_df(spark)
    m = RandomForestClassifier(featuresCol="fv", labelCol="label", numTrees=5,
                               maxDepth=3, seed=7).fit(df)
    _check_multi_export(spark, df, m)


def test_linear_svc_export(spark):
    """SVC exports the raw margin: rawPrediction[1] == w.x + b."""
    from pyspark.ml.classification import LinearSVC
    df = _fit_df(spark)
    m = LinearSVC(featuresCol="fv", labelCol="label", maxIter=20).fit(df)
    _check_export(spark, df, m, vector_to_array(F.col("rawPrediction"))[1])


def test_naive_bayes_export(spark):
    """Multinomial NB over count features: exported probability array equals
    Spark's probability vector (pi + theta.x, exp-normalized)."""
    import random
    from pyspark.ml.classification import NaiveBayes
    rng = random.Random(11)
    rows = []
    for _ in range(240):
        y = float(rng.randrange(3))
        # class-dependent count features (NB needs nonnegative values)
        rows.append(([float(rng.randrange(int(2 + 3 * y) + 1)),
                      float(rng.randrange(6 - int(y))),
                      float(rng.randrange(4))], y))
    df = spark.createDataFrame(rows, "arr array<double>, label double") \
        .withColumn("fv", array_to_vector(F.col("arr")))
    m = NaiveBayes(featuresCol="fv", labelCol="label",
                   modelType="multinomial").fit(df)
    assert m.numClasses == 3
    _check_multi_export(spark, df, m)


def test_naive_bayes_non_multinomial_gated(spark):
    from pyspark.ml.classification import NaiveBayes
    df = _fit_df(spark).withColumn(
        "fv", array_to_vector(F.transform("arr", lambda v: F.abs(v))))
    m = NaiveBayes(featuresCol="fv", labelCol="label",
                   modelType="gaussian").fit(df)
    with pytest.raises(NotImplementedError, match="multinomial"):
        export_model_params(m)


def test_mlp_export(spark):
    """MLP: column-major affine unroll + sigmoid hidden + softmax top must
    reproduce Spark's probability vector through both registry paths."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    df = _multi_df(spark)
    m = MultilayerPerceptronClassifier(
        featuresCol="fv", labelCol="label", layers=[2, 5, 4, 3],
        maxIter=40, seed=7).fit(df)
    _check_multi_export(spark, df, m, tol=1e-7)


def test_svc_and_mlp_predictor_stage_roundtrip(spark, tmp_path):
    """Manifest round-trip + local scoring for the round-4 export families
    (SVC margin is a scalar; MLP scores an array of class probabilities)."""
    from pyspark.ml.classification import (LinearSVC,
                                           MultilayerPerceptronClassifier)
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.serving.local import compile_local
    from transmogrifai_spark.serving.ml_export import predictor_stage
    from transmogrifai_spark.serving.persistence import load_model, save_model
    from transmogrifai_spark.workflow import Workflow

    df = _fit_df(spark)
    feats = from_dataframe(df.select("arr", "label"), response="label")
    svc = LinearSVC(featuresCol="fv", labelCol="label", maxIter=15).fit(df)
    mdf = _multi_df(spark)
    mfeats = from_dataframe(mdf.select("arr", "label"), response="label")
    mlp = MultilayerPerceptronClassifier(
        featuresCol="fv", labelCol="label", layers=[2, 4, 3],
        maxIter=25, seed=7).fit(mdf)

    for data, fts, model, out_name in ((df, feats, svc, "margin"),
                                       (mdf, mfeats, mlp, "probs")):
        st = predictor_stage(model, fts["arr"], output_name=out_name)
        wf = Workflow([st.output]).fit(data)
        path = str(tmp_path / out_name)
        save_model(wf, path)
        loaded = load_model(path)
        a = [r[out_name] for r in
             wf.score(data, keep_intermediate=True).select(out_name).collect()]
        b = [r[out_name] for r in
             loaded.score(data, keep_intermediate=True).select(out_name).collect()]
        assert a == b and len(a) > 0
        local = compile_local(loaded)
        for r, want in zip(data.select("arr").collect(), a):
            got = local({"arr": list(r["arr"])})[out_name]
            if isinstance(want, list):
                assert got == pytest.approx(want, rel=1e-9)
            else:
                assert got == pytest.approx(want, rel=1e-9)
