"""Fitted numeric operators (§2.6): fills, scalers, bucketizers, calibrators."""
import math

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.feature import from_dataframe
from transmogrifai_spark.operators.numeric import (ScalingArgs,
                                                   decision_tree_bucketizer,
                                                   descaler,
                                                   fill_missing_with_mean,
                                                   isotonic_calibrator,
                                                   numeric_bucketizer,
                                                   percentile_calibrator,
                                                   scaler, standard_scaler)


def test_fill_missing_with_mean(spark):
    df = spark.createDataFrame([(2.0,), (4.0,), (None,)], "x double")
    f = from_dataframe(df)["x"]
    fitted = fill_missing_with_mean(f).fit(df)
    assert [r["x_imputed"] for r in df.select(fitted.expr()).collect()] == [2.0, 4.0, 3.0]
    assert fitted.params["mean"] == 3.0


def test_standard_scaler(spark):
    df = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    f = from_dataframe(df)["x"]
    fitted = standard_scaler(f).fit(df)
    vals = sorted(r["x_scaled"] for r in df.select(fitted.expr()).collect())
    assert vals == [-1.0, 1.0]  # mean 2, pop std 1


def test_scaler_descaler_roundtrip(spark):
    df = spark.createDataFrame([(10.0,), (20.0,)], "x double")
    f = from_dataframe(df)["x"]
    args = ScalingArgs(family="linear", slope=2.0, intercept=3.0)
    s = scaler(f, args)
    d = descaler(s.output, args)
    out = df.select(F.col("x"), s.expr()).select("x", d._make_expr(F.col(s.output_name)).alias("back"))
    for r in out.collect():
        assert r["back"] == pytest.approx(r["x"])


def test_log_scaler_descaler(spark):
    df = spark.createDataFrame([(math.e,)], "x double")
    f = from_dataframe(df)["x"]
    args = ScalingArgs(family="log")
    out = df.select(scaler(f, args).expr()).first()[0]
    assert out == pytest.approx(1.0)


def test_numeric_bucketizer(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (1.5,), (99.0,), (None,)], "x double")
    f = from_dataframe(df)["x"]
    st = numeric_bucketizer(f, splits=[-math.inf, 0.0, 1.0, math.inf])
    assert [r["x_bucket"] for r in df.select(st.expr()).collect()] == [0, 1, 2, 2, None]


def test_numeric_bucketizer_onehot(spark):
    df = spark.createDataFrame([(0.5,), (None,)], "x double")
    f = from_dataframe(df)["x"]
    st = numeric_bucketizer(f, splits=[0.0, 1.0, 2.0], as_onehot=True)
    rows = [r["x_bucket"] for r in df.select(st.expr()).collect()]
    assert rows == [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]


def test_percentile_calibrator(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    f = from_dataframe(df)["x"]
    fitted = percentile_calibrator(f, buckets=4).fit(df)
    out = df.select(F.col("x"), fitted.expr().alias("b")).collect()
    by_val = {r["x"]: r["b"] for r in out}
    assert by_val[0.0] == 0 and by_val[50.0] == 2 and by_val[99.0] == 3


def test_decision_tree_bucketizer_finds_boundary(spark):
    rows = [(float(i), 0.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    feats = from_dataframe(df, response="y")
    fitted = decision_tree_bucketizer(feats["x"], feats["y"], max_depth=1).fit(df)
    interior = fitted.params["splits"][1:-1]  # full list is [-inf, ..., inf]
    assert len(interior) >= 1 and 40 <= interior[0] <= 60  # boundary near 50


def test_isotonic_calibrator_monotone(spark):
    import random
    rng = random.Random(1)
    rows = [(i / 100, 1.0 if rng.random() < i / 100 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y double")
    feats = from_dataframe(df, response="y")
    fitted = isotonic_calibrator(feats["s"], feats["y"]).fit(df)
    out = [r["c"] for r in df.orderBy("s").select(fitted.expr().alias("c")).collect()]
    assert all(a <= b + 1e-9 for a, b in zip(out, out[1:]))  # monotone


def test_decision_tree_map_bucketizer(spark):
    """Map form (DecisionTreeNumericMapBucketizer.scala:46): per-key trees
    find each key's boundary; vector = per-key one-hot + null slot; the
    Spark expr and the serving-registry local fn agree row by row."""
    from transmogrifai_spark.operators.numeric import decision_tree_map_bucketizer
    from transmogrifai_spark.serving import registry
    rows = []
    for i in range(100):
        m = {"a": float(i), "b": float(100 - i)}
        if i % 10 == 0:
            m.pop("b")  # missing key -> null slot
        rows.append((m, 0.0 if i < 50 else 1.0))
    df = spark.createDataFrame(rows, "m map<string,double>, y double")
    feats = from_dataframe(df, response="y")
    fitted = decision_tree_map_bucketizer(feats["m"], feats["y"], max_depth=1).fit(df)
    assert fitted.params["keys"] == ["a", "b"]
    for k in ("a", "b"):
        interior = fitted.params["splits"][k][1:-1]
        assert len(interior) >= 1 and 40 <= interior[0] <= 60
    # fitted stage takes the map alone (label is fit-time-only)
    assert [f.name for f in fitted.inputs] == ["m"]
    out = df.select(F.col("m"), fitted.expr().alias("v")).collect()
    local = registry.local_for("dtMapBucketizer", fitted.params)
    for r in out:
        v = r["v"]
        assert len(v) == len(fitted.slots)
        assert v == local(r["m"])
        # each key contributes exactly one hot bucket, or the null slot
        assert sum(v) == pytest.approx(2.0)


def test_mlp_in_classifier_zoo(spark):
    """MultilayerPerceptronClassifier with layers="auto" resolves the layer
    spec from the data and competes in the CV leaderboard."""
    import random
    from transmogrifai_spark.ml.selectors import select_binary_model
    from pyspark.ml.functions import array_to_vector
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1), rng.uniform(-1, 1)]) for i in range(120)]
    df = spark.createDataFrame(rows, "k long, arr array<double>") \
        .withColumn("fv", array_to_vector(F.col("arr"))) \
        .withColumn("y", (F.col("arr")[0] + F.col("arr")[1] > 0).cast("double"))
    sel = select_binary_model(
        df, "fv", "y", "k",
        candidates=[("MultilayerPerceptronClassifier",
                     {"layers": "auto", "maxIter": 30, "seed": 42}),
                    ("LogisticRegression", {"regParam": 0.01, "maxIter": 10})],
        k=2)
    names = {c.name for c in sel.leaderboard}
    assert "MultilayerPerceptronClassifier" in names
    mlp = next(c for c in sel.leaderboard if c.name == "MultilayerPerceptronClassifier")
    assert mlp.metric > 0.5  # separable-ish problem, better than random
    # the stored params keep the "auto" marker (resolved only at fit time)
    assert mlp.params["layers"] == "auto"


def test_percentile_calibrator_approx_close_to_exact(spark, sf_dir):
    """approx=True (GK sketch, the 100 TB fit path) lands each row within a
    bucket of the exact calibration, and the stage contract is identical."""
    from transmogrifai_spark.feature import Feature
    from transmogrifai_spark.operators.numeric import percentile_calibrator
    df = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select(F.col("o_totalprice").alias("x"), "o_orderkey")
    feat = Feature("x", "Real")
    exact = percentile_calibrator(feat, buckets=20).fit(df)
    approx = percentile_calibrator(feat, buckets=20, approx=True,
                                   accuracy=10000).fit(df)
    out = df.select(exact.expr().alias("b_exact"),
                    approx.expr().alias("b_approx"))
    worst = out.agg(F.max(F.abs(
        F.col("b_exact") - F.col("b_approx")))).first()[0]
    assert worst <= 1  # off-by-one bucket at most at this accuracy
    assert exact.params.keys() == approx.params.keys()


def test_drift_report(spark):
    """Identical frames -> ~zero drift on every metric; a location-shifted
    serving frame -> all three metrics fire; python-oracle equality for PSI
    and KS on the same histograms."""
    import math
    import random
    from transmogrifai_spark.operators.preparators import (
        _ks, _psi, drift_report, numeric_histograms)
    rng = random.Random(7)
    train_rows = [(rng.gauss(0.0, 1.0),) for _ in range(4000)]
    same_rows = [(rng.gauss(0.0, 1.0),) for _ in range(4000)]
    shifted_rows = [(rng.gauss(2.0, 1.0),) for _ in range(4000)]
    train = spark.createDataFrame(train_rows, "x double")
    same = spark.createDataFrame(same_rows, "x double")
    shifted = spark.createDataFrame(shifted_rows, "x double")

    quiet = drift_report(train, same, ["x"])["x"]
    loud = drift_report(train, shifted, ["x"])["x"]
    assert quiet["psi"] < 0.1 and loud["psi"] > 0.25
    assert quiet["ks"] < 0.05 and loud["ks"] > 0.5
    assert loud["js_divergence"] > quiet["js_divergence"]

    # oracle: recompute PSI/KS from the same histograms in plain python
    th, ranges = numeric_histograms(train, ["x"], 20)
    sh, _ = numeric_histograms(shifted, ["x"], 20, ranges=ranges)
    assert loud["psi"] == _psi(th["x"], sh["x"])
    assert loud["ks"] == _ks(th["x"], sh["x"])
    # serving outliers clip into edge bins (train ranges), all rows counted
    assert sum(sh["x"]) == 4000


def test_histogram_clamps_below_range_values(spark):
    from transmogrifai_spark.operators.preparators import numeric_histograms
    df = spark.createDataFrame([(-100.0,), (0.5,), (200.0,)], "x double")
    h, _ = numeric_histograms(df, ["x"], bins=4, ranges={"x": (0.0, 1.0)})
    assert sum(h["x"]) == 3           # nothing dropped
    assert h["x"][0] >= 1 and h["x"][3] >= 1   # edge bins catch outliers
