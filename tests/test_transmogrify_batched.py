"""Batched transmogrify: 2-job fit, equality with per-column path, triple
law (Spark == local == save/load)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.feature import from_dataframe
from transmogrifai_spark.operators.vectorizers import (transmogrify,
                                                       transmogrify_batched)
from transmogrifai_spark.serving.local import compile_local
from transmogrifai_spark.serving.persistence import load_model, save_model
from transmogrifai_spark.workflow import Workflow


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        ("a", 10, 1.5, True), ("b", 20, None, False), ("a", 20, 3.5, None),
        ("c", None, 2.0, True), (None, 20, 4.0, False), ("a", 10, 1.0, True),
    ]
    return spark.createDataFrame(rows, "cat string, n bigint, x double, b boolean")


def _feats(df):
    return from_dataframe(df, overrides={"cat": "PickList"})


def test_batched_equals_per_column(spark, mixed_df):
    feats = _feats(mixed_df)
    cols = [feats["cat"], feats["n"], feats["x"], feats["b"]]
    v1 = transmogrify(cols, top_k=5, min_support=1, output_name="f1")
    v2 = transmogrify_batched(cols, top_k=5, min_support=1, output_name="f2")
    m1 = Workflow([v1]).fit(mixed_df)
    m2 = Workflow([v2]).fit(mixed_df)
    r1 = [r["f1"] for r in m1.score(mixed_df, keep_intermediate=True).select("f1").collect()]
    r2 = [r["f2"] for r in m2.score(mixed_df, keep_intermediate=True).select("f2").collect()]
    assert r1 == r2


def test_batched_fit_jobs_independent_of_column_count(spark, mixed_df):
    """The fit runs a fixed number of actions (melt counts + means, plus AQE
    sub-jobs) — the same whether vectorizing 2 or 4 columns, unlike the
    per-column path (one fit job per estimator)."""
    sc = spark.sparkContext
    feats = _feats(mixed_df)
    tracker = sc.statusTracker()

    def jobs_for(cols):
        before = set(tracker.getJobIdsForGroup(None))
        v = transmogrify_batched(cols, top_k=5, min_support=1,
                                 output_name=f"f{len(cols)}")
        Workflow([v]).fit(mixed_df)
        return len(set(tracker.getJobIdsForGroup(None)) - before)

    two = jobs_for([feats["cat"], feats["x"]])
    four = jobs_for([feats["cat"], feats["n"], feats["x"], feats["b"]])
    assert four <= two + 1  # column count does not scale the job count


def test_batched_slots_and_params(spark, mixed_df):
    feats = _feats(mixed_df)
    v = transmogrify_batched([feats["cat"], feats["x"]], top_k=5, min_support=1)
    model = Workflow([v]).fit(mixed_df)
    st = model.layers[0][0]
    kinds = [c["kind"] for c in st.params["columns"]]
    assert kinds == ["pivot", "fill"]
    assert st.params["columns"][0]["values"] == ["a", "b", "c"]  # 3,2,1 by count desc
    names = [s.indicator_value or s.descriptor for s in st.slots]
    assert "OTHER" in names and "NullIndicatorValue" in names


def test_batched_triple_law(spark, mixed_df, tmp_path):
    feats = _feats(mixed_df)
    cols = [feats["cat"], feats["n"], feats["x"], feats["b"]]
    v = transmogrify_batched(cols, top_k=5, min_support=1)
    model = Workflow([v]).fit(mixed_df)
    spark_out = [r["features"] for r in
                 model.score(mixed_df, keep_intermediate=True).select("features").collect()]

    path = str(tmp_path / "m")
    save_model(model, path)
    loaded = load_model(path)
    loaded_out = [r["features"] for r in
                  loaded.score(mixed_df, keep_intermediate=True).select("features").collect()]
    assert spark_out == loaded_out

    local = compile_local(loaded)
    for r, expected in zip(mixed_df.collect(), spark_out):
        got = local(r.asDict())
        assert got["features"] == pytest.approx(list(expected))


def test_batched_integral_mode_numeric_tie_break(spark):
    """ADVICE regression: integral mode ties break by numeric value (2 < 10),
    not string order ("10" < "2") — same rule as the per-column path."""
    from transmogrifai_spark.feature import from_dataframe
    rows = [(10,)] * 3 + [(2,)] * 3 + [(None,)]
    df = spark.createDataFrame(rows, "n bigint")
    feats = from_dataframe(df, overrides={"n": "Integral"})
    v = transmogrify_batched([feats["n"]], top_k=5, min_support=1)
    st = Workflow([v]).fit(df).layers[0][0]
    fills = {c["name"]: c for c in st.params["columns"]}
    assert fills["n"]["fill"] == 2.0
