"""OpParams external-override surface (OpParams.scala:81-308): JSON in the
reference's camelCase spelling must drive reader paths, stage kwargs, and
run locations without touching pipeline code."""
import json

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.params import OpParams, ReaderParams

CAMEL = """
{"readerParams": {"events": {"path": "/alt/events", "partitions": 8,
                             "customParams": {"mergeSchema": "true"}}},
 "alternateReaderParams": {"events": {"path": "/score/events"}},
 "stageParams": {"one_hot": {"top_k": 25, "min_support": 2}},
 "modelLocation": "/models/m1",
 "writeLocation": "/scores/m1",
 "metricsLocation": "/metrics/m1",
 "customTagName": "opAppName",
 "customTagValue": "churn",
 "customParams": {"team": "ds"}}
"""


def test_from_string_camelcase_roundtrip():
    p = OpParams.from_string(CAMEL)
    assert p.reader_params["events"] == ReaderParams(
        path="/alt/events", partitions=8,
        custom_params={"mergeSchema": "true"})
    assert p.stage_params["one_hot"]["top_k"] == 25
    assert p.model_location == "/models/m1"
    assert p.write_location == "/scores/m1"
    assert p.metrics_location == "/metrics/m1"
    assert p.custom_params == {"team": "ds"}
    # to_dict emits the reference spelling and round-trips
    assert OpParams.from_dict(p.to_dict()) == p


def test_switch_reader_params():
    p = OpParams.from_string(CAMEL)
    sw = p.switch_reader_params()
    assert sw.reader_params["events"].path == "/score/events"
    assert sw.alternate_reader_params["events"].path == "/alt/events"
    assert sw.switch_reader_params().reader_params == p.reader_params


def test_stage_kwargs_precedence():
    p = OpParams.from_string(CAMEL)
    kw = p.stage_kwargs("one_hot", top_k=10, min_support=1, other="x")
    assert kw == {"top_k": 25, "min_support": 2, "other": "x"}  # file wins
    assert p.stage_kwargs("unknown", top_k=10) == {"top_k": 10}


def test_reader_override_applied(spark, tmp_path):
    src = str(tmp_path / "ev.parquet")
    spark.range(10).withColumnRenamed("id", "key").write.parquet(src)
    p = OpParams.from_dict(
        {"readerParams": {"events": {"path": src, "partitions": 3}}})
    r = p.reader_for("events", path="/nonexistent/default")
    assert r.path == src and r.repartition == 3
    df = r.read(spark)
    assert df.count() == 10 and df.rdd.getNumPartitions() == 3
    # readers without an override keep their code defaults
    r2 = p.reader_for("other", path=src)
    assert r2.repartition is None


def test_runner_accepts_params_file(spark, tmp_path, monkeypatch):
    """End to end: a params JSON supplies the model location and a stage
    override; the pipeline module reads its kwargs through stage_kwargs."""
    import sys
    import types
    from transmogrifai_spark.runner import RunParams, run

    seen = {}
    mod = types.ModuleType("fixture_pipeline_params")

    def build(sp, params):
        df = sp.createDataFrame([("a", 1.0), ("b", 2.0), ("a", 3.0)],
                                "cat string, x double")
        from transmogrifai_spark.feature import from_dataframe
        from transmogrifai_spark.operators.vectorizers import transmogrify
        kw = params.op_params.stage_kwargs("transmogrify", top_k=3,
                                           min_support=1)
        seen.update(kw)
        feats = from_dataframe(df, overrides={"cat": "PickList"})
        return df, [transmogrify([feats["cat"], feats["x"]], **kw)]

    mod.build = build
    monkeypatch.setitem(sys.modules, "fixture_pipeline_params", mod)

    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "modelLocation": str(tmp_path / "model"),
        "stageParams": {"transmogrify": {"top_k": 2}},
        "customTagName": "opAppName", "customTagValue": "t"}))
    op = OpParams.from_file(str(pfile))
    run(RunParams(mode="train", pipeline="fixture_pipeline_params",
                  data_dir="unused", op_params=op), spark=spark)
    assert seen == {"top_k": 2, "min_support": 1}      # JSON overrode top_k
    assert (tmp_path / "model").exists()               # modelLocation used
    assert spark.sparkContext.getLocalProperty("opAppName") == "t"


def test_from_file_yaml(tmp_path):
    """YAML params documents load identically to JSON (OpParams.scala:316)."""
    y = tmp_path / "params.yaml"
    y.write_text(
        "readerParams:\n"
        "  events:\n"
        "    path: /alt/events\n"
        "    partitions: 8\n"
        "stageParams:\n"
        "  one_hot: {top_k: 25}\n"
        "modelLocation: /models/m1\n")
    p = OpParams.from_file(str(y))
    assert p.reader_params["events"].path == "/alt/events"
    assert p.reader_params["events"].partitions == 8
    assert p.stage_params["one_hot"]["top_k"] == 25
    assert p.model_location == "/models/m1"
