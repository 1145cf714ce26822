"""Application runner — the engine's batch/streaming entry point.

Re-expression of OpWorkflowRunner (core/.../OpWorkflowRunner.scala:296-324)
and OpApp (core/.../OpApp.scala): dispatch on run type
(Train / Score / Features / Evaluate / StreamingScore, OpWorkflowRunnerType
:358-365), configured by a small params object (OpParams equivalent:
reader paths, model location, write location).

Usage (python -m transmogrifai_spark.runner or programmatic):

    run(RunParams(
        mode="train",
        pipeline="my_pipelines.churn",   # module with build(spark, params)
        data_dir="/data/sf0.1",
        model_dir="/models/churn",
        output_dir="/scores/churn",
    ))

The pipeline module contract: ``build(spark, params) -> (df, result_features)``
— declare raw features and stages against the loaded frame, return the frame
and result features; the runner owns fit / score / save / evaluate.
"""
from __future__ import annotations

import argparse
import importlib
import json
import sys
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession

from .params import OpParams


@dataclass
class RunParams:
    """Run dispatch config; external overrides ride in ``op_params``
    (OpParams.scala:81 — see transmogrifai_spark.params)."""

    mode: str                      # train | score | features | evaluate | stream
    pipeline: str                  # importable module with build(spark, params)
    data_dir: str
    model_dir: str | None = None
    output_dir: str | None = None
    label_col: str = "label"
    score_col: str = "score"
    options: dict = field(default_factory=dict)
    op_params: "OpParams | None" = None

    def __post_init__(self):
        # file locations: explicit args win, then the params JSON
        op = self.op_params
        if op is not None:
            self.model_dir = self.model_dir or op.model_location
            self.output_dir = self.output_dir or op.write_location


def run(params: RunParams, spark: SparkSession | None = None):
    from . import session
    from .serving.persistence import load_model, save_model
    from .workflow import Workflow

    spark = spark or session(app=f"transmogrifai-{params.mode}")
    if params.op_params is not None:
        params.op_params.stamp(spark)
    mod = importlib.import_module(params.pipeline)
    df, result_features = mod.build(spark, params)

    if params.mode == "train":
        model = Workflow(result_features).fit(df)
        if params.model_dir:
            save_model(model, params.model_dir)
        return model

    if params.mode == "score":
        model = load_model(params.model_dir)
        scores = model.score(df)
        if params.output_dir:
            scores.write.mode("overwrite").parquet(params.output_dir)
        return scores

    if params.mode == "features":
        # materialize raw + derived features only (runner type Features)
        model = Workflow(result_features).fit(df)
        out = model.score(df, keep_intermediate=True)
        if params.output_dir:
            out.write.mode("overwrite").parquet(params.output_dir)
        return out

    if params.mode == "evaluate":
        from .ml.evaluators import binary_metrics
        model = load_model(params.model_dir)
        scores = model.score(df)
        metrics = binary_metrics(scores, params.score_col, params.label_col)
        metrics_dir = params.output_dir or (
            params.op_params.metrics_location if params.op_params else None)
        if metrics_dir:
            import os
            os.makedirs(metrics_dir, exist_ok=True)
            with open(f"{metrics_dir}/metrics.json", "w") as f:
                json.dump(metrics, f, indent=2)
        return metrics

    if params.mode == "stream":
        from .streaming.windows import score_stream
        model = load_model(params.model_dir)
        stream = mod.build_stream(spark, params)  # pipeline module provides the source
        scored = score_stream(stream, model)
        query = (scored.writeStream.format("parquet")
                 .option("path", params.output_dir)
                 .option("checkpointLocation", f"{params.output_dir}/_checkpoints")
                 .start())
        return query

    raise ValueError(f"unknown mode {params.mode!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="transmogrifai-spark runner")
    ap.add_argument("--mode", required=True,
                    choices=["train", "score", "features", "evaluate", "stream"])
    ap.add_argument("--pipeline", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--model-dir")
    ap.add_argument("--output-dir")
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--score-col", default="score")
    ap.add_argument("--params", help="OpParams JSON file (reader/stage/"
                    "location overrides, OpParams.scala:300 fromFile)")
    a = ap.parse_args(argv)
    from .params import OpParams
    op = OpParams.from_file(a.params) if a.params else None
    run(RunParams(mode=a.mode, pipeline=a.pipeline, data_dir=a.data_dir,
                  model_dir=a.model_dir, output_dir=a.output_dir,
                  label_col=a.label_col, score_col=a.score_col, op_params=op))


if __name__ == "__main__":
    main()
