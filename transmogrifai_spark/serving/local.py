"""Local (Spark-free) scoring: compile a fitted WorkflowModel to a pure
Python ``dict -> dict`` function.

Re-expression of OpWorkflowModelLocal.scoreFunction
(local/src/main/scala/com/salesforce/op/local/OpWorkflowModelLocal.scala:79):
the fitted DAG collapses to a closure over plain Python data — sub-ms
scoring for serving without a SparkSession. Each stage's local fn comes from
the same registry as its Column expression, and the two paths are asserted
equal in tests (the reference's OpTransformerSpec triple-equality law).
"""
from __future__ import annotations

from typing import Any, Callable

from ..workflow import WorkflowModel
from . import registry


def compile_local(model: WorkflowModel) -> Callable[[dict], dict]:
    """Compile the model's layers to a row function. Raises
    NotImplementedError at compile time (not score time) for any stage
    without a local form."""
    plan: list[tuple[str, list[str], Callable]] = []
    for layer in model.layers:
        for stage in layer:
            params = getattr(stage, "params", None)
            if params is None:
                raise NotImplementedError(
                    f"stage {stage.op_name!r} carries no params — no local form")
            fn = registry.local_for(stage.op_name, params)
            plan.append((stage.output_name, [f.name for f in stage.inputs], fn))
    result_names = [f.name for f in model.result_features]

    def score(row: dict) -> dict:
        vals: dict[str, Any] = dict(row)
        for out, ins, fn in plan:
            vals[out] = fn(*[vals.get(i) for i in ins])
        return {n: vals.get(n) for n in result_names}

    return score
