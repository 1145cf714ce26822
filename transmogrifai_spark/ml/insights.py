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
                coefficients: list[float], top_k: int = 5,
                link: str = "logit") -> DataFrame:
    """RecordInsightsLOCO for linear/logistic models, fully vectorized:

    score      = link(w·x + b)      (link: logit -> sigmoid, identity -> raw)
    loco(i)    = score - link(w·x - w_i x_i + b)

    One projection computes every slot's delta via the shared margin — no
    re-scoring passes, no UDFs. Output: (original columns..., loco map of the
    top_k |delta| slots). ``link='identity'`` is the linear-regression form
    whose deltas reduce to w_i x_i — SQL-closed, hence oracle-gatable."""
    if link not in ("logit", "identity"):
        raise ValueError(f"link must be 'logit' or 'identity', got {link!r}")
    x = F.col(vec_col)
    margin = F.lit(intercept) + F.aggregate(
        F.zip_with(x, F.array(*[F.lit(c) for c in coefficients]),
                   lambda xi, wi: xi * wi),
        F.lit(0.0), lambda a, v: a + v)
    if link == "identity":
        sig = lambda m: m
    else:
        sig = lambda m: F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    # materialize the margin, then the base score, as COLUMNS before the
    # per-slot delta array references them: the single-projection form
    # embedded the margin fold (a w·x aggregate over the whole vector) in
    # every slot's delta — (1 + n_slots) fold evaluations per row, since
    # HOF folds are CodegenFallback and re-evaluate per reference.
    # CollapseProject keeps the stacked projections separate (non-cheap
    # aliases referenced many times); values are bit-identical.
    # collision-safe temp name (r12 advice): a caller column literally
    # named "_loco_margin" must not be silently overwritten and dropped
    mcol = "_loco_margin"
    while mcol in df.columns:
        mcol += "_"
    out = df.withColumn(mcol, margin) \
            .withColumn("base_score", sig(F.col(mcol)))
    m, base = F.col(mcol), F.col("base_score")
    deltas = F.array(*[
        F.struct(
            F.lit(i).alias("slot"),
            (base - sig(m - F.try_element_at(x, F.lit(i + 1)) * F.lit(coefficients[i])))
            .alias("delta"))
        for i in range(len(coefficients))])
    top = F.slice(F.array_sort(deltas, lambda a, b:
                               F.when(F.abs(a["delta"]) > F.abs(b["delta"]), -1)
                               .when(F.abs(a["delta"]) < F.abs(b["delta"]), 1)
                               .otherwise(F.when(a["slot"] < b["slot"], -1).otherwise(1))),
                  1, top_k)
    return out.withColumn("loco", top).drop(mcol)


def record_insights_corr(df: DataFrame, pred_col: str, features_col: str,
                         pred_size: int, feature_size: int, top_k: int = 20,
                         norm: str = "minmax") -> DataFrame:
    """RecordInsightsCorr (RecordInsightsCorr.scala:55): model-agnostic
    per-record insights — importance(record, pred p, slot j) =
    corr(feature_j, pred_p) * normalized(feature_j(record)); top-K slots by
    |importance| kept per prediction column (NaN correlations -> 0, the
    reference's guard).

    Fit plan: ONE posexplode + groupBy(slot) pass computes every slot's
    moments and cross-moments with each prediction column — the shuffle
    carries (slot, stats), bounded by the vector width, never by rows. The
    per-pred label moments come from one whole-frame aggregate. Both reduce
    to a literal corr matrix + normalizer, so the transform is a pure
    column expression (no model, no second pass over the data).

    ``norm``: "minmax" ((x-min)/range, the reference default) or "znorm"
    ((x-mean)/std). Output column ``insights``:
    array<struct<pred:int, slot:int, importance:double>>."""
    import math as _math
    if norm not in ("minmax", "znorm"):
        raise ValueError(f"norm must be 'minmax' or 'znorm', got {norm!r}")
    p_arr, x_arr = F.col(pred_col), F.col(features_col)

    ex = df.select(p_arr.alias("_p"), F.posexplode(x_arr).alias("_j", "_x"))
    per = ex.groupBy("_j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.min("_x").alias("mn"), F.max("_x").alias("mx"),
        *[F.sum(F.col("_x") * F.col("_p")[p]).alias(f"sxy{p}")
          for p in range(pred_size)]).collect()
    yrow = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(p_arr[p]).alias(f"sy{p}") for p in range(pred_size)],
        *[F.sum(p_arr[p] * p_arr[p]).alias(f"syy{p}") for p in range(pred_size)]).first()

    stats = {r["_j"]: r for r in per}
    n = float(yrow["n"])
    corr = [[0.0] * feature_size for _ in range(pred_size)]
    mins, ranges, means, stds = ([0.0] * feature_size for _ in range(4))
    for j in range(feature_size):
        r = stats.get(j)
        if r is None:
            continue
        sx, sxx = float(r["sx"]), float(r["sxx"])
        mins[j] = float(r["mn"])
        ranges[j] = float(r["mx"]) - float(r["mn"])
        means[j] = sx / n
        var = max(0.0, (sxx - sx * sx / n) / n)
        stds[j] = _math.sqrt(var)
        for p in range(pred_size):
            sy, syy = float(yrow[f"sy{p}"]), float(yrow[f"syy{p}"])
            sxy = float(r[f"sxy{p}"])
            den = _math.sqrt(max(0.0, n * sxx - sx * sx)) * \
                _math.sqrt(max(0.0, n * syy - sy * sy))
            c = (n * sxy - sx * sy) / den if den > 0 else float("nan")
            corr[p][j] = 0.0 if _math.isnan(c) else c  # NaN corr -> 0

    def norm_expr(j):
        x = F.try_element_at(x_arr, F.lit(j + 1))
        if norm == "minmax":
            if ranges[j] == 0:
                return F.lit(0.0)
            return (x - F.lit(mins[j])) / F.lit(ranges[j])
        if stds[j] == 0:
            return F.lit(0.0)
        return (x - F.lit(means[j])) / F.lit(stds[j])

    per_pred = []
    for p in range(pred_size):
        entries = F.array(*[
            F.struct(F.lit(p).alias("pred"), F.lit(j).alias("slot"),
                     (F.lit(corr[p][j]) * norm_expr(j)).alias("importance"))
            for j in range(feature_size)])
        top = F.slice(F.array_sort(entries, lambda a, b:
                      F.when(F.abs(a["importance"]) > F.abs(b["importance"]), -1)
                      .when(F.abs(a["importance"]) < F.abs(b["importance"]), 1)
                      .otherwise(F.when(a["slot"] < b["slot"], -1).otherwise(1))),
                      1, top_k)
        per_pred.append(top)
    return df.withColumn("insights", F.flatten(F.array(*per_pred)))


def loco_any_model(df: DataFrame, model, vec_col: str, id_cols: list[str],
                   top_k: int = 5, slots: list[int] | None = None,
                   n_slots: int | None = None) -> DataFrame:
    """RecordInsightsLOCO for ANY fitted Spark ML model
    (RecordInsightsLOCO.scala:100 handles arbitrary models the same way):
    re-score each record with one vector slot zeroed; delta = base - zeroed.

    Plan: ONE ``model.transform`` over a slot-exploded frame — each record
    becomes (candidate_slots + 1) rows (slot -1 carries the unmodified
    vector), the model scores them all in a single distributed pass, and a
    groupBy pivots the deltas back, keeping the top-K |delta| slots. No
    per-slot transform passes, no driver loop. Cost scales linearly with the
    number of candidate slots; at scale restrict ``slots`` to the
    highest-weighted ones (e.g. from ModelInsights) rather than all.

    ``df[vec_col]`` must be array<double>; ``model`` any fitted estimator
    exposing featuresCol (+ probabilityCol for classifiers — the score is
    P(class 1); otherwise predictionCol is used)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if slots is None:
        if n_slots is None:
            n_slots = len(df.select(vec_col).first()[0])
        slots = list(range(n_slots))
    x = F.col(vec_col)
    ex = df.select(*id_cols, x.alias("_arr"),
                   F.explode(F.array(F.lit(-1), *[F.lit(s) for s in slots])).alias("_slot"))
    zeroed = F.transform(F.col("_arr"),
                         lambda v, i: F.when(i == F.col("_slot"), F.lit(0.0)).otherwise(v))
    fcol = model.getOrDefault(model.featuresCol)
    ex = ex.withColumn(fcol, array_to_vector(zeroed))
    scored = model.transform(ex)
    if model.hasParam("probabilityCol") and model.isDefined(model.probabilityCol):
        sc = vector_to_array(F.col(model.getOrDefault(model.probabilityCol)))[1]
    else:
        sc = F.col(model.getOrDefault(model.predictionCol)).cast("double")
    g = (scored.select(*id_cols, F.col("_slot"), sc.alias("_s"))
         .groupBy(*id_cols)
         .agg(F.max(F.when(F.col("_slot") == -1, F.col("_s"))).alias("base_score"),
              F.collect_list(F.when(F.col("_slot") >= 0,
                                    F.struct(F.col("_slot").alias("slot"),
                                             F.col("_s").alias("s")))).alias("_zs")))
    deltas = F.transform(F.col("_zs"), lambda z: F.struct(
        z["slot"].alias("slot"),
        (F.col("base_score") - z["s"]).alias("delta")))
    top = F.slice(F.array_sort(deltas, lambda a, b:
                  F.when(F.abs(a["delta"]) > F.abs(b["delta"]), -1)
                  .when(F.abs(a["delta"]) < F.abs(b["delta"]), 1)
                  .otherwise(F.when(a["slot"] < b["slot"], -1).otherwise(1))),
                  1, top_k)
    return g.withColumn("loco", top).drop("_zs")


def merged_model_insights(selected, slots: list[VectorSlot],
                          label_name: str | None = None,
                          train_rows: int | None = None,
                          sanity_params: dict | None = None,
                          rff_result=None,
                          evaluation: dict | None = None,
                          metric_name: str = "auroc") -> dict:
    """ModelInsights.scala:74 — the MERGED report: the reference fuses
    feature provenance (OpVectorMetadata), SanityChecker statistics
    (variance / label correlation / exclusion reasons), RawFeatureFilter
    results (fill rates, dropped features), model weights/importances, the
    selection leaderboard, and evaluation metrics into one serializable
    document. This builds the same fusion from the engine's artifacts:

      selected       — SelectedModel (leaderboard + best fitted model)
      slots          — vector slot metadata (the OpVectorMetadata analogue)
      sanity_params  — fitted sanityChecker stage params
                       ({"keep", "slot_stats"} with per-slot variance /
                        label_corr / dropped reason)
      rff_result     — RawFeatureFilterResult / RawFeatureFilterFullResult
      evaluation     — metric dict from ml.evaluators (holdout metrics)

    Returns a plain JSON-able dict (json.dumps-ready)."""
    base = model_insights(selected, slots, metric_name)
    stats_by_slot = {}
    if sanity_params:
        stats_by_slot = {s["slot"]: s for s in sanity_params.get("slot_stats", [])}
    features = []
    for f in base.features:
        d = asdict(f)
        st = stats_by_slot.get(f.slot)
        if st:
            d["variance"] = st["variance"]
            d["label_corr"] = st["label_corr"]
            d["excluded_reason"] = st["dropped"]
        features.append(d)
    report = {
        "label": {"name": label_name, "train_rows": train_rows},
        "selected_model": {
            "name": base.model_name,
            "params": base.model_params,
            "validation_metric": {base.metric_name: base.metric_value},
        },
        "leaderboard": base.leaderboard,
        "features": features,
        "evaluation": evaluation or {},
    }
    if rff_result is not None:
        rff = {"fill_rates": getattr(rff_result, "fill_rates", None) or
               getattr(rff_result, "train_fill", None),
               "dropped": list(getattr(rff_result, "dropped", []) or [])}
        js = getattr(rff_result, "js_divergence", None)
        if js is not None:
            rff["js_divergence"] = js
            rff["reasons"] = getattr(rff_result, "reasons", None)
        report["raw_feature_filter"] = rff
    return report
