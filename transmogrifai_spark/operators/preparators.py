"""Data-driven feature pruning estimators (SURVEY.md §2.5).

Re-expression of:
  * SanityChecker     core/.../impl/preparators/SanityChecker.scala:232
    (params :58-231 — maxCorrelation=0.95, minVariance=1e-5, maxCramersV)
  * MinVarianceFilter core/.../impl/preparators/MinVarianceFilter.scala:58,145
  * RawFeatureFilter  core/src/main/scala/com/salesforce/op/filters/RawFeatureFilter.scala:90,486
  * chi²/Cramér's V   utils/.../stats/OpStatistics.scala:108-141

Physical plans:
  * All statistics come from single-pass ``df.agg`` sweeps or
    ``Correlation.corr`` on the assembled vector — no per-row Python, no
    collect of data rows (only of the fitted statistics, whose size is
    O(#slots), independent of data size — safe at 100 TB).
  * Pruning is a slot-slice expression over the array vector (the reference
    slices VectorUDT via DropIndicesByTransformer / VectorSlicer).
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..feature import Feature
from ..stages.base import ColumnTransformer, Estimator
from .vectorizers import FittedVectorizer, VectorSlot


def slice_slots_expr(keep: list[int]):
    """Keep the given slot indices of an array<double> vector column."""
    def make_expr(c: Column) -> Column:
        return F.array(*[F.element_at(c, i + 1) for i in keep])
    return make_expr


def min_variance_filter(vec: Feature, min_variance: float = 1e-5,
                        output_name: str | None = None) -> Estimator:
    """MinVarianceFilter.scala:58 — drop near-constant vector slots.

    Variance per slot via one aggregation over posexploded slots: at scale
    this is a single shuffle of (slot, partial-moments) pairs — O(#slots)
    reduced rows."""
    out = output_name or f"{vec.name}_pruned"

    def fit(stage: Estimator, df: DataFrame) -> FittedVectorizer:
        pos = df.select(F.posexplode(F.col(vec.name)).alias("_i", "_x"))
        stats = pos.groupBy("_i").agg(F.var_pop("_x").alias("v")).orderBy("_i").collect()
        keep = [int(r["_i"]) for r in stats if r["v"] is not None and r["v"] > min_variance]
        return FittedVectorizer("minVariance", [vec], out, slice_slots_expr(keep),
                                [VectorSlot(vec.name, descriptor=f"slot_{i}") for i in keep],
                                {"keep": keep})

    return Estimator("minVariance", [vec], out, "OPVector", fit)


def sanity_checker(vec: Feature, label: Feature, max_correlation: float = 0.95,
                   min_variance: float = 1e-5, output_name: str | None = None) -> Estimator:
    """SanityChecker.scala:232 — remove junk & label-leakage slots.

    Implements the two core checks (variance + |corr(slot, label)| bounds)
    via Pearson correlation computed from one moments aggregation:
    corr = (E[xy] - E[x]E[y]) / (σx σy), all moments from a single
    posexplode + groupBy(slot) pass. Slots with σ² <= min_variance or
    |corr| >= max_correlation (leakage) are dropped."""
    out = output_name or f"{vec.name}_checked"

    def fit(stage: Estimator, df: DataFrame) -> FittedVectorizer:
        pos = df.select(F.col(label.name).cast("double").alias("_y"),
                        F.posexplode(F.col(vec.name)).alias("_i", "_x"))
        stats = (
            pos.groupBy("_i")
            .agg(F.avg("_x").alias("mx"), F.avg("_y").alias("my"),
                 F.avg(F.col("_x") * F.col("_y")).alias("mxy"),
                 F.var_pop("_x").alias("vx"), F.var_pop("_y").alias("vy"))
            .orderBy("_i").collect()
        )
        keep: list[int] = []
        for r in stats:
            if r["vx"] is None or r["vx"] <= min_variance:
                continue
            corr = 0.0
            if r["vy"] and r["vy"] > 0:
                corr = (r["mxy"] - r["mx"] * r["my"]) / ((r["vx"] ** 0.5) * (r["vy"] ** 0.5))
            if abs(corr) >= max_correlation:
                continue  # label leakage (SanityChecker maxCorrelation:94)
            keep.append(int(r["_i"]))
        return FittedVectorizer("sanityChecker", [vec, label], out,
                                lambda c, _y: slice_slots_expr(keep)(c),
                                [VectorSlot(vec.name, descriptor=f"slot_{i}") for i in keep],
                                {"keep": keep})

    return Estimator("sanityChecker", [vec, label], out, "OPVector", fit)


@dataclass
class RawFeatureFilterResult:
    fill_rates: dict[str, float]
    dropped: list[str]


def raw_feature_filter(df: DataFrame, feature_cols: list[str],
                       min_fill_rate: float = 0.001) -> RawFeatureFilterResult:
    """RawFeatureFilter.scala:90,486 — drop raw columns by fill rate.

    One ``df.agg`` sweep computes every column's fill rate simultaneously
    (the reference's two-pass distribution computation collapses into a
    single job; train/score-distribution divergence is a second call on the
    scoring frame)."""
    n = F.count(F.lit(1))
    aggs = [(F.count(F.col(c)) / n).alias(c) for c in feature_cols]
    row = df.agg(*aggs).first()
    fill = {c: float(row[c]) for c in feature_cols}
    dropped = [c for c, r in fill.items() if r < min_fill_rate]
    return RawFeatureFilterResult(fill_rates=fill, dropped=dropped)
