"""Declarative data-quality expectations, verified in ONE aggregation pass.

The pipeline-gate companion to the fit-time SanityChecker / RawFeatureFilter
(core/.../filters/RawFeatureFilter.scala computes the same fill-rate style
metrics at fit time): a user declares constraints over a frame, the engine
computes every metric in a single `agg(...)` — one scan, one reduced row,
however many constraints — and reports pass/fail per constraint. The shape
follows the public Deequ/Great-Expectations model.

At 100 TB: all metrics are native aggregate expressions with map-side
partial aggregation; the single reduced row is the only thing that leaves
the executors. `unique` uses exact `count_distinct` (a second shuffle of
distinct values) — prefer `approx_unique` at extreme cardinality.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Constraint", "complete", "unique", "approx_unique", "in_range",
           "matches", "allowed_values", "non_negative", "satisfies",
           "check", "check_report"]


@dataclass
class Constraint:
    name: str
    metric: Column            # aggregate expression -> double
    predicate: Callable[[Column], Column]   # metric -> boolean
    threshold: float          # recorded in the report


def _fraction(cond: Column) -> Column:
    return (F.sum(cond.cast("long")) / F.count(F.lit(1))).cast("double")


def complete(col: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of non-null values >= min_fraction."""
    return Constraint(
        f"complete({col})", _fraction(F.col(col).isNotNull()),
        lambda m: m >= min_fraction, min_fraction)


def unique(col: str) -> Constraint:
    """Exact: distinct count == row count (no duplicate values; nulls count
    as one value)."""
    return Constraint(
        f"unique({col})",
        (F.count_distinct(F.col(col)) / F.count(F.lit(1))).cast("double"),
        lambda m: m >= 1.0, 1.0)


def approx_unique(col: str, min_ratio: float = 0.99) -> Constraint:
    """HLL-based distinct ratio — the 100 TB-safe uniqueness check."""
    return Constraint(
        f"approx_unique({col})",
        (F.approx_count_distinct(F.col(col)) / F.count(F.lit(1)))
        .cast("double"),
        lambda m: m >= min_ratio, min_ratio)


def in_range(col: str, lo: float, hi: float,
             min_fraction: float = 1.0) -> Constraint:
    """Fraction of non-null values inside [lo, hi] >= min_fraction."""
    c = F.col(col)
    ok = F.when(c.isNull(), None).otherwise(
        (c >= lo) & (c <= hi))
    return Constraint(
        f"in_range({col},{lo},{hi})",
        (F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long")))
        .cast("double"),
        lambda m: F.coalesce(m >= min_fraction, F.lit(True)), min_fraction)


def matches(col: str, pattern: str, min_fraction: float = 1.0) -> Constraint:
    c = F.col(col)
    ok = F.when(c.isNull(), None).otherwise(c.rlike(pattern))
    return Constraint(
        f"matches({col})",
        (F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long")))
        .cast("double"),
        lambda m: F.coalesce(m >= min_fraction, F.lit(True)), min_fraction)


def allowed_values(col: str, values: list,
                   min_fraction: float = 1.0) -> Constraint:
    c = F.col(col)
    ok = F.when(c.isNull(), None).otherwise(c.isin(*values))
    return Constraint(
        f"allowed_values({col})",
        (F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long")))
        .cast("double"),
        lambda m: F.coalesce(m >= min_fraction, F.lit(True)), min_fraction)


def non_negative(col: str, min_fraction: float = 1.0) -> Constraint:
    return in_range(col, 0.0, float("inf"), min_fraction)


def satisfies(name: str, cond: Column,
              min_fraction: float = 1.0) -> Constraint:
    """Custom row-level boolean condition; passes when the fraction of rows
    satisfying it >= min_fraction."""
    return Constraint(name, _fraction(cond),
                      lambda m: m >= min_fraction, min_fraction)


def check_report(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One aggregation pass -> one row per constraint:
    (constraint, metric, threshold, passed)."""
    row = df.agg(*[c.metric.alias(f"_m{i}")
                   for i, c in enumerate(constraints)])
    cols = []
    for i, c in enumerate(constraints):
        m = F.col(f"_m{i}")
        cols.append(F.struct(
            F.lit(c.name).alias("constraint"),
            m.alias("metric"),
            F.lit(float(c.threshold)).alias("threshold"),
            F.coalesce(c.predicate(m), F.lit(False)).alias("passed")))
    return (row.select(F.explode(F.array(*cols)).alias("r"))
            .select("r.constraint", "r.metric", "r.threshold", "r.passed"))


def check(df: DataFrame, constraints: list[Constraint]) -> dict:
    """Driver-side verdict: {'passed': bool, 'results': {name: {...}}} from
    the one-pass report (a single reduced row is collected)."""
    rows = check_report(df, constraints).collect()
    results = {r["constraint"]: {"metric": r["metric"],
                                 "threshold": r["threshold"],
                                 "passed": r["passed"]} for r in rows}
    return {"passed": all(v["passed"] for v in results.values()),
            "results": results}


def suggest(df: DataFrame, max_allowed_values: int = 20,
            range_margin: float = 0.0) -> list[Constraint]:
    """Constraint suggestion (the Deequ ConstraintSuggestion idea): derive
    a starting rule set from the data's observed profile — two jobs total
    (one profile pass + one top-values pass for low-cardinality strings):

      * null-free columns        -> complete
      * all-distinct int/string  -> approx_unique (key-like)
      * numeric                  -> in_range(observed min/max ± margin)
      * low-cardinality strings  -> allowed_values(observed set)
      * everything else          -> no suggestion (never guess regexes)

    Suggestions describe THIS frame; review before enforcing on future
    data (that's the point — they fail loudly when new data drifts outside
    everything the profiled frame exhibited).
    """
    from .profile import profile

    prof = profile(df)
    out: list[Constraint] = []
    low_card_strings = []
    for f in df.schema.fields:
        s = prof[f.name]
        if s["count"] == 0:
            continue
        if s["null_count"] == 0:
            out.append(complete(f.name))
        if "min" in s and "p50" in s:                 # numeric
            lo, hi = float(s["min"]), float(s["max"])
            pad = (hi - lo) * range_margin
            out.append(in_range(f.name, lo - pad, hi + pad))
            ratio = s["approx_distinct"] / s["count"]
            if ratio >= 0.99:
                # threshold from the OBSERVED ratio with slack: the check's
                # own estimator (approx_count_distinct) and the profile's
                # HLL disagree within sketch error, so a hard 0.99 would
                # self-fail on columns both see as ~unique
                out.append(approx_unique(f.name, min_ratio=0.9 * ratio))
        elif "min_length" in s:                       # string
            ratio = s["approx_distinct"] / s["count"]
            if s["approx_distinct"] <= max_allowed_values:
                low_card_strings.append(f.name)
            elif ratio >= 0.99:
                out.append(approx_unique(f.name, min_ratio=0.9 * ratio))
    if low_card_strings:
        # one pass for all low-cardinality value sets
        rows = (df.select(*[F.collect_set(c).alias(c)
                            for c in low_card_strings]).collect()[0])
        for c in low_card_strings:
            out.append(allowed_values(c, sorted(rows[c])))
    return out
