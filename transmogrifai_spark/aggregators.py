"""Monoid aggregators: the engine's keyed-aggregation vocabulary.

Re-expression of the reference's aggregator library (SURVEY.md §2.4):
  * numeric monoids      features/.../aggregators/Numerics.scala:51-120
  * text concat          aggregators/Text.scala:56-69
  * modal value          aggregators/Text.scala (ExtendedMultiset)
  * set unions           aggregators/Sets.scala
  * list concat / geo midpoint  aggregators/Lists.scala, Geolocation.scala
  * first/last by event time    aggregators/TimeBasedAggregator.scala:61-225
  * map monoids (union + value merge)  aggregators/Maps.scala
  * dispatch table       MonoidAggregatorDefaults.scala:52-130

Physical form: each monoid is a **native Catalyst aggregate expression**
factory ``(value_col, time_col|None) -> Column``. The reference ran these as
Scala UDAFs with per-row catalyst<->scala conversion (its worst perf pain,
JoinedDataReader.scala:356-375); here Catalyst's hash aggregate gives
partial (map-side) + final aggregation for free — the shape that scales to
100 TB (one shuffle on the key, combiner-reduced).

Determinism notes (oracle gate):
  * concat orders by event time when given, else by value — `collect_list`
    order under parallel merge is otherwise nondeterministic.
  * mode breaks count ties by smallest value (the reference's ExtendedMultiset
    iteration order is its own tie-break; we pin an explicit, testable one).
  * first/last = min_by/max_by on the time column; ties broken by value via
    struct ordering.
"""
from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AggFactory = Callable[[Column, Optional[Column]], Column]


# -- numeric monoids (Numerics.scala:51-120) --------------------------------

def agg_sum(c: Column, ts: Column | None = None) -> Column:
    return F.sum(c)


def agg_min(c: Column, ts: Column | None = None) -> Column:
    return F.min(c)


def agg_max(c: Column, ts: Column | None = None) -> Column:
    return F.max(c)


def agg_mean(c: Column, ts: Column | None = None) -> Column:
    return F.avg(c)


def agg_sum_exact(c: Column, ts: Column | None = None, precision: int = 28, scale: int = 6) -> Column:
    """Order-independent exact sum for doubles: accumulate in decimal, emit
    double. Float summation order varies with partitioning; at 1000 executors
    a plain double sum is run-to-run nondeterministic. Decimal accumulation is
    associative-exact, so the result is stable at any parallelism."""
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def agg_mean_exact(c: Column, ts: Column | None = None,
                   precision: int = 28, scale: int = 6) -> Column:
    """Order-exact mean: decimal-accumulated sum over the count, one final
    double division (same rationale as sum_exact — plain avg() of doubles
    is partition-order-dependent at 1000 executors)."""
    return (F.sum(c.cast(f"decimal({precision},{scale})"))
            / F.count(c)).cast("double")


def agg_logical_or(c: Column, ts: Column | None = None) -> Column:  # LogicalOr:118
    return F.max(c.cast("boolean"))


def agg_logical_and(c: Column, ts: Column | None = None) -> Column:  # LogicalAnd
    return F.min(c.cast("boolean"))


def agg_logical_xor(c: Column, ts: Column | None = None) -> Column:  # LogicalXor
    return (F.sum(c.cast("boolean").cast("long")) % 2 == 1)


# -- text / collection monoids ---------------------------------------------

def agg_concat(c: Column, ts: Column | None = None, sep: str = ",") -> Column:
    """ConcatText* (Text.scala:56-69): concatenation in event-time order when
    a time column is given, else sorted by value (determinism)."""
    if ts is not None:
        pairs = F.array_sort(F.collect_list(F.struct(ts.alias("t"), c.alias("v"))))
        return F.array_join(F.transform(pairs, lambda p: p["v"]), sep)
    return F.array_join(F.array_sort(F.collect_list(c)), sep)


def agg_concat_list(c: Column, ts: Column | None = None) -> Column:
    """ConcatTextList/ConcatDateList (Lists.scala): flatten in time order."""
    if ts is not None:
        pairs = F.array_sort(F.collect_list(F.struct(ts.alias("t"), c.alias("v"))))
        return F.flatten(F.transform(pairs, lambda p: p["v"]))
    # no time column: sort the collected arrays lexicographically before
    # flattening — collect_list order is partition-layout-dependent
    return F.flatten(F.array_sort(F.collect_list(c)))


def agg_set_union(c: Column, ts: Column | None = None) -> Column:
    """UnionMultiPickList (Sets.scala) — for scalar inputs collects the
    distinct set; output sorted for determinism."""
    return F.array_sort(F.collect_set(c))


def agg_set_union_flat(c: Column, ts: Column | None = None) -> Column:
    """Set union over array-typed input columns."""
    return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))


def agg_mode(c: Column, ts: Column | None = None) -> Column:
    """ModePickList (Text.scala / ExtendedMultiset): most frequent value,
    ties -> smallest value. One-expression form: build (count, -ord) pairs via
    a map-side count in a two-stage plan is preferable at scale — see
    ``aggregate_events`` which rewrites mode into groupBy(key, value) +
    max_by; this expression form is for small groups."""
    counted = F.array_sort(F.collect_list(c.cast("string")))  # equal values adjacent
    # deterministic mode over the sorted multiset, computed with aggregate():
    return F.aggregate(
        counted,
        F.struct(F.lit(None).cast("string").alias("best"), F.lit(0).alias("best_n"),
                 F.lit(None).cast("string").alias("cur"), F.lit(0).alias("cur_n")),
        lambda acc, x: F.struct(
            F.when((F.when(x == acc["cur"], acc["cur_n"] + 1).otherwise(F.lit(1))) > acc["best_n"], x)
             .otherwise(acc["best"]).alias("best"),
            F.greatest(F.when(x == acc["cur"], acc["cur_n"] + 1).otherwise(F.lit(1)), acc["best_n"]).alias("best_n"),
            x.alias("cur"),
            F.when(x == acc["cur"], acc["cur_n"] + 1).otherwise(F.lit(1)).alias("cur_n"),
        ),
        lambda acc: acc["best"],
    )


def agg_first(c: Column, ts: Column) -> Column:
    """First-by-event-time (TimeBasedAggregator.scala:61-225); ties on the
    timestamp break by smallest value via struct ordering."""
    return F.min(F.struct(ts.alias("t"), c.alias("v")))["v"]


def agg_last(c: Column, ts: Column) -> Column:
    return F.max(F.struct(ts.alias("t"), c.alias("v")))["v"]


def agg_geo_midpoint(c: Column, ts: Column | None = None) -> Column:
    """GeolocationMidpoint (aggregators/Geolocation.scala): mean of lat/lon/
    accuracy slots over array<double> columns (the reference's 3D-mean).
    Decimal-accumulated sums: order-independent, exact at any parallelism."""
    n = F.count(c)
    sums = [F.sum(F.try_element_at(c, F.lit(i + 1)).cast("decimal(30,8)")).cast("double")
            for i in range(3)]
    return F.array(*[s / n for s in sums])


MONOIDS: dict[str, AggFactory] = {
    "sum": agg_sum,
    "sum_exact": agg_sum_exact,
    "min": agg_min,
    "max": agg_max,
    "mean": agg_mean,
    "mean_exact": agg_mean_exact,
    "logical_or": agg_logical_or,
    "logical_and": agg_logical_and,
    "logical_xor": agg_logical_xor,
    "concat": agg_concat,
    "concat_list": agg_concat_list,
    "set_union": agg_set_union,
    "set_union_flat": agg_set_union_flat,
    "mode": agg_mode,
    "first": agg_first,
    "last": agg_last,
    "geo_midpoint": agg_geo_midpoint,
}


def deterministic_mode_plan(df: DataFrame, key: str, value: str, out: str) -> DataFrame:
    """Scale-path mode: two hash aggregations instead of per-group sorts.

    groupBy(key, value).count() then max_by(value, (count, neg-rank)) — both
    stages are partial-aggregated map-side, so the shuffle carries one row per
    (key, value) pair, not per event. Ties -> smallest value, matching
    agg_mode. This is the plan the reference's ExtendedMultiset UDAF becomes
    when re-expressed relationally.
    """
    counts = df.groupBy(key, value).agg(F.count(F.lit(1)).alias("_n"))
    pick = F.min(F.struct((-F.col("_n")).alias("neg_n"), F.col(value).alias("v")))["v"]
    return counts.groupBy(key).agg(pick.alias(out))


def aggregate_map_column(df: DataFrame, key: str, map_col: str, out: str,
                         value_monoid: str = "sum") -> DataFrame:
    """Map monoids (aggregators/Maps.scala, 25 Union*Map variants): key-wise
    union with value merge. Physical plan: explode -> hash-agg -> re-assemble
    with map_from_entries. Skew note (SURVEY.md §7): exploding fans out by map
    size; at 100 TB salt hot keys before the second aggregation.
    """
    monoid = MONOIDS[value_monoid]
    exploded = df.select(F.col(key), F.explode_outer(F.col(map_col)).alias("_k", "_v"))
    merged = exploded.where(F.col("_k").isNotNull()) \
        .groupBy(key, "_k").agg(monoid(F.col("_v"), None).alias("_mv"))
    return merged.groupBy(key).agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("_k", "_mv")))).alias(out)
    )


def aggregate_vector_column(df: DataFrame, key: str, vec_col: str, out: str) -> DataFrame:
    """CombineVector (aggregators/OPVector.scala): elementwise sum of
    array<double> vectors per key — zip_with fold inside a native aggregate
    would need a UDAF; the relational form posexplodes and re-assembles,
    keeping everything in hash aggregates."""
    pos = df.select(F.col(key), F.posexplode(F.col(vec_col)).alias("_i", "_x"))
    summed = pos.groupBy(key, "_i").agg(F.sum("_x").alias("_s"))
    return summed.groupBy(key).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("_i", "_s"))), lambda p: p["_s"]).alias(out)
    )
