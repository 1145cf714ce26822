"""Date-list and date-map vectorization operators (SURVEY.md §2.8).

Re-expression of:
  * DateListVectorizer  core/.../impl/feature/DateListVectorizer.scala:103 —
    pivots SinceFirst / SinceLast / ModeDay / ModeMonth / ModeHour over a
    DateList (array of epoch-ms longs)
  * DateMapVectorizer   OPMapVectorizer.scala:150 — days-ago per map key
  * DateToUnitCircleTransformer / DateMapToUnitCircleVectorizer
    (scalar forms live in functions/dates.py)

The reference's "ago" computations default to now() (Transmogrifier.scala:58)
— here ``reference_date`` is an explicit required parameter (determinism)."""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..feature import Feature
from ..functions.dates import millis_to_ts
from ..stages.base import ColumnTransformer
from .vectorizers import FittedVectorizer, VectorSlot


def date_list_expr_builder(reference_date: str, pivots):
    """Expression factory shared by the stage and the serving registry."""
    ref = F.lit(reference_date).cast("timestamp")

    def since(ms: Column) -> Column:
        return F.datediff(ref, millis_to_ts(ms)).cast("double")

    def mode_unit(lst: Column, unit) -> Column:
        units = F.transform(lst, lambda m: unit(millis_to_ts(m)).cast("long"))
        sorted_u = F.array_sort(units)
        # deterministic mode of a small sorted list via fold (ties -> smallest)
        acc0 = F.struct(F.lit(None).cast("long").alias("best"), F.lit(0).alias("bn"),
                        F.lit(None).cast("long").alias("cur"), F.lit(0).alias("cn"))
        folded = F.aggregate(
            sorted_u, acc0,
            lambda a, x: F.struct(
                F.when((F.when(x == a["cur"], a["cn"] + 1).otherwise(F.lit(1))) > a["bn"], x)
                 .otherwise(a["best"]).alias("best"),
                F.greatest(F.when(x == a["cur"], a["cn"] + 1).otherwise(F.lit(1)), a["bn"]).alias("bn"),
                x.alias("cur"),
                F.when(x == a["cur"], a["cn"] + 1).otherwise(F.lit(1)).alias("cn"),
            ),
            lambda a: a["best"])
        return folded.cast("double")

    unit_fns = {"ModeDay": F.dayofweek, "ModeMonth": F.month, "ModeHour": F.hour}

    def make_expr(lst: Column) -> Column:
        empty = lst.isNull() | (F.size(lst) == 0)
        parts = []
        for p in pivots:
            if p == "SinceFirst":
                parts.append(F.when(empty, 0.0).otherwise(since(F.array_min(lst))))
            elif p == "SinceLast":
                parts.append(F.when(empty, 0.0).otherwise(since(F.array_max(lst))))
            elif p in unit_fns:
                parts.append(F.when(empty, -1.0).otherwise(mode_unit(lst, unit_fns[p])))
            else:
                raise ValueError(f"unknown DateList pivot {p!r}")
        return F.array(*parts)

    return make_expr


def date_list_vectorizer(feat: Feature, reference_date: str,
                         pivots: tuple[str, ...] = ("SinceFirst", "SinceLast"),
                         output_name: str | None = None) -> ColumnTransformer:
    """DateListVectorizer.scala:103 — whole-day distances from the reference
    date to the first/last event, and/or modal calendar units of the list.

    Empty/null lists produce 0.0 for Since* (with the implicit semantics of
    the reference's fill) and -1.0 for Mode* slots."""
    out = output_name or f"{feat.name}_vec"
    slots = [VectorSlot(feat.name, descriptor=p) for p in pivots]
    return FittedVectorizer("dateListVec", [feat], out,
                            date_list_expr_builder(reference_date, pivots), slots,
                            {"reference_date": reference_date, "pivots": list(pivots)})


def date_map_days_ago(feat: Feature, keys: list[str], reference_date: str,
                      output_name: str | None = None) -> ColumnTransformer:
    """DateMapVectorizer (OPMapVectorizer.scala:150): per fitted key, whole
    days between the map's epoch-ms value and the reference date."""
    out = output_name or f"{feat.name}_vec"
    ref = F.lit(reference_date).cast("timestamp")
    slots = [VectorSlot(feat.name, group=k, descriptor="daysAgo") for k in keys]

    def make_expr(m: Column) -> Column:
        return F.array(*[
            F.coalesce(
                F.datediff(ref, millis_to_ts(F.try_element_at(m, F.lit(k)))).cast("double"),
                F.lit(0.0))
            for k in keys])

    return FittedVectorizer("dateMapVec", [feat], out, make_expr, slots,
                            {"keys": keys, "reference_date": reference_date})
