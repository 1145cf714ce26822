"""One-pass table profiler: per-column statistics for every column in ONE
aggregation job — the data-engineering "describe" that scales.

``df.describe()``/``summary()`` cover numeric columns with exact
percentiles (a sort per column at scale); this profiler emits, per column,
type-dispatched stats chosen to be single-pass and bounded:

  * all types: count, null_count, approx_distinct (HLL)
  * numeric: min, max, decimal-exact mean, p50/p95 (KLL sketch)
  * string: min/max length, decimal-exact mean length
  * array: min/max/mean size
  * boolean: true_count

Everything is one ``df.agg(...)`` — one scan, no shuffle beyond the final
single-row reduce, however many columns (the reference computes its
fit-time summaries per-stage; SanityChecker-style whole-frame statistics
here cost one job, the same shape as operators/expectations.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stats_for(field: T.StructField) -> dict[str, object]:
    c = F.col(field.name)
    dt = field.dataType
    # hll_sketch_agg accepts int/bigint/string/binary — other types go in
    # as their canonical string form (1:1 for the profiling purpose)
    if isinstance(dt, (T.IntegerType, T.LongType, T.StringType,
                       T.BinaryType)):
        hll_in = c
    else:
        hll_in = c.cast("string")
    stats: dict[str, object] = {
        "count": F.count(c),
        "null_count": F.count(F.lit(1)) - F.count(c),
        "approx_distinct": F.hll_sketch_estimate(
            F.hll_sketch_agg(hll_in, F.lit(12))).cast("long"),
    }
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        kll = F.kll_sketch_agg_double(c.cast("double"), F.lit(200))
        stats.update({
            "min": F.min(c), "max": F.max(c),
            "mean": (F.sum(c.cast("decimal(30,6)")).cast("double")
                     / F.count(c)),
            "p50": F.kll_sketch_get_quantile_double(kll, F.lit(0.5)),
            "p95": F.kll_sketch_get_quantile_double(kll, F.lit(0.95)),
        })
    elif isinstance(dt, T.StringType):
        ln = F.length(c)
        stats.update({
            "min_length": F.min(ln), "max_length": F.max(ln),
            "mean_length": (F.sum(ln.cast("decimal(30,6)")).cast("double")
                            / F.count(ln)),
        })
    elif isinstance(dt, T.ArrayType):
        sz = F.size(c)
        stats.update({
            "min_size": F.min(sz), "max_size": F.max(sz),
            "mean_size": (F.sum(sz.cast("decimal(30,6)")).cast("double")
                          / F.count(c)),
        })
    elif isinstance(dt, T.BooleanType):
        stats["true_count"] = F.count(F.when(c, True))
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        stats.update({"min": F.min(c), "max": F.max(c)})
    return stats


def profile(df: DataFrame, columns: list[str] | None = None) -> dict[str, dict]:
    """{column: {stat: value}} for every (or the named) columns — ONE
    aggregation job over one scan. Values are plain Python (driver-sized:
    a handful of scalars per column)."""
    fields = [f for f in df.schema.fields
              if columns is None or f.name in columns]
    aggs, index = [], []
    for f in fields:
        for stat, expr in _stats_for(f).items():
            aggs.append(expr.alias(f"{f.name}__{stat}"))
            index.append((f.name, stat))
    row = df.agg(*aggs).collect()[0]
    out: dict[str, dict] = {}
    for (col, stat), v in zip(index, row):
        out.setdefault(col, {})[stat] = v
    return out
