"""Property-based monoid laws (hypothesis): every aggregator in MONOIDS must
be PARTITION-LAYOUT INVARIANT — same multiset of rows, any partitioning, any
input order, identical result. This is the associativity+commutativity law
the reference pins via algebird's MonoidLaws (features/.../aggregators/);
here the merge is Catalyst's partial/final aggregation, so the law is tested
by re-laying-out the same data and demanding bit-identical outputs.

Numeric inputs are integer-valued doubles: exactly representable, so even
the plain double `sum`/`mean` are order-exact and the law is testable on
every monoid (the engine's order-independence for NON-integer doubles is
provided by `sum_exact`'s decimal accumulation, covered in unit tests)."""
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from transmogrifai_spark.aggregators import MONOIDS

SCALAR_MONOIDS = ["sum", "sum_exact", "min", "max", "mean", "mean_exact",
                  "logical_or",
                  "logical_and", "logical_xor", "concat", "set_union",
                  "mode", "first", "last"]
ARRAY_MONOIDS = ["concat_list", "set_union_flat", "geo_midpoint"]

rows_strategy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 6)),
    min_size=1, max_size=20)


def _canon(v):
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _layouts(df):
    yield df.repartition(1)
    yield df.repartition(5)
    yield df.orderBy(F.col("ts").desc(), F.col("v").desc()).repartition(3)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy)
def test_scalar_monoids_partition_invariant(spark, rows):
    df = spark.createDataFrame([(float(v), t) for v, t in rows],
                               "v double, ts long")
    aggs = [MONOIDS[m](F.col("v"), F.col("ts")).alias(m)
            for m in SCALAR_MONOIDS]
    results = [tuple(_canon(x) for x in layout.agg(*aggs).first())
               for layout in _layouts(df)]
    assert results[0] == results[1] == results[2]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(
    st.tuples(st.lists(st.integers(-20, 20), min_size=3, max_size=3),
              st.integers(0, 6)),
    min_size=1, max_size=15))
def test_array_monoids_partition_invariant(spark, rows):
    df = spark.createDataFrame(
        [([float(x) for x in arr], t) for arr, t in rows],
        "v array<double>, ts long")
    aggs = [MONOIDS[m](F.col("v"), F.col("ts")).alias(m)
            for m in ARRAY_MONOIDS]
    results = [tuple(_canon(x) for x in layout.agg(*aggs).first())
               for layout in _layouts(df)]
    assert results[0] == results[1] == results[2]


def test_monoid_identity_on_empty_group(spark):
    """Empty-input behavior is part of the monoid contract: aggregates over
    zero rows yield their identity (NULL for min/max/first/..., empty for
    collections) and never raise."""
    df = spark.createDataFrame([], "v double, ts long")
    aggs = [MONOIDS[m](F.col("v"), F.col("ts")).alias(m)
            for m in SCALAR_MONOIDS]
    row = df.agg(*aggs).first()
    assert row["sum"] is None and row["min"] is None
    assert row["concat"] == "" and row["set_union"] == []
    assert row["mode"] is None and row["first"] is None
