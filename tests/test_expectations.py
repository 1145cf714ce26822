"""Data expectations: one-pass metrics vs direct computation; plan law."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.expectations import (
    allowed_values, approx_unique, check, check_report, complete, in_range,
    matches, non_negative, satisfies, unique)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").persist()


def test_check_on_orders(spark, orders):
    out = check(orders, [
        complete("o_orderkey"),
        unique("o_orderkey"),
        complete("o_orderdate", min_fraction=0.5),
        in_range("o_totalprice", 0, 10**9),
        non_negative("o_totalprice"),
        allowed_values("o_orderstatus", ["F", "O", "P"]),
        matches("o_orderpriority", r"^\d-[A-Z ]+$"),
        satisfies("key_nonneg", F.col("o_orderkey") >= 0),
    ])
    assert out["passed"], out
    assert out["results"]["unique(o_orderkey)"]["metric"] == 1.0


def test_violations_are_caught(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -3.0), (2, None, 7.0)],
        "id long, s string, v double")
    out = check(df, [
        unique("id"),                      # 2 appears twice
        complete("s"),                     # one null
        in_range("v", 0, 10),              # -3 out of range
        allowed_values("s", ["a"]),        # 'b' not allowed
    ])
    assert not out["passed"]
    assert all(not v["passed"] for v in out["results"].values())
    r = out["results"]
    assert r["unique(id)"]["metric"] == pytest.approx(2 / 3)
    assert r["complete(s)"]["metric"] == pytest.approx(2 / 3)
    assert r["in_range(v,0,10)"]["metric"] == pytest.approx(2 / 3)


def test_all_null_column_vacuous_pass_for_fraction_checks(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = check(df, [in_range("v", 0, 1), complete("v", min_fraction=0.0)])
    # range over zero non-null values is vacuously true; completeness 0.0 ok
    assert out["passed"], out


def test_report_is_single_aggregation(spark, orders):
    rep = check_report(orders, [complete("o_orderkey"),
                                in_range("o_totalprice", 0, 10**9),
                                satisfies("k", F.col("o_orderkey") > 0)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # no count_distinct in this set -> exactly one exchange (partial+final agg)
    assert plan.count("Exchange") == 1, plan


def test_approx_unique_close_to_exact(spark, orders):
    out = check(orders, [approx_unique("o_orderkey", min_ratio=0.9)])
    assert out["passed"]


def test_suggest_constraints_roundtrip(spark, sf_dir):
    from transmogrifai_spark.operators.expectations import check, suggest
    from transmogrifai_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cons = suggest(li)
    names = {c.name for c in cons}
    # key-ish, numeric-range and categorical suggestions all present
    assert any("complete" in n for n in names)
    assert any("in_range(l_quantity" in n for n in names)
    assert any("allowed_values(l_returnflag" in n for n in names)
    # the suggested set must PASS on the frame it was derived from
    verdict = check(li, cons)
    assert verdict["passed"], {n: r for n, r in verdict["results"].items()
                               if not r["passed"]}
    # and fail on data outside the observed ranges
    import pyspark.sql.functions as F
    poisoned = li.withColumn("l_quantity", F.col("l_quantity") + 1_000_000)
    assert not check(poisoned, cons)["passed"]
