"""Monoid aggregators + aggregate/conditional reader cutoff semantics
(FeatureAggregator.extract windows, TimeBasedAggregator first/last,
ConditionalDataReader per-key cutoffs)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.aggregators import (aggregate_map_column,
                                             aggregate_vector_column,
                                             deterministic_mode_plan)
from transmogrifai_spark.sources.readers import (AggSpec, CutOffTime,
                                                 aggregate_events,
                                                 conditional_aggregate_events)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # key, ts, amount, category, flag
        ("a", "2024-01-01 00:00:00", 10.0, "x", False),
        ("a", "2024-01-02 00:00:00", 20.0, "y", False),
        ("a", "2024-01-20 00:00:00", 99.0, "x", True),   # after cutoff
        ("b", "2024-01-03 00:00:00", 5.0, "y", False),
        ("b", "2024-01-04 00:00:00", 7.0, "y", True),    # before cutoff
    ]
    df = spark.createDataFrame(rows, "key string, ts_s string, amount double, category string, flag boolean")
    return df.withColumn("ts", F.col("ts_s").cast("timestamp"))


def test_cutoff_windows(events):
    specs = [
        AggSpec("total", "amount", "sum"),
        AggSpec("n", "1", "sum"),
        AggSpec("resp", "flag", "logical_or", is_response=True),
    ]
    out = {r["key"]: r for r in aggregate_events(
        events, "key", "ts", CutOffTime(timestamp="2024-01-15 00:00:00"), specs).collect()}
    # predictors: t < cutoff only; responses: t >= cutoff only
    assert out["a"]["total"] == 30.0 and out["a"]["n"] == 2
    assert out["a"]["resp"] is True          # flag event after cutoff
    assert out["b"]["total"] == 12.0
    assert out["b"]["resp"] is None          # no events after cutoff


def test_predictor_lookback_window(events):
    cut = CutOffTime(timestamp="2024-01-15 00:00:00", predictor_window_days=12)
    out = {r["key"]: r for r in aggregate_events(
        events, "key", "ts", cut, [AggSpec("total", "amount", "sum")]).collect()}
    # window [01-03, 01-15): both of 'a's events (01-01, 01-02) fall outside
    assert out["a"]["total"] is None
    assert out["b"]["total"] == 12.0


def test_first_last_by_event_time(events):
    specs = [AggSpec("first_cat", "category", "first"),
             AggSpec("last_cat", "category", "last")]
    out = {r["key"]: r for r in aggregate_events(
        events, "key", "ts", CutOffTime(), specs).collect()}
    assert out["a"]["first_cat"] == "x" and out["a"]["last_cat"] == "x"
    assert out["b"]["first_cat"] == "y"


def test_concat_in_time_order(events):
    out = {r["key"]: r["cats"] for r in aggregate_events(
        events, "key", "ts", CutOffTime(),
        [AggSpec("cats", "category", "concat")]).collect()}
    assert out["a"] == "x,y,x"  # event-time order, not value order


def test_mode_deterministic_tie_break(spark):
    df = spark.createDataFrame([("k", "b"), ("k", "a"), ("k", "b"), ("k", "a")],
                               "key string, v string")
    out = deterministic_mode_plan(df, "key", "v", "m").collect()
    assert out[0]["m"] == "a"  # tie 2-2 -> smallest value


def test_conditional_cutoff_drops_keys_without_condition(events):
    out = conditional_aggregate_events(
        events, "key", "ts", "category = 'x' AND flag",
        [AggSpec("total", "amount", "sum")], timestamp_to_keep="min")
    rows = {r["key"]: r for r in out.collect()}
    # only 'a' has (x, flag) at 01-20; predictors before that: 10+20
    assert set(rows) == {"a"}
    assert rows["a"]["total"] == 30.0


def test_map_monoid_union_sum(spark):
    df = spark.createDataFrame(
        [("k1", {"a": 1, "b": 2}), ("k1", {"b": 3}), ("k2", {"c": 4})],
        "key string, m map<string,bigint>")
    out = {r["key"]: r["agg"] for r in aggregate_map_column(df, "key", "m", "agg").collect()}
    assert out["k1"] == {"a": 1, "b": 5}
    assert out["k2"] == {"c": 4}


def test_vector_elementwise_sum(spark):
    df = spark.createDataFrame([("k", [1.0, 2.0]), ("k", [3.0, 4.0])],
                               "key string, v array<double>")
    out = aggregate_vector_column(df, "key", "v", "s").collect()
    assert out[0]["s"] == [4.0, 6.0]


def test_logical_xor(spark):
    df = spark.createDataFrame([("k", True), ("k", True), ("k", True)], "key string, b boolean")
    out = aggregate_events(df.withColumn("ts", F.current_timestamp()), "key", "ts",
                           CutOffTime(), [AggSpec("x", "b", "logical_xor")]).collect()
    assert out[0]["x"] is True  # odd count of trues


def test_concat_list_deterministic_without_time(spark):
    """ADVICE regression: agg_concat_list with no time column sorts the
    collected arrays before flattening — layout-independent output."""
    from transmogrifai_spark.aggregators import agg_concat_list
    df = spark.createDataFrame(
        [("k", ["b", "z"]), ("k", ["a", "c"]), ("k", ["a", "b"])],
        "key string, v array<string>").repartition(5)
    out = df.groupBy("key").agg(agg_concat_list(F.col("v")).alias("l")).collect()
    assert out[0]["l"] == ["a", "b", "a", "c", "b", "z"]  # arrays sorted, order stable
