"""skew_join laws: equality with the plain join for every join type (incl.
null keys + outer), broadcast on the hot branch, no-hot passthrough."""
from pyspark.sql import functions as F

from transmogrifai_spark.sources.joins import skew_join


def _skewed_frames(spark):
    # left: key 7 is hot (90%), plus some null keys; right: small dim
    left = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
         .when(F.col("id") % 100 == 9, F.lit(None))
         .otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"))
    right = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    return left, right


def _rows(df):
    # None-safe sort (outer joins produce null keys/values)
    return sorted([tuple(r) for r in df.collect()],
                  key=lambda t: tuple((v is None, v) for v in t))


def test_skew_join_equals_plain_join_all_types(spark):
    left, right = _skewed_frames(spark)
    hot = [{"k": 7}]
    for how in ["inner", "left", "right", "outer"]:
        got = skew_join(left, right, "k", how, hot=hot)
        want = left.join(right, "k", how)
        assert _rows(got) == _rows(want), how


def test_skew_join_autodetects_hot_key(spark):
    left, right = _skewed_frames(spark)
    # 90% of 20k rows on key 7; 100% sample makes detection deterministic
    got = skew_join(left, right, "k", "inner",
                    sample_rate=1.0, min_estimated_rows=10_000)
    want = left.join(right, "k", "inner")
    assert _rows(got) == _rows(want)


def test_skew_join_hot_branch_is_broadcast(spark):
    left, right = _skewed_frames(spark)
    plan = skew_join(left, right, "k", "inner", hot=[{"k": 7}]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_skew_join_no_hot_keys_is_plain_join(spark):
    left, right = _skewed_frames(spark)
    got = skew_join(left, right, "k", "left", hot=[])
    assert _rows(got) == _rows(left.join(right, "k", "left"))


def test_skew_join_multi_key(spark):
    left = spark.range(0, 5_000).select(
        (F.col("id") % 3).alias("a"), (F.col("id") % 2).alias("b"),
        F.col("id").alias("lv"))
    right = spark.range(0, 6).select(
        (F.col("id") % 3).alias("a"), (F.col("id") % 2).alias("b"),
        (F.col("id") * 100).alias("rv"))
    got = skew_join(left, right, ["a", "b"], "inner", hot=[{"a": 0, "b": 1}])
    want = left.join(right, ["a", "b"], "inner")
    assert _rows(got) == _rows(want)
