"""Partitioning-invariance laws: results and fitted statistics must be
bit-identical under different parallelism — the property that makes the
engine's outputs stable between local[32] and a 1000-executor cluster."""
import pytest
from pyspark.sql import functions as F


def _with_partitions(spark, n, fn):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_agg_reader_invariant_to_partitioning(spark, sf_dir):
    from transmogrifai_spark.driver_queries import q_agg_reader_cutoff

    def run():
        return sorted(tuple(r) for r in q_agg_reader_cutoff(spark, sf_dir).collect())

    a = _with_partitions(spark, 3, run)
    b = _with_partitions(spark, 17, run)
    assert a == b


def test_exact_mean_invariant(spark, sf_dir):
    from transmogrifai_spark.operators.numeric import exact_mean, exact_moments
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m3 = _with_partitions(spark, 3, lambda: exact_mean(df.repartition(3), "o_totalprice"))
    m17 = _with_partitions(spark, 17, lambda: exact_mean(df.repartition(17), "o_totalprice"))
    assert m3 == m17  # bit-identical, not approx
    s3 = _with_partitions(spark, 3, lambda: exact_moments(df.repartition(3), "o_totalprice"))
    s17 = _with_partitions(spark, 17, lambda: exact_moments(df.repartition(17), "o_totalprice"))
    assert s3 == s17


def test_auroc_invariant(spark, sf_dir):
    from transmogrifai_spark.ml.evaluators import auroc
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_totalprice").alias("s"),
        (F.col("o_orderstatus") == "F").cast("double").alias("y"))
    a = _with_partitions(spark, 3, lambda: auroc(df.repartition(3), "s", "y"))
    b = _with_partitions(spark, 29, lambda: auroc(df.repartition(29), "s", "y"))
    assert a == b


def test_onehot_fit_invariant(spark, sf_dir):
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.operators.vectorizers import one_hot_estimator
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    f = from_dataframe(cust, overrides={"c_mktsegment": "PickList"})["c_mktsegment"]

    def fit_values(n):
        fitted = one_hot_estimator(f, top_k=3, min_support=1).fit(cust.repartition(n))
        return fitted.params["values"]

    assert _with_partitions(spark, 2, lambda: fit_values(2)) == \
        _with_partitions(spark, 19, lambda: fit_values(19))
