"""plan_audit: each rule fires on a constructed offender and stays silent on
the engine's committed plan shapes."""
from pyspark.sql import Window
from pyspark.sql import functions as F

from transmogrifai_spark.util import plan_audit


def _rules(findings):
    return {f["rule"] for f in findings}


def test_clean_plan_is_clean(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    assert plan_audit(df) == []


def test_python_udf_flagged(spark):
    from pyspark.sql.functions import udf
    f = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(f(F.col("id")).alias("x"))
    assert "python_udf" in _rules(plan_audit(df))


def test_cartesian_flagged(spark):
    a, b = spark.range(5), spark.range(5).withColumnRenamed("id", "id2")
    df = a.crossJoin(b)
    assert "cartesian" in _rules(plan_audit(df))


def test_global_window_flagged(spark):
    df = spark.range(100).select(
        F.row_number().over(Window.orderBy("id")).alias("rn"))
    assert "global_window" in _rules(plan_audit(df))


def test_partitioned_window_not_flagged(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 5).select(
        F.row_number().over(
            Window.partitionBy("g").orderBy("id")).alias("rn"))
    assert "global_window" not in _rules(plan_audit(df))


def test_global_sort_no_limit_flagged(spark):
    # desc: Catalyst's EliminateSorts removes an asc sort on Range output
    df = spark.range(1000).orderBy(F.desc("id"))
    assert "global_sort_no_limit" in _rules(plan_audit(df))
    limited = spark.range(1000).orderBy(F.desc("id")).limit(5)
    assert "global_sort_no_limit" not in _rules(plan_audit(limited))


def test_wide_scan_flagged(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert "unpruned_scan" in _rules(plan_audit(df, max_scan_cols=3))
    assert "unpruned_scan" not in _rules(
        plan_audit(df.select("l_orderkey"), max_scan_cols=3))
