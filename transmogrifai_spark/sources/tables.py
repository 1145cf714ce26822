"""Canonical loaders for the driver testdata tables (TESTDATA.md).

``load_table(spark, sf_dir, name)`` returns the parquet table with
engine-normalized columns. The events table is written with
TIMESTAMP(NANOS) which Spark's vectorized parquet reader rejects; the loader
flips ``spark.sql.legacy.parquet.nanosAsLong`` and derives:
  * ``ts``     — TimestampType truncated to microseconds,
  * ``ts_ms``  — epoch milliseconds (the reference's DateTime physical form,
                 FeatureSparkTypes.scala: DateTime -> LongType epoch ms).
Both are instant-based (timezone-independent), which the oracle gate needs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # calendar functions must not depend on the caller session's locale —
    # force UTC (the oracle gate's DuckDB timestamps are naive/UTC)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # integer division (`div`), NOT `/`: epoch-nanos (~1.7e18) exceed
        # double's 2^53 exact-integer range, so floor(ts/1000.0) corrupts the
        # low microseconds (measured: off-by-1ms on ~0.02% of rows)
        return (
            df.withColumn("ts_ms", F.expr("ts div 1000000").cast("long"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000").cast("long")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
