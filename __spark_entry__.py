"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full engine spine on sf0.001 (joined+aggregated
                reader -> transmogrify -> logistic regression -> scores).
queries()     — one entry per implemented operator family from SURVEY.md §2
                plus the LLM-pipeline extensions; each (spark, sf_dir) ->
                DataFrame, built through the transmogrifai_spark engine API.
oracle_sql()  — matching DuckDB SQL for every SQL-expressible query (hash
                compared by the driver); seeded-hash / ML / vector outputs
                are rows-only by design.
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from transmogrifai_spark.driver_queries import q_ml_train_score
    return q_ml_train_score(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from transmogrifai_spark.driver_queries import SPARK_QUERIES
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from transmogrifai_spark.driver_queries import ORACLES
    return dict(ORACLES)
