"""Bucketed storage for shuffle-free co-located joins and aggregations.

The reference pre-shapes data driver-side (readers key and aggregate before
the workflow); at 100 TB the equivalent lever in Spark is BUCKETED layout:
``bucketBy(n, key)`` at write time hash-partitions the files themselves, so
a join or groupBy on the bucket key needs NO exchange at read time — the
single biggest shuffle eliminator for repeated joins on the same key (e.g.
events-by-user joined to profiles-by-user every run).

Usage:
    write_bucketed(events, "events_by_user", "user_id", n_buckets=512)
    write_bucketed(users,  "users_by_id",   "user_id", n_buckets=512)
    j = bucketed(spark, "events_by_user").join(
        bucketed(spark, "users_by_id"), "user_id")   # zero Exchange

Notes for a real cluster:
  * Both sides must share n_buckets (or one must be a multiple — AQE can
    coalesce) and the join key must equal the bucket key exactly.
  * ``spark.sql.sources.bucketing.enabled`` is on by default;
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` additionally
    exploits ``sortBy`` for sort-merge joins without a sort step.
  * Buckets are per-table-directory; Spark's bucketing is hive-compatible
    metadata in the session catalog (saveAsTable, not plain save).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Bucketing by the join/agg key makes every later equi-join or groupBy on
    that key exchange-free; ``sort=True`` additionally pre-sorts within
    buckets so sort-merge joins skip their sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (the catalog carries the bucket spec; a
    plain ``spark.read.parquet`` of the same files would lose it)."""
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True if the physical plan for ``joined`` contains no SHUFFLE exchange
    — the property bucketed layout buys. BroadcastExchange does not count:
    it moves only the small side, not the bucketed data."""
    import re
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return not re.search(r"(?<!Broadcast)Exchange", plan)
