"""Joined readers: equi-joins over keyed sources + post-join aggregation.

Re-expression of JoinedDataReader (readers/src/main/scala/com/salesforce/op/
readers/JoinedDataReader.scala — SURVEY.md §2.3):
  * getJoinedData:119,146-187 — equi-join on key columns; the left side may
    itself be a join (left-deep n-way tree via leftReader recursion:156-162).
  * JoinTypes.scala:39-41 — Outer / LeftOuter / Inner only.
  * combined-key coalesce (combineKeysUDF:135) -> F.coalesce, no UDF.
  * JoinedAggregateDataReader:251,274-305 — post-join groupBy(key).agg with
    per-feature monoids.
  * withSecondaryAggregation (TimeBasedFilter:69) — time-windowed conditional
    aggregation after the join (JoinedConditionalAggregator:418-441), here a
    filtered aggregate, not a UDAF.

Scale decisions (explicit, because the reference has none — it always emits a
plain shuffle join and lets Spark 2.4 pick):
  * ``broadcast_right=True`` broadcasts a dimension-sized right side —
    at 100 TB a fact x dim join must never shuffle the fact table.
  * Otherwise the join shuffles both sides on the key; when the downstream
    plan aggregates on the same key (JoinedAggregateDataReader), Catalyst
    reuses the exchange — the aggregation is shuffle-free.
  * Skewed fact keys: rely on AQE skew-join splitting
    (spark.sql.adaptive.skewJoin.enabled, on by default in session()).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .readers import AggSpec, CutOffTime, DataReader, aggregate_events

JoinType = Literal["inner", "left", "outer"]  # JoinTypes.scala:39-41


@dataclass
class JoinedReader:
    """Left-deep equi-join tree (JoinedDataReader.scala:146-187)."""

    left: Union["JoinedReader", DataReader]
    right: DataReader
    left_key: str
    right_key: str
    join_type: JoinType = "left"
    broadcast_right: bool = False
    # combined-key semantics for outer joins (combineKeysUDF:135)
    combine_keys_as: str | None = None

    def generate(self, spark: SparkSession) -> DataFrame:
        ldf = self.left.generate(spark) if isinstance(self.left, JoinedReader) else self.left.read(spark)
        rdf = self.right.read(spark)
        if self.broadcast_right:
            rdf = F.broadcast(rdf)
        cond = ldf[self.left_key] == rdf[self.right_key]
        out = ldf.join(rdf, cond, self.join_type)
        if self.combine_keys_as:
            out = out.withColumn(self.combine_keys_as,
                                 F.coalesce(ldf[self.left_key], rdf[self.right_key]))
        return out


@dataclass
class TimeBasedFilter:
    """JoinedDataReader.scala:69 TimeBasedFilter — cutoff window applied to
    the right (event) side during post-join aggregation."""

    time_col: str
    cutoff: CutOffTime


@dataclass
class JoinedAggregateReader:
    """JoinedAggregateDataReader:251 — join then aggregate on the join key."""

    joined: JoinedReader
    key_col: str
    specs: list[AggSpec]
    secondary: TimeBasedFilter | None = None   # withSecondaryAggregation:234

    def generate(self, spark: SparkSession) -> DataFrame:
        df = self.joined.generate(spark)
        if self.secondary is not None:
            return aggregate_events(df, self.key_col, self.secondary.time_col,
                                    self.secondary.cutoff, self.specs)
        aggs = []
        for s in self.specs:
            from ..aggregators import MONOIDS
            aggs.append(MONOIDS[s.monoid](F.expr(s.expr), None).alias(s.output))
        return df.groupBy(F.col(self.key_col).cast("string").alias("key")).agg(*aggs)
