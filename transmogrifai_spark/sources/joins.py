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


def skew_join(left: DataFrame, right: DataFrame, on: Union[str, list[str]],
              how: JoinType | str = "inner",
              hot: list[dict] | None = None,
              sample_rate: float = 0.01,
              min_estimated_rows: int = 1_000_000) -> DataFrame:
    """Skew-aware equi-join: split out the left side's hot keys and join
    them via a broadcast of the right rows for ONLY those keys; everything
    else takes the normal shuffle join. At 100 TB a handful of hot keys
    (the null-like sentinel user, the default tenant) can pin a sort-merge
    join on a few straggler reducers for hours; routing just those keys
    through a BroadcastHashJoin removes the skewed shuffle entirely.

    Relationship to AQE skew-join (on in session()): AQE splits oversized
    sort-merge PARTITIONS after they materialize — it still shuffles the hot
    rows and only helps when skew shows up at partition granularity. This
    operator keeps hot-key rows out of the shuffle altogether and bounds
    the broadcast to |hot keys| x right-rows-per-key, which is exactly the
    dimension-sized payload broadcasts are for. Use when the right side is
    per-key small (dims, profiles); let AQE handle diffuse skew.

    ``hot``: rows from ``util.hot_keys`` (or any [{key...}, ...]); detected
    from ``left`` via a hash sample when omitted. Key-set splitting keeps
    the union exact for every join type: the two branches partition rows by
    key value, and NULL keys (which never equi-match) ride the cold branch
    so outer-join null-preservation is untouched.
    """
    from ..util import hot_keys as detect_hot_keys

    keys = [on] if isinstance(on, str) else list(on)
    if hot is None:
        hot = detect_hot_keys(left, keys, sample_rate=sample_rate,
                              min_estimated_rows=min_estimated_rows)
    if not hot:
        return left.join(right, on, how)

    hot_tuples = [tuple(h[k] for k in keys) for h in hot]
    probe = F.struct(*[F.col(k) for k in keys])
    hot_lit = F.array(*[
        F.struct(*[F.lit(v).alias(k) for k, v in zip(keys, t)])
        for t in hot_tuples])
    is_hot = F.array_contains(hot_lit, probe)

    # NULL keys never match in an equi-join; coalesce(is_hot, false) sends
    # them down the cold branch, preserving outer-join semantics
    cold_l = left.filter(~F.coalesce(is_hot, F.lit(False)))
    hot_l = left.filter(F.coalesce(is_hot, F.lit(False)))
    cold_r = right.filter(~F.coalesce(is_hot, F.lit(False)))
    hot_r = right.filter(F.coalesce(is_hot, F.lit(False)))

    cold = cold_l.join(cold_r, keys, how)
    hot_j = hot_l.join(F.broadcast(hot_r), keys, how)
    return cold.unionByName(hot_j)
