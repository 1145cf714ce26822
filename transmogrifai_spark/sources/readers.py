"""Data readers: sources + key extraction + (conditional) event aggregation.

Re-expression of the reference's reader layer (SURVEY.md §2.2/§2.4):
  * DataReader          readers/src/main/scala/com/salesforce/op/readers/DataReader.scala:58
    (generateDataFrame:174-207 — read -> key extract -> per-feature extractFn)
  * CSVReader/CSVAutoReader  readers/.../CSVReaders.scala:54, CSVAutoReaders.scala:57
  * AvroReader          readers/.../AvroReaders.scala:55
  * ParquetProductReader readers/.../ParquetProductReader.scala:47
  * AggregateDataReader readers/.../DataReader.scala:266-294 — per-feature
    monoid aggregation of events: predictors over t < cutoff, responses over
    t >= cutoff (FeatureAggregator.extract, features/.../aggregators/
    FeatureAggregator.scala:62-106).
  * ConditionalDataReader readers/.../DataReader.scala:303-384 — per-key
    cutoff = time of the target-condition event (Min/Max policy via
    TimeStampToKeep); keys without the condition are dropped (:319).
  * CutOffTime          features/.../aggregators/CutOffTime.scala:42.

Physical plans, chosen for 100 TB:
  * Aggregation is a single ``groupBy(key).agg(...)`` — Catalyst's hash
    aggregate does partial (map-side) + final combine, the exact shape the
    reference hand-built with ``reduceByKey`` (DataReader.scala:237-242).
    One shuffle, combiner-compressed.
  * Cutoff windows are ``F.when(predicate, col)`` **inside** the aggregate —
    a filtered aggregation, not a UDAF (the reference's
    JoinedConditionalAggregator UDAF disappears, JoinedDataReader.scala:418-441).
  * The conditional reader computes per-key cutoffs with a window function
    over the same key partitioning the aggregation will shuffle on — one
    shuffle total, reused by both steps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..aggregators import MONOIDS


@dataclass
class DataReader:
    """Simple source reader: path + format + key column.

    ``generate(spark, extract)`` mirrors generateDataFrame
    (DataReader.scala:174-207): read, then one ``select`` of the key and every
    feature's extract expression — at the scan, so Catalyst pushes column
    pruning into parquet (only extracted columns are read off disk).
    """

    path: str
    fmt: Literal["parquet", "csv", "avro", "json"] = "parquet"
    key_col: str = "key"
    options: dict = field(default_factory=dict)
    schema: str | None = None
    repartition: int | None = None  # DataReader.maybeRepartition:147-164

    def read(self, spark: SparkSession) -> DataFrame:
        fmt = self.fmt
        if fmt == "avro":
            # JVM spark-avro if on the classpath, else the pure-Python
            # splittable fallback datasource (sources/avro_source.py)
            from .avro_source import register_avro
            fmt = register_avro(spark)
        reader = spark.read.options(**self.options)
        if self.schema:
            reader = reader.schema(self.schema)
        if fmt == "csv" and "header" not in self.options:
            reader = reader.option("header", True).option("inferSchema", self.schema is None)
        df = reader.format(fmt).load(self.path)
        if self.repartition:
            df = df.repartition(self.repartition)
        return df

    def generate(self, spark: SparkSession, extract: dict[str, str] | None = None) -> DataFrame:
        df = self.read(spark)
        if not extract:
            return df
        cols = [F.col(self.key_col).cast("string").alias("key")]
        cols += [F.expr(e).alias(name) for name, e in extract.items()]
        return df.select(*cols)


@dataclass
class InlineReader:
    """Inline DataFrame as a reader (reference setInputDataset/setInputRDD,
    core/.../OpWorkflowCore.scala:147,164)."""

    df: DataFrame
    key_col: str = "key"

    def read(self, spark: SparkSession) -> DataFrame:
        return self.df

    def generate(self, spark: SparkSession, extract: dict[str, str] | None = None) -> DataFrame:
        if not extract:
            return self.df
        cols = [F.col(self.key_col).cast("string").alias("key")]
        cols += [F.expr(e).alias(name) for name, e in extract.items()]
        return self.df.select(*cols)


@dataclass(frozen=True)
class AggSpec:
    """One feature's aggregation: source expression + monoid + role.

    Mirrors the (FeatureGeneratorStage extractFn, MonoidAggregator) pair the
    reference attaches to every raw feature (MonoidAggregatorDefaults.scala:52-130).
    """

    output: str
    expr: str                      # SQL expression over the source row
    monoid: str = "sum"            # key into aggregators.MONOIDS
    is_response: bool = False


@dataclass
class CutOffTime:
    """CutOffTime.scala:42 — an explicit, deterministic cutoff timestamp.

    The reference also supports DaysAgo (relative to now()); the rebuild
    requires absolute cutoffs — determinism is part of the correctness gate.
    """

    timestamp: str | None = None          # e.g. '2024-01-15 00:00:00'
    predictor_window_days: float | None = None   # lookback for predictors
    response_window_days: float | None = None    # lookahead for responses

    def cutoff_col(self) -> Column | None:
        return F.lit(self.timestamp).cast("timestamp") if self.timestamp else None


def _windowed(col: Column, ts: Column, cutoff: Column | None,
              is_response: bool, cut: CutOffTime) -> Column:
    """FeatureAggregator cutoff semantics (FeatureAggregator.scala:62-106):
    predictors keep ``cutoff - window <= t < cutoff``; responses keep
    ``cutoff <= t < cutoff + window`` (JoinedDataReader.scala:433-434)."""
    if cutoff is None:
        return col
    if is_response:
        pred = ts >= cutoff
        if cut.response_window_days is not None:
            pred &= ts < cutoff + F.expr(f"INTERVAL {cut.response_window_days} DAYS")
    else:
        pred = ts < cutoff
        if cut.predictor_window_days is not None:
            pred &= ts >= cutoff - F.expr(f"INTERVAL {cut.predictor_window_days} DAYS")
    return F.when(pred, col)


@dataclass
class AggregateDataReader:
    """DataReader.scala:266-294 — keyed monoid aggregation of an event table."""

    reader: DataReader
    key_col: str
    time_col: str
    cutoff: CutOffTime
    specs: list[AggSpec]

    def generate(self, spark: SparkSession) -> DataFrame:
        df = self.reader.read(spark)
        return aggregate_events(df, self.key_col, self.time_col, self.cutoff, self.specs)


def aggregate_events(df: DataFrame, key_col: str, time_col: str,
                     cutoff: CutOffTime, specs: list[AggSpec],
                     cutoff_col: Column | None = None) -> DataFrame:
    """The aggregation planner shared by aggregate/conditional/joined readers.

    Emits one ``groupBy(key).agg(...)`` with every monoid as a native
    aggregate over a cutoff-filtered value — single shuffle, map-side partial
    aggregation, no UDAFs.
    """
    ts = F.col(time_col)
    cut = cutoff_col if cutoff_col is not None else cutoff.cutoff_col()
    aggs = []
    for s in specs:
        monoid = MONOIDS[s.monoid]
        val = _windowed(F.expr(s.expr), ts, cut, s.is_response, cutoff)
        needs_ts = s.monoid in ("first", "last", "concat", "concat_list")
        agg = monoid(val, ts) if needs_ts else monoid(val, None)
        aggs.append(agg.alias(s.output))
    return df.groupBy(F.col(key_col).cast("string").alias("key")).agg(*aggs)


@dataclass
class ConditionalDataReader:
    """DataReader.scala:303-384 — per-key cutoff from a target-condition event.

    ``timestamp_to_keep``: 'min' | 'max' (TimeStampToKeep.scala; the
    reference's Random policy is excluded — nondeterministic, SURVEY.md §7).
    Keys whose event stream never satisfies the condition are dropped
    (DataReader.scala:319).

    Plan: cutoff via ``min/max(when(cond, ts)) over (partition by key)`` —
    the window shuffle partitions by the same key as the subsequent
    aggregation, so AQE coalesces them into one exchange.
    """

    reader: DataReader
    key_col: str
    time_col: str
    condition: str                 # SQL boolean over the event row
    specs: list[AggSpec]
    timestamp_to_keep: Literal["min", "max"] = "min"
    cutoff: CutOffTime = field(default_factory=CutOffTime)

    def generate(self, spark: SparkSession) -> DataFrame:
        df = self.reader.read(spark)
        return conditional_aggregate_events(
            df, self.key_col, self.time_col, self.condition, self.specs,
            self.timestamp_to_keep, self.cutoff)


def conditional_aggregate_events(df: DataFrame, key_col: str, time_col: str,
                                 condition: str, specs: list[AggSpec],
                                 timestamp_to_keep: str = "min",
                                 cutoff: CutOffTime | None = None) -> DataFrame:
    cutoff = cutoff or CutOffTime()
    w = Window.partitionBy(key_col)
    cond_ts = F.when(F.expr(condition), F.col(time_col))
    picker = F.min if timestamp_to_keep == "min" else F.max
    with_cut = df.withColumn("_cutoff", picker(cond_ts).over(w))
    with_cut = with_cut.where(F.col("_cutoff").isNotNull())  # drop keys w/o condition
    return aggregate_events(with_cut, key_col, time_col, cutoff, specs,
                            cutoff_col=F.col("_cutoff"))
