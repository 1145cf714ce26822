"""Stateful operators: batch sessionization laws + streaming running state
(applyInPandasWithState) == batch aggregate."""
from pyspark.sql import functions as F

from transmogrifai_spark.sources.tables import load_table
from transmogrifai_spark.streaming.stateful import (running_totals_stream,
                                                    session_stats_batch,
                                                    sessionize_batch)


def test_sessionize_gap_semantics(spark):
    rows = [
        ("u1", "2024-01-01 10:00:00", 1.0),
        ("u1", "2024-01-01 10:10:00", 2.0),   # same session (10 min)
        ("u1", "2024-01-01 11:00:00", 3.0),   # new session (50 min gap)
        ("u2", "2024-01-01 10:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, t string, value double") \
        .withColumn("ts", F.col("t").cast("timestamp"))
    out = sessionize_batch(df, "user_id", "ts", gap_minutes=30)
    got = {(r["user_id"], r["t"]): r["session_id"] for r in out.collect()}
    assert got[("u1", "2024-01-01 10:00:00")] == 0
    assert got[("u1", "2024-01-01 10:10:00")] == 0
    assert got[("u1", "2024-01-01 11:00:00")] == 1
    assert got[("u2", "2024-01-01 10:00:00")] == 0


def test_session_stats(spark):
    rows = [("u1", "2024-01-01 10:00:00", 1.0), ("u1", "2024-01-01 10:10:00", 2.0)]
    df = spark.createDataFrame(rows, "user_id string, t string, value double") \
        .withColumn("ts", F.col("t").cast("timestamp"))
    out = session_stats_batch(df, "user_id", "ts").first()
    assert out["n_events"] == 2 and out["total_value"] == 3.0
    assert out["end_ms"] - out["start_ms"] == 600000


def test_streaming_running_totals_equals_batch(spark, sf_dir):
    """applyInPandasWithState over the events file (availableNow) must end at
    the same totals as the batch aggregate."""
    import uuid

    from transmogrifai_spark.streaming.windows import file_stream
    stream = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts")
    out = running_totals_stream(stream)
    sink = f"mem_{uuid.uuid4().hex[:10]}"
    q = (out.writeStream.format("memory").queryName(sink)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # last update per key = final state
    streamed = spark.table(sink).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
    s = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in streamed.collect()}
    b = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert s == b


def test_session_window_equals_batch_sessionize(spark, sf_dir):
    """Native session_window agg == label-propagation-free batch
    sessionization (same 30-minute gap semantics)."""
    from transmogrifai_spark.streaming.windows import session_windowed_aggregate
    ev = load_table(spark, sf_dir, "events")
    native = session_windowed_aggregate(ev, "user_id", "ts", gap="30 minutes")
    batch = session_stats_batch(ev, "user_id", "ts", gap_minutes=30.0)
    n = {(r["user_id"], r["session_start_ms"]): (r["n_events"], round(r["total_value"], 6))
         for r in native.collect()}
    b = {(int(r["key"]), r["start_ms"]): (r["n_events"], round(r["total_value"], 6))
         for r in batch.collect()}
    assert n == b
