"""Structured Streaming: stream-over-static-files must equal the batch plan
(the rebuild of the reference's streaming scoring path, SURVEY.md §2.13)."""
from pyspark.sql import functions as F

from transmogrifai_spark.sources.tables import load_table
from transmogrifai_spark.streaming.windows import (run_stream_available_now,
                                                   windowed_event_aggregate)

SCHEMA = ("event_id long, ts long, user_id long, event_type string, "
          "value double, props string")


def test_stream_equals_batch(spark, sf_dir):
    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA,
        lambda s: windowed_event_aggregate(s, "ts", "1 day", "1 day"),
        nanos_ts_col="ts")
    batch = windowed_event_aggregate(load_table(spark, sf_dir, "events"), "ts", "1 day")
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows
    assert len(s_rows) > 0


def test_streaming_scoring_pipeline(spark, sf_dir):
    """A fitted column-pipeline model applies to a stream unchanged."""
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.stages.base import unary
    from transmogrifai_spark.workflow import Workflow

    batch_events = load_table(spark, sf_dir, "events")
    feats = from_dataframe(batch_events.select("event_id", "value"))
    doubled = unary("dbl", feats["value"], "value_x2", "Real", lambda c: c * 2)
    model = Workflow([doubled]).fit(batch_events)

    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA,
        lambda s: model.transform(s).groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value_x2").cast("decimal(28,6)")).cast("double").alias("total")),
        nanos_ts_col="ts")
    row = streamed.first()
    n_batch = batch_events.count()
    assert row["n"] == n_batch
