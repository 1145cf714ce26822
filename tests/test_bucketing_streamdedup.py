"""Bucketed co-located joins (no Exchange in the physical plan) and
watermark-bounded streaming dedup (stream == batch on static files)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources.bucketing import (bucketed,
                                                   is_exchange_free_join,
                                                   write_bucketed)
from transmogrifai_spark.sources.tables import load_table
from transmogrifai_spark.streaming.dedup import (dedup_stream,
                                                 dedup_stream_by_digest)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The whole point of bucketing: an equi-join of two tables bucketed on
    the join key runs with ZERO shuffle, and a groupBy on the bucket key
    likewise — at 100 TB this is the difference between a network-bound job
    and a local one. (Managed tables land in the session warehouse dir and
    are dropped, data included, in the finally block.)"""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    users = (load_table(spark, sf_dir, "events")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
    write_bucketed(ev, "t_ev_bucketed", "user_id", n_buckets=8)
    write_bucketed(users, "t_users_bucketed", "user_id", n_buckets=8)
    # disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (at 100 TB neither side broadcasts)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, r = bucketed(spark, "t_ev_bucketed"), bucketed(spark, "t_users_bucketed")
        j = l.join(r, "user_id")
        assert is_exchange_free_join(j)
        # same rows as the plain (shuffling) join
        plain = ev.join(users, "user_id")
        assert j.count() == plain.count()
        # and a groupBy on the bucket key is exchange-free too
        g = l.groupBy("user_id").agg(F.sum("value"))
        assert "Exchange" not in g._jdf.queryExecution().executedPlan().toString()
        # control: joining on a NON-bucket key must shuffle
        j2 = l.withColumnRenamed("event_id", "k").join(
            r.withColumn("k", F.col("user_id") + 0), "k")
        assert not is_exchange_free_join(j2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_users_bucketed")


def test_stream_dedup_equals_batch(spark, sf_dir):
    """Watermarked streaming dedup over static files == batch dropDuplicates
    (every duplicate inside the watermark horizon is caught)."""
    from transmogrifai_spark.streaming.windows import file_stream, run_to_memory

    src = f"{sf_dir}/events.parquet"
    stream = file_stream(spark, src, ts_col="ts")
    # synthesize redelivery: every event duplicated via union
    dup = stream.unionAll(stream)
    out = run_to_memory(
        dedup_stream(dup, ["event_id"], time_col="ts", within="2 days"),
        output_mode="append")
    batch = load_table(spark, sf_dir, "events")
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == batch.count()


def test_stream_dedup_by_digest(spark):
    """Same payload under different ids collapses; different payloads
    survive. Batch path (no stream needed for the digest logic)."""
    df = spark.createDataFrame(
        [(1, "hello", 1.0), (2, "hello", 1.0), (3, "world", 2.0),
         (4, None, 2.0), (5, None, 2.0)],
        "id long, text string, v double")
    out = dedup_stream_by_digest(df, ["text", "v"])
    assert out.count() == 3  # (hello,1.0), (world,2.0), (null,2.0)
    # nulls dedup as equal payloads, not as distinct
    assert out.where(F.col("text").isNull()).count() == 1


def test_dedup_stream_requires_time_col():
    with pytest.raises(ValueError, match="time_col"):
        # a streaming frame is required to hit the guard; fake with a stub
        class _S:
            isStreaming = True
        dedup_stream(_S(), ["k"], within="1 hour")
