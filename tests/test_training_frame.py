"""Point-in-time training-frame laws: no future leakage, asof==scd2
cross-operator agreement, deletion gaps, multi-source fold."""
import random

from pyspark.sql import functions as F

from transmogrifai_spark.ml.training_frame import (
    assemble_training_frame, point_in_time_features, scd2_features)
from transmogrifai_spark.sources.upsert import scd2_history


def _obs_log(spark, seed=3, keys=8, n=120):
    rng = random.Random(seed)
    rows = [(rng.randrange(keys), f"s{i}", (i + 1) * 10, "U")
            for i in range(n)]
    return spark.createDataFrame(rows, "k int, state string, ts long, op string")


def _labels(spark, seed=4, keys=8, n=60):
    rng = random.Random(seed)
    rows = [(rng.randrange(keys + 2), rng.randrange(0, 1300), i)
            for i in range(n)]
    return spark.createDataFrame(rows, "k int, t long, label_id int")


def test_no_future_leakage(spark):
    # carry the observation time as a payload column to audit the match
    obs = _obs_log(spark).drop("op").withColumn("obs_ts", F.col("ts"))
    labels = _labels(spark)
    out = point_in_time_features(labels, obs, "k", "t", feature_time="ts")
    rows = out.collect()
    assert len(rows) == labels.count()           # left-preserving
    matched = 0
    for r in rows:
        if r["state"] is not None:
            matched += 1
            assert r["obs_ts"] <= r["t"]         # never a future observation
    assert matched > 0


def test_asof_equals_scd2_route(spark):
    """The event-log route and the versioned-state route agree when the
    history is built from the same log (no deletes)."""
    obs = _obs_log(spark)
    labels = _labels(spark)
    via_asof = point_in_time_features(
        labels, obs.drop("op"), "k", "t", feature_time="ts")
    hist = scd2_history(obs, ["k"], "ts", "op")
    via_scd2 = scd2_features(labels, hist, "k", "t")
    a = sorted((r["label_id"], r["state"]) for r in via_asof.collect())
    s = sorted((r["label_id"], r["state"]) for r in via_scd2.collect())
    assert a == s and a


def test_scd2_deletion_gap_gives_nulls(spark):
    rows = [(1, "alive", 10, "I"), (1, "dead", 30, "D"),
            (1, "back", 50, "I")]
    hist = scd2_history(
        spark.createDataFrame(rows, "k int, state string, ts long, op string"),
        ["k"], "ts", "op")
    labels = spark.createDataFrame(
        [(1, 20, 0), (1, 40, 1), (1, 60, 2), (1, 5, 3)],
        "k int, t long, label_id int")
    got = {r["label_id"]: r["state"]
           for r in scd2_features(labels, hist, "k", "t").collect()}
    assert got == {0: "alive", 1: None, 2: "back", 3: None}


def test_assemble_training_frame_multi_source(spark):
    obs = _obs_log(spark).drop("op")
    hist = scd2_history(_obs_log(spark, seed=9), ["k"], "ts", "op")
    labels = _labels(spark)
    out = assemble_training_frame(
        labels, "k", "t",
        feature_logs=[(obs.withColumnRenamed("state", "recent"), "ts")],
        histories=[hist.withColumnRenamed("state", "version_state")])
    assert out.count() == labels.count()
    assert {"recent", "version_state"} <= set(out.columns)


def test_scd2_features_on_a_stream_equals_batch(spark, tmp_path):
    """Versioned-state enrichment works unchanged on a stream (stream-static
    left join with the interval condition is stateless per micro-batch) and
    equals the batch route."""
    from transmogrifai_spark.streaming.windows import run_to_memory

    hist = scd2_history(_obs_log(spark), ["k"], "ts", "op")
    labels = _labels(spark)
    src = str(tmp_path / "labels")
    labels.write.parquet(src)
    stream = (spark.readStream.schema(labels.schema).parquet(src))
    enriched = scd2_features(stream, hist, "k", "t")
    got = sorted((r["label_id"], r["state"]) for r in
                 run_to_memory(enriched, "append").collect())
    want = sorted((r["label_id"], r["state"]) for r in
                  scd2_features(labels, hist, "k", "t").collect())
    assert got == want and got
