"""Streaming CDC sink laws: stream == batch fold, replay idempotence,
version retention, reader isolation (pointer flips atomically)."""
import os

from pyspark.sql import functions as F

from transmogrifai_spark.sources.upsert import apply_changes
from transmogrifai_spark.streaming.upsert_sink import (
    read_snapshot, stream_apply_changes, upsert_batch)

SCHEMA = "k int, v string, ver long, op string"

ROWS = [
    (1, "a1", 1, "I"), (2, "b1", 2, "I"), (3, "c1", 3, "I"),
    (1, "a2", 4, "U"), (2, None, 5, "D"),
    (4, "d1", 6, "I"), (1, "a3", 7, "U"), (3, None, 8, "D"),
]


def _write_changelog(spark, tmpdir, files=4):
    src = os.path.join(tmpdir, "changelog")
    per = len(ROWS) // files
    for i in range(files):
        chunk = ROWS[i * per:(i + 1) * per]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    return src


def test_stream_fold_equals_batch_fold(spark, tmp_path):
    src = _write_changelog(spark, str(tmp_path))
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1)   # force multiple batches
              .parquet(src))
    q = stream_apply_changes(stream, snap, ["k"], "ver", "op",
                             checkpoint=ckpt)
    q.awaitTermination()
    got = sorted(map(tuple, read_snapshot(spark, snap).collect()))
    empty = spark.createDataFrame([], "k int, v string, ver long")
    want = sorted(map(tuple, apply_changes(
        empty, spark.createDataFrame(ROWS, SCHEMA), ["k"], "ver", "op")
        .collect()))
    assert got == want
    assert got == [(1, "a3", 7), (4, "d1", 6)]   # 2,3 deleted; 1 updated


def test_replayed_batch_is_skipped(spark, tmp_path):
    snap = str(tmp_path / "snap")
    batch = spark.createDataFrame(ROWS[:3], SCHEMA)
    assert upsert_batch(batch, snap, ["k"], "ver", "op", batch_id=0)
    before = sorted(map(tuple, read_snapshot(spark, snap).collect()))
    assert not upsert_batch(batch, snap, ["k"], "ver", "op", batch_id=0)
    after = sorted(map(tuple, read_snapshot(spark, snap).collect()))
    assert before == after
    # a NEW batch id applies
    assert upsert_batch(spark.createDataFrame(ROWS[3:5], SCHEMA),
                        snap, ["k"], "ver", "op", batch_id=1)
    assert sorted(r["k"] for r in read_snapshot(spark, snap).collect()) == [1, 3]


def test_version_retention_prunes_old_dirs(spark, tmp_path):
    snap = str(tmp_path / "snap")
    for i, row in enumerate(ROWS[:5]):
        upsert_batch(spark.createDataFrame([row], SCHEMA), snap,
                     ["k"], "ver", "op", batch_id=i, retain_versions=2)
    versions = sorted(int(d[2:]) for d in os.listdir(snap)
                      if d.startswith("v="))
    assert versions == [3, 4, 5]                 # last 2 + current kept
    assert read_snapshot(spark, snap) is not None
