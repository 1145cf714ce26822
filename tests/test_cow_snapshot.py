"""Copy-on-write snapshot laws: fold == whole-table fold, only touched
buckets rewritten, replay idempotence, point lookup reads one bucket,
streaming sink == batch fold, bucket-count mismatch guard."""
import json
import os

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources.cow_snapshot import CowSnapshot
from transmogrifai_spark.sources.upsert import apply_changes

SCHEMA = "k long, v string, ver long, op string"

ROWS = [
    (1, "a1", 1, "I"), (2, "b1", 2, "I"), (3, "c1", 3, "I"),
    (9, "x1", 4, "I"), (1, "a2", 5, "U"), (2, None, 6, "D"),
    (17, "y1", 7, "I"), (3, "c2", 8, "U"),
]


def _expected(spark):
    empty = spark.createDataFrame([], "k long, v string, ver long")
    return sorted(map(tuple, apply_changes(
        empty, spark.createDataFrame(ROWS, SCHEMA),
        ["k"], "ver", "op").collect()))


def test_cow_fold_equals_whole_table_fold(spark, tmp_path):
    snap = CowSnapshot(str(tmp_path / "cow"), ["k"], "ver",
                       n_buckets=8, op_col="op")
    for i in range(0, len(ROWS), 3):
        snap.apply(spark.createDataFrame(ROWS[i:i + 3], SCHEMA), batch_id=i)
    got = sorted(map(tuple, snap.read(spark).collect()))
    assert got == _expected(spark)


def test_cow_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "cow")
    snap = CowSnapshot(path, ["k"], "ver", n_buckets=8, op_col="op")
    snap.apply(spark.createDataFrame(ROWS, SCHEMA), batch_id=0)
    m1 = snap._read_manifest()
    # second batch touches ONLY key 1
    snap.apply(spark.createDataFrame([(1, "a3", 10, "U")], SCHEMA),
               batch_id=1)
    m2 = snap._read_manifest()
    bumped = {b for b in m2["buckets"]
              if m2["buckets"][b] != m1["buckets"].get(b)}
    assert len(bumped) == 1                      # exactly key 1's bucket
    # untouched bucket dirs were not rewritten (same single version)
    untouched = set(m1["buckets"]) - bumped
    for b in untouched:
        assert m2["buckets"][b] == m1["buckets"][b]
    # and content is correct
    got = {r["k"]: r["v"] for r in snap.read(spark).collect()}
    assert got[1] == "a3"


def test_cow_replay_skipped_and_lookup_single_bucket(spark, tmp_path):
    snap = CowSnapshot(str(tmp_path / "cow"), ["k"], "ver",
                       n_buckets=8, op_col="op")
    assert snap.apply(spark.createDataFrame(ROWS, SCHEMA), batch_id=0)
    assert not snap.apply(spark.createDataFrame(ROWS, SCHEMA), batch_id=0)
    row = snap.lookup(spark, {"k": 3}).collect()
    assert [(r["k"], r["v"]) for r in row] == [(3, "c2")]
    # the lookup's scan reads one bucket's files only
    files = snap.lookup(spark, {"k": 3}).inputFiles()
    buckets = {f.split("/b=")[1].split("/")[0] for f in files}
    assert len(buckets) == 1
    all_buckets = set(snap._read_manifest()["buckets"])
    assert len(all_buckets) > 1                  # table spans many buckets


def test_cow_stream_sink_equals_batch(spark, tmp_path):
    src = str(tmp_path / "changelog")
    for i in range(0, len(ROWS), 2):
        spark.createDataFrame(ROWS[i:i + 2], SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    snap = CowSnapshot(str(tmp_path / "cow"), ["k"], "ver",
                       n_buckets=8, op_col="op")
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = snap.stream_sink(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert sorted(map(tuple, snap.read(spark).collect())) == _expected(spark)


def test_cow_bucket_count_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "cow")
    CowSnapshot(path, ["k"], "ver", n_buckets=8, op_col="op").apply(
        spark.createDataFrame(ROWS[:2], SCHEMA), batch_id=0)
    with pytest.raises(ValueError):
        CowSnapshot(path, ["k"], "ver", n_buckets=16, op_col="op") \
            .read(spark)


def test_cow_sorted_files_disjoint_key_ranges(spark, tmp_path):
    """Locality law (VERDICT r4 item 6): each bucket version is written as
    range-partitioned, key-sorted files, so per-file key [min, max] ranges
    are pairwise DISJOINT — the layout parquet min/max pruning needs for
    point/range predicates inside a bucket."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "cow_sorted")
    snap = CowSnapshot(path, ["k"], "ver", n_buckets=1, files_per_bucket=4)
    data = spark.createDataFrame([(i, 1, float(i)) for i in range(400)],
                                 "k long, ver int, v double")
    snap.apply(data)
    files = glob.glob(f"{path}/b=0/v=1/part-*.parquet")
    assert len(files) >= 2
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert t == sorted(t)                      # sorted within file
        ranges.append((min(t), max(t)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo                             # pairwise disjoint
    hit = snap.lookup(spark, {"k": 123}).collect()
    assert len(hit) == 1 and hit[0]["v"] == 123.0


def test_cow_range_partitioned_snapshot(spark, tmp_path):
    """Key-range-partitioned variant: buckets are key intervals, so a range
    scan reads ONLY overlapping bucket directories, and the streaming sink
    rewrites only the buckets a batch touches."""
    path = str(tmp_path / "cow_range")
    snap = CowSnapshot(path, ["k"], "ver",
                       range_boundaries=[100, 200, 300])
    data = spark.createDataFrame([(i, 1, float(i)) for i in range(0, 400, 7)],
                                 "k long, ver int, v double")
    snap.apply(data)
    # files-read law: [110, 190] lies entirely inside bucket 1 (101..200)
    sub = snap.range_read(spark, 110, 190)
    assert all("/b=1/" in f for f in sub.inputFiles())
    want = sorted(k for k in range(0, 400, 7) if 110 <= k <= 190)
    assert sorted(r["k"] for r in sub.collect()) == want
    # an update touching only bucket 0 must not version other buckets
    m1 = json.loads(open(f"{path}/_MANIFEST.json").read())["buckets"]
    snap.apply(spark.createDataFrame([(5, 2, -5.0)],
                                     "k long, ver int, v double"))
    m2 = json.loads(open(f"{path}/_MANIFEST.json").read())["buckets"]
    assert m2["0"] == m1["0"] + 1
    assert all(m2[b] == m1[b] for b in m1 if b != "0")
    assert snap.lookup(spark, {"k": 5}).collect()[0]["v"] == -5.0
