"""Bucket-partitioned copy-on-write snapshots: CDC upserts that rewrite
ONLY the key-buckets a batch touches — the thing that makes
apply_changes viable at 100 TB.

A whole-table upsert (streaming/upsert_sink.py) re-shuffles and rewrites
the full snapshot every batch: correct, but at 100 TB a 1 GB changelog
batch must not cost a 100 TB write. Standard lakehouse answer
(copy-on-write at file/partition granularity): shard the snapshot by a
deterministic key hash into ``n_buckets``; a batch (a) computes the
DISTINCT buckets its keys hash to, (b) reads only those buckets from the
current manifest, (c) folds with apply_changes, (d) writes the new bucket
versions, (e) commits a manifest mapping bucket -> version with an atomic
pointer swap. Untouched buckets are never read, shuffled, or written —
cost scales with |changed buckets| ~ batch key spread, not table size.

Layout on disk:

    <dir>/b=<bucket>/v=<version>/part-*.parquet   immutable bucket versions
    <dir>/_MANIFEST.json                          {bucket: version,
                                                   last_batch_id}

Readers resolve the manifest once and union the per-bucket paths — every
path is immutable, so a long-running read is consistent even while
upserts land (it keeps reading the versions its manifest named; pruned
old versions only disappear after ``retain_versions`` newer ones exist).
Exactly-once under foreachBatch replay comes from last_batch_id exactly
as in the whole-table sink.

The bucket column is pmod(xxhash64(keys), n_buckets) — layout-independent
and computable by both the writer and any reader that wants bucket
pruning for point lookups (read one bucket, not the table).
"""
from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST.json"


def bucket_of(keys: list[str], n_buckets: int):
    """The deterministic shard id expression shared by writer and readers."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def range_bucket_of(key: str, boundaries: list):
    """Range-partitioning shard id: bucket i holds keys in
    (boundaries[i-1], boundaries[i]] with open ends below/above — i.e.
    ``sum(key > b)`` over the sorted boundary list. Unlike the hash form
    this keeps key ORDER across buckets, so range scans touch only the
    overlapping buckets."""
    b = F.lit(0)
    for bound in boundaries:
        b = b + (F.col(key) > F.lit(bound)).cast("int")
    return b


class CowSnapshot:
    """A bucket-partitioned, versioned, manifest-committed upsert table.

    Sharding is hash (``pmod(xxhash64(keys))``, default) or — with
    ``range_boundaries`` and a single key — RANGE: bucket i covers one key
    interval, so ``range_read(lo, hi)`` reads only the overlapping bucket
    directories. Either way this is the key-partitioned variant of
    streaming/upsert_sink: ``stream_sink`` rewrites only the buckets a
    micro-batch touches, never the whole table.

    Every bucket version is written range-partitioned into
    ``files_per_bucket`` files and SORTED by key within each file, so the
    parquet min/max stats are tight: a point lookup inside a bucket prunes
    at file/row-group level, not just directory level (locality
    law-tested: per-file key ranges are pairwise disjoint)."""

    def __init__(self, path: str, keys: list[str], order_col: str,
                 n_buckets: int = 64, op_col: str | None = None,
                 retain_versions: int = 2, files_per_bucket: int = 1,
                 range_boundaries: list | None = None):
        self.path, self.keys, self.order_col = path, list(keys), order_col
        self.op_col = op_col
        self.retain_versions = retain_versions
        self.files_per_bucket = files_per_bucket
        self.range_boundaries = (sorted(range_boundaries)
                                 if range_boundaries else None)
        if self.range_boundaries is not None:
            if len(self.keys) != 1:
                raise ValueError("range partitioning needs a single key")
            self.n_buckets = len(self.range_boundaries) + 1
        else:
            self.n_buckets = n_buckets

    def _bucket_expr(self):
        if self.range_boundaries is not None:
            return range_bucket_of(self.keys[0], self.range_boundaries)
        return bucket_of(self.keys, self.n_buckets)

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        p = os.path.join(self.path, _MANIFEST)
        if not os.path.exists(p):
            return {"buckets": {}, "last_batch_id": -1,
                    "n_buckets": self.n_buckets}
        with open(p) as f:
            m = json.load(f)
        if m["n_buckets"] != self.n_buckets:
            raise ValueError(
                f"snapshot was written with n_buckets={m['n_buckets']}, "
                f"reader configured {self.n_buckets}")
        return m

    def _commit(self, manifest: dict) -> None:
        p = os.path.join(self.path, _MANIFEST)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, p)  # atomic: readers see old or new manifest

    # -- read --------------------------------------------------------------
    def _bucket_paths(self, manifest: dict,
                      buckets: list[int] | None = None) -> list[str]:
        items = manifest["buckets"].items()
        if buckets is not None:
            want = {str(b) for b in buckets}
            items = [(b, v) for b, v in items if b in want]
        return [os.path.join(self.path, f"b={b}", f"v={v}")
                for b, v in items]

    def read(self, spark: SparkSession,
             buckets: list[int] | None = None) -> DataFrame | None:
        """The committed snapshot (optionally restricted to ``buckets`` for
        point lookups); None before the first commit."""
        paths = self._bucket_paths(self._read_manifest(), buckets)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def range_read(self, spark: SparkSession, lo, hi) -> DataFrame | None:
        """Range scan [lo, hi] on a RANGE-partitioned snapshot: reads only
        the bucket directories whose key interval overlaps, then filters.
        (On a hash-partitioned snapshot every bucket may hold in-range
        keys, so this requires range_boundaries.)"""
        if self.range_boundaries is None:
            raise ValueError("range_read requires range_boundaries")
        bs = self.range_boundaries
        first = sum(1 for b in bs if lo > b)    # bucket holding lo
        last = sum(1 for b in bs if hi > b)     # bucket holding hi
        df = self.read(spark, buckets=list(range(first, last + 1)))
        if df is None:
            return None
        k = F.col(self.keys[0])
        return df.filter((k >= F.lit(lo)) & (k <= F.lit(hi)))

    def lookup(self, spark: SparkSession, key_row: dict) -> DataFrame | None:
        """Point lookup: hash the key to its bucket, read ONE bucket (not
        the table), filter to the key. None before the first commit.

        The probe row is CAST to the snapshot's actual key column types
        before hashing: xxhash64 is type-sensitive, so a probe typed by
        guessing from the Python value (e.g. long for a key stored as
        int/decimal/date) would hash to a different bucket than the
        writer's bucket_of and silently miss. The types come from ONE
        committed bucket's parquet footers (every bucket shares the
        schema) — NOT a full-table read, which would list every bucket
        directory and make point-lookup setup cost O(table files)."""
        paths = self._bucket_paths(self._read_manifest())
        if not paths:
            return None
        schema = spark.read.parquet(paths[0]).schema
        row = spark.createDataFrame(
            [tuple(None if key_row[k] is None else str(key_row[k])
                   for k in self.keys)],
            ", ".join(f"{k} string" for k in self.keys))
        row = row.select(*[F.col(k).cast(schema[k].dataType)
                           for k in self.keys])
        b = row.select(self._bucket_expr().alias("b")).collect()[0]["b"]
        df = self.read(spark, buckets=[int(b)])
        if df is None:
            return None
        cond = None
        for k in self.keys:
            c = F.col(k) == F.lit(key_row[k])
            cond = c if cond is None else (cond & c)
        return df.filter(cond)

    # -- write -------------------------------------------------------------
    def apply(self, changes: DataFrame, batch_id: int | None = None) -> bool:
        """Fold a changelog batch: only the buckets containing changed keys
        are read, merged, and rewritten. Returns False on a replayed
        batch_id (skipped)."""
        from .upsert import apply_changes

        os.makedirs(self.path, exist_ok=True)
        manifest = self._read_manifest()
        if batch_id is not None and batch_id <= manifest["last_batch_id"]:
            return False
        spark = changes.sparkSession
        b = self._bucket_expr()
        changes = changes.withColumn("__b", b).persist()
        touched = sorted(r["__b"] for r in
                         changes.select("__b").distinct().collect())

        out_cols = [c for c in changes.columns
                    if c not in ("__b", self.op_col)]
        base = self.read(spark, buckets=touched)
        if base is None:
            base = spark.createDataFrame([], changes.select(*out_cols).schema)
        merged = apply_changes(base, changes.drop("__b"), self.keys,
                               self.order_col, self.op_col) \
            .withColumn("__b", b).persist()

        # ONE write job for every touched bucket (r6 — was a driver-side
        # loop of one write job per bucket, which serializes the batch at
        # |touched buckets| jobs; a 100 TB ingest touching 1000 buckets
        # must not run 1000 jobs). Range-partition on (__b, keys) and
        # partitionBy(__b): each bucket's rows land range-disjoint and
        # key-sorted in its own staging subdirectory — same per-file
        # min/max tightness as before — then each subdirectory is MOVED
        # into its b=<bucket>/v=<version> place (a metadata-only rename
        # per bucket, not a job).
        import uuid as _uuid
        staging = os.path.join(self.path, f".staging-{_uuid.uuid4().hex[:8]}")
        n_parts = max(1, self.files_per_bucket) * max(1, len(touched))
        (merged.repartitionByRange(n_parts, F.col("__b"),
                                   *[F.col(k) for k in self.keys])
         .sortWithinPartitions("__b", *self.keys)
         .write.mode("overwrite").partitionBy("__b").parquet(staging))
        new_buckets = dict(manifest["buckets"])
        for bucket in touched:
            version = int(new_buckets.get(str(bucket), 0)) + 1
            src = os.path.join(staging, f"__b={bucket}")
            dst = os.path.join(self.path, f"b={bucket}", f"v={version}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(src):
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
            else:
                # the batch deleted every row of this bucket: write a
                # schema-only empty version (rare; one tiny job)
                spark.createDataFrame([], merged.drop("__b").schema) \
                    .coalesce(1).write.mode("overwrite").parquet(dst)
            new_buckets[str(bucket)] = version
        shutil.rmtree(staging, ignore_errors=True)
        merged.unpersist()
        changes.unpersist()
        self._commit({"buckets": new_buckets,
                      "last_batch_id": batch_id if batch_id is not None
                      else manifest["last_batch_id"],
                      "n_buckets": self.n_buckets})
        # prune versions beyond retention — only TOUCHED buckets can have
        # gained a version (r6: was a listdir walk over EVERY bucket)
        for bucket in touched:
            version = new_buckets[str(bucket)]
            bdir = os.path.join(self.path, f"b={bucket}")
            for d in os.listdir(bdir):
                if d.startswith("v=") and \
                        int(d[2:]) <= version - self.retain_versions - 1:
                    shutil.rmtree(os.path.join(bdir, d), ignore_errors=True)
        return True

    def stream_sink(self, changes: DataFrame, checkpoint: str | None = None,
                    available_now: bool = True):
        """foreachBatch streaming sink over this snapshot (exactly-once by
        batch id, like streaming/upsert_sink.stream_apply_changes)."""
        writer = (changes.writeStream
                  .foreachBatch(lambda df, bid: self.apply(df, batch_id=bid))
                  .outputMode("append"))
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
