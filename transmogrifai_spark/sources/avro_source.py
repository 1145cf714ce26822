"""``pyavro``: a Spark Python Data Source over the pure-Python Avro codec.

Registers the reference's Avro surface (AvroReaders.scala:55 ``AvroReader``,
``aggregateAvro``/``conditionalAvro`` via the generic reader machinery) as a
real Spark V2 datasource when the JVM ``spark-avro`` package is absent:

    register_avro(spark)
    df = spark.read.format("pyavro").load("/data/events.avro")
    df2.write.format("pyavro").option("codec", "deflate").save("/out/dir")

Scale design: ``partitions()`` emits HADOOP-STYLE BYTE-RANGE SPLITS
(``split_mb`` per task, default 32) over every file, so one large container
file fans out across the cluster exactly like the JVM datasource; the driver
touches only file headers. Each task scans to its first sync marker and walks
blocks by computed offsets (avro_py.iter_split_blocks). Decode is Python-side
(the documented trade for a jar-free environment) but block-batched, and rows
flow back through the datasource's Arrow channel — no per-row py4j.

The write path is per-partition: each task writes one ``part-*.avro``
container (deterministic sync markers), the commit message carries the file
name; abort cleans up its own part file. Reading back accepts a directory of
part files.
"""
from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, DataSourceWriter,
                                    InputPartition, WriterCommitMessage)

from . import avro_py

DEFAULT_SPLIT_MB = 32


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(_glob.glob(os.path.join(path, "*.avro")))
        if not out:
            raise FileNotFoundError(f"no .avro files under {path}")
        return out
    if "*" in path:
        out = sorted(_glob.glob(path))
        if not out:
            raise FileNotFoundError(f"no files match {path}")
        return out
    return [path]


@dataclass
class AvroSplit(InputPartition):
    path: str
    start: int
    end: int
    schema_json: str
    codec: str
    sync_hex: str
    first_block: int
    size: int

    def header(self) -> avro_py.AvroHeader:
        import json
        return avro_py.AvroHeader(schema=json.loads(self.schema_json),
                                  codec=self.codec,
                                  sync=bytes.fromhex(self.sync_hex),
                                  first_block=self.first_block,
                                  size=self.size)


class AvroBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.split_bytes = int(
            float(options.get("split_mb", DEFAULT_SPLIT_MB)) * (1 << 20))

    def partitions(self):
        import json
        splits = []
        for path in _list_files(self.path):
            h = avro_py.read_header(path)
            first_sync = h.first_block - avro_py.SYNC_SIZE
            schema_json = json.dumps(h.schema)
            start = first_sync
            while start < h.size:
                end = min(start + self.split_bytes, h.size)
                splits.append(AvroSplit(path, start, end, schema_json,
                                        h.codec, h.sync.hex(), h.first_block,
                                        h.size))
                start = end
        return splits

    def read(self, partition: AvroSplit):
        header = partition.header()
        for block in avro_py.iter_split_blocks(partition.path, header,
                                               partition.start,
                                               partition.end):
            yield from block


class AvroStreamReader(DataSourceStreamReader):
    """File-source streaming over a directory of avro containers — the
    reference's FileStreamingAvroReader (AvroReaders.scala:110) on Structured
    Streaming instead of DStreams.

    Offsets are the set of files already processed (standard append-only
    file-source semantics: files arrive whole, names are never rewritten).
    Each micro-batch fans the NEW files out as the same byte-range splits as
    the batch reader, so a large landed file is decoded across the cluster
    within its first micro-batch. ``max_files_per_trigger`` bounds a batch
    during backfill."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.split_bytes = int(
            float(options.get("split_mb", DEFAULT_SPLIT_MB)) * (1 << 20))
        self.max_files = int(options.get("max_files_per_trigger", 0)) or None

    def _current_files(self):
        try:
            return _list_files(self.path)
        except FileNotFoundError:
            return []

    def initialOffset(self):
        return {"files": []}

    def latestOffset(self):
        seen = getattr(self, "_last_files", [])
        new = [f for f in self._current_files() if f not in set(seen)]
        if self.max_files:
            new = new[:self.max_files]
        self._last_files = seen + new
        return {"files": self._last_files}

    def partitions(self, start, end):
        import json
        new = [f for f in end["files"] if f not in set(start["files"])]
        splits = []
        for path in new:
            h = avro_py.read_header(path)
            schema_json = json.dumps(h.schema)
            s = h.first_block - avro_py.SYNC_SIZE
            while s < h.size:
                e = min(s + self.split_bytes, h.size)
                splits.append(AvroSplit(path, s, e, schema_json, h.codec,
                                        h.sync.hex(), h.first_block, h.size))
                s = e
        # an empty batch still needs one (empty) partition
        return splits or [AvroSplit("", 0, 0, "", "null", "00" * 16, 0, 0)]

    def read(self, partition: AvroSplit):
        if not partition.path:
            return iter(())
        header = partition.header()
        return (row
                for block in avro_py.iter_split_blocks(
                    partition.path, header, partition.start, partition.end)
                for row in block)

    def commit(self, end):
        pass


@dataclass
class AvroCommit(WriterCommitMessage):
    file: str


class AvroDataWriter(DataSourceWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a path")
        self.codec = options.get("codec", "null")
        self.avro_schema = avro_py.spark_to_avro_schema(schema)
        self.schema = schema
        if overwrite and os.path.isdir(self.path):
            for f in _glob.glob(os.path.join(self.path, "part-*.avro")):
                os.remove(f)

    def write(self, iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.avro")
        avro_py.write_container(out, self.avro_schema,
                                (tuple(row) for row in iterator),
                                codec=self.codec)
        return AvroCommit(file=out)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class PyAvroDataSource(DataSource):
    """`spark.read.format("pyavro")` / `df.write.format("pyavro")`.
    Options: ``split_mb`` (read fan-out), ``codec`` (null|deflate, write)."""

    @classmethod
    def name(cls):
        return "pyavro"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro requires a path")
        header = avro_py.read_header(_list_files(path)[0])
        return avro_py.avro_to_spark_schema(header.schema)

    def reader(self, schema):
        return AvroBatchReader(self.options)

    def writer(self, schema, overwrite):
        return AvroDataWriter(self.options, schema, overwrite)

    def streamReader(self, schema):
        return AvroStreamReader(self.options)


def register_avro(spark) -> str:
    """Register the best available Avro datasource and return its format name:
    the JVM ``avro`` datasource if the spark-avro jar is on the classpath,
    else the pure-Python ``pyavro`` fallback."""
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent-probe")
    except Exception as e:  # noqa: BLE001 — classify the failure mode
        msg = str(e)
        if "Failed to find" in msg or "FAILED_FIND_DATA_SOURCE" in msg \
                or "AVRO_NOT_LOADED" in msg or "failed to load" in msg.lower():
            try:
                spark.dataSource.register(PyAvroDataSource)
            except Exception:  # noqa: BLE001 — already registered
                pass
            return "pyavro"
    return "avro"
