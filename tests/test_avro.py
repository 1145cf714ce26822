"""Avro surface: pure-Python container codec + the ``pyavro`` datasource.

Reference: readers/src/main/scala/com/salesforce/op/readers/AvroReaders.scala:55
(AvroReader) — the reference's default record format. The environment has no
spark-avro jar, so these tests exercise the from-scratch fallback: container
read/write per the public Avro 1.x spec, Hadoop-style byte-range splits, and
the Spark V2 Python datasource wiring (read + write + DataReader fmt='avro').
"""
import datetime
import decimal
import os

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources import avro_py
from transmogrifai_spark.sources.avro_source import register_avro
from transmogrifai_spark.sources.readers import DataReader

SCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": ["null", "string"]},
    {"name": "score", "type": "double"},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "props", "type": {"type": "map", "values": "long"}},
    {"name": "kind", "type": {"type": "enum", "name": "k",
                              "symbols": ["A", "B", "C"]}},
    {"name": "ts", "type": {"type": "long",
                            "logicalType": "timestamp-micros"}},
    {"name": "d", "type": {"type": "int", "logicalType": "date"}},
    {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                             "precision": 12, "scale": 2}},
    {"name": "nested", "type": {"type": "record", "name": "n", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": ["null", "double"]}]}},
]}

UTC = datetime.timezone.utc


def _rows(n):
    t0 = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    d0 = datetime.date(2024, 1, 1)
    return [(i, None if i % 7 == 0 else f"name{i}", i * 0.5,
             [f"t{i % 3}"], {"a": i}, "ABC"[i % 3],
             t0 + datetime.timedelta(seconds=i, microseconds=i % 1000),
             d0 + datetime.timedelta(days=i % 300),
             decimal.Decimal(i) - decimal.Decimal("3.25"),
             (i, None if i % 5 == 0 else float(i)))
            for i in range(n)]


@pytest.fixture(scope="module", params=["null", "deflate", "snappy"])
def container(request, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("avro") / f"t_{request.param}.avro")
    rows = _rows(5000)
    avro_py.write_container(path, SCHEMA, rows, codec=request.param,
                            block_rows=250)
    return path, rows


def test_roundtrip_all_types(container):
    path, rows = container
    h = avro_py.read_header(path)
    got = [r for blk in avro_py.iter_split_blocks(path, h, 0, h.size)
           for r in blk]
    assert len(got) == len(rows)
    assert got[3][0] == 3 and got[3][1] == "name3"
    assert got[3][6] == datetime.datetime(2024, 1, 1, 0, 0, 3, 3, tzinfo=UTC)
    assert got[3][8] == decimal.Decimal("-0.25")
    assert got[3][9] == (3, 3.0)
    assert got[0][1] is None and got[0][9] == (0, None)


def test_splits_partition_blocks_exactly_once(container):
    """Contiguous byte ranges own every block exactly once (Hadoop sync
    ownership), at split sizes far smaller and larger than a block."""
    path, rows = container
    h = avro_py.read_header(path)
    whole = [r for blk in avro_py.iter_split_blocks(path, h, 0, h.size)
             for r in blk]
    for step in (512, 7777, 10 << 20):
        parts, s = [], h.first_block - avro_py.SYNC_SIZE
        while s < h.size:
            e = min(s + step, h.size)
            parts.extend(r for blk in avro_py.iter_split_blocks(path, h, s, e)
                         for r in blk)
            s = e
        assert parts == whole, step


def test_deterministic_writes(tmp_path):
    a, b = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    rows = _rows(100)
    avro_py.write_container(a, SCHEMA, rows, codec="deflate")
    avro_py.write_container(b, SCHEMA, rows, codec="deflate")
    with open(a, "rb") as fa, open(b, "rb") as fb:
        # sync marker derives from (schema, path): same bytes modulo the path
        assert fa.read()[16:] != b"" and os.path.getsize(a) == os.path.getsize(b)


def test_unsupported_codec_gated(tmp_path):
    # snappy is implemented from scratch since r7; zstandard stays gated
    # (format not reasonably reimplementable, lib absent)
    with pytest.raises(NotImplementedError, match="codec"):
        avro_py.write_container(str(tmp_path / "x.avro"), SCHEMA, [],
                                codec="zstandard")


def test_snappy_codec_roundtrip_and_vectors():
    """Pure-python snappy (sources/snappy_py.py): identity round-trips on
    adversarial inputs (empty, single byte, incompressible, long runs,
    overlap-forcing periods, 70KB literals), known-vector decode for every
    element type, and corrupt-stream rejection."""
    import os as _os
    import random

    from transmogrifai_spark.sources import snappy_py as sn

    rng = random.Random(7)
    cases = [b"", b"x", b"ab" * 5, b"a" * 100000,
             bytes(rng.randrange(256) for _ in range(70000)),
             (b"0123456789" * 7000),
             b"abcabcabcabc" + bytes(rng.randrange(256) for _ in range(50)),
             _os.urandom(0) + b"\x80\x00" * 33000]
    for c in cases:
        enc = sn.compress(c)
        assert sn.decompress(enc) == c
    # compression actually happens on repetitive data
    rep = b"the quick brown fox " * 4096
    assert len(sn.compress(rep)) < len(rep) // 4
    # known vectors: literal, copy1, copy2, copy4 (hand-assembled streams)
    lit = bytes([5]) + bytes([4 << 2]) + b"hello"
    assert sn.decompress(lit) == b"hello"
    # "abcd" literal then copy1 len4 offset4 -> "abcdabcd"
    c1 = bytes([8]) + bytes([3 << 2]) + b"abcd" + bytes([0b001]) + bytes([4])
    assert sn.decompress(c1) == b"abcdabcd"
    # overlap: "ab" then copy2 len6 offset2 -> "abababab"
    c2 = (bytes([8]) + bytes([1 << 2]) + b"ab"
          + bytes([((6 - 1) << 2) | 2]) + (2).to_bytes(2, "little"))
    assert sn.decompress(c2) == b"abababab"
    c4 = (bytes([8]) + bytes([3 << 2]) + b"wxyz"
          + bytes([((4 - 1) << 2) | 3]) + (4).to_bytes(4, "little"))
    assert sn.decompress(c4) == b"wxyzwxyz"
    for bad in (bytes([4]) + bytes([0b001]) + bytes([9]),   # offset > out
                bytes([9]) + bytes([4 << 2]) + b"hello"):    # wrong length
        with pytest.raises(ValueError):
            sn.decompress(bad)
    # avro framing: CRC of the UNCOMPRESSED data is verified
    import zlib
    framed = sn.compress(b"payload") + (zlib.crc32(b"payload")).to_bytes(4, "big")
    assert avro_py._decompress("snappy", framed) == b"payload"
    broken = framed[:-1] + bytes([framed[-1] ^ 1])
    with pytest.raises(ValueError, match="CRC"):
        avro_py._decompress("snappy", broken)


def test_schema_translation_both_ways():
    st = avro_py.avro_to_spark_schema(SCHEMA)
    assert st.simpleString() == (
        "struct<id:bigint,name:string,score:double,tags:array<string>,"
        "props:map<string,bigint>,kind:string,ts:timestamp,d:date,"
        "amt:decimal(12,2),nested:struct<a:int,b:double>>")
    back = avro_py.spark_to_avro_schema(st)
    assert avro_py.avro_to_spark_schema(back).simpleString() == \
        st.simpleString()
    with pytest.raises(NotImplementedError, match="union"):
        avro_py.avro_to_spark_type(["int", "string"])


def test_datasource_read_splits(spark, container):
    path, rows = container
    fmt = register_avro(spark)
    df = spark.read.format(fmt).option("split_mb", "0.01").load(path)
    if fmt == "pyavro":  # fallback in this environment: fan-out is ours
        assert df.rdd.getNumPartitions() > 1
    assert df.count() == len(rows)
    got = df.filter(F.col("id") == 3).collect()[0]
    assert got["name"] == "name3" and got["nested"]["a"] == 3
    agg = df.agg(F.sum("id").alias("s"), F.countDistinct("kind").alias("k")
                 ).collect()[0]
    assert agg["s"] == sum(r[0] for r in rows) and agg["k"] == 3


def test_datasource_write_read_roundtrip(spark, tmp_path):
    fmt = register_avro(spark)
    src = (spark.range(0, 300).repartition(3)
           .selectExpr("id", "cast(id as string) as s",
                       "array(id, id+1) as arr",
                       "named_struct('x', id) as st",
                       "timestamp_micros(id * 1000000) as ts",
                       "cast(id as decimal(10,2)) / 4 as dec"))
    out = str(tmp_path / "out")
    src.write.format(fmt).mode("overwrite").option("codec", "deflate").save(out)
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 3
    back = spark.read.format(fmt).load(out)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, src.collect()))


def test_streaming_avro_source(spark, tmp_path):
    """FileStreamingAvroReader (AvroReaders.scala:110) on Structured
    Streaming: new container files land as new micro-batches, each fanned out
    as byte-range splits."""
    fmt = register_avro(spark)
    d = str(tmp_path / "stream")
    os.makedirs(d)
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "v", "type": "double"}]}
    avro_py.write_container(os.path.join(d, "f1.avro"), schema,
                            [(i, i * 0.5) for i in range(100)])
    stream = (spark.readStream.format(fmt)
              .schema(avro_py.avro_to_spark_schema(schema)).load(d))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("avro_stream_sink")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        q.processAllAvailable()
        assert spark.table("avro_stream_sink").count() == 100
        avro_py.write_container(os.path.join(d, "f2.avro"), schema,
                                [(i, i * 0.5) for i in range(100, 150)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("avro_stream_sink")
    assert got.count() == 150
    assert got.agg(F.sum("id").alias("s")).collect()[0]["s"] == \
        sum(range(150))


def test_data_reader_avro_fmt(spark, container):
    """DataReader(fmt='avro') resolves to the working datasource and supports
    the generate/extract path (AvroReaders.scala:55 semantics)."""
    path, rows = container
    reader = DataReader(path=path, fmt="avro", key_col="id")
    df = reader.generate(spark, {"nm": "upper(coalesce(name, ''))",
                                 "half": "score / 2"})
    assert df.columns == ["key", "nm", "half"]
    got = {r["key"]: (r["nm"], r["half"]) for r in df.limit(2000).collect()}
    assert got["3"] == ("NAME3", 0.75)
    assert got["7"] == ("", 1.75)
