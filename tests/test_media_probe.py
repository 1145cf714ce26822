"""Decode-free image metadata probing: real container headers, no image lib."""
import struct
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transmogrifai_spark.llm.multimodal import (
    _jpeg_dims, image_dimensions, probe_media_metadata)


def png_bytes(w, h):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr \
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return sig + chunk + b"\x00" * 16


def gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def bmp_bytes(w, h, topdown=False):
    header = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    info = struct.pack("<IiiHH", 40, w, -h if topdown else h, 1, 24)
    return header + info + b"\x00" * 24


def jpeg_bytes(w, h):
    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3)
    return soi + app0 + sof0 + b"\xff\xd9"


CASES = [
    (1, png_bytes(640, 480), "png", 640, 480),
    (2, gif_bytes(320, 200), "gif", 320, 200),
    (3, bmp_bytes(800, 600), "bmp", 800, 600),
    (4, bmp_bytes(1024, 768, topdown=True), "bmp", 1024, 768),
    (5, jpeg_bytes(1920, 1080), "jpeg", 1920, 1080),
    (6, b"\x00\x01\x02 not an image", None, None, None),
    (7, None, None, None, None),
]


@pytest.fixture(scope="module")
def media(spark):
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True)])
    return spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None)
         for i, b, *_ in CASES], schema)


def test_codegen_probe_png_gif_bmp(spark, media):
    got = {r["media_id"]: r["d"] for r in media.select(
        "media_id", image_dimensions(F.col("content")).alias("d")).collect()}
    for i, _, fmt, w, h in CASES:
        if fmt in ("png", "gif", "bmp"):
            assert (got[i]["format"], got[i]["width"], got[i]["height"]) \
                == (fmt, w, h), i
        elif fmt != "jpeg":
            assert got[i] is None, i


def test_codegen_probe_is_python_free(spark, media):
    out = media.select(image_dimensions(F.col("content")).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_jpeg_marker_walk(spark):
    assert _jpeg_dims(jpeg_bytes(1920, 1080)) == (1920, 1080)
    assert _jpeg_dims(jpeg_bytes(1, 1)) == (1, 1)
    assert _jpeg_dims(png_bytes(5, 5)) is None
    assert _jpeg_dims(b"\xff\xd8\xff\xd9") is None
    assert _jpeg_dims(None) is None


def test_probe_media_metadata_all_formats(spark, media):
    got = {r["media_id"]: r for r in probe_media_metadata(media).collect()}
    for i, _, fmt, w, h in CASES:
        r = got[i]
        assert (r["probed_format"], r["probed_width"], r["probed_height"]) \
            == (fmt, w, h), i


def wav_bytes(channels=2, rate=44100, bits=16, frames=44100):
    import io
    import wave
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    w.writeframes(b"\x00" * (frames * channels * (bits // 8)))
    w.close()
    return buf.getvalue()


def mp4_bytes(duration_s=7, timescale=1000):
    mvhd_body = bytes([0]) + b"\x00\x00\x00" + b"\x00" * 8 \
        + struct.pack(">I", timescale) + struct.pack(">I", duration_s * timescale) \
        + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_wav_codegen_probe(spark):
    from transmogrifai_spark.llm.multimodal import wav_metadata
    schema = T.StructType([
        T.StructField("i", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True)])
    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes(2, 44100, 16, 44100))),
         (2, bytearray(wav_bytes(1, 16000, 8, 8000))),
         (3, bytearray(b"RIFFxxxxNOPE")), (4, None)], schema)
    got = {r["i"]: r["m"] for r in df.select(
        "i", wav_metadata(F.col("content")).alias("m")).collect()}
    assert (got[1]["channels"], got[1]["sample_rate"], got[1]["bits"],
            got[1]["duration_ms"]) == (2, 44100, 16, 1000)
    assert (got[2]["channels"], got[2]["sample_rate"],
            got[2]["duration_ms"]) == (1, 16000, 500)
    assert got[3] is None and got[4] is None
    plan = df.select(wav_metadata(F.col("content")).alias("m")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_probe_audio_metadata(spark):
    from transmogrifai_spark.llm.multimodal import probe_audio_metadata
    schema = T.StructType([
        T.StructField("i", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True)])
    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes(2, 44100, 16, 22050))),
         (2, bytearray(mp4_bytes(7))),
         (3, bytearray(b"junk")), (4, None)], schema)
    got = {r["i"]: r for r in probe_audio_metadata(df).collect()}
    assert (got[1]["probed_channels"], got[1]["probed_sample_rate"],
            got[1]["probed_bits"], got[1]["probed_duration_ms"]) \
        == (2, 44100, 16, 500)
    assert got[2]["probed_duration_ms"] == 7000
    assert got[2]["probed_channels"] is None
    assert got[3]["probed_duration_ms"] is None
    assert got[4]["probed_duration_ms"] is None
