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


# ---- perceptual dHash over uncompressed BMP (decode-free image content)

def _make_bmp(w, h, pix, top_down=False):
    """Minimal spec-conformant 24bpp BI_RGB BMP; pix(x, y) -> (b, g, r)
    with y=0 the TOP image row."""
    import struct
    stride = (w * 3 + 3) // 4 * 4
    off = 54
    size = off + stride * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    hdr += struct.pack("<iiiHHIIiiII", 40, w, (-h if top_down else h),
                       1, 24, 0, stride * h, 2835, 2835, 0, 0)
    rows = []
    yr = range(h) if top_down else range(h - 1, -1, -1)
    for y in yr:
        row = b"".join(bytes(pix(x, y)) for x in range(w))
        rows.append(row + b"\x00" * (stride - len(row)))
    return hdr + b"".join(rows)


def _grad(x, y):
    return ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)


def test_bmp_dhash_matches_python_mirror(spark):
    from transmogrifai_spark.llm.multimodal import bmp_dhash, bmp_dhash_py
    blobs = [
        _make_bmp(16, 12, _grad),
        _make_bmp(16, 12, _grad, top_down=True),       # same image
        _make_bmp(17, 12, _grad),                      # stride padding
        _make_bmp(64, 48, lambda x, y: (30, 60, 90)),  # flat -> hash 0
        _make_bmp(9, 8, _grad),                        # minimum grid
        _make_bmp(8, 8, _grad),                        # too narrow -> NULL
        b"BM" + b"\x00" * 40,                          # short -> NULL
        b"\x89PNG" + b"\x00" * 60,                     # not bmp -> NULL
        None,
    ]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)],
                               "i long, content binary")
    got = {r["i"]: r["h"] for r in
           df.select("i", bmp_dhash(F.col("content")).alias("h"))
           .collect()}
    for i, b in enumerate(blobs):
        from transmogrifai_spark.llm.multimodal import bmp_dhash_py
        assert got[i] == bmp_dhash_py(b), f"blob {i}"
    # bottom-up and top-down encodings of the SAME image hash equal
    assert got[0] == got[1] is not None
    # flat image: no neighbor differences -> 0
    assert got[3] == 0


def test_bmp_dhash_perceptual_property(spark):
    """Small noise -> small hamming distance; different image -> large."""
    from transmogrifai_spark.llm.multimodal import bmp_dhash_py

    def noisy(x, y):
        b, g, r = _grad(x, y)
        n = 3 if (x * 31 + y * 17) % 5 == 0 else 0
        return (min(255, b + n), g, r)

    base = bmp_dhash_py(_make_bmp(32, 24, _grad))
    near = bmp_dhash_py(_make_bmp(32, 24, noisy))
    far = bmp_dhash_py(_make_bmp(32, 24,
                                 lambda x, y: ((255 - x * 9) % 256,
                                               (y * y) % 256,
                                               (x ^ y) % 256)))
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(base, near) <= 8
    assert ham(base, far) > 16


# ---- decode-free WAV energy fingerprint

def _make_wav(samples, channels=1, rate=8000):
    import struct
    data = b"".join(struct.pack("<h", max(-32768, min(32767, s)))
                    for s in samples for _ in range(channels))
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                 rate * channels * 2, channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def _burst(n=2048, loud_from=0.25, loud_to=0.5, amp=12000, quiet=300):
    out = []
    for i in range(n):
        a = amp if loud_from <= i / n < loud_to else quiet
        out.append(a if i % 2 == 0 else -a)
    return out


def test_wav_energy_sig_matches_mirror(spark):
    from transmogrifai_spark.llm.multimodal import (wav_energy_sig,
                                                    wav_energy_sig_py)
    blobs = [
        _make_wav(_burst()),
        _make_wav(_burst(), channels=2),           # stereo, 1st channel
        _make_wav(_burst(loud_from=0.6, loud_to=0.9)),
        _make_wav([100] * 2048),                   # flat
        _make_wav([0] * 2048),                     # silence -> NULL
        _make_wav([5] * 64),                       # too short -> NULL
        b"RIFF" + b"\x00" * 60,                    # not WAVE -> NULL
        None,
    ]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)],
                               "i long, content binary")
    got = {r["i"]: r["s"] for r in
           df.select("i", wav_energy_sig(F.col("content")).alias("s"))
           .collect()}
    for i, b in enumerate(blobs):
        assert got[i] == wav_energy_sig_py(b), f"blob {i}"
    assert got[0] is not None and got[4] is None and got[5] is None


def test_wav_energy_sig_volume_invariant_and_discriminative(spark):
    from transmogrifai_spark.llm.multimodal import wav_energy_sig_py
    base = wav_energy_sig_py(_make_wav(_burst(amp=8000, quiet=200)))
    loud = wav_energy_sig_py(_make_wav(
        [s * 2 for s in _burst(amp=8000, quiet=200)]))
    moved = wav_energy_sig_py(_make_wav(
        _burst(loud_from=0.6, loud_to=0.85, amp=8000, quiet=200)))
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    # doubling the volume scales bins and mean together -> same code
    assert ham(base, loud) == 0
    # moving the burst elsewhere flips many thermometer bits
    assert ham(base, moved) > 12
