"""Tika-format mimetypes XML loader (operators/mime_metadata.py) feeding
detect_mime_type(rules=) — the magic-signature data as the user's file.

Reference: core/src/main/scala/com/salesforce/op/stages/impl/feature/
MimeTypeDetector.scala:49 — Tika's detector; its magic knowledge is the
public XML this loader parses.
"""
import base64

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.categorical import detect_mime_type
from transmogrifai_spark.operators.mime_metadata import (
    load_tika_mimetypes_xml)

_XML = """<?xml version="1.0" encoding="UTF-8"?>
<mime-info xmlns="http://www.freedesktop.org/standards/shared-mime-info">
  <mime-type type="image/png">
    <magic priority="50">
      <match value="\\x89PNG\\r\\n\\x1a\\n" type="string" offset="0"/>
    </magic>
  </mime-type>
  <mime-type type="application/java-vm">
    <magic priority="40">
      <match value="0xcafebabe" type="big32" offset="0"/>
    </magic>
  </mime-type>
  <mime-type type="image/webp">
    <magic priority="60">
      <match value="RIFF" type="string" offset="0">
        <match value="WEBP" type="string" offset="8"/>
      </match>
    </magic>
  </mime-type>
  <mime-type type="audio/wav">
    <magic priority="55">
      <match value="RIFF" type="string" offset="0">
        <match value="WAVE" type="string" offset="8"/>
      </match>
    </magic>
  </mime-type>
  <mime-type type="text/html">
    <magic priority="30">
      <match value="&lt;html" type="string" offset="0:64"/>
    </magic>
  </mime-type>
  <mime-type type="application/x-elf">
    <magic priority="45">
      <match value="\\177ELF" type="string" offset="0"/>
    </magic>
  </mime-type>
</mime-info>
"""


@pytest.fixture(scope="module")
def loaded():
    return load_tika_mimetypes_xml(_XML)


def test_loader_shapes(loaded):
    rules, report = loaded
    d = dict(rules)
    # escape grammar: \xNN, \r\n, octal \177
    assert d["image/png"] == [(0, b"\x89PNG\r\n\x1a\n")]
    assert d["application/x-elf"] == [(0, b"\x7fELF")]
    # big32 numeric
    assert d["application/java-vm"] == [(0, bytes.fromhex("cafebabe"))]
    # nested match path = AND of (offset, bytes) pairs
    assert d["image/webp"] == [(0, b"RIFF"), (8, b"WEBP")]
    # priority DESC ordering: webp(60) before wav(55) before png(50)
    mimes = [m for m, _ in rules]
    assert mimes.index("image/webp") < mimes.index("audio/wav") \
        < mimes.index("image/png") < mimes.index("application/x-elf")
    # the ranged-offset html match is SKIPPED and REPORTED
    assert "text/html" not in d
    assert report["skipped"] == {"ranged-offset": 1}
    assert report["types"] == 6 and report["rules"] == 5


def test_loader_errors():
    with pytest.raises(ValueError, match="mime-type"):
        load_tika_mimetypes_xml("<mime-info/>")


def test_rules_drive_detect_mime_type(spark, loaded):
    rules, _ = loaded
    payloads = {
        "png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
        "class": bytes.fromhex("cafebabe") + b"\x00" * 16,
        "webp": b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8,
        "wav": b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8,
        "elf": b"\x7fELF" + b"\x00" * 16,
        "junk": b"\x01\x02\x03\x04" + b"\x00" * 16,
    }
    rows = [(k, base64.b64encode(v).decode()) for k, v in payloads.items()]
    df = spark.createDataFrame(rows, "k string, b64 string")
    got = {r["k"]: r["m"] for r in df.select(
        "k", detect_mime_type(F.col("b64"), rules=rules).alias("m"))
        .collect()}
    assert got == {"png": "image/png", "class": "application/java-vm",
                   "webp": "image/webp", "wav": "audio/wav",
                   "elf": "application/x-elf",
                   "junk": "application/octet-stream"}
    # default table untouched when rules omitted
    base = df.select(detect_mime_type(F.col("b64")).alias("m")) \
        .where(F.col("m") == "image/png").count()
    assert base == 1
