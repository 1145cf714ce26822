"""Trainable single-byte charset NB (operators/charset_nb.py).

Reference: core/.../impl/feature/MimeTypeDetector.scala:49 — Tika
EncodingDetector's single-byte arm is ICU4J's byte-n-gram frequency
model (shipped data); here the same model family is TRAINED from
labeled samples, replacing detect_charset's windows-1252 blanket.
"""
import base64

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

from transmogrifai_spark.operators.categorical import detect_charset
from transmogrifai_spark.operators.charset_nb import (
    byte_bigrams, charset_nb_label, detect_charset_statistical,
    train_charset_classifier)

# real encoded bytes from real codecs: German/French text for latin-1 /
# windows-1252, Russian for iso-8859-5 and koi8-r — the SAME unicode
# Russian text encodes to DIFFERENT byte distributions under the two
# Cyrillic codecs, which is exactly the distinction the blanket answer
# cannot make and the NB must learn.
_DE = ("über die größe der schönen grünen wälder ärgern sich müde väter "
       "während die königin im frühling südfrüchte genießt")
_RU = ("широкая электрификация южных губерний даст мощный толчок подъёму "
       "сельского хозяйства страны пока жюри журит режиссёра")


def _rot(words, k, take=10):
    w = words.split()
    return " ".join(w[(k * 3 + j) % len(w)] for j in range(take))


def _corpus(spark, n_per=60):
    rows, i = [], 0
    for enc, text in (("windows-1252", _DE), ("iso-8859-5", _RU),
                      ("koi8-r", _RU)):
        for k in range(n_per):
            rows.append((i, bytearray(_rot(text, k).encode(enc)), enc))
            i += 1
    schema = StructType([StructField("sid", LongType()),
                         StructField("payload", BinaryType()),
                         StructField("enc", StringType())])
    return spark.createDataFrame(rows, schema)


def test_heldout_accuracy_beats_blanket(spark):
    """>= 95% held-out accuracy across three single-byte encodings —
    including iso-8859-5 vs koi8-r over the SAME Russian text (pure byte
    -distribution separation); the rule path answers windows-1252 for
    all of them."""
    corpus = _corpus(spark)
    train = corpus.where(F.col("sid") % 5 != 0)
    test = corpus.where(F.col("sid") % 5 == 0)
    m = train_charset_classifier(train, "payload", "enc", max_vocab=3000)
    assert m["labels"] == ["iso-8859-5", "koi8-r", "windows-1252"]
    out = test.select("enc", charset_nb_label(F.col("payload"), m)
                      .alias("pred")).collect()
    acc = sum(r["enc"] == r["pred"] for r in out) / len(out)
    assert acc >= 0.95, acc


def test_statistical_detector_keeps_structural_rules(spark):
    """detect_charset_statistical: BOM/ascii/utf-8 answers are identical
    to the rule path; ONLY the high-byte else branch changes — and there
    it answers the trained encoding instead of the blanket."""
    corpus = _corpus(spark)
    m = train_charset_classifier(corpus, "payload", "enc", max_vocab=3000)
    cases = [
        ("ascii", b"plain ascii text"),
        ("bom8", b"\xef\xbb\xbfhello"),
        ("bom16", b"\xff\xfeh\x00i\x00"),
        ("utf8", "grüße".encode("utf-8")),
        ("koi8", _RU.split(" ", 1)[0].encode("koi8-r") * 3),
        ("cyr", _RU.split(" ", 1)[0].encode("iso-8859-5") * 3),
        ("de", _DE.split(" ", 1)[0].encode("windows-1252") * 3),
    ]
    df = spark.createDataFrame(
        [(k, base64.b64encode(b).decode()) for k, b in cases],
        "k string, b64 string")
    out = {r["k"]: (r["rule"], r["nb"]) for r in df.select(
        "k", detect_charset(F.col("b64")).alias("rule"),
        detect_charset_statistical(F.col("b64"), m).alias("nb")).collect()}
    # structural rules unchanged
    for k in ("ascii", "bom8", "bom16", "utf8"):
        assert out[k][0] == out[k][1], (k, out[k])
    assert out["ascii"][1] == "us-ascii"
    assert out["bom16"][1] == "utf-16le"
    # the blanket vs the trained answer
    assert out["koi8"][0] == "windows-1252" and out["koi8"][1] == "koi8-r"
    assert out["cyr"][0] == "windows-1252" and out["cyr"][1] == "iso-8859-5"
    assert out["de"][1] == "windows-1252"


def test_bigram_shape_bounded_fit_and_determinism(spark, monkeypatch):
    corpus = _corpus(spark, n_per=20)
    # byte alignment: 3 bytes -> exactly 2 grams, 4 hex chars each
    row = spark.createDataFrame([(bytearray(b"\x01\x02\x03"),)],
                                "b binary").select(
        byte_bigrams(F.col("b")).alias("g")).first()
    assert list(row["g"]) == ["0102", "0203"]
    # empty / 1-byte -> empty bag
    short = spark.createDataFrame([(bytearray(b"\x01"),), (None,)],
                                  "b binary").select(
        F.size(byte_bigrams(F.col("b"))).alias("n")).collect()
    assert [r["n"] for r in short] == [0, 0]
    # bounded collects (the shared-trainer contract)
    _DF = type(corpus)
    sizes = []
    real_collect = _DF.collect

    def spy(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_DF, "collect", spy)
    m1 = train_charset_classifier(corpus, "payload", "enc", max_vocab=50,
                                  portable=True)
    assert sizes and all(s <= 50 * 3 for s in sizes), sizes
    monkeypatch.undo()
    m2 = train_charset_classifier(corpus, "payload", "enc", max_vocab=50,
                                  portable=True)
    assert m1 == m2 and len(m1["log_prob"]) == 50
