"""Trainable single-byte charset identification — multinomial Naive
Bayes over byte bigrams.

Replaces the rule path's windows-1252 BLANKET fallback
(``operators/categorical.detect_charset`` — a non-UTF-8 high-byte
payload always reports windows-1252) with a TRAINED statistical answer,
narrowing the depth delta against the reference's MimeTypeDetector
(core/src/main/scala/com/salesforce/op/stages/impl/feature/
MimeTypeDetector.scala:49 — Tika's EncodingDetector, whose single-byte
arm is the ICU4J n-gram frequency model shipped as data): same model
family (byte-n-gram frequency profiles per encoding), trained from the
user's own labeled samples in one distributed pass instead of shipping
ICU's frozen tables (the langid_nb "train it, don't ship it" pattern).

Structural detections stay RULES — BOMs, UTF-16/32, UTF-8 validity and
us-ascii are properties of the byte stream, not statistics — the model
only arbitrates among single-byte encodings where the rule path had one
blanket answer (``detect_charset_statistical`` wires both together).

Fit/score ride the shared bag-NB machinery (``operators/ner_nb``):
features are byte BIGRAMS as 4-hex-char strings (≤ 65536 distinct, so
``max_vocab`` genuinely caps the model), scoring is pure expressions,
``portable=True`` gives the 6dp/DECIMAL SQL-replicable form.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ner_nb import bag_nb_label, bag_nb_scores, train_bag_classifier

__all__ = ["byte_bigrams", "train_charset_classifier",
           "charset_nb_scores", "charset_nb_label",
           "detect_charset_statistical"]


def byte_bigrams(raw: Column) -> Column:
    """array<string> of byte-bigram features from a BINARY column: gram i
    is bytes (i, i+1) as 4 uppercase hex chars — byte-aligned by
    construction (substring at odd hex offsets), so no cross-boundary
    phantom grams. <2-byte or NULL input yields an empty bag."""
    hx = F.hex(raw)
    n = (F.length(hx) / 2 - 1).cast("int")
    grams = F.transform(F.sequence(F.lit(1), n),
                        lambda i: F.substr(hx, i * 2 - 1, F.lit(4)))
    return F.when(raw.isNull() | (n < 1),
                  F.array().cast("array<string>")).otherwise(grams)


def train_charset_classifier(df: DataFrame, bin_col: str, label_col: str,
                             max_vocab: int = 4000, add_k: float = 0.5,
                             portable: bool = False) -> dict:
    """Fit the byte-bigram NB over labeled binary samples (label = the
    encoding name). One distributed aggregation pass; all driver
    collects bounded by max_vocab × labels (the shared-trainer
    contract)."""
    return train_bag_classifier(df, byte_bigrams(F.col(bin_col)),
                                label_col, max_vocab=max_vocab,
                                add_k=add_k, portable=portable)


def charset_nb_scores(raw: Column, model: dict) -> Column:
    """map<encoding, double> NB log-posteriors; empty bags -> NULLs."""
    return bag_nb_scores(byte_bigrams(raw), model)


def charset_nb_label(raw: Column, model: dict) -> Column:
    """Best encoding by NB score (ties alphabetical); NULL for <2-byte
    input."""
    return bag_nb_label(byte_bigrams(raw), model)


def detect_charset_statistical(c: Column, model: dict) -> Column:
    """``detect_charset``'s contract with the trained single-byte model
    in place of the windows-1252 blanket: BOMs / UTF-16/32 / us-ascii /
    UTF-8 validity stay structural rules (identical to the rule path);
    only the final else — a non-UTF-8 high-byte payload — asks the NB
    model, falling back to windows-1252 when the payload is too short to
    score. Input is a Base64 Text column (the detect_charset shape)."""
    raw = F.try_to_binary(c, F.lit("base64"))
    hx = F.hex(raw)
    utf8_valid = F.is_valid_utf8(raw.cast("string"))
    ascii_only = F.regexp_like(hx, F.lit("^([0-7][0-9A-F])*$"))
    out = (
        F.when(hx.startswith("EFBBBF"), F.lit("utf-8"))
        .when(hx.startswith("FFFE0000"), F.lit("utf-32le"))
        .when(hx.startswith("0000FEFF"), F.lit("utf-32be"))
        .when(hx.startswith("FFFE"), F.lit("utf-16le"))
        .when(hx.startswith("FEFF"), F.lit("utf-16be"))
        .when(ascii_only, F.lit("us-ascii"))
        .when(utf8_valid, F.lit("utf-8"))
        .otherwise(F.coalesce(charset_nb_label(raw, model),
                              F.lit("windows-1252"))))
    return F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(out)
