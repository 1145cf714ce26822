"""PII detectors: checksum laws, per-type fixtures, redact/detect duality."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.pii import (
    PII_PATTERNS, detect_pii, iban_valid, luhn_valid, pii_stats, redact_pii)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_luhn_known_vectors(spark):
    cases = [
        ("4532015112830366", True),    # Visa test number
        ("4532015112830367", False),   # last digit perturbed
        ("5555 5555 5555 4444", True),  # Mastercard test, spaced
        ("378282246310005", True),     # Amex test
        ("1234567812345678", False),
        ("411111111111", False),       # <12 digits after strip? 12 exact: Luhn of 4111-1111-1111 pads
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r["ok"] for r in
           df.select(luhn_valid(F.col("s")).alias("ok")).collect()]
    # python-side oracle
    def py_luhn(s):
        ds = [int(ch) for ch in s if ch.isdigit()]
        if len(ds) < 12:
            return False
        total = 0
        for i, d in enumerate(reversed(ds)):
            total += d * 2 - 9 if (i % 2 == 1 and d * 2 > 9) else (d * 2 if i % 2 == 1 else d)
        return total % 10 == 0
    assert got == [py_luhn(s) for s, _ in cases]
    for (s, want), g in zip(cases[:5], got[:5]):
        assert g == want, s


def test_iban_known_vectors(spark):
    cases = [
        ("GB82 WEST 1234 5698 7654 32", True),   # ISO 13616 example
        ("DE89 3704 0044 0532 0130 00", True),
        ("FR14 2004 1010 0505 0001 3M02 606", True),
        ("GB82 WEST 1234 5698 7654 33", False),  # bad check
        ("XX00 1234", False),                    # too short
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r["ok"] for r in
           df.select(iban_valid(F.col("s")).alias("ok")).collect()]
    assert got == [w for _, w in cases]


def test_detect_counts_per_type(spark):
    text = ("Mail bob.smith+x@example.co.uk or admin@test.org, "
            "ssh to 192.168.1.254 (not 999.1.2.3), "
            "SSN 123-45-6789 but not 666-12-3456, "
            "card 4532 0151 1283 0366 vs order no 1234 5678 1234 5678, "
            "iban GB82 WEST 1234 5698 7654 32.")
    m = _one(spark, detect_pii(F.lit(text)))
    assert m["email"] == 2
    assert m["ipv4"] == 1
    assert m["ssn"] == 1
    assert m["credit_card"] == 1   # Luhn-gated: the order number doesn't count
    assert m["iban"] == 1


def test_detect_null_and_clean(spark):
    df = spark.createDataFrame([(None,), ("just plain prose here",)],
                               "t string")
    rows = df.select(detect_pii(F.col("t")).alias("m")).collect()
    assert rows[0]["m"] == {}
    assert all(v == 0 for v in rows[1]["m"].values())


def test_redact_then_detect_is_clean(spark):
    """Duality law: after redaction no pattern-based detector fires (checksum
    classes excluded from the count because placeholders kill them anyway)."""
    text = ("a@b.com 10.0.0.1 fe80:0000:0000:0000:0202:b3ff:fe1e:8329 "
            "00:1A:2B:3C:4D:5E 123-45-6789 4532015112830366 "
            "GB82WEST12345698765432 +1 415 555 2671")
    red = _one(spark, redact_pii(F.lit(text)))
    m = _one(spark, detect_pii(F.lit(red)))
    assert all(v == 0 for v in m.values()), (red, m)
    for t in ("EMAIL", "IPV4", "SSN", "PHONE"):
        assert f"[{t}]" in red


def test_redact_selected_types_only(spark):
    red = _one(spark, redact_pii(F.lit("a@b.com and 10.0.0.1"),
                                 types=["email"]))
    assert red == "[EMAIL] and 10.0.0.1"


def test_pii_stats_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = pii_stats(docs, "text", types=["email", "ipv4"]).first()
    # synthetic corpus: counts are deterministic and non-negative
    assert row["email_matches"] >= 0 and row["email_docs"] <= docs.count()


def test_detectors_are_codegen_only(spark):
    df = spark.range(4).select(F.lit("x a@b.com 1.2.3.4").alias("t"))
    out = df.select(detect_pii(F.col("t")).alias("m"),
                    redact_pii(F.col("t")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_luhn_hypothesis_vs_python(spark):
    """Random digit strings: the HOF fold == the textbook python Luhn."""
    from hypothesis import given, settings, strategies as st

    collected = []

    @settings(max_examples=30, deadline=None)
    @given(st.text(alphabet="0123456789 -", min_size=8, max_size=24))
    def gen(s):
        collected.append(s)

    gen()
    def py_luhn(s):
        ds = [int(ch) for ch in s if ch.isdigit()]
        if len(ds) < 12:
            return False
        tot = 0
        for i, d in enumerate(reversed(ds)):
            v = d * 2 if i % 2 == 1 else d
            tot += v - 9 if v > 9 else v
        return tot % 10 == 0
    df = spark.createDataFrame([(s,) for s in collected], "s string")
    got = [r["ok"] for r in
           df.select(luhn_valid(F.col("s")).alias("ok")).collect()]
    assert got == [py_luhn(s) for s in collected]
