"""libphonenumber public-XML metadata loaders (functions/phone_metadata)
feeding parse_phone(ranges=, patterns=), format_phone and is_short_code —
the ingestion-convenience twin of the MeCab/IPADIC loader.

Reference: core/src/main/scala/com/salesforce/op/stages/impl/feature/
PhoneNumberParser.scala:566 — its validity/formatting knowledge is
libphonenumber's XML data tiers; we parse the user's copy of that public
format instead of shipping it.
"""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.functions.phone_metadata import (
    load_phone_metadata_xml, load_short_number_metadata_xml,
    parse_possible_lengths)
from transmogrifai_spark.functions.text import (format_phone, is_short_code,
                                                parse_phone)

# A hand-written fixture in the PUBLIC PhoneNumberMetadata.xml shape
# (territory/typed-desc/possibleLengths/availableFormats element and
# attribute names per the published resource format). Patterns are
# deliberately narrower than the real plans so the tests can pin both
# accept and reject cases.
_META_XML = """<?xml version="1.0" encoding="UTF-8"?>
<phoneNumberMetadata>
  <territories>
    <territory id="US" countryCode="1" internationalPrefix="011"
               nationalPrefix="1">
      <generalDesc>
        <nationalNumberPattern>[2-9]\\d{9}</nationalNumberPattern>
      </generalDesc>
      <fixedLine>
        <possibleLengths national="10"/>
        <nationalNumberPattern>
          [2-6]\\d{2}[2-9]\\d{6}
        </nationalNumberPattern>
      </fixedLine>
      <tollFree>
        <possibleLengths national="10"/>
        <nationalNumberPattern>800[2-9]\\d{6}</nationalNumberPattern>
      </tollFree>
      <availableFormats>
        <numberFormat pattern="(\\d{3})(\\d{3})(\\d{4})">
          <format>($1) $2-$3</format>
          <intlFormat>$1-$2-$3</intlFormat>
        </numberFormat>
      </availableFormats>
    </territory>
    <territory id="DE" countryCode="49" nationalPrefix="0">
      <mobile>
        <possibleLengths national="10,11"/>
        <nationalNumberPattern>15\\d{8,9}</nationalNumberPattern>
      </mobile>
      <fixedLine>
        <possibleLengths national="[6-8]"/>
        <nationalNumberPattern>30\\d{4,6}</nationalNumberPattern>
      </fixedLine>
      <availableFormats>
        <numberFormat pattern="(15\\d)(\\d{3,4})(\\d{4})">
          <leadingDigits>1</leadingDigits>
          <leadingDigits>15</leadingDigits>
          <format>$1 $2 $3</format>
        </numberFormat>
        <numberFormat pattern="(30)(\\d{4,6})">
          <leadingDigits>30</leadingDigits>
          <format>$1/$2</format>
          <intlFormat>NA</intlFormat>
        </numberFormat>
      </availableFormats>
    </territory>
  </territories>
</phoneNumberMetadata>
"""

_SHORT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<phoneNumberMetadata>
  <territories>
    <territory id="US">
      <shortCode>
        <possibleLengths national="3,5,6"/>
        <nationalNumberPattern>
          [2-9]11|[2-9]\\d{4,5}
        </nationalNumberPattern>
      </shortCode>
    </territory>
    <territory id="FR">
      <generalDesc>
        <nationalNumberPattern>1\\d{1,2}</nationalNumberPattern>
      </generalDesc>
    </territory>
  </territories>
</phoneNumberMetadata>
"""


@pytest.fixture(scope="module")
def meta():
    return load_phone_metadata_xml(_META_XML)


def test_possible_lengths_grammar():
    assert parse_possible_lengths("10") == [(10, 10)]
    assert parse_possible_lengths("7,9,[11-13]") == [(7, 7), (9, 9),
                                                     (11, 13)]
    assert parse_possible_lengths("[6-8]") == [(6, 8)]
    # adjacent singles merge into one window (one ranges-rule each
    # otherwise — the contract is merged contiguous windows)
    assert parse_possible_lengths("10,11") == [(10, 11)]
    with pytest.raises(ValueError):
        parse_possible_lengths("x")
    with pytest.raises(ValueError):
        parse_possible_lengths("[9-7]")


def test_tables_shape(meta):
    # ranges: one rule per typed desc x contiguous window, literal
    # digit prefixes extracted ("800...", "15...", "30..."),
    # class-led fixedLine contributes the length-only rule
    assert ("", 10, 10) in meta["ranges"]["US"]
    assert ("800", 10, 10) in meta["ranges"]["US"]
    assert ("15", 10, 11) in meta["ranges"]["DE"]
    assert ("30", 6, 8) in meta["ranges"]["DE"]
    # patterns: whitespace-wrapped XML regex text is cleaned
    assert "[2-6]\\d{2}[2-9]\\d{6}" in meta["patterns"]["US"]
    assert "800[2-9]\\d{6}" in meta["patterns"]["US"]
    # formats: document order; the LAST leadingDigits governs and is
    # folded in as a start-anchored lookahead
    assert meta["formats"]["US"] == [("(\\d{3})(\\d{3})(\\d{4})",
                                      "($1) $2-$3")]
    assert meta["formats"]["DE"][0] == ("(?=(?:15))(15\\d)(\\d{3,4})(\\d{4})",
                                        "$1 $2 $3")
    assert meta["formats"]["DE"][1] == ("(?=(?:30))(30)(\\d{4,6})", "$1/$2")
    # intl table: explicit intlFormat substitutes, NA drops the rule,
    # absent intlFormat falls back to format
    assert meta["formats_intl"]["US"] == [("(\\d{3})(\\d{3})(\\d{4})",
                                           "$1-$2-$3")]
    assert meta["formats_intl"]["DE"] == [
        ("(?=(?:15))(15\\d)(\\d{3,4})(\\d{4})", "$1 $2 $3")]
    assert meta["regions"]["DE"] == {"cc": "49", "national_prefix": "0"}


def test_loader_errors():
    with pytest.raises(ValueError):
        load_phone_metadata_xml("<phoneNumberMetadata/>")
    with pytest.raises(ValueError):
        load_short_number_metadata_xml("<phoneNumberMetadata/>")


def _validity(spark, numbers, region, meta):
    df = spark.createDataFrame([(n,) for n in numbers], "p string")
    out = df.select(parse_phone(F.col("p"), region,
                                ranges=meta["ranges"],
                                patterns=meta["patterns"])
                    .alias("r")).collect()
    return [r["r"]["valid"] for r in out]


def test_loaded_ranges_and_patterns_validate(spark, meta):
    """End-to-end through parse_phone: the loaded sub-range + full-regex
    tiers reject numbers the base length/lead tier accepts."""
    # 212-555-0188-style: valid US fixedLine (leads 2-6, 4th digit 2-9)
    # 919...: lead 9 passes the BASE US rule but no loaded typed pattern
    # 800-2xx: tollFree ok; 800-1xx: 4th digit 1 fails both typed regexes
    vals = _validity(spark, ["2125550188", "9195550188",
                             "8002345678", "8001234567"], "US", meta)
    assert vals == [True, False, True, False]
    # DE: mobile 15x at 10-11 digits ok; 9 digits fails every length
    # window; fixedLine 30xxxx ok; 40xxxx has a valid length but no
    # matching sub-range prefix or pattern
    vals = _validity(spark, ["015123456789", "015123456",
                             "0301234", "0401234"], "DE", meta)
    assert vals == [True, False, True, False]
    # unlisted region (GB not in the fixture): untouched base behavior
    df = spark.createDataFrame([("02079460000",)], "p string")
    base = df.select(parse_phone(F.col("p"), "GB").alias("r")).collect()
    loaded = df.select(parse_phone(F.col("p"), "GB",
                                   ranges=meta["ranges"],
                                   patterns=meta["patterns"])
                       .alias("r")).collect()
    assert base[0]["r"] == loaded[0]["r"]


def test_loaded_formats_format(spark, meta):
    us = spark.createDataFrame([("2125550188",)], "p string")
    rows = us.select(
        format_phone(parse_phone(F.col("p"), "US"),
                     meta["formats"]).alias("nat")).collect()
    assert rows[0]["nat"] == "(212) 555-0188"

    de = spark.createDataFrame([("015123456789",), ("0301234",)],
                               "p string")
    parsed = parse_phone(F.col("p"), "DE")
    got = de.select(
        format_phone(parsed, meta["formats"]).alias("nat"),
        format_phone(parsed, meta["formats_intl"],
                     style="international").alias("intl")).collect()
    # leadingDigits discriminates the two DE rules
    assert got[0]["nat"] == "151 2345 6789"
    assert got[1]["nat"] == "30/1234"
    assert got[0]["intl"] == "+49 151 2345 6789"
    # the NA-marked rule is absent from the intl table -> NULL
    assert got[1]["intl"] is None


def test_loaded_short_codes(spark):
    codes = load_short_number_metadata_xml(_SHORT_XML)
    assert set(codes) == {"US", "FR"}
    df = spark.createDataFrame([("911",), ("91",), ("55555",)], "p string")
    got = df.select(is_short_code(F.col("p"), "US", codes).alias("s"),
                    is_short_code(F.col("p"), "DE", codes).alias("d")) \
        .collect()
    assert [r["s"] for r in got] == [True, False, True]
    assert [r["d"] for r in got] == [None, None, None]
    fr = df.select(is_short_code(F.lit("112"), "FR", codes).alias("s")) \
        .head()
    assert fr["s"] is True


def test_patterns_only_tier(spark, meta):
    """patterns= works without ranges= (regex fidelity alone)."""
    df = spark.createDataFrame([("8002345678",), ("8001234567",)],
                               "p string")
    got = df.select(parse_phone(F.col("p"), "US",
                                patterns=meta["patterns"])["valid"]
                    .alias("v")).collect()
    assert [r["v"] for r in got] == [True, False]


def test_load_stopword_list(spark, tmp_path):
    """Snowball/Lucene stopword-file format: | comments, blanks, and the
    analyze(stopwords=) override."""
    from transmogrifai_spark.functions.text import (analyze,
                                                    load_stopword_list)
    p = tmp_path / "english_stop.txt"
    p.write_text(
        " | An English stop word list.\n"
        "\n"
        "the | definite article\n"
        "quick\n"
        "   \n"
        "brown | because we can\n")
    sw = load_stopword_list(str(p))
    assert sw == ["the", "quick", "brown"]
    df = spark.createDataFrame([("the quick brown foxes",)], "t string")
    out = df.select(analyze(F.col("t"), "en", stopwords=sw).alias("a")) \
        .first()["a"]
    assert out == ["fox"]  # loaded set removed all three; porter stemmed
    empty = tmp_path / "empty.txt"
    empty.write_text("| only a comment\n")
    with pytest.raises(ValueError, match="no stopwords"):
        load_stopword_list(str(empty))
