"""PII detection and redaction for training-data curation.

Pattern-based detectors for the PII classes a text-corpus pipeline scrubs
before training (emails, phone numbers, IP addresses, SSNs, credit-card
numbers, IBANs, MAC addresses), as pure Catalyst expressions — one linear
scan, whole-stage codegen, no Python in the hot path, so the cost at 100 TB
is the regex engine only.

Two layers:

* ``detect_pii``  — per-document counts by PII type. Credit cards and IBANs
  are checksum-gated (Luhn / ISO 7064 mod-97, both implemented as
  higher-order-function folds over the digit array) so 16-digit order ids
  don't count as cards.
* ``redact_pii``  — replaces pattern matches with ``[TYPE]`` placeholders.
  Redaction is pattern-based (a regexp_replace cannot consult a checksum);
  over-redacting card-shaped numbers is the safe direction for a corpus
  scrubber.

Reference analogue: TransmogrifAI's text detectors (EmailExtractor /
PhoneNumberParser, core/.../impl/feature/) stop at emails+phones; the PII
surface here is the corpus-curation superset.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "luhn_valid", "iban_valid", "detect_pii",
           "redact_pii", "pii_stats"]

# Order matters for redaction: specific before general (email before phone so
# digits in addresses aren't half-eaten; ipv4 before phone for dotted quads).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
    "ipv6": r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b",
    "mac": r"\b(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}\b",
    "ssn": r"\b(?!000|666|9[0-9]{2})[0-9]{3}-(?!00)[0-9]{2}-(?!0000)[0-9]{4}\b",
    "credit_card": r"\b(?:[0-9][ -]?){12,18}[0-9]\b",
    "iban": r"\b[A-Z]{2}[0-9]{2}(?:[ ]?[0-9A-Z]{4}){2,7}[ ]?[0-9A-Z]{1,4}\b",
    "phone": r"(?:\+[0-9]{1,3}[ .-]?)?(?:\([0-9]{2,4}\)[ .-]?)?"
             r"[0-9]{2,4}(?:[ .-]?[0-9]{2,4}){2,4}",
}


def _digit_array(c: Column) -> Column:
    """Array<int> of the digits of a string (non-digits stripped)."""
    return F.transform(
        F.filter(F.split(c, "(?!$)"), lambda ch: ch.rlike("[0-9]")),
        lambda ch: F.ascii(ch) - 48)


def luhn_valid(c: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over the digits of ``c``: from the right,
    double every second digit, subtract 9 when >9, total % 10 == 0."""
    from ..util import bind_once

    # the reversed digit array is referenced three times (fold input,
    # sequence bound, length gate) — bound once so the split+filter digit
    # extraction does not re-run per reference (HOFs are CodegenFallback)
    def check(rev: Column) -> Column:
        total = F.aggregate(
            F.zip_with(rev, F.sequence(F.lit(0), F.size(rev) - 1),
                       lambda d, i: F.when(i % 2 == 1,
                                           F.when(d * 2 > 9, d * 2 - 9)
                                           .otherwise(d * 2)).otherwise(d)),
            F.lit(0), lambda acc, x: acc + x)
        return (F.size(rev) >= 12) & (total % 10 == 0)

    return bind_once(F.reverse(_digit_array(c)), check)


def iban_valid(c: Column) -> Column:
    """ISO 13616 / ISO 7064 mod-97-10 IBAN check: move the first 4 chars to
    the end, map letters A..Z -> 10..35, running remainder mod 97 == 1.
    The fold keeps the accumulator < 97 so it never overflows."""
    from ..util import bind_once

    # the stripped/uppercased string is referenced four times (two
    # substrings, two length gates) — bound once per candidate
    def check(s: Column) -> Column:
        rearranged = F.concat(F.substring(s, 5, 40), F.substring(s, 1, 4))
        chars = F.split(rearranged, "(?!$)")
        rem = F.aggregate(
            chars, F.lit(0).cast("long"),
            lambda acc, ch: F.when(
                ch.rlike("[0-9]"), (acc * 10 + (F.ascii(ch) - 48)) % 97
            ).otherwise((acc * 100 + (F.ascii(ch) - 55)) % 97))
        return (F.length(s) >= 15) & (F.length(s) <= 34) & (rem == 1)

    return bind_once(F.upper(F.regexp_replace(c, r"\s", "")), check)


def _checked_count(c: Column, pattern: str, check) -> Column:
    cands = F.regexp_extract_all(c, F.lit(f"({pattern})"), 1)
    return F.size(F.filter(cands, check))


def detect_pii(c: Column, types: list[str] | None = None) -> Column:
    """map<string,int> of PII match counts by type (checksum-gated for
    credit_card / iban). NULL text -> empty map. Only non-zero entries
    would still hash-compare stably, but all requested types are emitted
    so downstream thresholds don't need existence checks."""
    wanted = types or list(PII_PATTERNS)
    entries = []
    for t in wanted:
        pat = PII_PATTERNS[t]
        if t == "credit_card":
            n = _checked_count(c, pat, luhn_valid)
        elif t == "iban":
            n = _checked_count(c, pat, iban_valid)
        else:
            n = F.regexp_count(c, F.lit(pat))
        entries += [F.lit(t), F.coalesce(n, F.lit(0))]
    return F.when(c.isNull(), F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<int>"))) \
        .otherwise(F.create_map(*entries))


def redact_pii(c: Column, types: list[str] | None = None) -> Column:
    """Replace every PII pattern match with its ``[TYPE]`` placeholder, in
    PII_PATTERNS order (specific classes first). Pattern-based: card-shaped
    numbers are redacted whether or not they pass Luhn (fail-safe)."""
    out = c
    for t in (types or list(PII_PATTERNS)):
        out = F.regexp_replace(out, PII_PATTERNS[t], f"[{t.upper()}]")
    return out


def pii_stats(df: DataFrame, text_col: str = "text",
              types: list[str] | None = None) -> DataFrame:
    """Corpus-level PII profile: per type, total matches and the number of
    documents with >=1 match — one aggregation pass over the corpus."""
    wanted = types or list(PII_PATTERNS)
    m = detect_pii(F.col(text_col), wanted)
    aggs = []
    for t in wanted:
        n = F.coalesce(F.element_at(m, t), F.lit(0))
        aggs += [F.sum(n).alias(f"{t}_matches"),
                 F.sum((n > 0).cast("int")).alias(f"{t}_docs")]
    return df.agg(*aggs)
