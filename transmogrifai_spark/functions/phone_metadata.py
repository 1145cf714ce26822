"""Loaders for libphonenumber's PUBLIC XML metadata formats.

The reference's phone intelligence (core/.../impl/feature/
PhoneNumberParser.scala:566) rides libphonenumber, which ships its
number-plan knowledge as three XML data tiers: per-region number-type
patterns + possible lengths (PhoneNumberMetadata.xml territories),
numberFormat formatting rules (availableFormats), and short-code tables
(ShortNumberMetadata.xml). Our engine re-expressed the ALGORITHM tiers
in rounds 5-9 (`functions/text.parse_phone/format_phone/is_short_code`)
under the "supply the data, don't ship it" pattern — the caller passes
plain-Python rule tables. What was still missing (VERDICT r8 "What's
missing" #1) was ingestion convenience: the data exists in a documented
public XML shape, and a user should not have to write a parser to wire
it. This module is that parser — the phone twin of
`operators/segmentation.load_mecab_dict` (the MeCab/IPADIC loader):

* ``load_phone_metadata_xml`` -> ``{"ranges", "patterns", "formats",
  "formats_intl", "regions"}`` feeding ``parse_phone(ranges=,
  patterns=)`` and ``format_phone(formats=)``;
* ``load_short_number_metadata_xml`` -> the ``is_short_code(codes=)``
  table.

Only the stdlib XML parser is used; no libphonenumber artifact is
bundled or fetched. The format knowledge (element/attribute names,
possibleLengths syntax, leadingDigits lookingAt semantics, $-group
format strings) is from the library's published resource documentation.
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["load_phone_metadata_xml", "load_short_number_metadata_xml",
           "parse_possible_lengths"]

# the typed number descs libphonenumber validates against (isValidNumber
# = the national number matches SOME type's pattern); generalDesc is the
# fallback when a territory lists no typed descs
_TYPE_DESCS = ["fixedLine", "mobile", "tollFree", "premiumRate",
               "sharedCost", "personalNumber", "voip", "pager", "uan",
               "voicemail"]

_WS = re.compile(r"\s+")


def _clean_pattern(text: str | None) -> str | None:
    """The XML wraps regexes over multiple indented lines; the published
    convention is that ALL whitespace inside a pattern is ignorable."""
    if text is None:
        return None
    p = _WS.sub("", text)
    return p or None


def parse_possible_lengths(spec: str) -> list[tuple[int, int]]:
    """Parse a ``possibleLengths national="..."`` attribute — a comma
    list of single lengths and ``[lo-hi]`` inclusive ranges (e.g.
    ``"7,9,[11-13]"``) — into merged, sorted (lo, hi) windows."""
    lens: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"\[(\d+)-(\d+)\]", part)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            if hi < lo:
                raise ValueError(f"bad possibleLengths range {part!r}")
            lens.update(range(lo, hi + 1))
        elif part.isdigit():
            lens.add(int(part))
        else:
            raise ValueError(f"bad possibleLengths token {part!r}")
    if not lens:
        return []
    # merge into contiguous windows: one ranges-rule per window
    out: list[tuple[int, int]] = []
    run_lo = run_hi = None
    for n in sorted(lens):
        if run_lo is None:
            run_lo = run_hi = n
        elif n == run_hi + 1:
            run_hi = n
        else:
            out.append((run_lo, run_hi))
            run_lo = run_hi = n
    out.append((run_lo, run_hi))
    return out


_LEAD_DIGITS = re.compile(r"^(\d+)")


def _literal_prefix(pattern: str) -> str:
    """Leading LITERAL digits of a national-number pattern ("800\\d{7}"
    -> "800"); class-led patterns get the empty prefix (the rule then
    constrains length only — a documented conservative approximation,
    the full-regex fidelity lives in the ``patterns`` table)."""
    m = _LEAD_DIGITS.match(pattern)
    return m.group(1) if m else ""


def load_phone_metadata_xml(source: str) -> dict:
    """Parse a PhoneNumberMetadata.xml-format document (a path or an XML
    string) into the rule tables ``functions/text`` consumes:

    * ``ranges``:   {region: [(prefix, min_len, max_len), ...]} for
      ``parse_phone(ranges=)`` — one rule per typed desc x contiguous
      possibleLengths window, prefix = the pattern's leading literal
      digits (class-led patterns contribute length-only rules);
    * ``patterns``: {region: [full nationalNumberPattern regex, ...]}
      for ``parse_phone(patterns=)`` — the exact isValidNumber tier
      (typed descs when present, generalDesc otherwise);
    * ``formats`` / ``formats_intl``: {region: [(pattern, repl), ...]}
      for ``format_phone`` — numberFormat rules in document order, each
      leadingDigits constraint folded in as a leading ``(?=...)``
      lookahead (libphonenumber checks leadingDigits with lookingAt —
      a match anchored at the start — before requiring the full pattern
      match; with multiple progressive leadingDigits elements the LAST
      governs full-number formatting). ``formats_intl`` substitutes
      ``intlFormat`` replacements, skipping rules marked ``NA``;
    * ``regions``:  {region: {"cc", "national_prefix"}} for reference.

    Raises ValueError on documents without any <territory> (wrong file /
    wrong format — a clean error instead of empty tables)."""
    root = _parse_xml(source)
    territories = root.findall(".//territory")
    if not territories:
        raise ValueError(
            "no <territory> elements found - not a PhoneNumberMetadata"
            ".xml-format document")
    ranges: dict[str, list[tuple[str, int, int]]] = {}
    patterns: dict[str, list[str]] = {}
    formats: dict[str, list[tuple[str, str]]] = {}
    formats_intl: dict[str, list[tuple[str, str]]] = {}
    regions: dict[str, dict] = {}
    for terr in territories:
        rid = terr.get("id")
        if not rid:
            raise ValueError("territory element without an id attribute")
        regions[rid] = {"cc": terr.get("countryCode"),
                        "national_prefix": terr.get("nationalPrefix")}
        descs = [(d, terr.find(d)) for d in _TYPE_DESCS
                 if terr.find(d) is not None]
        if not descs:
            g = terr.find("generalDesc")
            if g is not None:
                descs = [("generalDesc", g)]
        r_rules: list[tuple[str, int, int]] = []
        p_rules: list[str] = []
        for _name, el in descs:
            pat = _clean_pattern(
                el.findtext("nationalNumberPattern"))
            if pat:
                p_rules.append(pat)
            pl = el.find("possibleLengths")
            if pl is not None and pl.get("national"):
                prefix = _literal_prefix(pat) if pat else ""
                for lo, hi in parse_possible_lengths(pl.get("national")):
                    rule = (prefix, lo, hi)
                    if rule not in r_rules:
                        r_rules.append(rule)
        if r_rules:
            ranges[rid] = r_rules
        if p_rules:
            patterns[rid] = p_rules
        af = terr.find("availableFormats")
        if af is not None:
            nat_rules: list[tuple[str, str]] = []
            intl_rules: list[tuple[str, str]] = []
            for nf in af.findall("numberFormat"):
                pat = _clean_pattern(nf.get("pattern"))
                fmt = nf.findtext("format")
                if not pat or fmt is None:
                    raise ValueError(
                        f"numberFormat in {rid} missing pattern/format")
                lds = nf.findall("leadingDigits")
                if lds:
                    ld = _clean_pattern(lds[-1].text)
                    eff = f"(?=(?:{ld})){pat}" if ld else pat
                else:
                    eff = pat
                nat_rules.append((eff, fmt.strip()))
                intl = nf.findtext("intlFormat")
                if intl is not None:
                    intl = intl.strip()
                    if intl != "NA":
                        intl_rules.append((eff, intl))
                else:
                    intl_rules.append((eff, fmt.strip()))
            if nat_rules:
                formats[rid] = nat_rules
            if intl_rules:
                formats_intl[rid] = intl_rules
    return {"ranges": ranges, "patterns": patterns, "formats": formats,
            "formats_intl": formats_intl, "regions": regions}


def load_short_number_metadata_xml(source: str) -> dict:
    """Parse a ShortNumberMetadata.xml-format document (path or XML
    string) into the ``is_short_code(codes=)`` table: {region:
    [shortCode nationalNumberPattern, ...]} (falling back to generalDesc
    when a territory has no <shortCode> element)."""
    root = _parse_xml(source)
    territories = root.findall(".//territory")
    if not territories:
        raise ValueError(
            "no <territory> elements found - not a ShortNumberMetadata"
            ".xml-format document")
    codes: dict[str, list[str]] = {}
    for terr in territories:
        rid = terr.get("id")
        if not rid:
            raise ValueError("territory element without an id attribute")
        el = terr.find("shortCode")
        if el is None:
            el = terr.find("generalDesc")
        if el is None:
            continue
        pat = _clean_pattern(el.findtext("nationalNumberPattern"))
        if pat:
            codes.setdefault(rid, []).append(pat)
    return codes


def _parse_xml(source: str):
    s = source.lstrip()
    if s.startswith("<"):
        return ET.fromstring(source)
    tree = ET.parse(source)
    return tree.getroot()
