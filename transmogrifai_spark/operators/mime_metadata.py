"""Loader for Tika-format mimetypes XML into the magic-signature table.

The reference's MimeTypeDetector (core/src/main/scala/com/salesforce/op/
stages/impl/feature/MimeTypeDetector.scala:49) rides Apache Tika, whose
magic-byte knowledge ships as a PUBLIC XML resource (the
tika-mimetypes.xml / freedesktop shared-mime-info family: <mime-type
type=...><magic priority=...><match value=... type=... offset=.../>).
Our engine's detector is a from-scratch 50-signature table
(`operators/categorical._MAGIC`) — this module lets a user feed it the
full public data instead: parse THEIR copy of the XML into the
``detect_mime_type(rules=)`` shape. Same pattern as the MeCab /
phone-XML / GIS / vocab loaders — the algorithm is code, the data is
the user's.

Supported subset (each skip is silent-by-design and countable via the
returned report): ``type="string"`` values with the format's escape
grammar (\\xNN, \\NNN octal, \\n\\r\\t\\\\), big/little 16/32-bit
numeric matches, fixed integer offsets, and nested <match> trees
(a root-to-leaf path = AND; sibling branches = alternative rules —
the tree's documented OR-of-ANDs semantics). Skipped: ranged offsets
("0:64"), masked matches, and non-magic constructs (globs, aliases) —
those need scan loops or filename context the offset-equality compare
doesn't have.
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["load_tika_mimetypes_xml"]

_NS = "{http://www.freedesktop.org/standards/shared-mime-info}"

_ESC = re.compile(r"\\(x[0-9A-Fa-f]{1,2}|[0-7]{1,3}|[nrt\\'\"])")


def _parse_string_value(v: str) -> bytes:
    """The match-value escape grammar for type="string"."""
    out = bytearray()
    i = 0
    while i < len(v):
        m = _ESC.match(v, i)
        if m:
            e = m.group(1)
            if e.startswith(("x", "X")):
                out.append(int(e[1:], 16))
            elif e[0] in "01234567":
                out.append(int(e, 8) & 0xFF)
            else:
                out.append({"n": 10, "r": 13, "t": 9, "\\": 92,
                            "'": 39, '"': 34}[e])
            i = m.end()
        else:
            out.extend(v[i].encode("latin-1", "replace"))
            i += 1
    return bytes(out)


def _parse_value(v: str, vtype: str) -> bytes | None:
    if vtype in ("string", "stringignorecase"):
        # stringignorecase needs per-byte case folding the equality
        # compare can't express -> treat as case-sensitive string
        # (the common magic bytes are case-exact anyway)
        return _parse_string_value(v)
    m = re.fullmatch(r"0[xX]([0-9A-Fa-f]+)|(\d+)", v.strip())
    if not m:
        return None
    n = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    width = {"big16": 2, "big32": 4, "little16": 2, "little32": 4,
             "host16": 2, "host32": 4, "byte": 1}.get(vtype)
    if width is None:
        return None
    # shared-mime-info 'host' types mean native byte order; every
    # platform this engine targets (x86-64, arm64) is little-endian,
    # so host16/host32 encode little — not big (r9 ADVICE fix)
    order = "little" if vtype.startswith(("little", "host")) else "big"
    try:
        return n.to_bytes(width, order)
    except OverflowError:
        return None


def _match_paths(el, skipped: list) -> list[list[tuple[int, bytes]]]:
    """Root-to-leaf AND-paths of a <match> subtree (branches = OR)."""
    off_s = el.get("offset", "0")
    if ":" in off_s:
        skipped.append("ranged-offset")
        return []
    if el.get("mask"):
        skipped.append("mask")
        return []
    try:
        off = int(off_s)
    except ValueError:
        skipped.append("bad-offset")
        return []
    val = _parse_value(el.get("value", ""), el.get("type", "string"))
    if not val:
        skipped.append("unsupported-value")
        return []
    here = (off, val)
    kids = [k for k in el if k.tag.endswith("match")]
    if not kids:
        return [[here]]
    paths = []
    for k in kids:
        for p in _match_paths(k, skipped):
            paths.append([here] + p)
    # the tree ALSO matches when only the parent matches and no child
    # does? No — shared-mime-info semantics: a match node with children
    # succeeds iff the node matches AND any child path matches; a
    # childless node stands alone. (Tika implements the same.)
    return paths if paths else [[here]]


def load_tika_mimetypes_xml(source: str) -> tuple[list, dict]:
    """Parse a tika-mimetypes.xml / shared-mime-info document (path or
    XML string) into (``rules``, ``report``):

    * ``rules`` — the ``detect_mime_type(rules=)`` table: one
      ``(mime, [(offset, bytes), ...])`` AND-rule per root-to-leaf
      match path, ordered by magic priority DESC (Tika's pick rule)
      then document order;
    * ``report`` — ``{"types": N, "rules": N, "skipped": {reason:
      count}}`` so silent subsetting is visible (the no-silent-caps
      rule): ranged offsets, masks, and non-numeric values are counted,
      never dropped invisibly.

    Raises ValueError when no <mime-type> elements are present."""
    s = source.lstrip()
    root = ET.fromstring(source) if s.startswith("<") else \
        ET.parse(source).getroot()
    types = [el for el in root.iter()
             if el.tag in ("mime-type", f"{_NS}mime-type")]
    if not types:
        raise ValueError("no <mime-type> elements found - not a "
                         "tika-mimetypes.xml-format document")
    entries: list[tuple[int, int, str, list]] = []
    skipped: list[str] = []
    order = 0
    for t in types:
        mime = t.get("type")
        if not mime:
            skipped.append("typeless-mime-type")
            continue
        for magic in [el for el in t
                      if el.tag in ("magic", f"{_NS}magic")]:
            prio = int(magic.get("priority", "50"))
            for match in [el for el in magic
                          if el.tag.endswith("match")]:
                for path in _match_paths(match, skipped):
                    entries.append((-prio, order, mime, path))
                    order += 1
    entries.sort(key=lambda e: (e[0], e[1]))
    rules = [(mime, path) for _, _, mime, path in entries]
    rep: dict[str, int] = {}
    for r in skipped:
        rep[r] = rep.get(r, 0) + 1
    return rules, {"types": len(types), "rules": len(rules),
                   "skipped": rep}
