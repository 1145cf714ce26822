"""Pure-Python Snappy block codec (public format_description.txt spec).

Implemented from the published byte-level format so the Avro ``snappy``
codec no longer needs the absent ``python-snappy`` library:

    stream  = uvarint(uncompressed length) + element*
    element = literal | copy
    literal : tag & 3 == 0; upper 6 bits = len-1, or 60..63 = 1..4 extra
              little-endian length bytes (value = len-1)
    copy1   : tag & 3 == 1; len = 4 + bits[2:5], offset = bits[5:8]<<8 | next
    copy2   : tag & 3 == 2; len = (tag>>2)+1, 2-byte LE offset
    copy4   : tag & 3 == 3; len = (tag>>2)+1, 4-byte LE offset
    copies may overlap (LZ77): decode byte-at-a-time

``decompress`` handles every element type (so any conformant producer's
files read back). ``compress`` is a greedy hash-match encoder in the
shape of the reference implementation's fast path: 4-byte-key hash
table, matches emitted as copy2 (offset <= 65535, length <= 64, longer
runs as back-to-back copies), everything else as literals — conformant
output any snappy decoder accepts, with real compression on repetitive
data. Throughput is python-speed; this codec exists for CORRECTNESS
(reading third-party snappy Avro containers, writing containers other
tools accept) — at 100 TB you would route hot paths through deflate
(zlib is C) or a JVM datasource. Round-trip and known-vector tests in
tests/test_avro.py.
"""
from __future__ import annotations

__all__ = ["compress", "decompress"]

_MAX_COPY_LEN = 64
_MAX_COPY_OFFSET = 65535


def _uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _emit_literal(out: bytearray, data: bytes, s: int, e: int) -> None:
    if s >= e:
        return
    length = e - s
    val = length - 1
    if val < 60:
        out.append(val << 2)
    elif val < (1 << 8):
        out.append(60 << 2)
        out.append(val)
    elif val < (1 << 16):
        out.append(61 << 2)
        out.extend(val.to_bytes(2, "little"))
    elif val < (1 << 24):
        out.append(62 << 2)
        out.extend(val.to_bytes(3, "little"))
    else:
        out.append(63 << 2)
        out.extend(val.to_bytes(4, "little"))
    out.extend(data[s:e])


def _emit_copy2(out: bytearray, offset: int, length: int) -> None:
    out.append(((length - 1) << 2) | 2)
    out.extend(offset.to_bytes(2, "little"))


def compress(data: bytes) -> bytes:
    """Spec-conformant snappy stream for ``data`` (greedy copy2 matcher)."""
    out = bytearray()
    _uvarint(out, len(data))
    n = len(data)
    i = 0
    lit_start = 0
    table: dict[bytes, int] = {}
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= _MAX_COPY_OFFSET:
            _emit_literal(out, data, lit_start, i)
            offset = i - cand
            # extend the 4-byte seed as far as copy2 allows; longer runs
            # continue as additional copies at the same offset
            while True:
                m = 4
                while (i + m < n and m < _MAX_COPY_LEN
                       and data[cand + m] == data[i + m]):
                    m += 1
                _emit_copy2(out, offset, m)
                i += m
                cand += m
                if m < _MAX_COPY_LEN or i + 4 > n \
                        or data[cand:cand + 4] != data[i:i + 4]:
                    break
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode a snappy stream (all four element types, overlap-safe)."""
    n = 0
    shift = 0
    i = 0
    while True:
        if i >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    ln = len(data)
    while i < ln:
        tag = data[i]
        i += 1
        typ = tag & 3
        if typ == 0:
            length = tag >> 2
            if length >= 60:
                nb = length - 59
                if i + nb > ln:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[i:i + nb], "little")
                i += nb
            length += 1
            if i + length > ln:
                raise ValueError("snappy: truncated literal")
            out += data[i:i + length]
            i += length
            continue
        if typ == 1:
            length = 4 + ((tag >> 2) & 0x7)
            if i >= ln:
                raise ValueError("snappy: truncated copy1")
            offset = ((tag >> 5) << 8) | data[i]
            i += 1
        elif typ == 2:
            length = (tag >> 2) + 1
            if i + 2 > ln:
                raise ValueError("snappy: truncated copy2")
            offset = int.from_bytes(data[i:i + 2], "little")
            i += 2
        else:
            length = (tag >> 2) + 1
            if i + 4 > ln:
                raise ValueError("snappy: truncated copy4")
            offset = int.from_bytes(data[i:i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if offset >= length:
            start = len(out) - offset
            out += out[start:start + length]
        else:  # overlapping run: byte-at-a-time, the LZ77 rule
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != n:
        raise ValueError(
            f"snappy: declared length {n} != decoded {len(out)}")
    return bytes(out)
