"""MurmurHash3 x86_32 — pure-Python, bit-compatible with Spark's
``Murmur3_x86_32`` (the JVM hasher behind ``F.hash`` seed 42, Spark ML
``HashingTF``, and the sketch library's string/binary hashing).

Public algorithm (Austin Appleby, public domain); re-implemented from the
published spec plus Spark's documented tail handling: Spark's
``hashUnsafeBytes`` consumes the 4-byte-aligned prefix as little-endian ints
and then mixes each remaining byte INDIVIDUALLY (sign-extended) through the
full k1/h1 mix — unlike canonical murmur3, which accumulates the tail into a
single k1. Verified against ``F.hash`` and ``count_min_sketch`` point
queries in tests/test_sketches.py.

Used by: serving-side CountMinSketch point queries (operators/sketches.py)
and anywhere a JVM-identical 32-bit hash is needed without a SparkSession.
"""
from __future__ import annotations

import struct

_C1 = 0xcc9e2d51
_C2 = 0x1b873593
_M32 = 0xFFFFFFFF


def _i32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _rotl32(x: int, r: int) -> int:
    x &= _M32
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xe6546b64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85ebca6b) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xc2b2ae35) & _M32
    h1 ^= h1 >> 16
    return h1


def hash_bytes(data: bytes, seed: int) -> int:
    """Spark ``Murmur3_x86_32.hashUnsafeBytes(data, seed)`` — signed int32."""
    h1 = seed & _M32
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        k1 = struct.unpack_from("<i", data, i)[0] & _M32
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:          # JVM bytes are signed; sign-extend before mixing
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _i32(_fmix(h1, len(data)))


def hash_string(s: str, seed: int) -> int:
    """Murmur3_x86_32 over the UTF-8 bytes (Spark hashes strings this way)."""
    return hash_bytes(s.encode("utf-8"), seed)


def hash_long(x: int, seed: int) -> int:
    """Spark ``Murmur3_x86_32.hashLong``: two 32-bit halves, low first."""
    low = x & _M32
    high = (x >> 32) & _M32
    h1 = _mix_h1(seed & _M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _i32(_fmix(h1, 8))
