"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Spark's XxHash64 expression hashes each argument's Spark-SQL binary form and
chains the result as the seed of the next argument; for a single STRING
argument it is XXH64(utf8_bytes, seed). This implementation follows the
public XXH64 specification (Yann Collet, BSD) so the serving registry's
local path can reproduce hashing-trick vectors without a JVM. Verified
bit-for-bit against Spark in tests.
"""
from __future__ import annotations

MASK64 = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 digest as an unsigned 64-bit int (Spark's default seed is 42)."""
    seed &= MASK64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed
        v4 = (seed - PRIME1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def hash_int32(i: int, seed: int) -> int:
    """Spark XxHash64.hashInt — IntegerType values take the 4-byte path."""
    h = (seed + PRIME5 + 4) & MASK64
    h ^= ((i & 0xFFFFFFFF) * PRIME1) & MASK64
    h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """Spark XxHash64.hashLong — LongType values take the 8-byte path."""
    return xxh64((l & MASK64).to_bytes(8, "little"), seed)


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Spark ``xxhash64(a, b, ...)`` as a SIGNED 64-bit int.

    Spark hashes each argument with the running hash as seed (initial 42).
    Pass plain values; Python ints are treated as Spark INT when they fit in
    32 bits (the type a bare ``F.lit(n)`` gets) — pass ``("long", v)`` to
    force the 8-byte LongType path."""
    h = seed & MASK64
    for a in args:
        if isinstance(a, tuple) and len(a) == 2 and a[0] in ("int", "long"):
            kind, v = a
            h = hash_int32(v, h) if kind == "int" else hash_long(v, h)
        elif isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, bool):
            raise TypeError("boolean hashing not implemented")
        elif isinstance(a, int):
            if -(1 << 31) <= a < (1 << 31):
                h = hash_int32(a, h)
            else:
                h = hash_long(a, h)
        elif a is None:
            continue  # Spark skips nulls (hash unchanged)
        else:
            raise TypeError(f"unsupported xxhash64 argument type {type(a)}")
    return h - (1 << 64) if h >= (1 << 63) else h
