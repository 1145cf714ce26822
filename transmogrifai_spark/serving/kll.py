"""JVM-free KLL quantile-sketch reader — decode the Apache DataSketches
KLL binary (as produced by Spark's ``kll_sketch_agg_double`` /
``_bigint``) and answer quantile/rank queries in pure Python.

Completes the serving contract for persisted sketch tables: HLL estimates
finalize in SQL, CountMin decodes via serving (sketches.CountMinSketch),
and with this module a percentile dashboard can read persisted KLL
partial columns without a SparkSession.

Wire format (little-endian; reverse-engineered from serialized sketches
and verified against the JVM's get_quantile in tests/test_sketches.py):

  byte 0   preamble ints (5 = general, 2 = empty/single-item)
  byte 1   serial version
  byte 2   family (15 = KLL)
  byte 3   flags (bit0 empty, bit1 level-zero-sorted, bit2 single item)
  4-5      k (u16)         6  m (u8)        7  unused
  -- general format only --
  8-15     n (u64)         16-17 min_k (u16)  18 num_levels (u8)  19 pad
  20..     levels[num_levels] (u32, in-memory offsets; the serialized
           items start at levels[0], and level i spans
           [levels[i], levels[i+1]) with levels[num_levels] implied
           = levels[0] + retained)
  then     min item, max item, retained items (level 0 first), each 8B
  -- single-item format --
  8..      the one item

Level i items carry weight 2^i. Quantile queries sort the weighted items
once and walk cumulative weights with INCLUSIVE rank semantics (the
DataSketches default since 3.x, which Spark's functions use).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

_FAMILY_KLL = 15


@dataclass
class KllSketch:
    k: int
    n: int
    min_item: float | int | None
    max_item: float | int | None
    weighted: list[tuple[float | int, int]]   # (item, weight), sorted

    @classmethod
    def from_bytes(cls, b: bytes, item_type: str = "double") -> "KllSketch":
        fmt, width = ("<d", 8) if item_type == "double" else ("<q", 8)
        if item_type not in ("double", "bigint"):
            raise ValueError(f"item_type must be double|bigint: {item_type}")
        pre, _ser, fam, flags = b[0], b[1], b[2], b[3]
        if fam != _FAMILY_KLL:
            raise ValueError(f"not a KLL sketch (family {fam})")
        k, = struct.unpack_from("<H", b, 4)
        if flags & 1:                                    # empty
            return cls(k, 0, None, None, [])
        if flags & 4:                                    # single item
            item, = struct.unpack_from(fmt, b, 8)
            return cls(k, 1, item, item, [(item, 1)])
        n, = struct.unpack_from("<Q", b, 8)
        num_levels = b[18]
        off = 20
        levels = list(struct.unpack_from(f"<{num_levels}I", b, off))
        off += 4 * num_levels
        mn, = struct.unpack_from(fmt, b, off)
        mx, = struct.unpack_from(fmt, b, off + width)
        off += 2 * width
        retained = (len(b) - off) // width
        items = struct.unpack_from(f"<{retained}{fmt[1]}", b, off)
        bounds = levels + [levels[0] + retained]
        weighted: list[tuple[float | int, int]] = []
        for lvl in range(num_levels):
            w = 1 << lvl
            for i in range(bounds[lvl] - levels[0],
                           bounds[lvl + 1] - levels[0]):
                weighted.append((items[i], w))
        weighted.sort(key=lambda t: t[0])
        total = sum(w for _, w in weighted)
        if total != n:
            raise ValueError(f"decode mismatch: weights {total} != n {n}")
        return cls(k, n, mn, mx, weighted)

    def quantile(self, rank: float):
        """Item at normalized rank in [0, 1]. Matches the JVM library
        (verified value-for-value on shared sketch bytes in tests):
        rank 0/1 return the exact min/max items; interior ranks use
        INCLUSIVE search — the first item whose cumulative weight
        reaches rank*n. (KLL construction is randomized: always compare
        against the SAME serialized sketch, never a re-aggregation.)"""
        if not 0.0 <= rank <= 1.0:
            raise ValueError(f"rank must be in [0,1]: {rank}")
        if self.n == 0:
            return None
        if rank == 0.0:
            return self.min_item
        if rank == 1.0:
            return self.max_item
        target = rank * self.n
        cum = 0
        for item, w in self.weighted:
            cum += w
            if cum >= target:
                return item
        return self.max_item

    def rank(self, value) -> float | None:
        """Normalized inclusive rank of ``value`` (fraction of mass <=)."""
        if self.n == 0:
            return None
        cum = 0
        for item, w in self.weighted:
            if item <= value:
                cum += w
            else:
                break
        return cum / self.n
