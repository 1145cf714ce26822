"""Edit-distance (Levenshtein) similarity joins without O(n²) pair
enumeration — pigeonhole segment blocking (the PassJoin family, Li et al.,
"PASS-JOIN: A Partition-based Method for Similarity Joins", VLDB 2011 —
public algorithm), re-expressed as pure Spark DataFrame operations.

Entity resolution / fuzzy matching is the string-side complement of the
reference's similarity features (NGramSimilarity / Jaccard,
core/src/main/scala/com/salesforce/op/stages/impl/feature/NGramSimilarity.scala)
and of this repo's near-dup stack: where MinHash finds *set*-similar
documents, an edit-distance join finds *sequence*-similar short strings
(names, titles, codes) under a hard distance bound.

Why not ``left.join(right, levenshtein(a, b) <= d)``: Spark plans a
non-equi join as BroadcastNestedLoop/Cartesian — O(|L|·|R|) Levenshtein
calls, a non-starter at scale.

The pigeonhole scheme: split every indexed string of length L into
``k = d+1`` contiguous segments. If ``edit(s, t) <= d``, at least one of
s's k segments is untouched by all edits, so it occurs in t EXACTLY, at a
start position shifted by at most d. Therefore an equi-join on
``(segment_text, L, segment_index)`` between

- INDEX side: the k segments of each string, and
- PROBE side: every substring of t whose (length, position) window is
  compatible with some (L, i) segment slot,

is a COMPLETE candidate generator (no false negatives), and a final exact
``levenshtein(s, t) <= d`` re-check removes false positives. Cost per probe
string is O(d³) generated keys (≈45 at d=2, ≈147 at d=3) — independent of
corpus size; the join is ONE hash shuffle on the segment key.

Strings shorter than k chars have zero-length segments under any split, so
they route through a dedicated SHORT block instead: a string with
``len(s) <= d`` can only be within distance d of strings with
``len(t) <= 2d`` (length difference is a lower bound on edit distance),
and that block is tiny by construction.

Scale notes (100 TB): both sides shuffle once on (seg, L, i); candidate
re-check is pushed after a ``distinct`` so each surviving pair pays ONE
bounded Levenshtein (threshold form, early-exit). Hot segments (e.g. a
constant prefix shared by every row) behave like skewed join keys — the
``max_seg_freq`` cap drops segment keys whose index-side frequency exceeds
the cap, exactly the ``max_doc_freq`` guard the n-gram dedup index uses;
capped keys are logged out-of-band by callers that need completeness
accounting (with the cap disabled the join is exact).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_len(L: Column, i: Column, k: int) -> Column:
    """Length of segment ``i`` (0-based) of a length-``L`` string split into
    ``k`` segments: the first ``k - (L % k)`` segments get ``L // k`` chars,
    the rest one extra."""
    base = F.floor(L / k).cast("int")
    rem = (L - base * k).cast("int")
    return base + F.when(i >= k - rem, F.lit(1)).otherwise(F.lit(0))


def _seg_start(L: Column, i: Column, k: int) -> Column:
    """0-based start offset of segment ``i``: i*base plus one for every
    earlier extra-length segment."""
    base = F.floor(L / k).cast("int")
    rem = (L - base * k).cast("int")
    return i * base + F.greatest(F.lit(0), i - (k - rem))


def _index_side(df: DataFrame, id_col: str, text_col: str, d: int) -> DataFrame:
    """(id, txt, len, seg, kL, ki) rows: k segments per long string, one
    sentinel ('', -1, -1) row per short string (len <= d)."""
    k = d + 1
    base = (df.select(F.col(id_col).alias("_iid"), F.col(text_col).alias("_itxt"))
              .filter(F.col("_itxt").isNotNull())
              .withColumn("_ilen", F.length("_itxt").cast("int")))
    L = F.col("_ilen")
    long_rows = (base.filter(L >= k)
                 .select("_iid", "_itxt", "_ilen",
                         F.explode(F.transform(
                             F.sequence(F.lit(0), F.lit(k - 1)),
                             lambda i: F.struct(
                                 i.cast("int").alias("ki"),
                                 F.col("_itxt").substr(
                                     _seg_start(F.col("_ilen"), i.cast("int"), k) + 1,
                                     _seg_len(F.col("_ilen"), i.cast("int"), k)
                                 ).alias("seg")))).alias("e"))
                 .select("_iid", "_itxt", "_ilen",
                         F.col("e.seg").alias("seg"),
                         F.col("_ilen").alias("kL"),
                         F.col("e.ki").alias("ki")))
    short_rows = (base.filter(L <= d)
                  .select("_iid", "_itxt", "_ilen",
                          F.lit("").alias("seg"),
                          F.lit(-1).cast("int").alias("kL"),
                          F.lit(-1).cast("int").alias("ki")))
    return long_rows.unionByName(short_rows)


def _probe_side(df: DataFrame, id_col: str, text_col: str, d: int,
                max_extra_len: int) -> DataFrame:
    """(id, txt, len, seg, kL, ki) candidate-key rows for the probe side.

    For each probe string t (length m) and each candidate index length
    ``L in [max(k, m - d), m + max_extra_len]`` and segment slot i, emit
    every substring of t with the (L, i) segment's length, starting within
    ±d of the segment's home position. ``max_extra_len`` is 0 for the
    self-join (the shorter string is always the indexed one) and d for a
    general two-table join (the indexed string may be longer)."""
    k = d + 1
    base = (df.select(F.col(id_col).alias("_pid"), F.col(text_col).alias("_ptxt"))
              .filter(F.col("_ptxt").isNotNull())
              .withColumn("_plen", F.length("_ptxt").cast("int")))
    m = F.col("_plen")

    def keys_for(Lc):
        def window(i):
            start = _seg_start(Lc, i, k)
            slen = _seg_len(Lc, i, k)
            lo = F.greatest(F.lit(0), start - d)
            hi = F.least(m - slen, start + d)
            # F.sequence(a, b) DESCENDS when b < a — clamp then filter.
            ps = F.filter(F.sequence(lo, F.greatest(lo, hi)),
                          lambda p: p <= hi)
            return F.transform(ps, lambda p: F.struct(
                F.col("_ptxt").substr(p.cast("int") + 1, slen).alias("seg"),
                Lc.cast("int").alias("kL"),
                i.cast("int").alias("ki")))
        return F.flatten(F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: window(i.cast("int"))))

    lo_L = F.greatest(F.lit(k), m - d)
    hi_L = m + max_extra_len
    Ls = F.filter(F.sequence(lo_L, F.greatest(lo_L, hi_L)),
                  lambda L: L <= hi_L)
    long_rows = (base.filter(m + max_extra_len >= k)
                 .select("_pid", "_ptxt", "_plen",
                         F.explode(F.flatten(
                             F.transform(Ls, keys_for))).alias("e"))
                 .select("_pid", "_ptxt", "_plen",
                         "e.seg", "e.kL", "e.ki"))
    short_rows = (base.filter(m <= 2 * d)
                  .select("_pid", "_ptxt", "_plen",
                          F.lit("").alias("seg"),
                          F.lit(-1).cast("int").alias("kL"),
                          F.lit(-1).cast("int").alias("ki")))
    return long_rows.unionByName(short_rows)


def _recheck(cands: DataFrame, d: int) -> DataFrame:
    """Exact bounded re-check: threshold Levenshtein (early-exit in the
    JVM; returns -1 past the bound, Spark >= 3.5) with a real 2-arg
    fallback for older runtimes (full distance, plain <= d filter)."""
    try:
        lev = F.levenshtein("_t1", "_t2", d)
    except TypeError:  # pyspark < 3.5: no threshold argument
        return (cands.withColumn("dist", F.levenshtein("_t1", "_t2"))
                .filter(F.col("dist") <= d))
    return (cands.withColumn("dist", lev)
            .filter((F.col("dist") >= 0) & (F.col("dist") <= d)))


def _cap_hot_segments(index: DataFrame, max_seg_freq: int | None) -> DataFrame:
    if max_seg_freq is None:
        return index
    hot = (index.groupBy("seg", "kL", "ki").count()
           .filter(F.col("count") > max_seg_freq)
           .select("seg", "kL", "ki"))
    return index.join(F.broadcast(hot), ["seg", "kL", "ki"], "left_anti")


def edit_distance_self_join(df: DataFrame, id_col: str, text_col: str,
                            max_dist: int,
                            max_seg_freq: int | None = None) -> DataFrame:
    """All pairs (id1 < id2) with ``levenshtein(text1, text2) <= max_dist``.

    Complete (no false negatives) unless ``max_seg_freq`` caps a hot
    segment key. Output: ``id1, id2, dist`` with ``id1 < id2``. The probe
    side only targets index lengths ``<= m`` and equal-length pairs are
    oriented smaller-id-indexed, so each unordered pair is generated in
    exactly one orientation (then ``distinct`` collapses multi-segment
    hits)."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1: {max_dist}")
    index = _cap_hot_segments(
        _index_side(df, id_col, text_col, max_dist), max_seg_freq)
    probe = _probe_side(df, id_col, text_col, max_dist, max_extra_len=0)
    order = (index["_ilen"] < probe["_plen"]) | \
            ((index["_ilen"] == probe["_plen"]) & (index["_iid"] < probe["_pid"]))
    cands = (index.join(probe, ["seg", "kL", "ki"])
             .filter(order)
             .select(index["_iid"].alias("_id1"), probe["_pid"].alias("_id2"),
                     index["_itxt"].alias("_t1"), probe["_ptxt"].alias("_t2"))
             .distinct())
    out = _recheck(cands, max_dist)
    return out.select(
        F.least("_id1", "_id2").alias("id1"),
        F.greatest("_id1", "_id2").alias("id2"),
        F.col("dist").cast("int").alias("dist"))


def edit_distance_join(left: DataFrame, right: DataFrame,
                       left_id: str, left_text: str,
                       right_id: str, right_text: str,
                       max_dist: int,
                       max_seg_freq: int | None = None) -> DataFrame:
    """General two-table edit-distance join: every (left, right) pair with
    ``levenshtein <= max_dist``. Left is segmented/indexed, right probes;
    output ``left_id, right_id, dist`` (original id column names)."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1: {max_dist}")
    index = _cap_hot_segments(
        _index_side(left, left_id, left_text, max_dist), max_seg_freq)
    probe = _probe_side(right, right_id, right_text, max_dist,
                        max_extra_len=max_dist)
    cands = (index.join(probe, ["seg", "kL", "ki"])
             .select(index["_iid"].alias("_id1"), probe["_pid"].alias("_id2"),
                     index["_itxt"].alias("_t1"), probe["_ptxt"].alias("_t2"))
             .distinct())
    out = _recheck(cands, max_dist)
    return out.select(
        F.col("_id1").alias(left_id if left_id != right_id else f"l_{left_id}"),
        F.col("_id2").alias(right_id if left_id != right_id else f"r_{right_id}"),
        F.col("dist").cast("int").alias("dist"))
