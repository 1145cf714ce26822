"""Bucketed range join — point-in-interval and interval-overlap joins that
shuffle-partition instead of nested-looping.

Spark executes ``left.join(right, point BETWEEN start AND end)`` as a
BroadcastNestedLoopJoin (small right) or CartesianProduct — O(|L| x |R|)
comparisons, a non-starter at scale. The standard fix (used by the
interval-join implementations in streaming engines and by Spark's own
range-join hints on Databricks — public technique) is BUCKETING: quantize the
range dimension into fixed-width buckets, equi-join on the bucket id (each
interval lands in every bucket it overlaps), then re-check the exact
predicate. Cost: one hash shuffle + per-bucket work proportional to true
match density; interval replication is bounded by
ceil(interval_len / bucket_width) + 1.

Pick ``bucket_width`` near the typical interval length: too small replicates
long intervals across many buckets, too large packs unrelated rows into one
bucket (the filter then does the work). Degenerate long intervals dominate
cost exactly like skewed keys — cap or split them upstream.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: int) -> Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_col: str, start_col: str, end_col: str,
                           bucket_width: int,
                           extra_keys: list[str] | None = None,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (optionally also matching ``extra_keys``).

    Points take ONE bucket; intervals explode to each bucket they overlap
    (``sequence`` over the bucket range). The equi-join key is
    (extra_keys..., bucket), so the plan is scan -> explode -> ONE hash
    shuffle -> sort-merge/hash join -> exact-predicate filter. ``how`` may
    be 'inner' or 'left' ('left' keeps unmatched points with null interval
    columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    keys = list(extra_keys or [])
    p = points.withColumn("__bucket", _bucket(F.col(point_col), bucket_width))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(F.col(start_col), bucket_width),
                             _bucket(F.col(end_col), bucket_width))))
    cond = [p["__bucket"] == iv["__bucket"]] + \
        [p[k] == iv[k] for k in keys] + \
        [p[point_col] >= iv[start_col], p[point_col] <= iv[end_col]]
    joined = p.join(iv, cond, "inner" if how == "inner" else "left_outer")
    out_cols = [p[c] for c in points.columns] + \
        [iv[c] for c in intervals.columns if c not in keys]
    return joined.select(*out_cols)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket_width: int,
                          extra_keys: list[str] | None = None) -> DataFrame:
    """Join interval pairs that OVERLAP: ``l_start <= r_end AND
    r_start <= l_end``. Both sides explode to their bucket ranges;
    deduplication of multi-bucket double-matches keeps only the pair's
    FIRST shared bucket (the max of the two start buckets), the standard
    trick that avoids a distinct shuffle."""
    keys = list(extra_keys or [])
    lb = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(F.col(l_start), bucket_width),
                             _bucket(F.col(l_end), bucket_width))))
    rb = right.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(F.col(r_start), bucket_width),
                             _bucket(F.col(r_end), bucket_width))))
    first_shared = F.greatest(_bucket(lb[l_start], bucket_width),
                              _bucket(rb[r_start], bucket_width))
    cond = [lb["__bucket"] == rb["__bucket"]] + \
        [lb[k] == rb[k] for k in keys] + \
        [lb[l_start] <= rb[r_end], rb[r_start] <= lb[l_end],
         lb["__bucket"] == first_shared]
    joined = lb.join(rb, cond, "inner")
    out_cols = [lb[c] for c in left.columns] + \
        [rb[c] for c in right.columns if c not in keys]
    return joined.select(*out_cols)
