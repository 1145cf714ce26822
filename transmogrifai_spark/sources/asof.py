"""As-of (point-in-time) join — the event-enrichment operator a training-data
pipeline needs that Spark's DataFrame API lacks as a primitive.

The reference approximates point-in-time semantics with
``JoinedDataReader.withSecondaryAggregation`` + ``TimeBasedFilter``
(readers/.../JoinedDataReader.scala:233, DataReaders time-window filters):
"join each left row to right-side state visible at its timestamp". This module
provides the explicit form: for every left row, attach the single most recent
right row at-or-before (``backward``) / earliest at-or-after (``forward``) its
timestamp, per key, with optional ``tolerance``.

Scale design — the union + window formulation, NOT a range join:

  * both sides are tagged and unioned, then ONE hash shuffle on the key
    partitions the merged stream; within each key, an ordered window carries
    the last-seen right payload forward (``last(..., ignorenulls=true)``).
  * cost is a single shuffle + per-key sort — linear in rows, no candidate
    blow-up. A naive ``left.join(right, key AND r.ts <= l.ts)`` + argmax
    explodes to O(|L| x matching |R|) pairs per key before pruning; at 100 TB
    event scale that's the difference between a sort-merge pass and an
    unbounded intermediate.
  * skewed keys: the shuffle key is the join key; salt or AQE-skew handles a
    hot key exactly as for any groupBy (the window itself is per-key
    sequential, as the semantics require).
  * ties (equal timestamps): right rows win over left rows at the same
    instant when ``allow_exact_matches`` (the pandas.merge_asof default).
    Multiple RIGHT rows sharing (key, timestamp) have no defined winner —
    dedupe the right side first (e.g. ``dropDuplicates``) when that can
    occur, as with any as-of implementation.

DuckDB's native ``ASOF JOIN`` is the cross-check oracle in tests.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_time: str, right_time: str | None = None,
              direction: str = "backward", tolerance_ms: int | None = None,
              allow_exact_matches: bool = True,
              suffix: str = "") -> DataFrame:
    """For each left row, attach the closest right row per key: most recent
    at-or-before ``left_time`` (``backward``, default) or earliest
    at-or-after (``forward``). Timestamps may be TimestampType or numeric
    epoch; ``tolerance_ms`` bounds the match age in epoch milliseconds.

    Right payload columns (everything except key + time) come back
    null-filled when no match, with ``suffix`` appended on name collisions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time

    def to_ms(c):
        # integer `div`, never `/` (float) — the repo-wide timestamp rule
        # (sources/tables.py): float division is exact only while
        # epoch-micros fit 2^53.
        return F.expr(f"unix_micros(`{c}`) div 1000")

    l_ts = to_ms(left_time) if _is_timestamp(left, left_time) \
        else F.col(left_time).cast("long")
    r_ts = to_ms(right_time) if _is_timestamp(right, right_time) \
        else F.col(right_time).cast("long")

    payload = [c for c in right.columns if c not in keys and c != right_time]
    out_names = {c: c + suffix if c in left.columns else c for c in payload}

    # tagged union: right rows first at equal instants iff exact matches count
    l_tag, r_tag = (1, 0) if allow_exact_matches else (0, 1)
    lu = left.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)],
        l_ts.alias("__ts"), F.lit(l_tag).alias("__tag"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(right.select(F.struct(*payload).alias("s"))
                         .schema["s"].dataType).alias("__r"),
        F.lit(None).cast("long").alias("__rts"))
    ru = right.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)],
        r_ts.alias("__ts"), F.lit(r_tag).alias("__tag"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("s"))
                         .schema["s"].dataType).alias("__l"),
        F.struct(*payload).alias("__r"), r_ts.alias("__rts"))
    merged = lu.unionByName(ru)

    kcols = [F.col(f"__k_{i}") for i in range(len(keys))]
    if direction == "backward":
        w = (Window.partitionBy(*kcols)
             .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(*kcols)
             .orderBy(F.col("__ts").desc(), F.col("__tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        "*",
        F.last("__r", ignorenulls=True).over(w).alias("__match"),
        F.last("__rts", ignorenulls=True).over(w).alias("__match_ts"))

    out = carried.where(F.col("__l").isNotNull())
    if tolerance_ms is not None:
        age = (F.col("__ts") - F.col("__match_ts")) if direction == "backward" \
            else (F.col("__match_ts") - F.col("__ts"))
        keep = F.col("__match_ts").isNotNull() & (age <= F.lit(tolerance_ms))
        out = out.withColumn("__match",
                             F.when(keep, F.col("__match")))
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload])


def _is_timestamp(df: DataFrame, col: str) -> bool:
    from pyspark.sql import types as T
    return isinstance(df.schema[col].dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType))
