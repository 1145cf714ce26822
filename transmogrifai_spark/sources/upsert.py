"""Changelog application: upsert/merge compaction and SCD type-2 history —
the snapshot-maintenance half of a lakehouse pipeline (MERGE INTO without a
table format: the reference reads immutable extracts, but any 100 TB
deployment maintains mutable entity state from CDC feeds).

Design: both operators are ONE window over one union — no join. Applying a
changelog is "keep the winning version per key", which shuffles
(base ∪ changes) once on the key and resolves winners with a bounded-state
window; a join-based MERGE would shuffle both sides AND re-shuffle the
output. Determinism: winners are chosen by (order_col, source-priority,
op-priority) — ties between a base row and a change at the same version go
to the change, so re-applying an already-applied changelog is a no-op
(idempotence law), and applying c1 then c2 equals applying c1 ∪ c2 when
order_col orders versions (composition law). Both laws are tested against a
Python fold oracle on randomized changelogs.

Scale notes: the window partitions by key — hot keys have at most
|versions| rows to sort, not |table|; deletes are physical here (the
snapshot drops the row) while scd2_history keeps them as closed intervals,
which is the auditable form. Snapshots should be written with
layout.write_optimized so the next apply_changes prunes on key ranges.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_FAR_FUTURE_MS = 253_402_300_799_999  # 9999-12-31T23:59:59.999Z


def apply_changes(base: DataFrame, changes: DataFrame, keys: list[str],
                  order_col: str, op_col: str | None = None,
                  delete_op: str = "D",
                  allow_schema_evolution: bool = False) -> DataFrame:
    """New snapshot = base with ``changes`` applied: per key, the row with
    the highest ``order_col`` wins (changes beat base on ties); if the
    winner is a delete (``op_col == delete_op``) the key disappears.

    ``base`` and ``changes`` must share the snapshot columns; ``changes``
    may carry ``op_col`` ('I'/'U'/'D' — inserts and updates are the same
    upsert operation, only deletes are special). The output drops
    ``op_col``. Columns are matched by name.

    ``allow_schema_evolution=True`` widens the output to the UNION of both
    schemas: columns new in ``changes`` appear with nulls on old base rows
    (the standard mergeSchema-style additive evolution); columns missing
    from ``changes`` null-fill on change rows, so a winner from the
    changelog erases a dropped column's value — supply full rows in the
    changelog if old payloads must survive a schema widening.
    """
    out_cols = [c for c in base.columns if c != op_col]
    if allow_schema_evolution:
        out_cols += [c for c in changes.columns
                     if c not in out_cols and c != op_col]
    if op_col is None:
        op_col = "__op"
        changes = changes.withColumn(op_col, F.lit("U"))
    elif op_col not in changes.columns:
        raise ValueError(f"changes has no op column {op_col!r}")
    if allow_schema_evolution:
        for col in out_cols:
            if col not in base.columns:
                base = base.withColumn(col, F.lit(None))
            if col not in changes.columns:
                changes = changes.withColumn(col, F.lit(None))
    b = base.select(*out_cols) \
            .withColumn(op_col, F.lit("U")) \
            .withColumn("__src", F.lit(0))
    c = changes.select(*out_cols, op_col).withColumn("__src", F.lit(1))
    # deterministic winner: latest version; changes beat base; on an exact
    # version tie between change ops, the delete wins ('D' sorts first asc)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(order_col).desc(), F.col("__src").desc(),
                  F.col(op_col).asc()))
    return (b.unionByName(c)
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
            .select(*out_cols))


def merge_upsert(base: DataFrame, updates: DataFrame,
                 keys: list[str], order_col: str) -> DataFrame:
    """Upsert without deletes — MERGE INTO ... WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT, keyed by ``keys``, latest ``order_col`` wins."""
    return apply_changes(base, updates, keys, order_col)


def scd2_history(changes: DataFrame, keys: list[str], order_col: str,
                 op_col: str | None = None, delete_op: str = "D",
                 far_future: int | None = _FAR_FUTURE_MS) -> DataFrame:
    """Slowly-changing-dimension type 2: every version of every key as a
    validity interval. Adds ``valid_from`` (= its order_col), ``valid_to``
    (next version's order_col, else ``far_future``/NULL) and ``is_current``.
    Delete rows CLOSE the previous interval but emit no row of their own —
    a deleted key has no current version.

    One window pass (lead over versions per key); intervals are half-open
    [valid_from, valid_to) so point-in-time lookups are
    ``valid_from <= t AND t < valid_to`` — composable with
    sources/range_join.bucketed_point_in_interval at scale.
    """
    cols = [c for c in changes.columns if c != op_col]
    if op_col is None:
        op_col = "__op"
        changes = changes.withColumn(op_col, F.lit("U"))
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    to_default = F.lit(far_future) if far_future is not None else F.lit(None)
    out = (changes
           .withColumn("valid_from", F.col(order_col))
           .withColumn("valid_to",
                       F.lead(F.col(order_col)).over(w))
           .withColumn("is_current", F.col("valid_to").isNull() &
                       (F.col(op_col) != delete_op))
           .withColumn("valid_to", F.coalesce(F.col("valid_to"),
                                              to_default))
           .filter(F.col(op_col) != delete_op))
    return out.select(*cols, "valid_from", "valid_to", "is_current")


def snapshot_at(history: DataFrame, at, keys: list[str] | None = None) -> DataFrame:
    """Point-in-time view of an SCD2 history: rows whose interval covers
    ``at`` (half-open). Pure filter — prunes on valid_from/valid_to stats
    when the history is range-sorted on write."""
    return history.filter((F.col("valid_from") <= F.lit(at)) &
                          (F.lit(at) < F.col("valid_to"))) \
                  .drop("valid_from", "valid_to", "is_current")


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  order_col: str, op_col: str = "op",
                  delete_op: str = "D") -> DataFrame:
    """Changelog between two snapshots — the inverse of ``apply_changes``:
    emits I (key only in new), U (key in both, any payload column changed),
    D (key only in old, payload nulled, ``order_col`` carried from old so
    the delete outranks the old version). Unchanged keys emit nothing.

    Roundtrip law (tested): ``apply_changes(old, snapshot_diff(old, new))
    == new``. One full-outer join on the key — both sides shuffle once;
    payload comparison is null-safe (``<=>``) column-wise.

    Use for CDC feed generation from periodic full extracts (the common
    source shape when the upstream system has no changelog), and for
    auditing what an upsert actually changed.
    """
    payload = [c for c in new.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share a schema")
    o = old.select(*keys, F.lit(True).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in payload])
    n = new.select(*keys, F.lit(True).alias("__in_new"),
                   *[F.col(c).alias(f"__n_{c}") for c in payload])
    j = (o.join(n, keys, "full_outer")
         .withColumn("__in_old", F.coalesce("__in_old", F.lit(False)))
         .withColumn("__in_new", F.coalesce("__in_new", F.lit(False))))
    in_old, in_new = F.col("__in_old"), F.col("__in_new")
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (F.when(~in_old, F.lit("I"))
          .when(~in_new, F.lit(delete_op))
          .when(changed, F.lit("U")))
    out_payload = [
        # deletes carry the old version so they outrank it in apply_changes;
        # every other payload column is nulled on delete
        (F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}"))
         if c == order_col else
         F.when(in_new, F.col(f"__n_{c}"))).alias(c)
        for c in payload]
    return (j.withColumn(op_col, op)
            .filter(F.col(op_col).isNotNull())
            .select(*keys, *out_payload, op_col))
