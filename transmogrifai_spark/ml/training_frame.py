"""Leakage-safe training-frame assembly: attach feature values AS OF each
label's timestamp — the point-in-time-correct join that separates a valid
training set from one that trains on the future.

This is the explicit form of what the reference enforces with cutoff
aggregation (readers/.../DataReaders aggregate/conditional readers,
CutOffTime: predictor features strictly before the cutoff, responses after —
SURVEY.md §2.4): there the boundary is one global cutoff per run; here every
label row carries its own boundary, which is what event-level supervised
data needs (churn at t, fraud at t, conversion at t).

Two feature-source shapes, one guarantee (feature visible_at <= label time):

* event-stream features (a timestamped observation log) -> asof_join
  backward per key: one shuffle + per-key window, no range blow-up
  (sources/asof.py).
* versioned entity state (an SCD2 history from sources/upsert.scd2_history)
  -> equi-join on the key + half-open interval containment: candidates are
  bounded by versions-per-key, and intervals are disjoint so each label
  matches at most one version.

The two agree by construction — scd2_features(labels, scd2_history(log)) ==
point_in_time_features(labels, log) — and the cross-operator law is tested.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.asof import asof_join


def point_in_time_features(labels: DataFrame, features: DataFrame,
                           on: str | list[str], label_time: str,
                           feature_time: str | None = None,
                           tolerance_ms: int | None = None,
                           suffix: str = "_f") -> DataFrame:
    """Attach the most recent feature observation at-or-before each label's
    time, per key. ``features`` is a timestamped observation log; rows with
    no visible observation keep the label with null features (never a
    future value). ``tolerance_ms`` additionally expires observations older
    than the window (stale-feature guard)."""
    return asof_join(labels, features, on, label_time,
                     right_time=feature_time, direction="backward",
                     tolerance_ms=tolerance_ms, allow_exact_matches=True,
                     suffix=suffix)


def scd2_features(labels: DataFrame, history: DataFrame,
                  on: str | list[str], label_time: str,
                  suffix: str = "_f") -> DataFrame:
    """Attach the entity version whose validity interval covers each
    label's time: equi-join on the key, then ``valid_from <= t < valid_to``.
    History intervals are disjoint per key (scd2_history guarantees it), so
    this is a left join that matches at most one version — labels in a
    deletion gap or before the first version keep null features."""
    keys = [on] if isinstance(on, str) else list(on)
    for c in ("valid_from", "valid_to"):
        if c not in history.columns:
            raise ValueError(f"history is missing SCD2 column {c!r}")
    payload = [c for c in history.columns
               if c not in keys + ["valid_from", "valid_to", "is_current"]]
    renamed = history.select(
        *keys, "valid_from", "valid_to",
        *[F.col(c).alias(c + suffix if c in labels.columns else c)
          for c in payload])
    t = F.col(label_time)
    cond = [labels[k] == renamed[k] for k in keys] + [
        renamed["valid_from"] <= t, t < renamed["valid_to"]]
    out = labels.join(renamed, cond, "left")
    return out.select(
        *[labels[c] for c in labels.columns],
        *[renamed[c + suffix if c in labels.columns else c]
          for c in payload])


def assemble_training_frame(labels: DataFrame, on: str | list[str],
                            label_time: str,
                            feature_logs: list[tuple[DataFrame, str]] = (),
                            histories: list[DataFrame] = (),
                            tolerance_ms: int | None = None) -> DataFrame:
    """Fold any number of feature sources onto the label frame, each
    point-in-time correct: ``feature_logs`` are (observation_df, time_col)
    pairs joined as-of; ``histories`` are SCD2 frames joined by interval.
    Suffixes ``_f1, _f2, ...`` disambiguate collisions in fold order."""
    out = labels
    i = 0
    for feats, tcol in feature_logs:
        i += 1
        out = point_in_time_features(out, feats, on, label_time,
                                     feature_time=tcol,
                                     tolerance_ms=tolerance_ms,
                                     suffix=f"_f{i}")
    for hist in histories:
        i += 1
        out = scd2_features(out, hist, on, label_time, suffix=f"_f{i}")
    return out
