"""Shared Naive-Bayes scoring substrate for the trainable detectors
(language-ID ``llm/langid_nb``, NER ``operators/ner_nb``, charset
``operators/charset_nb``): one BUCKETED literal lookup table + one fold,
all labels at once.

Why this exists (r8 perf finding): the first-generation scorers built a
``create_map`` literal of the whole vocabulary PER LABEL and probed it
inside the fold lambda — Catalyst does not constant-fold CreateMap, and
an expression referenced inside a higher-order-function lambda is
re-evaluated per ELEMENT, so a 500-gram × 4-label model rebuilt a
1000-child map ~grams × labels times per row (measured: 40 s to score
500 documents). This module fixes both multipliers:

* ONE ``map<int, map<string, array<double>>>`` table for ALL labels
  (gram -> per-label log-prob vector), two-level-bucketed by
  ``crc32(gram) % 64`` (computable identically in Python at build time
  and as an expression at probe time), so the literal-map linear scan is
  ~vocab/64 per probe instead of ~vocab;
* the table is BOUND ONCE PER ROW as a transform-lambda variable (the
  detect_mime_type codegen lesson) — construction cost is paid once per
  row, not per gram;
* the table literal is built from ONE parsed SQL expression
  (milliseconds) instead of per-element python Column calls (seconds) —
  the ``_lit_matrix`` lesson, with proper string escaping for arbitrary
  gram bytes;
* the fold accumulates ALL labels simultaneously (``zip_with`` over the
  per-label vector), keeping the exact per-label addition order — and in
  portable mode the exact DECIMAL(18,6)/(28,6) arithmetic — of the
  original per-label scorers, so oracle-gated values are unchanged.
"""
from __future__ import annotations

import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["nb_scores_map", "nb_best_labels", "save_nb_model",
           "load_nb_model"]


def save_nb_model(model: dict, path: str) -> None:
    """Persist a trained NB model dict (langid_nb / ner_nb / charset_nb /
    token tagger — they share this shape) as versioned JSON. Floats
    round-trip bit-exactly (json emits repr, the shortest round-trip
    decimal), so a loaded model scores identically — including the
    oracle-gated portable mode."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump({"format": "nbmodel/1", "model": model}, f,
                  ensure_ascii=False)


def load_nb_model(path: str) -> dict:
    """Load a ``save_nb_model`` file; raises ValueError on an unknown
    format marker (clean error instead of a downstream KeyError)."""
    import json

    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    if not isinstance(d, dict) or d.get("format") != "nbmodel/1":
        raise ValueError(f"{path!r} is not a saved NB model "
                         "(missing nbmodel/1 format marker)")
    return d["model"]

_N_BUCKETS = 64


def _sql_str(s: str) -> str:
    """SQL string literal with Spark's default backslash escaping.
    Control chars (possible in raw-corpus grams) go through \\uXXXX so
    the parsed literal can never break the surrounding SQL text."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def _table_expr(model: dict, labels: list[str]) -> Column:
    """The bucketed lookup table as one parsed literal:
    map<int, map<string, array<double>>>."""
    buckets: dict[int, list[tuple[str, list[float]]]] = {}
    for g, per in sorted(model["log_prob"].items()):
        b = zlib.crc32(g.encode("utf-8")) % _N_BUCKETS
        buckets.setdefault(b, []).append((g, [per[lb] for lb in labels]))
    parts = []
    for b in sorted(buckets):
        inner = ",".join(
            _sql_str(g) + ",array(" + ",".join(repr(float(v)) + "D"
                                               for v in vec) + ")"
            for g, vec in buckets[b])
        parts.append(f"{b},map({inner})")
    return F.expr("map(" + ",".join(parts) + ")")


def nb_scores_map(grams: Column, model: dict, labels: list[str],
                  normalize: bool) -> Column:
    """map<label, double> of NB scores for one gram/feature array:
    per label, log_prior + sum over grams of logP(g|label) (absent grams
    take the label's smoothed-zero ``unk``), divided by the gram count
    when ``normalize`` (the langid length-normalized form). Empty/NULL
    gram arrays map every label to NULL. ``model['portable']`` folds
    6dp-rounded terms through DECIMAL(18,6)/(28,6) exactly like the
    original per-label scorers — values are bit-identical to them."""
    unk = F.array(*[F.lit(model["unk"][lb]) for lb in labels])
    portable = bool(model.get("portable"))

    # bind the GRAM ARRAY first: every later reference (the terms
    # transform, |grams| normalization, the per-label empty checks)
    # would otherwise re-evaluate the caller's gram expression — for
    # langid that is the full char-n-gram substring sweep, and ~10
    # references made it the dominant scoring cost (r8 measurement:
    # 16 s -> 2.5 s for 500 documents)
    def with_grams(gs: Column) -> Column:
        def with_table(tab: Column) -> Column:
            terms = F.transform(
                gs,
                lambda g: F.coalesce(
                    F.try_element_at(
                        F.try_element_at(
                            tab,
                            (F.crc32(F.encode(g, "UTF-8")) % _N_BUCKETS)
                            .cast("int")),
                        g),
                    unk))
            if portable:
                zero = F.array(*[F.lit(0).cast("decimal(28,6)")
                                 for _ in labels])
                sums = F.aggregate(
                    terms, zero,
                    lambda a, t: F.zip_with(
                        a, t,
                        lambda x, y: (x + y.cast("decimal(18,6)"))
                        .cast("decimal(28,6)")))
                totals = F.zip_with(
                    sums,
                    F.array(*[F.lit(model["log_prior"][lb])
                              for lb in labels]),
                    lambda s, p: s.cast("double") + p)
            else:
                zero = F.array(*[F.lit(0.0) for _ in labels])
                sums = F.aggregate(
                    terms, zero,
                    lambda a, t: F.zip_with(a, t, lambda x, y: x + y))
                totals = F.zip_with(
                    sums,
                    F.array(*[F.lit(model["log_prior"][lb])
                              for lb in labels]),
                    lambda s, p: s + p)
            if normalize:
                # greatest(|grams|, 1): the division is only OBSERVED for
                # non-empty gram arrays (empty ones map to NULL below),
                # but ANSI mode evaluates it eagerly — guard the zero
                totals = F.transform(
                    totals, lambda t: t / F.greatest(F.size(gs), F.lit(1)))
            return totals

        scored = F.get(F.transform(F.array(_table_expr(model, labels)),
                                   with_table), 0)

        # bind the scored vector too — referenced once per label below
        def to_map(sc: Column) -> Column:
            pairs = []
            for i, lb in enumerate(labels):
                pairs.append(F.lit(lb))
                pairs.append(F.when(F.size(gs) > 0,
                                    F.element_at(sc, i + 1)))
            return F.create_map(*pairs)

        return F.get(F.transform(F.array(scored), to_map), 0)

    return F.get(F.transform(F.array(grams), with_grams), 0)


def nb_best_labels(bags: Column, model: dict, labels: list[str]) -> Column:
    """array<string>: the best NB label per feature bag for an ARRAY of
    bags (array<array<string>>) — the per-token batch form behind the
    sequence taggers. The lookup table is bound ONCE per row and shared
    by every bag (calling ``nb_scores_map`` per token would rebuild the
    table literal per element — the HOF re-evaluation trap this module
    exists to avoid). Scoring and tie rules are exactly
    ``bag_nb_label``'s: unnormalized log prior + term sum, absent
    features at the smoothed zero, argmax by ascending (-score, label);
    empty bags yield NULL."""
    unk = F.array(*[F.lit(model["unk"][lb]) for lb in labels])
    priors = F.array(*[F.lit(model["log_prior"][lb]) for lb in labels])
    label_arr = F.array(*[F.lit(lb) for lb in labels])
    portable = bool(model.get("portable"))

    def with_table(tab: Column) -> Column:
        def score_bag(gs: Column) -> Column:
            terms = F.transform(
                gs,
                lambda g: F.coalesce(
                    F.try_element_at(
                        F.try_element_at(
                            tab,
                            (F.crc32(F.encode(g, "UTF-8")) % _N_BUCKETS)
                            .cast("int")),
                        g),
                    unk))
            if portable:
                zero = F.array(*[F.lit(0).cast("decimal(28,6)")
                                 for _ in labels])
                sums = F.aggregate(
                    terms, zero,
                    lambda a, t: F.zip_with(
                        a, t,
                        lambda x, y: (x + y.cast("decimal(18,6)"))
                        .cast("decimal(28,6)")))
                totals = F.zip_with(sums, priors,
                                    lambda s, p: s.cast("double") + p)
            else:
                zero = F.array(*[F.lit(0.0) for _ in labels])
                sums = F.aggregate(
                    terms, zero,
                    lambda a, t: F.zip_with(a, t, lambda x, y: x + y))
                totals = F.zip_with(sums, priors, lambda s, p: s + p)
            best = F.element_at(F.array_sort(F.zip_with(
                totals, label_arr,
                lambda s, lb: F.struct((-s).alias("ns"), lb.alias("l")))),
                1)["l"]
            return F.when(F.size(gs) > 0, best).otherwise(
                F.lit(None).cast("string"))

        return F.transform(bags, score_bag)

    return F.get(F.transform(F.array(_table_expr(model, labels)),
                             with_table), 0)
