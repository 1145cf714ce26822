"""OpenNLP GIS maxent models: public-format load/save + expression scoring.

The reference's NameEntityRecognizer (core/src/main/scala/com/salesforce/
op/stages/impl/feature/NameEntityRecognizer.scala:56 via utils/.../text/
OpenNLPModels.scala) scores with PRE-TRAINED OpenNLP maxent (GIS) models.
Round 8 re-expressed the trainable side of that family as a Naive-Bayes
chunk classifier (`operators/ner_nb.py` — same indicator features, fit
from the user's labels); what remained of PARITY delta 3a was the model
DATA: OpenNLP ships its models as artifacts in a documented public
serialization, and a user holding one could not feed it to this engine.

This module is that bridge — the phone-XML/MeCab-loader pattern applied
to maxent: parse the user's copy of the PUBLIC plain-text GIS model
format (the `PlainTextGISModelWriter`/`GISModelReader` layout: "GIS"
header, correction constant + correction parameter, outcome labels,
outcome-pattern table, predicate names, then per-pattern parameter
blocks) and score it as pure Catalyst expressions riding the shared
bucketed-table substrate (`nbmodel`) — a maxent model IS a
feature -> per-outcome weight table with absent features contributing 0,
so the NB scorer's sum machinery applies with zero priors and zero unk:

    p(o | features) ∝ exp( (Σ_active w[f][o]) / C + correction )

the GISModel.eval shape (feature values are the default 1.0 — the
binary-indicator form OpenNLP's NER/doccat features use). One honest
simplification: classic OpenNLP scales the correction term by
(1 - n_active/C) before adding it; since the term is added to EVERY
outcome it cancels in the softmax normalization, so probabilities and
argmax are identical either way — only the un-normalized exponent
differs (r9 ADVICE fix: the claim here was previously "exactly the
published arithmetic").

`typed_entities_statistical` dispatches on the model's ``type`` marker,
so a loaded GIS model drops into the NER path wherever a trained NB
chunk classifier does.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["load_opennlp_gis_model", "save_opennlp_gis_model",
           "maxent_sums", "maxent_probs", "maxent_best_outcome",
           "ner_maxent_label", "maxent_beam_decode", "maxent_beam_tag",
           "maxent_beam_tag_py", "maxent_beam_decode_py",
           "beam_token_features"]


def load_opennlp_gis_model(path: str) -> dict:
    """Read a plain-text GIS model file (the public OpenNLP
    ``PlainTextGISModelWriter`` layout — one writeUTF/writeInt/
    writeDouble per line):

    line 1        ``GIS``
    line 2        correction constant (int)
    line 3        correction parameter (double)
    then          #outcomes, outcome labels
    then          #outcome-patterns, pattern lines ``k o1 .. om``
                  (k = how many predicates share the pattern, o* =
                  outcome indices the pattern covers)
    then          #predicates, predicate names (grouped by pattern)
    then          parameters: for each pattern, k blocks of m doubles

    Returns ``{"type": "GIS", "outcomes", "labels", "weights",
    "correction_constant", "correction_param", "context": False}`` with
    ``weights`` sparse — ``{predicate: {outcome: param}}`` covering
    exactly the pattern's outcomes (others are implicitly 0, the GIS
    eval contract). ``labels`` mirrors ``outcomes`` so the model plugs
    into the detector-family call sites. Raises ValueError on a wrong
    header or a truncated table (clean errors instead of downstream
    index drift)."""
    with open(path, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    it = iter(lines)

    def nxt(what: str) -> str:
        try:
            return next(it)
        except StopIteration:
            raise ValueError(f"truncated GIS model file: missing {what}")

    header = nxt("header")
    if header.strip() != "GIS":
        raise ValueError(
            f"not a plain-text GIS model (header {header!r}, expected 'GIS')")
    corr_const = int(nxt("correction constant"))
    corr_param = float(nxt("correction parameter"))
    n_out = int(nxt("outcome count"))
    outcomes = [nxt("outcome label") for _ in range(n_out)]
    n_pat = int(nxt("pattern count"))
    patterns: list[tuple[int, list[int]]] = []
    for _ in range(n_pat):
        parts = nxt("pattern line").split()
        if len(parts) < 2:
            raise ValueError(f"bad GIS outcome-pattern line: {parts!r}")
        k, oidx = int(parts[0]), [int(x) for x in parts[1:]]
        if any(o < 0 or o >= n_out for o in oidx):
            raise ValueError(f"outcome index out of range in {parts!r}")
        patterns.append((k, oidx))
    n_pred = int(nxt("predicate count"))
    if sum(k for k, _ in patterns) != n_pred:
        raise ValueError(
            "pattern predicate counts do not sum to the predicate count")
    preds = [nxt("predicate name") for _ in range(n_pred)]
    weights: dict[str, dict[str, float]] = {}
    pid = 0
    for k, oidx in patterns:
        for _ in range(k):
            weights[preds[pid]] = {
                outcomes[o]: float(nxt("parameter")) for o in oidx}
            pid += 1
    return {"type": "GIS", "outcomes": outcomes, "labels": list(outcomes),
            "weights": weights, "correction_constant": corr_const,
            "correction_param": corr_param, "context": False}


def save_opennlp_gis_model(model: dict, path: str) -> None:
    """Write ``{"outcomes", "weights", ...}`` in the same public
    plain-text GIS layout (predicates grouped by their outcome-pattern
    signature, the writer-side compression the format defines) — the
    round-trip partner of ``load_opennlp_gis_model`` and a migration
    path for models trained elsewhere. Floats are written with repr
    (shortest round-trip decimal), so load-back scores bit-identically."""
    outcomes: list[str] = list(model["outcomes"])
    o_idx = {o: i for i, o in enumerate(outcomes)}
    groups: dict[tuple[int, ...], list[str]] = {}
    for pred, per in model["weights"].items():
        unknown = set(per) - set(o_idx)
        if unknown:
            raise ValueError(f"predicate {pred!r} references outcomes "
                             f"not in the outcome list: {sorted(unknown)}")
        sig = tuple(sorted(o_idx[o] for o in per))
        if not sig:
            raise ValueError(f"predicate {pred!r} has no outcome weights")
        groups.setdefault(sig, []).append(pred)
    out = ["GIS", str(int(model.get("correction_constant", 1))),
           repr(float(model.get("correction_param", 0.0))),
           str(len(outcomes)), *outcomes, str(len(groups))]
    sigs = list(groups)
    for sig in sigs:
        out.append(" ".join([str(len(groups[sig]))] +
                            [str(o) for o in sig]))
    out.append(str(sum(len(v) for v in groups.values())))
    for sig in sigs:
        out.extend(groups[sig])
    for sig in sigs:
        for pred in groups[sig]:
            per = model["weights"][pred]
            out.extend(repr(float(per[outcomes[o]])) for o in sig)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


def _nb_adapter(model: dict) -> tuple[dict, list[str]]:
    """A GIS model as an nbmodel-shaped table: dense per-outcome weight
    vectors (absent = 0, the 'contributes only to its pattern' rule),
    zero priors, zero unk — the NB scorer then computes exactly the
    active-weight sums GISModel.eval accumulates."""
    outcomes = model["outcomes"]
    dense = {p: {o: per.get(o, 0.0) for o in outcomes}
             for p, per in model["weights"].items()}
    return {"log_prob": dense,
            "log_prior": {o: 0.0 for o in outcomes},
            "unk": {o: 0.0 for o in outcomes}}, outcomes


def maxent_sums(features: Column, model: dict) -> Column:
    """map<outcome, double> of RAW active-weight sums Σ w[f][o] (the
    pre-exponentiation GIS accumulator; unknown predicates contribute
    0). NULL/empty feature arrays map every outcome to NULL — the
    detector-family abstain contract (OpenNLP itself returns the
    uniform distribution there; abstain is this engine's convention for
    'no evidence'). One bucketed table bound once per row
    (``nbmodel``), whatever the predicate count."""
    from ..nbmodel import nb_scores_map
    adapter, outcomes = _nb_adapter(model)
    return nb_scores_map(features, adapter, outcomes, normalize=False)


def maxent_probs(features: Column, model: dict) -> Column:
    """map<outcome, double> normalized probabilities — the published
    GISModel.eval arithmetic: exp(sum/C + correctionParam), then divide
    by the total (accumulated in outcome order)."""
    c = float(model["correction_constant"])
    cp = float(model["correction_param"])
    sums = maxent_sums(features, model)

    def norm(mm: Column) -> Column:
        ex = F.transform(F.map_values(mm),
                         lambda v: F.exp(v / F.lit(c) + F.lit(cp)))

        def with_ex(e: Column) -> Column:
            z = F.aggregate(e, F.lit(0.0), lambda a, x: a + x)
            return F.map_from_arrays(F.map_keys(mm),
                                     F.transform(e, lambda x: x / z))

        out = F.get(F.transform(F.array(ex), with_ex), 0)
        return F.when(F.element_at(F.map_values(mm), 1).isNull(),
                      F.lit(None).cast("map<string,double>")) \
            .otherwise(out)

    return F.get(F.transform(F.array(sums), norm), 0)


def maxent_best_outcome(features: Column, model: dict) -> Column:
    """Best outcome label — OpenNLP's getBestOutcome rule: the FIRST
    maximum in OUTCOME ORDER (not alphabetical — the NB family breaks
    ties alphabetically, so this argmax is index-keyed). Softmax is
    monotone in the sums, so the raw accumulator decides. NULL for
    NULL/empty feature arrays."""
    outcomes = model["outcomes"]
    sums = maxent_sums(features, model)
    label_arr = F.array(*[F.lit(o) for o in outcomes])

    def pick(mm: Column) -> Column:
        vals = F.map_values(mm)
        best_i = F.element_at(F.array_sort(F.zip_with(
            vals,
            F.sequence(F.lit(1), F.lit(len(outcomes))),
            lambda v, i: F.struct((-v).alias("ns"), i.alias("i")))), 1)["i"]
        return F.when(F.element_at(vals, 1).isNull(),
                      F.lit(None).cast("string")) \
            .otherwise(F.element_at(label_arr, best_i))

    return F.get(F.transform(F.array(sums), pick), 0)


def ner_maxent_label(chunk: Column, model: dict,
                     context: Column | None = None) -> Column:
    """Chunk label via a GIS model over the SAME indicator features the
    NB chunk classifier uses (``ner_nb.chunk_features``) — the drop-in
    the ``typed_entities_statistical`` dispatch calls for
    ``type='GIS'`` models. A model whose predicates use another feature
    vocabulary still scores (unknown predicates are 0-weight); it just
    won't discriminate — supply models trained on these features, or
    adapt the feature names at load time."""
    from .ner_nb import chunk_features
    return maxent_best_outcome(
        chunk_features(chunk, context if model.get("context") else None),
        model)


# ---------------------------------------------------------------------------
# Token-level BEAM-DECODED tagging (r10 — PARITY delta 3a's decoding
# residual): OpenNLP's NameFinderME does not label chunks, it labels
# TOKENS, decoding the outcome sequence with a width-3 beam search over
# per-token maxent distributions whose context features include the
# PREVIOUS OUTCOME (reference: core/src/main/scala/com/salesforce/op/
# stages/impl/feature/NameEntityRecognizer.scala:56 scoring through
# utils/.../text/OpenNLPModels.scala -> NameFinderME/BeamSearch).
#
# Re-expression: per-position token features are hypothesis-INDEPENDENT,
# so their active-weight sums are computed once per position (one
# bucketed-table bind, the maxent_sums machinery); the only
# hypothesis-coupled term is the pd=<prevOutcome> predicate, a k x k
# literal matrix added per extension. The beam itself is ONE
# F.aggregate over positions whose accumulator is the live hypothesis
# array (<= beam structs of (outcome indices, score)) — the WordPiece
# cursor-scan shape, bind-once at every stage. Per-step log-probs are
# rounded to 9dp in BOTH engines (the engine's portability
# quantization: JVM and libm exp/ln can differ in the last ulp, and a
# beam comparison must not flip on that); ties break on the outcome
# index sequence ascending (deterministic — OpenNLP's heap order is
# unspecified).
#
# The sequence validator (validate=True) is NameFinderSequenceValidator:
# an outcome named '<type>-cont' may only follow '<type>-start' or
# '<type>-cont'; everything else is always valid.

_BEAM_Q = 9


def beam_token_features(token, prev_tok, next_tok):
    """The documented per-token context feature set (backend-shared):
    w=<token>, wl=<lower>, wc=<shape: ic/lc/num/other>, pw=<prev or
    *BOS*>, nw=<next or *EOS*>. The beam adds pd=<prevOutcome> itself.
    Works on Columns (Spark) or str/None (the mirror)."""
    if isinstance(token, str) or token is None:
        import re as _re
        shape = ("num" if token and _re.fullmatch(r"[0-9]+", token) else
                 "ic" if token and token[0].isupper() else
                 "lc" if token and token[0].islower() else "other")
        return [f"w={token}", f"wl={token.lower() if token else token}",
                f"wc={shape}",
                f"pw={prev_tok if prev_tok is not None else '*BOS*'}",
                f"nw={next_tok if next_tok is not None else '*EOS*'}"]
    shape = F.when(token.rlike("^[0-9]+$"), F.lit("num")) \
        .when(token.rlike("^[A-Z]"), F.lit("ic")) \
        .when(token.rlike("^[a-z]"), F.lit("lc")) \
        .otherwise(F.lit("other"))
    return F.array(
        F.concat(F.lit("w="), token),
        F.concat(F.lit("wl="), F.lower(token)),
        F.concat(F.lit("wc="), shape),
        F.concat(F.lit("pw="), F.coalesce(prev_tok, F.lit("*BOS*"))),
        F.concat(F.lit("nw="), F.coalesce(next_tok, F.lit("*EOS*"))))


def _beam_model_parts(model: dict):
    outcomes = list(model["outcomes"])
    c = float(model["correction_constant"])
    # pd-matrix: pw[p][o] = weight of predicate 'pd=<outcome p>' for o
    pd = [[float(model["weights"].get(f"pd={p}", {}).get(o, 0.0))
           for o in outcomes] for p in outcomes]
    cont_ok = _cont_validity(outcomes)
    return outcomes, c, pd, cont_ok


def _cont_validity(outcomes: list[str]):
    """cont_ok[o][p] = may outcome o follow outcome p (and, row
    cont_bos[o] = may o start the sequence) under the
    NameFinderSequenceValidator rule."""
    def typ(o):
        return o[:-5] if o.endswith("-cont") else \
            o[:-6] if o.endswith("-start") else None

    ok = []
    bos = []
    for o in outcomes:
        if o.endswith("-cont"):
            t = typ(o)
            ok.append([typ(p) == t and
                       (p.endswith("-start") or p.endswith("-cont"))
                       for p in outcomes])
            bos.append(False)
        else:
            ok.append([True] * len(outcomes))
            bos.append(True)
    return ok, bos


def maxent_beam_decode(tokens: Column, model: dict, beam: int = 3,
                       validate: bool = True) -> Column:
    """Width-``beam`` beam search over the GIS model, returning the
    BEST hypothesis as ``struct<tags: array<string>, sc: double>`` —
    tags aligned with the input tokens ([] with sc 0.0 for NULL/empty
    input). Scores are accumulated per-step log-probabilities (softmax
    of sums/C; the correction term cancels), 9dp-rounded each step —
    the portability quantization that makes the SQL-oracle replica
    exact."""
    outcomes, c, pd, (cont_ok, bos_ok) = _beam_model_parts(model)
    k = len(outcomes)
    pd_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in pd])
    ok_lit = F.array(*[F.array(*[F.lit(bool(v)) for v in row])
                       for row in cont_ok])
    bos_lit = F.array(*[F.lit(bool(v)) for v in bos_ok])
    toks = F.coalesce(tokens, F.array().cast("array<string>"))

    def with_toks(ts: Column) -> Column:
        n = F.size(ts)
        # sequence(1, 0) counts DOWN — an empty token array needs an
        # explicit empty position list
        pos = F.when(n > 0, F.sequence(F.lit(1), n)) \
            .otherwise(F.array().cast("array<int>"))
        feats = F.transform(
            pos,
            lambda i: beam_token_features(
                F.element_at(ts, i),
                # index 0 always throws, even in try_element_at: route
                # a NULL index for the first position instead
                F.try_element_at(ts, F.when(i > 1, i - 1)),
                F.try_element_at(ts, i + 1)))
        base = F.transform(
            feats, lambda fa: F.map_values(maxent_sums(fa, model)))

        def with_base(bs: Column) -> Column:
            init = F.array(F.struct(
                F.array().cast("array<int>").alias("labs"),
                F.lit(0.0).alias("sc")))

            def step(acc: Column, sc: Column) -> Column:
                def extend(h: Column) -> Column:
                    first = F.size(h["labs"]) == 0
                    prev = F.try_element_at(h["labs"], F.lit(-1))
                    pdrow = F.when(
                        first,
                        F.array(*[F.lit(0.0)] * k)) \
                        .otherwise(F.element_at(pd_lit, prev + 1))

                    def with_row(row: Column) -> Column:
                        s = F.zip_with(sc, row, lambda a, b: a + b)

                        def with_s(sv: Column) -> Column:
                            z = F.aggregate(
                                F.transform(sv,
                                            lambda x: F.exp(x / F.lit(c))),
                                F.lit(0.0), lambda a, x: a + x)

                            def with_z(lz: Column) -> Column:
                                return F.transform(
                                    F.sequence(F.lit(0), F.lit(k - 1)),
                                    lambda o: F.struct(
                                        F.concat(h["labs"], F.array(o))
                                        .alias("labs"),
                                        (h["sc"] + F.round(
                                            F.element_at(sv, o + 1)
                                            / F.lit(c) - lz,
                                            _BEAM_Q)).alias("sc"),
                                        (F.when(
                                            first,
                                            F.element_at(bos_lit, o + 1))
                                         .otherwise(F.element_at(
                                             F.element_at(ok_lit, o + 1),
                                             prev + 1))
                                         if validate else F.lit(True))
                                        .alias("ok")))

                            return F.get(F.transform(
                                F.array(F.log(z)), with_z), 0)

                        return F.get(F.transform(F.array(s), with_s), 0)

                    return F.get(F.transform(F.array(pdrow), with_row), 0)

                cands = F.filter(F.flatten(F.transform(acc, extend)),
                                 lambda x: x["ok"])
                ranked = F.array_sort(F.transform(
                    cands, lambda x: F.struct(
                        (-x["sc"]).alias("ns"),
                        x["labs"].alias("labs"))))
                return F.transform(
                    F.slice(ranked, 1, beam),
                    lambda r: F.struct(r["labs"].alias("labs"),
                                       (-r["ns"]).alias("sc")))

            best = F.try_element_at(F.aggregate(bs, init, step), F.lit(1))
            tags = F.when(
                best.isNull(), F.array().cast("array<string>")) \
                .otherwise(F.transform(
                    best["labs"],
                    lambda o: F.element_at(
                        F.array(*[F.lit(x) for x in outcomes]), o + 1)))
            sc = F.coalesce(best["sc"], F.lit(0.0))
            return F.struct(tags.alias("tags"), sc.alias("sc"))

        return F.get(F.transform(F.array(base), with_base), 0)

    return F.get(F.transform(F.array(toks), with_toks), 0)


def maxent_beam_tag(tokens: Column, model: dict, beam: int = 3,
                    validate: bool = True) -> Column:
    """Tag a token array with per-token outcomes via width-``beam``
    beam search — array<string> aligned with the input tokens; [] for
    NULL/empty input (``maxent_beam_decode``'s tags field)."""
    return maxent_beam_decode(tokens, model, beam, validate)["tags"]


def maxent_beam_tag_py(tokens, model: dict, beam: int = 3,
                       validate: bool = True):
    """Pure-Python beam mirror (the law-test partner) — identical
    feature set, pd coupling, 9dp step rounding, and
    (-score, outcome-index-sequence) ranking. Tags only; see
    ``maxent_beam_decode_py`` for (tags, score)."""
    return maxent_beam_decode_py(tokens, model, beam, validate)[0]


def maxent_beam_decode_py(tokens, model: dict, beam: int = 3,
                          validate: bool = True):
    """Pure-Python mirror of ``maxent_beam_decode``: (tags, score)."""
    import math

    if not tokens:
        return [], 0.0
    outcomes, c, pd, (cont_ok, bos_ok) = _beam_model_parts(model)
    k = len(outcomes)
    dense = {p: [per.get(o, 0.0) for o in outcomes]
             for p, per in model["weights"].items()}
    hyps = [([], 0.0)]
    for i, tok in enumerate(tokens):
        feats = beam_token_features(
            tok, tokens[i - 1] if i > 0 else None,
            tokens[i + 1] if i + 1 < len(tokens) else None)
        base = [0.0] * k
        for f in feats:
            w = dense.get(f)
            if w:
                base = [a + b for a, b in zip(base, w)]
        cands = []
        for labs, hsc in hyps:
            prev = labs[-1] if labs else None
            row = pd[prev] if prev is not None else [0.0] * k
            s = [a + b for a, b in zip(base, row)]
            z = 0.0
            for x in s:
                z += math.exp(x / c)
            lz = math.log(z)
            for o in range(k):
                if validate:
                    okv = bos_ok[o] if prev is None else cont_ok[o][prev]
                    if not okv:
                        continue
                cands.append((labs + [o],
                              hsc + round(s[o] / c - lz, _BEAM_Q)))
        cands.sort(key=lambda x: (-x[1], x[0]))
        hyps = cands[:beam]
    return [outcomes[o] for o in hyps[0][0]], hyps[0][1]
