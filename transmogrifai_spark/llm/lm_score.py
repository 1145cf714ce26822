"""Character n-gram language-model scoring for corpus curation.

The CCNet recipe (Wenzek et al. 2020) ranks web documents by the perplexity
of a language model trained on a clean reference corpus and keeps the
low-perplexity head. KenLM isn't available (and a word-level 5-gram doesn't
fit a map literal), so this is the same signal at character bigram/trigram
order — which is what practical quality filters degrade to anyway when the
reference corpus is small — computed engine-side:

* **fit** (`fit_char_lm`): one `explode`-free aggregation pass — each doc
  contributes its n-gram counts via a Catalyst expression, `posexplode` of
  the (tiny) per-doc count maps feeds one `groupBy(gram)`. The vocabulary is
  bounded by charset**n (we keep the top `max_vocab` grams), so the fitted
  model is a driver-side dict — the same bounded fit-time collection the
  estimator stages use.
* **score** (`lm_log_prob`): pure expression — per-char average of
  ``log P(c_i | context)`` with add-k smoothing, the model inlined as a map
  literal. No Python in the hot path; scoring 100 TB is a single projection.

Perplexity = ``exp(-lm_log_prob)``; filter by keeping documents below a
perplexity cutoff (`perplexity_filter`).

Scale note: ``GetMapValue`` on a map literal is a linear scan, so scoring
costs O(text_len * vocab) comparisons per doc. At char-bigram order the
vocab is alphabet² (~1-4k entries after frequency truncation) — ~1k integer
compares per character, comparable to the regex passes elsewhere in the
quality stack, and embarrassingly parallel. For word-level models (vocab
>> 10k) use an explode + broadcast-join + re-aggregate instead; at that
vocab a map literal is the wrong plan.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_char_lm", "lm_log_prob", "perplexity", "perplexity_filter"]


def _char_ngrams(c: Column, n: int) -> Column:
    """Array of character n-grams of the normalized text (lowercased,
    whitespace collapsed to single spaces — the LM alphabet).

    The normalized text is bound once (util.bind_once): the per-gram
    substring lambda used to embed the regexp_replace+lower chain, which
    re-ran per output gram (O(len²) regex work per row — higher-order
    functions are CodegenFallback)."""
    from ..util import bind_once

    def per(norm: Column) -> Column:
        starts = F.when(F.length(norm) >= n,
                        F.sequence(F.lit(1), F.length(norm) - (n - 1))) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(starts, lambda i: F.substring(norm, i, F.lit(n)))

    return bind_once(
        F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " "), per)


def fit_char_lm(df: DataFrame, text_col: str = "text", n: int = 2,
                max_vocab: int = 20000, add_k: float = 0.5) -> dict:
    """Train a char n-gram model on a (reference) corpus: distributed n-gram
    and (n-1)-gram counts, top-``max_vocab`` grams kept. Returns a plain
    dict (JSON-stable) consumed by ``lm_log_prob``."""
    grams = df.select(F.explode(_char_ngrams(F.col(text_col), n)).alias("g"))
    counts = grams.groupBy("g").agg(F.count("*").alias("c")) \
        .orderBy(F.col("c").desc(), F.col("g")).limit(max_vocab).collect()
    gram_counts = {r["g"]: r["c"] for r in counts}
    ctx_counts: dict[str, int] = {}
    for g, c in gram_counts.items():
        ctx = g[:- 1]
        ctx_counts[ctx] = ctx_counts.get(ctx, 0) + c
    vocab_chars = {g[-1] for g in gram_counts}
    return {"n": n, "add_k": add_k, "vocab_size": max(len(vocab_chars), 1),
            "gram_counts": gram_counts, "ctx_counts": ctx_counts}


def _log_prob_map(model: dict) -> dict[str, float]:
    """gram -> log P(last char | context) with add-k smoothing."""
    k, v = model["add_k"], model["vocab_size"]
    out = {}
    for g, c in model["gram_counts"].items():
        ctx_total = model["ctx_counts"][g[:-1]]
        out[g] = math.log((c + k) / (ctx_total + k * v))
    return out


def lm_log_prob(c: Column, model: dict) -> Column:
    """Average per-char log-probability of the text under the fitted model.
    Unseen grams get the floor ``log(k / (k * V))`` (an unseen context's
    add-k estimate). Empty/NULL text scores the floor."""
    from ..util import bind_once

    k, v = model["add_k"], model["vocab_size"]
    floor = math.log(k / (k * v))
    lp = _log_prob_map(model)
    lp_map = F.create_map(*[F.lit(x) for kv in lp.items() for x in kv]) \
        if lp else F.create_map(F.lit(""), F.lit(floor))

    # bind the gram array AND the literal probability map once per row:
    # ``grams`` was referenced three times (fold + two sizes), each
    # re-deriving the O(len²) gram construction, and CreateMap is not
    # constant-folded — embedded in the fold lambda it was rebuilt per
    # GRAM (the nbmodel r8 lesson)
    def score(s: Column) -> Column:
        grams, m = s["grams"], s["m"]
        total = F.aggregate(
            grams, F.lit(0.0),
            lambda acc, g: acc + F.coalesce(F.element_at(m, g),
                                            F.lit(floor)))
        return F.when(F.size(grams) > 0, total / F.size(grams)) \
            .otherwise(F.lit(floor))

    return bind_once(
        F.struct(_char_ngrams(c, model["n"]).alias("grams"),
                 lp_map.alias("m")), score)


def perplexity(c: Column, model: dict) -> Column:
    return F.exp(-lm_log_prob(c, model))


def perplexity_filter(df: DataFrame, model: dict, text_col: str = "text",
                      max_perplexity: float = 50.0) -> DataFrame:
    """CCNet-style head selection: keep documents whose perplexity under the
    reference model is below the cutoff."""
    return df.where(perplexity(F.col(text_col), model) <= max_perplexity)
