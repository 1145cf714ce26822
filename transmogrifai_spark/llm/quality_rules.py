"""Corpus quality-filter rule sets from the public literature: the Gopher
rules (Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A)
and the C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §2.2). These are the standard pre-training document
filters a large-scale pipeline runs before dedup/mixing.

Everything is column expressions over the text (split/filter/transform/
aggregate higher-order functions) — one projection per document inside
whole-stage codegen, no Python, no shuffle. The repetition metrics that need
within-document n-gram counts (top-ngram fraction, duplicate-ngram fraction)
use a per-document explode + groupBy — linear rows, one shuffle, the same
shape as the dedup paths.

Each rule emits its measured value plus a boolean, so downstream can audit
WHY a document was dropped (the reports the curation loop needs), and
``keep`` is the conjunction. Thresholds are the published defaults,
overridable per call.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# words = whitespace tokens, per both papers
_WS = r"\s+"


def _words(c: Column) -> Column:
    return F.filter(F.split(c, _WS), lambda w: F.length(w) > 0)


def _lines(c: Column) -> Column:
    return F.filter(F.split(c, r"\n"), lambda l: F.length(F.trim(l)) > 0)


def _dup_fraction(arr: Column) -> Column:
    """1 - distinct/total over a non-empty array (0.0 for empty)."""
    n = F.size(arr)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(arr)) / n.cast("double")
                  ).otherwise(F.lit(0.0))


def _dup_char_fraction(arr: Column) -> Column:
    """Fraction of characters inside elements that are repeats of an
    earlier-seen element (the Gopher 'duplicate line/paragraph character
    fraction'). Expression-only: total chars minus chars of the distinct
    set, over total. The two length folds are bound once (util.bind_once):
    ``total`` is referenced three times below, and HOF folds re-evaluate
    per reference."""
    from ..util import bind_once
    return bind_once(
        F.struct(
            F.aggregate(F.transform(arr, lambda x: F.length(x)),
                        F.lit(0), lambda a, x: a + x).alias("total"),
            F.aggregate(F.transform(F.array_distinct(arr),
                                    lambda x: F.length(x)),
                        F.lit(0), lambda a, x: a + x).alias("uniq")),
        lambda s: F.when(s["total"] > 0,
                         (s["total"] - s["uniq"]) / s["total"].cast("double")
                         ).otherwise(F.lit(0.0)))


GOPHER_DEFAULTS = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,       # '#' or '...' per word
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,         # words containing >=1 alphabetic char
    "min_stop_words": 2,                # distinct required stop words present
    "max_dup_line_frac": 0.3,
    "max_dup_para_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
    "max_dup_para_char_frac": 0.2,
}

#: Gopher's required-word list ("must contain >= 2 of these")
GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(text: Column, **overrides) -> Column:
    """The Gopher document-quality rule struct (Rae et al. 2021 App. A):
    measured values + per-rule booleans + ``keep`` conjunction, one
    expression tree. Repetition here covers the line/paragraph families;
    n-gram repetition (which needs within-doc grouping) is
    :func:`repetition_metrics`."""
    from ..util import bind_once

    p = {**GOPHER_DEFAULTS, **overrides}
    t = F.coalesce(text, F.lit(""))

    # two bind_once levels (HOFs are CodegenFallback — an expression
    # referenced N times evaluates N times): first the three split+filter
    # arrays (words/lines/paras — the old body re-split the text ~10x per
    # row), then every measured metric (each is referenced twice below:
    # its rule boolean + its output field). Identical values, each
    # computed exactly once.
    def metrics(words: Column, lines: Column, paras: Column) -> Column:
        lower_words = F.transform(words, lambda w: F.lower(w))
        n_words = F.size(words)
        nw = F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(1.0))
        mean_wl = F.aggregate(F.transform(words, lambda w: F.length(w)),
                              F.lit(0), lambda a, x: a + x) / nw
        n_symbols = (F.size(F.filter(words, lambda w: w.contains("#")))
                     + F.size(F.filter(words, lambda w: w.contains("..."))))
        symbol_ratio = n_symbols / nw
        alpha_frac = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}"))) / nw
        stops = F.size(F.array_intersect(
            F.array_distinct(lower_words),
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS])))
        n_lines = F.when(F.size(lines) > 0,
                         F.size(lines).cast("double")).otherwise(F.lit(1.0))
        bullet_frac = F.size(F.filter(
            lines, lambda l: F.trim(l).rlike(r"^([-*•‣▪◦])"))
        ) / n_lines
        ellipsis_frac = F.size(F.filter(
            lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))) / n_lines
        return F.struct(
            n_words.alias("n_words"), mean_wl.alias("mean_wl"),
            symbol_ratio.alias("symbol_ratio"),
            bullet_frac.alias("bullet_frac"),
            ellipsis_frac.alias("ellipsis_frac"),
            alpha_frac.alias("alpha_frac"), stops.alias("stops"),
            _dup_fraction(lines).alias("dup_line"),
            _dup_fraction(paras).alias("dup_para"),
            _dup_char_fraction(lines).alias("dup_line_chars"),
            _dup_char_fraction(paras).alias("dup_para_chars"))

    def assemble(m: Column) -> Column:
        checks = {
            "word_count_ok": (m["n_words"] >= p["min_words"]) &
                             (m["n_words"] <= p["max_words"]),
            "mean_word_len_ok": (m["mean_wl"] >= p["min_mean_word_len"]) &
                                (m["mean_wl"] <= p["max_mean_word_len"]),
            "symbol_ratio_ok": m["symbol_ratio"] <= p["max_symbol_word_ratio"],
            "bullet_frac_ok": m["bullet_frac"] <= p["max_bullet_line_frac"],
            "ellipsis_frac_ok":
                m["ellipsis_frac"] <= p["max_ellipsis_line_frac"],
            "alpha_frac_ok": m["alpha_frac"] >= p["min_alpha_word_frac"],
            "stop_words_ok": m["stops"] >= p["min_stop_words"],
            "dup_line_ok": m["dup_line"] <= p["max_dup_line_frac"],
            "dup_para_ok": m["dup_para"] <= p["max_dup_para_frac"],
            "dup_line_chars_ok":
                m["dup_line_chars"] <= p["max_dup_line_char_frac"],
            "dup_para_chars_ok":
                m["dup_para_chars"] <= p["max_dup_para_char_frac"],
        }
        keep = None
        for c in checks.values():
            keep = c if keep is None else (keep & c)
        return F.struct(
            m["n_words"].alias("n_words"), m["mean_wl"].alias("mean_word_len"),
            m["symbol_ratio"].alias("symbol_word_ratio"),
            m["bullet_frac"].alias("bullet_line_frac"),
            m["ellipsis_frac"].alias("ellipsis_line_frac"),
            m["alpha_frac"].alias("alpha_word_frac"),
            m["stops"].alias("n_stop_words"),
            m["dup_line"].alias("dup_line_frac"),
            m["dup_para"].alias("dup_para_frac"),
            m["dup_line_chars"].alias("dup_line_char_frac"),
            m["dup_para_chars"].alias("dup_para_char_frac"),
            *[v.alias(k) for k, v in checks.items()],
            keep.alias("keep"))

    return bind_once(
        F.struct(_words(t).alias("w"), _lines(t).alias("l"),
                 F.filter(F.split(t, r"\n\n+"),
                          lambda x: F.length(F.trim(x)) > 0).alias("p")),
        lambda s: bind_once(metrics(s["w"], s["l"], s["p"]), assemble))


C4_BAD_SUBSTRINGS = ["lorem ipsum", "{", "javascript"]


def c4_rules(text: Column, min_sentence_words: int = 3,
             min_sentences: int = 3) -> Column:
    """C4 cleaning struct (Raffel et al. 2020 §2.2), line-level semantics
    folded per document:

    - ``clean_text``: only lines ending in terminal punctuation with >=
      ``min_sentence_words`` words and no policy phrase, re-joined,
    - per-rule booleans (enough sentences, no lorem ipsum, no code brace,
      no 'javascript' line) + ``keep``.
    """
    t = F.coalesce(text, F.lit(""))
    lines = F.split(t, r"\n")
    kept_lines = F.filter(lines, lambda l: (
        F.trim(l).rlike(r'[.!?"”]$')
        & (F.size(_words(l)) >= F.lit(min_sentence_words))
        & ~F.lower(l).contains("javascript")
        & ~F.lower(l).contains("lorem ipsum")
        & ~l.contains("{")))
    n_sentences = F.size(F.filter(
        F.split(t, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0))
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    checks = {
        "sentences_ok": n_sentences >= min_sentences,
        "no_lorem_ipsum": ~has_lorem,
        "no_code_brace": ~has_brace,
    }
    keep = None
    for c in checks.values():
        keep = c if keep is None else (keep & c)
    return F.struct(
        F.array_join(kept_lines, "\n").alias("clean_text"),
        n_sentences.alias("n_sentences"),
        *[v.alias(k) for k, v in checks.items()],
        keep.alias("keep"))


def repetition_metrics(df: DataFrame, id_col: str, text_col: str,
                       top_ngram: tuple[int, ...] = (2, 3, 4),
                       dup_ngram: tuple[int, ...] = (5, 10)) -> DataFrame:
    """Gopher n-gram repetition metrics, the within-document kind:

    - ``top{n}gram_char_frac``: characters in the single most frequent
      word n-gram, over document characters (Gopher drops at > 0.20/0.18/
      0.16 for n=2/3/4),
    - ``dup{n}gram_word_frac``: fraction of words covered by n-grams that
      occur more than once (approximated as the standard count-based form:
      words in non-first occurrences over total words).

    Shape: explode per-document word n-grams once per n -> groupBy
    (doc, gram) -> per-doc aggregate — linear in corpus tokens with one
    shuffle per n, then broadcast-free joins back on the id. Use AFTER the
    cheap expression rules pruned the obvious junk."""
    from ..util import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        _words(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("ws"))
    base = base.withColumn("n_words", F.size("ws")) \
        .withColumn("n_chars", F.length(F.array_join("ws", " ")))
    base = base.persist()
    out = base.select("doc", "n_words", "n_chars")
    for n, kind in [(n, "top") for n in top_ngram] + \
                   [(n, "dup") for n in dup_ngram]:
        grams = base.select(
            "doc", "n_words", "n_chars",
            F.explode(F.when(F.size("ws") >= n, F.transform(
                F.sequence(F.lit(1), F.size("ws") - F.lit(n - 1)),
                lambda i: F.array_join(F.slice("ws", i, n), " "))
            ).otherwise(F.array().cast("array<string>"))).alias("g"))
        counts = grams.groupBy("doc", "n_words", "n_chars", "g").agg(
            F.count(F.lit(1)).alias("cnt"))
        if kind == "top":
            best = F.max(F.struct(F.col("cnt"), F.length("g").alias("len")))
            per_doc = counts.groupBy("doc").agg(
                F.least(F.lit(1.0),
                        best.getField("len").cast("double")
                        * best.getField("cnt")
                        / F.greatest(F.first("n_chars"),
                                     F.lit(1)).cast("double")
                        ).alias(f"top{n}gram_char_frac"))
        else:
            per_doc = counts.groupBy("doc").agg(
                F.least(F.lit(1.0),
                        F.sum(F.when(F.col("cnt") > 1,
                                     F.col("cnt") * n).otherwise(0))
                        / F.greatest(F.first("n_words"),
                                     F.lit(1)).cast("double")
                        ).alias(f"dup{n}gram_word_frac"))
        out = out.join(per_doc, "doc", "left")
    fill = {c: 0.0 for c in out.columns if c.endswith("_frac")}
    return out.fillna(fill).withColumnRenamed("doc", id_col)


def quality_filter(df: DataFrame, id_col: str, text_col: str,
                   rules: str = "gopher", **overrides) -> DataFrame:
    """Apply a rule set and return (id, metrics struct, keep) — the
    composable filter step: ``.where("q.keep")`` downstream."""
    c = F.col(text_col)
    q = gopher_rules(c, **overrides) if rules == "gopher" else c4_rules(c)
    return (df.select(F.col(id_col), q.alias("q"))
            .withColumn("keep", F.col("q.keep")))


def blocklist_hits(text: Column, words: list[str]) -> Column:
    """Count of blocklisted words in a document (exact whole-word matches,
    case-insensitive) as a column expression. C4's "bad words" page filter
    (Raffel et al. 2020 §2.2 drops any page with a listed word) is
    ``blocklist_hits(text, words) == 0``; the list itself is deployment-
    supplied (C4 uses an external public list, not reproduced here).

    Expression form: distinct document tokens intersected with a literal
    array — fine to a few hundred words (the literal rides the plan). For
    larger lists use ``blocklist_filter(..., large=True)``.
    """
    toks = F.array_distinct(_words(F.lower(F.coalesce(text, F.lit("")))))
    lits = F.array(*[F.lit(w.lower()) for w in words])
    return F.size(F.array_intersect(toks, lits))


def blocklist_filter(df: DataFrame, text_col: str, words: list[str],
                     max_hits: int = 0, large: bool = False,
                     id_col: str | None = None) -> DataFrame:
    """Drop documents with more than ``max_hits`` blocklisted words.

    ``large=False``: pure expression (list rides the plan as a literal).
    ``large=True``: the 100k-word form — distinct document tokens explode
    once and probe a BROADCAST blocklist table; hit counts come back via
    one groupBy and a left join on a row id. Both paths agree (law-tested);
    pick by list size, not corpus size (the corpus passes once either way).

    The row id for the large path is ``id_col`` when the caller has one
    (must be unique per row — ``curate_corpus`` passes its ``doc_id``);
    otherwise a DETERMINISTIC xxhash64 over every column. It must never be
    ``monotonically_increasing_id``: that is order-dependent, and the two
    branches of the self-join may recompute the input with different
    partition-internal row orders (e.g. post-shuffle), silently
    mis-matching ids. The hash is stable under recomputation; identical
    rows share a hash, which is harmless here because they also share the
    same token set (hit counts are computed once per id from a
    deduplicated token source, and the left join is 1:N back onto the
    original rows).
    """
    if not large:
        return df.where(blocklist_hits(F.col(text_col), words) <= max_hits)
    spark = df.sparkSession
    bl = spark.createDataFrame([(w.lower(),) for w in set(words)],
                               "word string")
    if id_col is not None:
        with_id = df.withColumn("__rid", F.col(id_col))
    else:
        with_id = df.withColumn(
            "__rid", F.xxhash64(*[F.col(c) for c in df.columns]))
    toks = with_id.select(
        "__rid",
        F.array_distinct(
            _words(F.lower(F.coalesce(F.col(text_col), F.lit("")))))
        .alias("__toks")) \
        .dropDuplicates(["__rid"]) \
        .select("__rid", F.explode("__toks").alias("word"))
    hits = (toks.join(F.broadcast(bl), "word")
            .groupBy("__rid").agg(F.count(F.lit(1)).alias("__hits")))
    return (with_id.join(hits, "__rid", "left")
            .where(F.coalesce(F.col("__hits"), F.lit(0)) <= max_hits)
            .drop("__rid", "__hits"))
