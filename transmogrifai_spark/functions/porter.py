"""The full Porter stemming algorithm as pure Catalyst expressions.

Reference: the English analyzer chain the reference routes text through
(utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala -> Lucene EnglishAnalyzer) stems with
PorterStemFilter — the COMPLETE 1980 Porter algorithm, not a light
suffix subset. Until now the en chain here shipped the
EnglishMinimalStemFilter behavior (plural-s only) and PARITY delta 1a
recorded "stems one step shallower" for English; this module closes
that arm exactly: all five steps of the published algorithm, including
the reference implementation's documented departures from the paper
(step 2 uses bli->ble rather than abli->able and adds logi->log) and
its leave-strings-of-length<=2-alone guard.

Everything is expression-level (no UDF): the consonant/vowel skeleton
is two regexp_replaces (vowels to a marker, then y-after-consonant to
the marker — Porter's y rule falls out of one left-to-right scan), the
measure m is one regexp_count of VC groups over that skeleton, and each
step is a longest-suffix-first CASE chain (the paper's "longest
matching S1 wins" rule; a failed condition on the matched suffix does
NOT fall through to a shorter one, exactly the published control flow).
Plan discipline: every step binds its input once as a transform-lambda
variable before the next step references it — naive chaining would
re-inline each step's whole expression into every reference the next
step makes and grow the plan exponentially over 7 stages (the
engine-wide bind-once rule).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["porter_stem", "porter_stem_py"]


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` once, pass the bound value to ``fn``."""
    return F.get(F.transform(F.array(col), fn), 0)


def _cv(s: Column) -> Column:
    """Consonant/vowel skeleton: vowels (and y-after-consonant) become
    'a', everything else keeps its letter (consonant). One left-to-right
    non-overlapping scan resolves Porter's y rule: after true vowels are
    marked, each y following a non-marker is itself a vowel, and the
    scan's consumption order handles runs of ys (yy after a vowel =
    consonant then vowel) exactly like the letter-by-letter definition."""
    return F.regexp_replace(F.regexp_replace(s, "[aeiou]", "a"),
                            "([^a])y", "$1a")


def _m(s: Column) -> Column:
    """Porter's measure: m in [C](VC)^m[V] = the number of maximal
    vowel-runs followed by a consonant."""
    return F.regexp_count(_cv(s), F.lit("a+[^a]+"))


def _has_vowel(s: Column) -> Column:
    return _cv(s).contains("a")


def _ends_double_c(s: Column) -> Column:
    """*d: ends with a double consonant (same letter twice, the last
    one a consonant under the y rule)."""
    return (F.length(s) >= 2) & \
        (s.substr(F.length(s) - 1, F.lit(1)) ==
         s.substr(F.length(s), F.lit(1))) & \
        F.regexp_like(_cv(s), F.lit("[^a]$"))


def _o(s: Column) -> Column:
    """*o: ends consonant-vowel-consonant where the final consonant is
    not w, x or y (a final y classified as a vowel already fails the
    cvc skeleton check)."""
    return F.regexp_like(_cv(s), F.lit("[^a]a[^a]$")) & \
        ~F.regexp_like(s, F.lit("[wxy]$"))


def _rules(w: Column, rules) -> Column:
    """One step's CASE chain: ``rules`` = [(suffix, replacement,
    cond(stem) or None), ...] in longest-first order. The FIRST matching
    suffix is selected; if its condition fails the word is unchanged
    (no fallthrough — the published semantics)."""
    out = w
    for sfx, repl, cond in reversed(rules):
        stem = w.substr(F.lit(1), F.length(w) - len(sfx))
        new = F.concat(stem, F.lit(repl)) if repl else stem
        val = new if cond is None else \
            F.when(cond(stem), new).otherwise(w)
        out = F.when(w.endswith(sfx), val).otherwise(out)
    return out


def _step1a(w: Column) -> Column:
    return _rules(w, [
        ("sses", "ss", None),
        ("ies", "i", None),
        ("ss", "ss", None),          # -ss stays
        ("s", "", None),
    ])


def _step1b(w: Column) -> Column:
    def adjust(t: Column) -> Column:
        # post-trim fixups after a (*v*) ed/ing removal
        grow = t.endswith("at") | t.endswith("bl") | t.endswith("iz")
        dd = _ends_double_c(t) & ~F.regexp_like(t, F.lit("[lsz]$"))
        cvc = (_m(t) == 1) & _o(t)
        return F.when(grow, F.concat(t, F.lit("e"))) \
            .when(dd, t.substr(F.lit(1), F.length(t) - 1)) \
            .when(cvc, F.concat(t, F.lit("e"))) \
            .otherwise(t)

    eed_stem = w.substr(F.lit(1), F.length(w) - 3)
    ed_stem = w.substr(F.lit(1), F.length(w) - 2)
    ing_stem = w.substr(F.lit(1), F.length(w) - 3)
    return F.when(w.endswith("eed"),
                  F.when(_m(eed_stem) > 0,
                         w.substr(F.lit(1), F.length(w) - 1))
                  .otherwise(w)) \
        .when(w.endswith("ed") & _has_vowel(ed_stem),
              _bind(ed_stem, adjust)) \
        .when(w.endswith("ing") & _has_vowel(ing_stem),
              _bind(ing_stem, adjust)) \
        .otherwise(w)


def _step1c(w: Column) -> Column:
    stem = w.substr(F.lit(1), F.length(w) - 1)
    return F.when(w.endswith("y") & _has_vowel(stem),
                  F.concat(stem, F.lit("i"))).otherwise(w)


_M0 = lambda stem: _m(stem) > 0          # noqa: E731
_M1 = lambda stem: _m(stem) > 1          # noqa: E731

_STEP2 = [
    ("ization", "ize", _M0), ("ational", "ate", _M0),
    ("iveness", "ive", _M0), ("fulness", "ful", _M0),
    ("ousness", "ous", _M0),
    ("tional", "tion", _M0), ("biliti", "ble", _M0),
    ("entli", "ent", _M0), ("ousli", "ous", _M0), ("ation", "ate", _M0),
    ("alism", "al", _M0), ("aliti", "al", _M0), ("iviti", "ive", _M0),
    ("enci", "ence", _M0), ("anci", "ance", _M0), ("izer", "ize", _M0),
    ("alli", "al", _M0), ("ator", "ate", _M0),
    ("logi", "log", _M0),                # reference-impl departure
    ("bli", "ble", _M0),                 # reference-impl departure
    ("eli", "e", _M0),
]

_STEP3 = [
    ("icate", "ic", _M0), ("ative", "", _M0), ("alize", "al", _M0),
    ("iciti", "ic", _M0),
    ("ical", "ic", _M0), ("ness", "", _M0),
    ("ful", "", _M0),
]

_STEP4 = [
    ("ement", "", _M1),
    ("ance", "", _M1), ("ence", "", _M1), ("able", "", _M1),
    ("ible", "", _M1), ("ment", "", _M1),
    ("ant", "", _M1), ("ent", "", _M1), ("ism", "", _M1),
    ("ate", "", _M1), ("iti", "", _M1), ("ous", "", _M1),
    ("ive", "", _M1), ("ize", "", _M1),
    ("ion", "", lambda stem: _M1(stem) &
     F.regexp_like(stem, F.lit("[st]$"))),
    ("al", "", _M1), ("er", "", _M1), ("ic", "", _M1), ("ou", "", _M1),
]


def _step5(w: Column) -> Column:
    stem = w.substr(F.lit(1), F.length(w) - 1)
    a = _m(w)   # a trailing vowel never completes a VC, so m(word
    #             with final e) == m(stem) — one skeleton pass suffices
    drop_e = w.endswith("e") & ((a > 1) | ((a == 1) & ~_o(stem)))
    after_e = F.when(drop_e, stem).otherwise(w)

    def step5b(t: Column) -> Column:
        return F.when(t.endswith("ll") & (_m(t) > 1),
                      t.substr(F.lit(1), F.length(t) - 1)).otherwise(t)

    return _bind(after_e, step5b)


def porter_stem(t: Column) -> Column:
    """Stem one (lowercase) token with the complete Porter algorithm.
    Strings of length <= 2 and NULLs pass through untouched (the
    reference implementation's guard). Non-letters are treated as
    consonants, as in the reference implementation."""
    chain = _bind(t, lambda w0:
                  _bind(_step1a(w0), lambda w1:
                        _bind(_step1b(w1), lambda w2:
                              _bind(_step1c(w2), lambda w3:
                                    _bind(_rules(w3, _STEP2), lambda w4:
                                          _bind(_rules(w4, _STEP3),
                                                lambda w5:
                                                _bind(_rules(w5, _STEP4),
                                                      _step5)))))))
    return F.when(F.length(t) <= 2, t).otherwise(chain)


# ---------------------------------------------------------------------------
# pure-Python mirror — the law-test partner (and a readable statement of
# the algorithm the expressions implement)

_VOWELS = set("aeiou")


def _cv_py(s: str) -> str:
    out = []
    for i, ch in enumerate(s):
        if ch in _VOWELS:
            out.append("a")
        elif ch == "y" and i > 0 and out[i - 1] != "a":
            out.append("a")
        else:
            out.append(ch)
    return "".join(out)


def _m_py(s: str) -> int:
    import re
    return len(re.findall(r"a+[^a]+", _cv_py(s)))


def _has_vowel_py(s: str) -> bool:
    return "a" in _cv_py(s)


def _dbl_py(s: str) -> bool:
    return len(s) >= 2 and s[-1] == s[-2] and _cv_py(s)[-1] != "a"


def _o_py(s: str) -> bool:
    import re
    return bool(re.search(r"[^a]a[^a]$", _cv_py(s))) and \
        s[-1] not in "wxy"


def _rules_py(w: str, rules) -> str:
    for sfx, repl, cond in rules:
        if w.endswith(sfx):
            stem = w[:len(w) - len(sfx)]
            if cond is None or cond(stem):
                return stem + repl
            return w
    return w


def porter_stem_py(w: str) -> str:
    """The same algorithm in plain Python (used by the equality law and
    handy driver-side, e.g. for stemming stopword lists once)."""
    if w is None or len(w) <= 2:
        return w
    # step 1a
    w = _rules_py(w, [("sses", "ss", None), ("ies", "i", None),
                      ("ss", "ss", None), ("s", "", None)])
    # step 1b
    if w.endswith("eed"):
        if _m_py(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel_py(w[:-2]):
        w = _adjust_py(w[:-2])
    elif w.endswith("ing") and _has_vowel_py(w[:-3]):
        w = _adjust_py(w[:-3])
    # step 1c
    if w.endswith("y") and _has_vowel_py(w[:-1]):
        w = w[:-1] + "i"
    m0 = lambda s: _m_py(s) > 0          # noqa: E731
    m1 = lambda s: _m_py(s) > 1          # noqa: E731
    w = _rules_py(w, [(s, r, m0) for s, r, _ in _STEP2])
    w = _rules_py(w, [(s, r, m0) for s, r, _ in _STEP3])
    step4 = [(s, r, m1) if s != "ion" else
             (s, r, lambda st: _m_py(st) > 1 and st[-1:] in ("s", "t"))
             for s, r, _ in _STEP4]
    w = _rules_py(w, step4)
    # step 5a
    if w.endswith("e"):
        a = _m_py(w)
        if a > 1 or (a == 1 and not _o_py(w[:-1])):
            w = w[:-1]
    # step 5b
    if w.endswith("ll") and _m_py(w) > 1:
        w = w[:-1]
    return w


def _adjust_py(t: str) -> str:
    if t.endswith(("at", "bl", "iz")):
        return t + "e"
    if _dbl_py(t) and t[-1] not in "lsz":
        return t[:-1]
    if _m_py(t) == 1 and _o_py(t):
        return t + "e"
    return t
