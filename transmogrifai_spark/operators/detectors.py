"""Detection operators: human names, language confidences, entity-ish tags.

Re-expression of:
  * HumanNameDetector  core/.../impl/feature/HumanNameDetector.scala:56,87
    (dictionaries in core/.../utils/stages/NameDetectUtils.scala; output is
    the NameStats map type) — here a broadcast-dictionary membership check
    over a compact built-in first-name list, expression-only.
  * LangDetector       core/.../impl/feature/LangDetector.scala:46 — language
    -> RealMap of confidences (the reference wraps Optimaize); here the
    stopword-profile scores of llm/textqual.py emitted as a map column.
  * NameEntityRecognizer  NameEntityRecognizer.scala:56 — the reference wraps
    OpenNLP; the dependency-free rebuild tags capitalized-token runs as
    candidate entities (a real NER library can slot in behind a pandas UDF).

All pure Column expressions; the dictionaries are literal arrays compiled
into the plan (broadcast-equivalent, zero shuffle).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..llm.textqual import STOPWORD_PROFILES, stopword_ratio

# compact built-in given-name dictionary (NameDetectUtils ships a large one;
# the operator contract is identical — swap the list for a fuller dictionary)
FIRST_NAMES = [
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael",
    "linda", "william", "elizabeth", "david", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "maria",
    "anna", "jose", "juan", "luis", "carlos", "ana", "wei", "li", "chen",
]


# given-name -> gender for the dictionary above (NameDetectUtils'
# GenderDictionary analogue; unisex/unknown -> U). Public census-style facts.
GENDER_BY_NAME = {
    "james": "M", "john": "M", "robert": "M", "michael": "M", "william": "M",
    "david": "M", "richard": "M", "joseph": "M", "thomas": "M", "charles": "M",
    "jose": "M", "juan": "M", "luis": "M", "carlos": "M",
    "mary": "F", "patricia": "F", "jennifer": "F", "linda": "F",
    "elizabeth": "F", "barbara": "F", "susan": "F", "jessica": "F",
    "sarah": "F", "karen": "F", "maria": "F", "anna": "F", "ana": "F",
    "wei": "U", "li": "U", "chen": "U",
}


def name_stats(c: Column, threshold: float = 0.5,
               include_gender: bool = False) -> Column:
    """HumanNameDetector: fraction of tokens found in the name dictionary +
    is-name flag, as a NameStats-like map<string,string>.

    ``include_gender=True`` adds the reference NameStats genderValue
    (NameDetectUtils.GenderDictionary): majority gender among dictionary-hit
    tokens, ties/none -> "U". Opt-in so the default output shape (and its
    oracle SQL) stays frozen."""
    toks = tokenize(c)
    dict_arr = F.array(*[F.lit(n) for n in FIRST_NAMES])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(dict_arr, t)))
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))
    keys = [F.lit("isName"), F.lit("nameRatio")]
    vals = [(ratio >= threshold).cast("string"), ratio.cast("string")]
    if include_gender:
        males = F.array(*[F.lit(k) for k, g in GENDER_BY_NAME.items() if g == "M"])
        females = F.array(*[F.lit(k) for k, g in GENDER_BY_NAME.items() if g == "F"])
        m = F.size(F.filter(toks, lambda t: F.array_contains(males, t)))
        f = F.size(F.filter(toks, lambda t: F.array_contains(females, t)))
        gender = F.when(m > f, F.lit("M")).when(f > m, F.lit("F")).otherwise(F.lit("U"))
        keys.append(F.lit("genderValue"))
        vals.append(gender)
    return F.map_from_arrays(F.array(*keys), F.array(*vals))


def is_human_name(c: Column, threshold: float = 0.5) -> Column:
    toks = tokenize(c)
    dict_arr = F.array(*[F.lit(n) for n in FIRST_NAMES])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(dict_arr, t)))
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))
    return ratio >= threshold


def language_scores(c: Column, profiles: dict[str, list[str]] | None = None) -> Column:
    """LangDetector.scala:46 — RealMap of per-language confidences
    (stopword-profile scores; keys sorted for determinism)."""
    profiles = profiles or STOPWORD_PROFILES
    langs = sorted(profiles)
    return F.map_from_arrays(
        F.array(*[F.lit(l) for l in langs]),
        F.array(*[stopword_ratio(c, profiles[l]) for l in langs]))


def candidate_entities(c: Column, min_len: int = 2) -> Column:
    """Dependency-free entity candidates: runs of capitalized words
    (tokenized case-sensitively), as array<string>."""
    toks = F.split(c, r"[^\p{L}\p{N}']+")
    caps = F.filter(toks, lambda t: (F.length(t) >= min_len) &
                    t.rlike(r"^[A-Z][a-z']+$"))
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(caps)
