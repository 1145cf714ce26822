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
from ..llm.textqual import STOPWORD_PROFILES

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
    from ..llm.textqual import stopword_ratio_tokens
    from ..util import bind_once

    profiles = profiles or STOPWORD_PROFILES
    langs = sorted(profiles)
    # one tokenize shared by every language's ratio (bind_once — each
    # per-language stopword_ratio would otherwise re-run the tokenizer)
    return bind_once(tokenize(c), lambda toks: F.map_from_arrays(
        F.array(*[F.lit(l) for l in langs]),
        F.array(*[stopword_ratio_tokens(toks, profiles[l])
                  for l in langs])))


def candidate_entities(c: Column, min_len: int = 2) -> Column:
    """Dependency-free entity candidates: runs of capitalized words
    (tokenized case-sensitively), as array<string>."""
    toks = F.split(c, r"[^\p{L}\p{N}']+")
    caps = F.filter(toks, lambda t: (F.length(t) >= min_len) &
                    t.rlike(r"^[A-Z][a-z']+$"))
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(caps)


# -- typed entity extraction (NameEntityRecognizer.scala:56 output shape:
# map<entity_type, tokens>; OpenNLP's TokenNameFinder replaced by chunking +
# gazetteer/affix classification, all Column expressions) --

# compact public gazetteers — literal arrays compiled into the plan. A real
# NER model slots in behind a pandas UDF without changing the output type.
LOCATION_GAZETTEER = [
    "america", "europe", "asia", "africa", "australia", "antarctica",
    "usa", "china", "india", "japan", "germany", "france", "britain",
    "england", "spain", "italy", "canada", "brazil", "mexico", "russia",
    "poland", "sweden", "norway", "egypt", "kenya", "nigeria", "argentina",
    "london", "paris", "berlin", "madrid", "rome", "moscow", "tokyo",
    "beijing", "shanghai", "delhi", "mumbai", "sydney", "toronto",
    "chicago", "boston", "seattle", "austin", "dallas", "miami",
    "texas", "california", "florida", "washington", "ohio", "georgia",
]
ORG_SUFFIXES = ["Inc", "Corp", "Corporation", "Ltd", "LLC", "GmbH", "AG",
                "SA", "Co", "Company", "Bank", "University", "Institute",
                "Labs", "Group", "Holdings", "Partners", "Foundation"]
HONORIFICS = ["Mr", "Mrs", "Ms", "Dr", "Prof", "Sir", "Madam", "Rev"]
MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]

_CHUNK_RE = r"[A-Z][A-Za-z']*(?: [A-Z][A-Za-z']*)*"


def _classify_chunk(chunk: Column) -> Column:
    """PERSON / LOCATION / ORGANIZATION / DATE / MISC for one capitalized
    chunk (honorific-led person detection happens on the raw text upstream,
    where the preceding-token context still exists)."""
    last = F.element_at(F.split(chunk, " "), -1)
    first = F.element_at(F.split(chunk, " "), 1)
    is_org = F.array_contains(
        F.array(*[F.lit(s) for s in ORG_SUFFIXES]), last) | \
        chunk.rlike(r"^[A-Z]{2,6}$")
    is_loc = F.array_contains(
        F.array(*[F.lit(g) for g in LOCATION_GAZETTEER]), F.lower(chunk)) | \
        F.array_contains(
            F.array(*[F.lit(g) for g in LOCATION_GAZETTEER]), F.lower(first))
    is_date = F.array_contains(F.array(*[F.lit(m) for m in MONTHS]), first)
    is_person = F.array_contains(
        F.array(*[F.lit(n) for n in FIRST_NAMES]), F.lower(first))
    return F.when(is_date, F.lit("DATE")) \
        .when(is_org, F.lit("ORGANIZATION")) \
        .when(is_loc, F.lit("LOCATION")) \
        .when(is_person, F.lit("PERSON")) \
        .otherwise(F.lit("MISC"))


def typed_entities(c: Column) -> Column:
    """map<string, array<string>> of typed entity candidates: capitalized
    chunks (multi-word runs kept together) classified by gazetteer, org
    suffix, acronym shape, month lead, or given-name lead; honorific-led
    names (``Dr Jane Roe``) force PERSON. The reference returns the same
    map-of-token-lists shape from OpenNLP (NameEntityRecognizer.scala:56).
    Pure expressions: dictionaries ride the plan, classification is a CASE.
    """
    hon_pat = "(?:%s)\\.? (%s)" % ("|".join(HONORIFICS), _CHUNK_RE)
    hon_people = F.regexp_extract_all(c, F.lit(hon_pat), 1)
    raw_chunks = F.regexp_extract_all(c, F.lit(f"({_CHUNK_RE})"), 1)
    # normalize: strip a leading honorific ("Dr Jane Roe" -> "Jane Roe") and
    # a leading sentence-capitalized function word ("The IBM" -> "IBM")
    lead_strip = "^(?:%s)\\.? |^(?:The|A|An|This|That|In|On|At|And|But|Or) " \
        % "|".join(HONORIFICS)
    chunks = F.array_distinct(F.transform(
        raw_chunks, lambda ch: F.regexp_replace(ch, lead_strip, "")))
    # drop leftovers that are bare honorifics/function words or empty
    chunks = F.filter(chunks, lambda ch: (F.length(ch) > 0) &
        ~F.array_contains(F.array(*[F.lit(h) for h in HONORIFICS]), ch) &
        ~F.lower(ch).isin("the", "a", "an", "this", "that", "it", "he",
                          "she", "they", "we", "i", "in", "on", "at"))
    tagged = F.transform(
        chunks, lambda ch: F.struct(
            F.when(F.array_contains(hon_people, ch), F.lit("PERSON"))
            .otherwise(_classify_chunk(ch)).alias("t"),
            ch.alias("e")))
    types = ["PERSON", "LOCATION", "ORGANIZATION", "DATE", "MISC"]
    entries = []
    for t in types:
        entries += [F.lit(t),
                    F.transform(F.filter(tagged, lambda s: s["t"] == t),
                                lambda s: s["e"])]
    empty = F.map_from_arrays(F.array().cast("array<string>"),
                              F.array().cast("array<array<string>>"))
    return F.when(c.isNull(), empty).otherwise(F.create_map(*entries))
