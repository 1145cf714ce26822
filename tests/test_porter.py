"""Full Porter stemmer (functions/porter.py) — expression == published
algorithm, pinned on the paper's own step examples and property-tested
against the pure-Python mirror.

Reference: utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala — the English chain is Lucene's
EnglishAnalyzer, whose stemmer is the complete Porter algorithm.
"""
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transmogrifai_spark.functions.porter import porter_stem, porter_stem_py

# (input, expected) — the 1980 paper's worked examples per step, run as
# whole words (none is altered by an earlier step than the one it
# illustrates), plus the reference implementation's documented
# departures (bli->ble, logi->log) and its length<=2 guard
_PINNED = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b (+ fixups)
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2 (note: several of the paper's step-2 inputs reach step 3/4
    # afterwards as whole words — expectations are end-to-end)
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"),
    ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"),
    ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("conformabli", "conform"), ("analogi", "analog"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"),
    ("homologou", "homolog"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # classics / guards
    ("generalizations", "gener"), ("oscillators", "oscil"),
    ("this", "thi"), ("running", "run"), ("quickly", "quickli"),
    ("as", "as"), ("is", "is"), ("be", "be"), ("ox", "ox"), ("a", "a"),
]


def test_python_mirror_pinned():
    """The mirror IS the published algorithm on the paper's examples."""
    bad = [(w, porter_stem_py(w), want)
           for w, want in _PINNED if porter_stem_py(w) != want]
    assert bad == []


def test_expression_matches_pinned(spark):
    df = spark.createDataFrame([(w,) for w, _ in _PINNED], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", porter_stem(F.col("w")).alias("s")).collect()}
    bad = [(w, got[w], want) for w, want in _PINNED if got[w] != want]
    assert bad == []


def test_expression_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("",)], "w string")
    got = [r["s"] for r in
           df.select(porter_stem(F.col("w")).alias("s")).collect()]
    assert got == [None, ""]


# random lowercase words biased toward the algorithm's trigger
# morphology (suffixes, y, doubles, e-endings)
_word = st.one_of(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
            max_size=12),
    st.tuples(
        st.text(alphabet="abcdefghilmnoprstuvyz", min_size=1, max_size=6),
        st.sampled_from(["sses", "ies", "ss", "s", "eed", "ed", "ing",
                         "y", "ational", "tional", "enci", "izer",
                         "bli", "alli", "entli", "ization", "ation",
                         "ator", "alism", "fulness", "aliti", "iviti",
                         "biliti", "logi", "icate", "ative", "alize",
                         "ical", "ful", "ness", "ance", "ence", "er",
                         "able", "ement", "ment", "ent", "ion", "ism",
                         "ate", "iti", "ous", "ive", "ize", "ll", "e"]),
    ).map(lambda p: p[0] + p[1]),
)


@pytest.mark.slow
@settings(max_examples=30, deadline=None)
@given(st.lists(_word, min_size=1, max_size=40, unique=True))
def test_expression_equals_mirror_on_random_words(spark, words):
    """THE law: the Catalyst expression stems every random word exactly
    like the pure-Python statement of the algorithm."""
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", porter_stem(F.col("w")).alias("s")).collect()}
    want = {w: porter_stem_py(w) for w in words}
    assert got == want


def test_analyze_en_routes_through_porter(spark):
    from transmogrifai_spark.functions.text import analyze
    df = spark.createDataFrame(
        [("the cats are generalizations of running oscillators",)],
        "t string")
    out = df.select(analyze(F.col("t"), "en").alias("a")).first()["a"]
    assert out == ["cat", "gener", "run", "oscil"]
