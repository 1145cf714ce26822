"""Property-based law for the two lexicon-segmentation forms: on RANDOM
lexicons (random words, lengths, costs — including adversarial overlaps
and single-char dictionary entries) and random texts, the broadcast-join
dp must land on byte-identical tokens as the plan-literal dp, and both
must equal an independent pure-Python Viterbi with the same tie rule.

One Spark job per hypothesis example (a whole batch of texts rides one
DataFrame), few examples — the monoid-laws budget pattern.
"""
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from transmogrifai_spark.functions.text import lexicon_segment
from transmogrifai_spark.operators.segmentation import lexicon_segment_join

_ALPHABET = "中国人民银行大"
_COSTS = [0.25, 0.5, 1.0, 1.5, 2.0, 3.5]

words = st.text(alphabet=_ALPHABET, min_size=1, max_size=4)
lexicons = st.dictionaries(words, st.sampled_from(_COSTS),
                           min_size=1, max_size=12)
texts = st.lists(st.text(alphabet=_ALPHABET, min_size=0, max_size=10),
                 min_size=1, max_size=12)


def _py_viterbi(s, lex, unknown_cost=2.0):
    L = max(len(w) for w in lex)
    INF = float("inf")
    dp = [(0.0, -1)] + [(INF, -1)] * len(s)
    for j in range(1, len(s) + 1):
        best = (INF, -1)
        for i in range(max(0, j - L), j):
            w = s[i:j]
            c = lex.get(w, unknown_cost if j - i == 1 else INF)
            cand = (dp[i][0] + c, i)
            if cand < best:
                best = cand
        dp[j] = best
    toks, pos = [], len(s)
    while pos > 0:
        toks.append(s[dp[pos][1]:pos])
        pos = dp[pos][1]
    return toks[::-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lex=lexicons, ts=texts)
def test_join_form_equals_literal_form_and_python(spark, lex, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "i long, t string")
    lex_df = spark.createDataFrame([(w, float(c)) for w, c in lex.items()],
                                   "word string, cost double")
    lit_out = {r["i"]: list(r["s"]) for r in df.select(
        "i", lexicon_segment(F.col("t"), dict(lex)).alias("s")).collect()}
    join_out = {r["i"]: list(r["tokens"]) for r in
                lexicon_segment_join(df, "t", lex_df)
                .select("i", "tokens").collect()}
    assert join_out == lit_out
    for i, t in enumerate(ts):
        want = _py_viterbi(t, lex) if t else []
        assert lit_out[i] == want, (t, sorted(lex), lit_out[i], want)


_CLASSES = ["N", "V", "P"]
lat_lexicons = st.dictionaries(
    words, st.tuples(st.sampled_from([50.0, 100.0, 200.0, 400.0]),
                     st.sampled_from(_CLASSES)),
    min_size=1, max_size=10)
conns = st.dictionaries(
    st.tuples(st.sampled_from(_CLASSES + ["BOS"]),
              st.sampled_from(_CLASSES + ["EOS"])),
    st.sampled_from([0.0, 5.0, 20.0, 90.0]),
    max_size=10)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lex=lat_lexicons, conn=conns,
       ts=st.lists(st.text(alphabet=_ALPHABET, min_size=0, max_size=8),
                   min_size=1, max_size=8))
def test_lattice_join_form_equals_literal_form_random(spark, lex, conn, ts):
    """Random dictionaries, class assignments, and connection matrices:
    the broadcast-join lattice dp equals the plan-literal lattice dp
    (token, cls) for (token, cls) — the shared-core law under
    adversarial inputs, unknown chars and BOS/EOS transitions included."""
    from transmogrifai_spark.functions.text import lexicon_segment_lattice
    from transmogrifai_spark.operators.segmentation import (
        lexicon_segment_lattice_join)
    conn = {(p, t): c for (p, t), c in conn.items()
            if p != "EOS" and t != "BOS"}
    df = spark.createDataFrame(list(enumerate(ts)), "i long, t string")
    lexd = spark.createDataFrame(
        [(w, float(c), k) for w, (c, k) in lex.items()],
        "word string, cost double, cls string")
    lit_out = {r["i"]: [(e["token"], e["cls"]) for e in r["s"]]
               for r in df.select("i", lexicon_segment_lattice(
                   F.col("t"), dict(lex), dict(conn),
                   unknown_cost=300.0).alias("s")).collect()}
    join_out = {r["i"]: [(e["token"], e["cls"]) for e in r["morphemes"]]
                for r in lexicon_segment_lattice_join(
                    df, "t", lexd, conn=dict(conn), unknown_cost=300.0)
                .select("i", "morphemes").collect()}
    assert join_out == lit_out
