"""Dictionary (lexicon) segmentation for unsegmented scripts
(functions/text.lexicon_segment / analyze_lexicon).

Reference: utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala — Kuromoji (ja) / SmartChineseAnalyzer (zh) /
ThaiAnalyzer (th) are dictionary + least-cost-path segmenters whose
dictionaries ship as binary assets; here the Viterbi lattice is the
code and the dictionary is supplied by the caller.
"""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.functions.text import (analyze_cjk,
                                                analyze_lexicon,
                                                lexicon_segment)

# tiny zh lexicon (real words): 中国 China, 人民 people, 银行 bank,
# 中国人 Chinese person, 北京 Beijing, 大学 university, 生 …
_ZH = ["中国", "人民", "银行", "中国人", "民银", "北京", "大学", "学生",
       "我", "是", "的"]
# Thai: สวัสดี hello, ครับ polite-m, เมือง city, ไทย Thai
_TH = ["สวัสดี", "ครับ", "เมือง", "ไทย", "คน"]


def _seg(spark, text, lexicon, **kw):
    df = spark.createDataFrame([(text,)], "t string")
    return list(df.select(
        lexicon_segment(F.col("t"), lexicon, **kw).alias("s")).first()["s"])


def test_viterbi_recovers_concatenated_words(spark):
    assert _seg(spark, "中国人民银行", _ZH) == ["中国", "人民", "银行"]
    assert _seg(spark, "北京大学学生", _ZH) == ["北京", "大学", "学生"]
    assert _seg(spark, "สวัสดีครับ", _TH) == ["สวัสดี", "ครับ"]
    # empty / NULL
    assert _seg(spark, "", _ZH) == []
    df = spark.createDataFrame([(None,)], "t string")
    assert list(df.select(lexicon_segment(F.col("t"), _ZH).alias("s"))
                .first()["s"]) == []


def test_least_cost_beats_greedy_and_costs_steer(spark):
    """The classic MaxMatch failure: greedy longest-first takes 中国人
    then strands 民银行 into worse pieces; Viterbi min-cost picks the
    globally cheaper 中国 人民 银行 (3 words) over 中国人 民银 行
    (2 words + 1 unknown char at higher cost). Explicit costs flip the
    choice."""
    # uniform costs: 3*1.0 = 3.0 beats 1.0+1.0+2.0 (unknown 行) = 4.0
    assert _seg(spark, "中国人民银行", _ZH) == ["中国", "人民", "银行"]
    # steer with costs: cheap 中国人 + 民银 beats every alternative
    # (0.1 + 0.4 + 2.0 = 2.5 vs 中国人+民+银行 = 3.1 vs 中国+人民+银行 = 7)
    costed = {w: 1.0 for w in _ZH}
    costed["中国人"] = 0.1
    costed["民银"] = 0.4
    costed["人民"] = 5.0
    assert _seg(spark, "中国人民银行", costed) == ["中国人", "民银", "行"]


def test_unknown_chars_isolate_and_ties_prefer_longer(spark):
    # 行 is not in the lexicon: isolated single-char token
    assert _seg(spark, "银行行", _ZH) == ["银行", "行"]
    # wholly-unknown text: per-char tokens
    assert _seg(spark, "abc", _ZH, unknown_cost=0.5) == ["a", "b", "c"]
    # tie (same total cost): longer leading word preferred
    lex = {"ab": 1.0, "a": 0.5, "b": 0.5}
    assert _seg(spark, "ab", lex) == ["ab"]


def test_analyze_lexicon_routes_runs(spark):
    """CJK/Thai runs segment through the lexicon; embedded Latin words
    pass through in position (the analyze_cjk chain shape)."""
    df = spark.createDataFrame(
        [(0, "我是 Spark 学生"), (1, "中国人民银行 opened"),
         (2, "สวัสดีครับ hello")],
        "i long, t string")
    out = {r["i"]: list(r["s"]) for r in df.select(
        "i", analyze_lexicon(F.col("t"), _ZH + _TH).alias("s")).collect()}
    assert out[0] == ["我", "是", "spark", "学生"]
    assert out[1] == ["中国", "人民", "银行", "opened"]
    assert out[2] == ["สวัสดี", "ครับ", "hello"]
    # vs the bigram chain: same routing, different CJK tokenization
    big = df.where(F.col("i") == 1).select(
        analyze_cjk(F.col("t")).alias("s")).first()["s"]
    assert list(big) == ["中国", "国人", "人民", "民银", "银行", "opened"]


def test_python_viterbi_mirror(spark):
    """Engine segmentation equals a reference python Viterbi on random
    concatenations — the lattice/backtrack law."""
    import itertools

    lex = {w: 1.0 for w in _ZH}
    L = max(len(w) for w in lex)

    def py_viterbi(s, unknown_cost=2.0):
        n = len(s)
        INF = float("inf")
        dp = [(0.0, -1)] + [(INF, -1)] * n
        for j in range(1, n + 1):
            best = (INF, -1)
            for i in range(max(0, j - L), j):
                w = s[i:j]
                c = lex.get(w, unknown_cost if j - i == 1 else INF)
                cand = (dp[i][0] + c, i)
                if cand < best:
                    best = cand
            dp[j] = best
        toks, pos = [], n
        while pos > 0:
            toks.append(s[dp[pos][1]:pos])
            pos = dp[pos][1]
        return toks[::-1]

    texts = ["".join(p) for p in
             itertools.islice(itertools.permutations(
                 ["中国", "人民", "银行", "我", "是"], 3), 12)]
    texts += ["中国人学生", "我是的中国人民"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {r["t"]: list(r["s"]) for r in df.select(
        "t", lexicon_segment(F.col("t"), lex).alias("s")).collect()}
    for t in texts:
        assert got[t] == py_viterbi(t), t
