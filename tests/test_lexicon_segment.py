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


def test_lattice_connection_costs_disambiguate(spark):
    """Full-lattice (Kuromoji cost model) laws: word costs + class
    transition costs jointly decide the path; flipping the connection
    matrix flips the classic 東京|都 vs 東|京都 ambiguity; BOS/EOS
    transitions and unknown-char tagging work; empty/NULL -> empty."""
    from transmogrifai_spark.functions.text import lexicon_segment_lattice

    lex = {"東京": (1.0, "NOUN"), "京都": (1.0, "NOUN"), "東": (1.0, "NOUN"),
           "都": (1.0, "SUF"), "に": (0.5, "PART"), "行く": (1.0, "VERB")}
    conn = {("NOUN", "SUF"): 0.0, ("NOUN", "NOUN"): 2.0,
            ("SUF", "PART"): 0.0, ("NOUN", "PART"): 0.5,
            ("PART", "VERB"): 0.0, ("BOS", "NOUN"): 0.0}
    df = spark.createDataFrame([("東京都に行く",), ("",), (None,)],
                               "t string")

    def run(cn):
        rows = df.select(
            lexicon_segment_lattice(F.col("t"), lex, cn).alias("r")).collect()
        return [[(x["token"], x["cls"]) for x in (r["r"] or [])]
                for r in rows]

    out = run(conn)
    assert out[0] == [("東京", "NOUN"), ("都", "SUF"), ("に", "PART"),
                      ("行く", "VERB")]
    assert out[1] == [] and out[2] == []
    flip = dict(conn)
    flip[("NOUN", "SUF")] = 3.0
    flip[("NOUN", "NOUN")] = 0.0
    assert run(flip)[0][:2] == [("東", "NOUN"), ("京都", "NOUN")]
    # BOS cost is a sunk constant over same-class starts: raising
    # BOS->NOUN cannot change the argmin among NOUN-starting paths
    bos = dict(conn)
    bos[("BOS", "NOUN")] = 50.0
    assert run(bos)[0] == out[0]
    # unknown-char tagging: a leading char outside the lexicon isolates
    # as a single UNK token and the rest still segments
    df2 = spark.createDataFrame([("q東京都に行く",)], "t string")
    r = df2.select(lexicon_segment_lattice(F.col("t"), lex, conn)
                   .alias("r")).first()["r"]
    typed = [(x["token"], x["cls"]) for x in r]
    assert typed[0] == ("q", "UNK")
    assert typed[1:] == [("東京", "NOUN"), ("都", "SUF"), ("に", "PART"),
                         ("行く", "VERB")]


def test_lattice_python_viterbi_mirror(spark):
    """Engine lattice == reference python class-transition Viterbi on
    random word concatenations (costs, backpointers, tie rules)."""
    from transmogrifai_spark.functions.text import lexicon_segment_lattice

    lex = {"ab": (1.0, "X"), "a": (0.8, "Y"), "b": (0.7, "Y"),
           "ba": (1.1, "X"), "aa": (0.9, "Z")}
    conn = {("BOS", "X"): 0.2, ("BOS", "Y"): 0.0,
            ("X", "Y"): 0.1, ("Y", "X"): 0.4, ("Y", "Y"): 0.6,
            ("X", "X"): 0.3, ("Z", "Y"): 0.0, ("Y", "Z"): 0.2,
            ("X", "EOS"): 0.0, ("Y", "EOS"): 0.3}
    classes = sorted({cls for _, cls in lex.values()} | {"UNK"})
    ci = {cl: i for i, cl in enumerate(classes)}
    L, INF, UNK_COST = 2, float("inf"), 2.0

    def py_lattice(s):
        n = len(s)
        dp = [[(0.0 if j == 0 else INF, -1, -1) for _ in classes]
              for j in range(n + 1)]
        for j in range(1, n + 1):
            for t, tc in enumerate(classes):
                best = (INF, -1, -1)
                for i in range(max(0, j - L), j):
                    w = s[i:j]
                    if w in lex:
                        wc, wcls = lex[w]
                    elif j - i == 1:
                        wc, wcls = UNK_COST, "UNK"
                    else:
                        continue
                    if ci[wcls] != t:
                        continue
                    if i == 0:
                        pc, pk = conn.get(("BOS", tc), 0.0), -1
                    else:
                        pc, pk = min(
                            (dp[i][p][0] + conn.get((classes[p], tc), 0.0),
                             p) for p in range(len(classes)))
                    cand = (wc + pc, i, pk)
                    if cand < best:
                        best = cand
                dp[j][t] = best
            # match the engine: unreachable (INF) cells keep bpi from the
            # window min — irrelevant since INF never wins a real path
        endc, endk = min((dp[n][t][0] + conn.get((classes[t], "EOS"), 0.0),
                          t) for t in range(len(classes)))
        toks, pos, k = [], n, endk
        while pos > 0:
            _, bpi, bpc = dp[pos][k]
            toks.append((s[bpi:pos], classes[k]))
            pos, k = bpi, bpc
        return toks[::-1]

    import itertools
    texts = ["".join(p) for p in itertools.product("ab", repeat=5)][:20]
    texts += ["abba", "aabb", "baab", "abcba"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {r["t"]: [(x["token"], x["cls"]) for x in r["r"]] for r in
           df.select("t", lexicon_segment_lattice(
               F.col("t"), lex, conn).alias("r")).collect()}
    for t in texts:
        assert got[t] == py_lattice(t), t


def test_lattice_degenerates_to_plain_viterbi(spark):
    """Coherence law tying the two segmenters: with a single class and an
    empty connection matrix, the full lattice's total cost reduces to the
    plain Viterbi objective, so its token sequence EQUALS lexicon_segment
    on every input (and every token carries that one class)."""
    from transmogrifai_spark.functions.text import (analyze_lexicon_lattice,
                                                    lexicon_segment_lattice)

    plain_lex = {w: 1.0 for w in _ZH}
    typed_lex = {w: (1.0, "W") for w in _ZH}
    texts = ["中国人民银行", "北京大学学生", "银行行", "我是的中国人民",
             "中国人学生", "abc"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    both = df.select(
        "t",
        lexicon_segment(F.col("t"), plain_lex).alias("p"),
        lexicon_segment_lattice(F.col("t"), typed_lex, {}).alias("l")).collect()
    for r in both:
        lat = [(x["token"], x["cls"]) for x in r["l"]]
        assert [tk for tk, _ in lat] == list(r["p"]), r["t"]
        # known words tagged W, unknown chars UNK
        for tk, cl in lat:
            assert cl == ("W" if tk in plain_lex else "UNK"), (tk, cl)
    # the analyzer-chain form routes runs identically to analyze_lexicon
    mixed = spark.createDataFrame([("中国人民银行 opened",)], "t string")
    out = mixed.select(analyze_lexicon_lattice(
        F.col("t"), typed_lex, {}).alias("s")).first()["s"]
    assert list(out) == ["中国", "人民", "银行", "opened"]
