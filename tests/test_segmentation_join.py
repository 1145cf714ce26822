"""Broadcast-join lexicon segmentation (operators/segmentation.py) — the
dictionary-as-DATA scale form of functions/text.lexicon_segment — plus the
MeCab/IPADIC public-format dictionary loader.

Reference: utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala (Kuromoji tier) — its ~400k-entry dictionary is
data; the join form carries it as a broadcast DataFrame instead of a
plan-literal map.
"""
import itertools

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.functions.text import (lexicon_segment,
                                                lexicon_segment_lattice)
from transmogrifai_spark.operators.segmentation import (lexicon_segment_join,
                                                        load_mecab_dict,
                                                        load_mecab_matrix,
                                                        mecab_lattice_model)

_ZH = ["中国", "人民", "银行", "中国人", "民银", "北京", "大学", "学生",
       "我", "是", "的"]


def _lex_df(spark, lexicon):
    return spark.createDataFrame(
        [(w, float(c)) for w, c in lexicon.items()], "word string, cost double")


def test_join_form_equals_literal_form(spark):
    """THE law: the broadcast-join dp lands on byte-identical tokens as
    the plan-literal dp on any lexicon — costed, tied, unknown-heavy,
    empty and NULL inputs included."""
    lexicon = {w: 1.0 for w in _ZH}
    lexicon["中国人"] = 0.1
    lexicon["民银"] = 0.4
    lexicon["人民"] = 5.0
    texts = ["".join(p) for p in itertools.islice(
        itertools.permutations(["中国", "人民", "银行", "我", "是"], 3), 10)]
    texts += ["中国人民银行", "银行行", "abc", "中国人学生", "", None,
              "ab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    lit_out = {r["i"]: list(r["s"]) for r in df.select(
        "i", lexicon_segment(F.col("t"), lexicon).alias("s")).collect()}
    join_out = {r["i"]: list(r["tokens"]) for r in
                lexicon_segment_join(df, "t", _lex_df(spark, lexicon))
                .select("i", "tokens").collect()}
    assert join_out == lit_out


def test_join_form_tie_and_unknown_rules(spark):
    """Tie prefers the longer leading word; single chars covered by the
    dictionary use the dictionary cost, not unknown_cost — the
    coalesce rule of the literal form."""
    lex = {"ab": 1.0, "a": 0.5, "b": 0.5}
    df = spark.createDataFrame([(0, "ab"), (1, "abc")], "i long, t string")
    out = {r["i"]: list(r["tokens"]) for r in
           lexicon_segment_join(df, "t", _lex_df(spark, lex))
           .select("i", "tokens").collect()}
    assert out[0] == ["ab"]
    assert out[1] == ["ab", "c"]


def test_join_form_plan_shape(spark):
    """Scale contract: the dictionary reaches the plan through ONE
    broadcast join — no multi-MB map literal re-parsed per query. A
    sentinel word long enough to never appear as plan boilerplate must
    be absent from the explain text, and exactly one broadcast
    exchange must feed the candidate join."""
    sentinel = "züxqwortfolge"
    lex = {w: 1.0 for w in _ZH}
    lex[sentinel] = 0.5
    df = spark.createDataFrame([(0, "中国人民银行")], "i long, t string")
    out = lexicon_segment_join(df, "t", _lex_df(spark, lex))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert sentinel not in plan
    assert plan.count("BroadcastHashJoin") == 1
    # and it still computes the right thing through that plan
    assert list(out.select("tokens").first()["tokens"]) == \
        ["中国", "人民", "银行"]


def test_join_form_null_and_no_match_rows(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "xyz")], "i long, t string")
    out = {r["i"]: list(r["tokens"]) for r in
           lexicon_segment_join(df, "t", _lex_df(spark, {"中国": 1.0}))
           .select("i", "tokens").collect()}
    assert out[0] == [] and out[1] == []
    assert out[2] == ["x", "y", "z"]


# ---------------------------------------------------------------------------
# MeCab/IPADIC loader round trip
# ---------------------------------------------------------------------------

_DICT_CSV = """中国,10,11,100,名詞
人民,10,11,200,名詞
银行,10,11,150,名詞
中国人,12,13,250,名詞
行,14,15,400,動詞
"""

# matrix.def: header "n_right n_left", then right_id left_id cost
_MATRIX = """16 16
0 10 5
0 12 7
11 10 20
11 12 90
13 10 30
11 14 10
15 0 2
11 0 3
13 0 4
"""


@pytest.fixture()
def mecab_files(tmp_path):
    d = tmp_path / "ipadic.csv"
    m = tmp_path / "matrix.def"
    d.write_text(_DICT_CSV, encoding="utf-8")
    m.write_text(_MATRIX, encoding="utf-8")
    return str(d), str(m)


def test_mecab_loader_round_trip(spark, mecab_files):
    """Load the public-format fixture, assemble the lattice model, and
    the costs/classes/connections must be exactly the hand-written
    values — then drive lexicon_segment_lattice with the loaded model
    end to end."""
    dict_path, matrix_path = mecab_files
    dd = load_mecab_dict(spark, dict_path)
    md = load_mecab_matrix(spark, matrix_path)
    assert dd.count() == 5
    got = {r["word"]: (r["left_id"], r["right_id"], r["cost"], r["cls"])
           for r in dd.collect()}
    assert got["中国"] == (10, 11, 100.0, "名詞")
    assert got["行"] == (14, 15, 400.0, "動詞")
    mm = {(r["right_id"], r["left_id"]): r["cost"] for r in md.collect()}
    assert len(mm) == 9 and mm[(0, 10)] == 5.0 and mm[(11, 14)] == 10.0

    lexicon, conn = mecab_lattice_model(dd, md)
    assert lexicon["中国"] == (100.0, "10:11")
    assert lexicon["中国人"] == (250.0, "12:13")
    # conn keys are (prev_class, class): matrix[right(prev), left(cur)]
    assert conn[("10:11", "10:11")] == 20.0
    assert conn[("BOS", "10:11")] == 5.0
    assert conn[("10:11", "EOS")] == 3.0

    # end to end: BOS->中国(5+100) ->conn 20-> 人民(200) ->conn 20->
    # 银行(150) ->EOS 3 = 498 beats 中国人(7+250) + unknown 民/银 and
    # the all-unknown path (unknown_cost mirrors MeCab's high UNK word
    # costs — at the 2.0 default the per-char path would win against
    # hundreds-scale dictionary costs)
    df = spark.createDataFrame([("中国人民银行",)], "t string")
    toks = df.select(lexicon_segment_lattice(
        F.col("t"), lexicon, conn, unknown_cost=10000.0).alias("s")
    ).first()["s"]
    assert [e["token"] for e in toks] == ["中国", "人民", "银行"]
    assert [e["cls"] for e in toks] == ["10:11", "10:11", "10:11"]


def test_mecab_model_cap(spark, mecab_files):
    dict_path, _ = mecab_files
    dd = load_mecab_dict(spark, dict_path)
    md = load_mecab_matrix(spark, mecab_files[1])
    with pytest.raises(ValueError, match="capped"):
        mecab_lattice_model(dd, md, max_words=2)


def test_mecab_loader_rejects_narrow_csv(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n", encoding="utf-8")
    with pytest.raises(ValueError, match="columns"):
        load_mecab_dict(spark, str(p))


def test_join_form_id_col_path_equals_text_keyed(spark):
    """id_col keying (the long-document shuffle form) lands on the same
    tokens as the default text-keyed form — including duplicate texts
    and null/empty rows."""
    lex = {w: 1.0 for w in _ZH}
    df = spark.createDataFrame(
        [(0, "中国人民银行"), (1, "中国人民银行"), (2, "银行行"),
         (3, None), (4, "")], "i long, t string")
    a = {r["i"]: list(r["tokens"]) for r in
         lexicon_segment_join(df, "t", _lex_df(spark, lex))
         .select("i", "tokens").collect()}
    b = {r["i"]: list(r["tokens"]) for r in
         lexicon_segment_join(df, "t", _lex_df(spark, lex), id_col="i")
         .select("i", "tokens").collect()}
    assert a == b
    assert a[0] == a[1] == ["中国", "人民", "银行"]
    assert a[3] == [] and a[4] == []


def test_join_form_null_id_raises(spark):
    """A NULL id in id_col mode fails loudly (it could never join its
    arcs back — the row would silently mis-segment as all-unknown)."""
    import pytest as _pytest
    df = spark.createDataFrame([(None, "中国人民")],
                               "i long, t string")
    out = lexicon_segment_join(df, "t", _lex_df(spark, {"中国": 1.0}),
                               id_col="i")
    with _pytest.raises(Exception, match="unique and non-null"):
        out.collect()


# ---------------------------------------------------------------------------
# full-lattice join form (r9b)
# ---------------------------------------------------------------------------

_LAT_LEX = {
    "中国": (100.0, "N"), "人民": (200.0, "N"), "银行": (150.0, "N"),
    "中国人": (250.0, "N"), "民银": (260.0, "N"), "行": (400.0, "V"),
    "我": (50.0, "P"), "是": (60.0, "V"),
}
_LAT_CONN = {
    ("BOS", "N"): 5.0, ("BOS", "P"): 2.0, ("N", "N"): 20.0,
    ("N", "V"): 35.0, ("P", "V"): 1.0, ("V", "N"): 8.0,
    ("N", "EOS"): 3.0, ("V", "EOS"): 4.0,
}


def _lat_df(spark):
    return spark.createDataFrame(
        [(w, float(c), k) for w, (c, k) in _LAT_LEX.items()],
        "word string, cost double, cls string")


def test_lattice_join_form_equals_literal_form(spark):
    """THE lattice law: the broadcast-join dp with connection costs lands
    on byte-identical (token, cls) pairs as the plan-literal
    lexicon_segment_lattice — ambiguous overlaps, unknown chars, empty
    and NULL inputs included."""
    from transmogrifai_spark.operators.segmentation import (
        lexicon_segment_lattice_join)
    texts = ["中国人民银行", "我是中国人", "银行行", "中国人x民",
             "", None, "xyz"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    lit_out = {r["i"]: [(e["token"], e["cls"]) for e in r["s"]]
               for r in df.select("i", lexicon_segment_lattice(
                   F.col("t"), dict(_LAT_LEX), dict(_LAT_CONN),
                   unknown_cost=500.0).alias("s")).collect()}
    join_out = {r["i"]: [(e["token"], e["cls"]) for e in r["morphemes"]]
                for r in lexicon_segment_lattice_join(
                    df, "t", _lat_df(spark), conn=dict(_LAT_CONN),
                    unknown_cost=500.0).select("i", "morphemes").collect()}
    assert join_out == lit_out
    # and the classic disambiguation actually engages the conn matrix
    assert [t for t, _ in lit_out[0]] == ["中国", "人民", "银行"]


def test_lattice_join_form_plan_and_id_col(spark):
    """No dictionary words in the plan; one broadcast join; id_col path
    equal; class cap raises cleanly."""
    import pytest as _pytest

    from transmogrifai_spark.operators.segmentation import (
        lexicon_segment_lattice_join)
    sentinel = "züxqwortfolge"
    lexd = spark.createDataFrame(
        [(w, float(c), k) for w, (c, k) in _LAT_LEX.items()]
        + [(sentinel, 1.0, "N")], "word string, cost double, cls string")
    df = spark.createDataFrame([(0, "中国人民银行"), (1, "中国人民银行")],
                               "i long, t string")
    out = lexicon_segment_lattice_join(df, "t", lexd,
                                       conn=dict(_LAT_CONN))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert sentinel not in plan
    assert plan.count("BroadcastHashJoin") == 1
    a = {r["i"]: [(e["token"], e["cls"]) for e in r["morphemes"]]
         for r in out.select("i", "morphemes").collect()}
    b = {r["i"]: [(e["token"], e["cls"]) for e in r["morphemes"]]
         for r in lexicon_segment_lattice_join(
             df, "t", lexd, conn=dict(_LAT_CONN), id_col="i")
         .select("i", "morphemes").collect()}
    assert a == b
    with _pytest.raises(ValueError, match="classes"):
        lexicon_segment_lattice_join(df, "t", lexd, max_classes=1)
