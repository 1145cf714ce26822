"""WordPiece tokenization (llm/tokenizer.py WordPiece section): public
vocab.txt loader + the published greedy longest-match-first algorithm
as expressions, law-tested against the Python mirror.
"""
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transmogrifai_spark.llm.tokenizer import (load_wordpiece_vocab,
                                               wordpiece_ids,
                                               wordpiece_tokenize,
                                               wordpiece_tokenize_py)

_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]",
          "un", "##aff", "##able", "##a", "##ble", "##ffable",
          "the", "quick", "brown", "fox", "##es",
          "run", "##ning", "##n", "##ing",
          "一", "二", ",", ".", "'", "-"]


@pytest.fixture(scope="module")
def wp(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "vocab.txt"
    p.write_text("\n".join(_VOCAB) + "\n", encoding="utf-8")
    return load_wordpiece_vocab(str(p))


def test_loader(wp, tmp_path):
    assert wp["vocab"]["[UNK]"] == 1
    assert wp["vocab"]["##ffable"] == 9
    assert wp["max_piece_len"] == len("##ffable")
    nounk = tmp_path / "nounk.txt"
    nounk.write_text("a\nb\n")
    with pytest.raises(ValueError, match="UNK"):
        load_wordpiece_vocab(str(nounk))


def test_greedy_longest_match(spark, wp):
    """The BERT paper's own example: 'unaffable' -> un ##aff ##able.
    Greedy longest-first at EACH cursor: after 'un' the cursor sits on
    'affable', whose longest vocab piece is ##aff — the globally
    'better' ##ffable (one piece fewer) is unreachable, exactly the
    published algorithm's behavior (greedy, not least-cost)."""
    df = spark.createDataFrame(
        [(1, "unaffable"), (2, "the quick brown foxes"),
         (3, "running"), (4, "xyzzy quick"), (5, "一二, quick"),
         (6, ""), (7, None)], "i long, t string")
    got = {r["i"]: r["p"] for r in df.select(
        "i", wordpiece_tokenize(F.col("t"), wp).alias("p")).collect()}
    assert got[1] == ["un", "##aff", "##able"]
    assert got[2] == ["the", "quick", "brown", "fox", "##es"]
    assert got[3] == ["run", "##ning"]
    # no piece at cursor 0 of xyzzy -> whole word [UNK]
    assert got[4] == ["[UNK]", "quick"]
    # CJK isolated per char; punctuation its own token
    assert got[5] == ["一", "二", ",", "quick"]
    assert got[6] == [] and got[7] == []


def test_mirror_agrees_on_fixtures(spark, wp):
    texts = ["unaffable", "the quick brown foxes", "running",
             "xyzzy quick", "一二, quick", "", "the un-running fox.",
             "quick'fox", "UNAFFABLE The"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r["i"]: r["p"] for r in df.select(
        "i", wordpiece_tokenize(F.col("t"), wp).alias("p")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == wordpiece_tokenize_py(t, wp), t


def test_ids(spark, wp):
    df = spark.createDataFrame([(1, "the foxes xyzzy")], "i long, t string")
    got = df.select(wordpiece_ids(F.col("t"), wp).alias("ids")).head()["ids"]
    v = wp["vocab"]
    assert got == [v["the"], v["fox"], v["##es"], v["[UNK]"]]


_txt = st.text(
    alphabet="abcefinoqrstux 一二,.'-", min_size=0, max_size=24)


@settings(max_examples=25, deadline=None)
@given(st.lists(_txt, min_size=1, max_size=24, unique=True))
def test_expression_equals_mirror_random(spark, wp, texts):
    """THE law: expression == the published algorithm on random text
    over the vocab's alphabet (UNK paths, CJK, punctuation included)."""
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r["i"]: r["p"] for r in df.select(
        "i", wordpiece_tokenize(F.col("t"), wp).alias("p")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == wordpiece_tokenize_py(t, wp), repr(t)


@settings(max_examples=10, deadline=None)
@given(st.lists(_txt, min_size=1, max_size=16, unique=True))
def test_df_form_equals_column_form(spark, wp, texts):
    """The distinct-word df form (scan once per TYPE, join back,
    array_sort regroup) tokenizes exactly like the per-row column
    form — same _wp_scan_word aggregate, different plan shape."""
    from transmogrifai_spark.llm.tokenizer import wordpiece_tokenize_df
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    col_form = {r["i"]: r["p"] for r in df.select(
        "i", wordpiece_tokenize(F.col("t"), wp).alias("p")).collect()}
    df_form = {r["i"]: r["pieces"] for r in
               wordpiece_tokenize_df(df, "t", wp, "i")
               .select("i", "pieces").collect()}
    assert df_form == col_form


def test_df_form_empty_and_null_rows(spark, wp):
    from transmogrifai_spark.llm.tokenizer import wordpiece_tokenize_df
    df = spark.createDataFrame([(1, None), (2, ""), (3, "the fox")],
                               "i long, t string")
    got = {r["i"]: r["pieces"] for r in
           wordpiece_tokenize_df(df, "t", wp, "i")
           .select("i", "pieces").collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["the", "fox"]


def test_df_form_null_or_duplicate_id_raises(spark, wp):
    """The regroup join key must be non-null and unique: a NULL id
    raises (instead of silently tokenizing to []), and duplicate ids
    raise (instead of silently merging piece lists across rows)."""
    import pytest
    from transmogrifai_spark.llm.tokenizer import wordpiece_tokenize_df
    df = spark.createDataFrame([(1, "the fox"), (None, "the dog")],
                               "i long, t string")
    with pytest.raises(Exception, match="NULL in id_col"):
        wordpiece_tokenize_df(df, "t", wp, "i").collect()
    dup = spark.createDataFrame([(1, "the fox"), (1, "the dog ran")],
                                "i long, t string")
    with pytest.raises(Exception, match="duplicate values in id_col"):
        wordpiece_tokenize_df(dup, "t", wp, "i").collect()
    # NULL id on a wordless text stays allowed
    ok = spark.createDataFrame([(None, ""), (2, "the fox")],
                               "i long, t string")
    got = {r["i"]: r["pieces"] for r in
           wordpiece_tokenize_df(ok, "t", wp, "i").collect()}
    assert got[None] == [] and got[2] == ["the", "fox"]
