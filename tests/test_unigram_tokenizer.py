"""SentencePiece-unigram tokenization (llm/tokenizer.py unigram section):
public vocab format loader + Viterbi decoding == unigram-LM argmax.

Unigram-LM tokenization (Kudo 2018) is least-cost dictionary
segmentation with cost = -log p; the decoder here IS the engine's
broadcast-join Viterbi, so these tests pin the tokenizer-specific
surface: the vocab file format, the ▁ pre-tokenization, the unknown
fallback pricing, and the id encoding.
"""
import math

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.tokenizer import (SPM_SPACE,
                                               load_sentencepiece_vocab,
                                               unigram_ids,
                                               unigram_tokenize)

_ = SPM_SPACE  # "▁"


def _vocab_file(tmp_path, entries, name="uni.vocab"):
    p = tmp_path / name
    p.write_text("\n".join(f"{piece}\t{lp}" for piece, lp in entries),
                 encoding="utf-8")
    return str(p)


@pytest.fixture()
def vocab(spark, tmp_path):
    # log-probs chosen so the LEAST-COST split differs from greedy
    # longest-match on "themes": greedy takes ▁themes? not present;
    # ▁theme+s vs ▁the+mes — theme route cheaper
    entries = [
        ("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
        (_ + "the", -2.0), (_ + "theme", -3.0), (_, -1.0),
        ("mes", -6.0), ("s", -2.5), ("quick", -4.0),
        ("th", -4.0), ("e", -2.0), ("m", -3.0),
    ]
    path = _vocab_file(tmp_path, entries)
    return load_sentencepiece_vocab(spark, path)


def test_loader_format(spark, vocab, tmp_path):
    rows = {r["piece"]: r for r in vocab.collect()}
    # control symbols dropped, costs are -log_prob, ids keep file order
    assert "<unk>" not in rows and "<s>" not in rows
    assert rows[_ + "the"]["cost"] == 2.0
    assert rows[_ + "the"]["piece_id"] == 3
    assert rows["s"]["cost"] == 2.5
    bad = tmp_path / "bad.vocab"
    bad.write_text("noscoreline\n")
    with pytest.raises(ValueError, match="piece"):
        load_sentencepiece_vocab(spark, str(bad))
    empty = tmp_path / "allcontrol.vocab"
    empty.write_text("<unk>\t0\n")
    with pytest.raises(ValueError, match="no usable"):
        load_sentencepiece_vocab(spark, str(empty))


def test_viterbi_beats_greedy(spark, vocab):
    """'the themes' — least-cost picks ▁theme+s (3+2.5) over the greedy
    continuation ▁the+mes (2+6); whitespace run collapses to one ▁."""
    df = spark.createDataFrame([(1, "the   themes"), (2, None),
                                (3, "")], "i long, t string")
    got = {r["i"]: r["pieces"] for r in
           unigram_tokenize(df, "t", vocab, id_col="i").collect()}
    assert got[1] == [_ + "the", _ + "theme", "s"]
    assert got[2] == [] and got[3] == []


def test_unknown_fallback_priced_above_vocab(spark, vocab):
    """Characters outside the vocab become single-char pieces at
    max(cost)+10 — they never displace a real piece."""
    df = spark.createDataFrame([(1, "the zq")], "i long, t string")
    got = unigram_tokenize(df, "t", vocab, id_col="i").head()["pieces"]
    assert got == [_ + "the", _, "z", "q"]


def test_matches_python_unigram_argmax(spark, vocab):
    """Law: the pipeline equals a brute-force max Σ log p over ALL
    segmentations of the pre-tokenized string."""
    probs = {r["piece"]: -r["cost"] for r in vocab.collect()}
    unk = min(probs.values()) - 10.0  # loader: max cost + 10

    def best(s):
        n = len(s)
        memo = {n: (0.0, [])}

        def go(i):
            if i in memo:
                return memo[i]
            cand = []
            for j in range(i + 1, n + 1):
                piece = s[i:j]
                lp = probs.get(piece)
                if lp is None and j - i == 1:
                    lp = unk
                if lp is not None:
                    sub = go(j)
                    cand.append((lp + sub[0], [piece] + sub[1]))
            memo[i] = max(cand, key=lambda x: x[0])
            return memo[i]

        return go(0)[1]

    texts = ["the themes", "them quick", "quick themes the",
             "mes mes", "e m th"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r["i"]: r["pieces"] for r in
           unigram_tokenize(df, "t", vocab, id_col="i").collect()}
    for i, t in enumerate(texts):
        pre = _ + t.replace(" ", _)
        total = lambda ps: sum(probs.get(p, unk) for p in ps)  # noqa: E731
        # scores must be optimal-equal (tie-broken paths may differ)
        assert total(got[i]) == pytest.approx(total(best(pre)), rel=1e-9), \
            (t, got[i], best(pre))


def test_unigram_ids(spark, vocab):
    df = spark.createDataFrame([(1, "the zq"), (2, None)],
                               "i long, t string")
    out = {r["i"]: r for r in
           unigram_ids(df, "t", vocab, id_col="i", unk_id=0).collect()}
    vmap = {r["piece"]: r["piece_id"] for r in vocab.collect()}
    # ▁the ▁ z q -> [id(▁the), id(▁), 0, 0]
    assert out[1]["piece_ids"] == [vmap[_ + "the"], vmap[_], 0, 0]
    assert out[2]["piece_ids"] == []


def test_df_form_equals_column_form(spark, vocab):
    """Law: unigram_tokenize_df (distinct-WORD Viterbi) is
    piece-equal to unigram_tokenize (whole-text Viterbi) — the ▁
    boundary-forcing decomposition — across multi-space runs, unknown
    chars, literal ▁ input, and empty/NULL rows."""
    from transmogrifai_spark.llm.tokenizer import unigram_tokenize_df
    texts = ["the   themes", "them quick", "quick themes the",
             "mes mes", "e m th", "the zq", "x" + _ + "y", _ + _,
             " ", "", None, "themes"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    via = {r["i"]: r["pieces"] for r in
           unigram_tokenize_df(df, "t", vocab, id_col="i").collect()}
    direct = {r["i"]: r["pieces"] for r in
              unigram_tokenize(df, "t", vocab, id_col="i").collect()}
    assert via == direct


def test_df_form_internal_space_vocab_falls_back(spark):
    """A vocab with an internal-▁ piece (split_by_whitespace=false
    training) breaks the per-word decomposition — the df form detects
    it with one bounded probe and routes to the whole-text Viterbi,
    where the cross-word piece CAN win."""
    from transmogrifai_spark.llm.tokenizer import unigram_tokenize_df
    rows = ([(_ + c, 5.0) for c in "ofthe"] + [(c, 5.5) for c in "ofthe"]
            + [(_ + "of" + _ + "the", 1.0)])
    vocab = spark.createDataFrame(rows, "piece string, cost double")
    df = spark.createDataFrame([(1, "of the")], "i long, t string")
    got = unigram_tokenize_df(df, "t", vocab, id_col="i") \
        .head()["pieces"]
    assert got == [_ + "of" + _ + "the"]


def test_df_form_null_or_duplicate_id_raises(spark, vocab):
    """The regroup join key must be non-null and unique — NULL ids on
    word-bearing rows and duplicate ids raise instead of silently
    mis-answering (the lexicon_segment_join guard)."""
    from transmogrifai_spark.llm.tokenizer import unigram_tokenize_df
    df = spark.createDataFrame([(1, "the"), (None, "quick")],
                               "i long, t string")
    with pytest.raises(Exception, match="NULL in id_col"):
        unigram_tokenize_df(df, "t", vocab, id_col="i").collect()
    dup = spark.createDataFrame([(1, "the"), (1, "quick")],
                                "i long, t string")
    with pytest.raises(Exception, match="duplicate values in id_col"):
        unigram_tokenize_df(dup, "t", vocab, id_col="i").collect()
    ok = spark.createDataFrame([(None, ""), (None, None), (2, "the")],
                               "i long, t string")
    got = {r["i"]: r["pieces"] for r in
           unigram_tokenize_df(ok, "t", vocab, id_col="i").collect()}
    assert got[None] == [] and got[2] == [_ + "the"]


def test_df_form_equals_column_form_random(spark, vocab):
    """Property law: the ▁ boundary decomposition holds on random
    texts over the vocab alphabet plus spaces, literal ▁, unknown
    chars, and whitespace runs."""
    import random
    rng = random.Random(1234)
    alphabet = "themsquick " + _ + "z  "
    texts = ["".join(rng.choice(alphabet)
                     for _i in range(rng.randrange(0, 24)))
             for _n in range(40)]
    from transmogrifai_spark.llm.tokenizer import unigram_tokenize_df
    df = spark.createDataFrame(list(enumerate(texts)),
                               "i long, t string")
    via = {r["i"]: r["pieces"] for r in
           unigram_tokenize_df(df, "t", vocab, id_col="i").collect()}
    direct = {r["i"]: r["pieces"] for r in
              unigram_tokenize(df, "t", vocab, id_col="i").collect()}
    assert via == direct
