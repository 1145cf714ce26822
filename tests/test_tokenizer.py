"""BPE tokenizer: known-vector merges, determinism, roundtrip and
two-path (Spark UDF vs pure python) equality laws."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm import tokenizer as tok


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_bpe_known_vector():
    # the classic corpus from the BPE paper: est-family merges first
    # ('e','s') 9 > ('s','t') 9 tie -> lexicographic: ('e','s') wins
    model = tok.learn_bpe(SENNRICH, num_merges=5, min_pair_count=2)
    assert model["merges"][0] == ("e", "s")
    assert model["merges"][1] == ("es", "t")
    assert ("est", tok.END_OF_WORD) in model["merges"][:3]
    assert tok.UNK == model["vocab"][0]
    assert "est" in model["vocab"]


def test_learn_bpe_deterministic():
    a = tok.learn_bpe(SENNRICH, num_merges=8)
    b = tok.learn_bpe(list(reversed(SENNRICH)), num_merges=8)
    assert a["merges"] == b["merges"]
    assert a["vocab"] == b["vocab"]


def test_encode_uses_merges_and_roundtrips():
    model = tok.learn_bpe(SENNRICH, num_merges=10, min_pair_count=2)
    pieces = tok.encode_text("newest lowest", model)
    # 'newest' was in-corpus: should compress below char count
    assert len(pieces) < len("newest") + 1 + len("lowest") + 1
    assert tok.bpe_decode_pieces(pieces) == "newest lowest"


def test_min_pair_count_stops_learning():
    model = tok.learn_bpe([("ab", 1), ("cd", 1)], num_merges=10,
                          min_pair_count=2)
    assert model["merges"] == []


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from transmogrifai_spark.sources.tables import load_table
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def corpus_model(docs):
    return tok.train_bpe(docs, "text", num_merges=300, max_words=50_000)


def test_train_bpe_distributed(corpus_model):
    assert len(corpus_model["merges"]) > 50
    assert len(corpus_model["vocab"]) > 100


def test_spark_encode_matches_python(docs, corpus_model):
    sample = docs.orderBy("doc_id").limit(30)
    got = sample.select("text",
                        tok.bpe_encode(F.col("text"), corpus_model)
                        .alias("pieces")).collect()
    for r in got:
        assert list(r["pieces"]) == tok.encode_text(r["text"], dict(corpus_model))


def test_spark_roundtrip_and_counts(docs, corpus_model):
    out = tok.tokenize_corpus(docs.limit(100), corpus_model)
    rows = out.select(
        "text", "tokens", "tokens_count",
        tok.bpe_token_count(F.col("text"), corpus_model).alias("n2")).collect()
    for r in rows:
        assert r["tokens_count"] == len(r["tokens"]) == r["n2"]
        want = " ".join(tok.PY_TOKEN_RE.findall(r["text"].lower()))
        assert tok.bpe_decode_pieces(list(r["tokens"])) == want
        # BPE pieces per word >= 1 -> piece count >= word count is FALSE
        # (merges compress); but piece count <= char-level upper bound holds
        assert r["tokens_count"] <= len(r["text"]) + len(want.split())


def test_bpe_ids_in_vocab_range(docs, corpus_model):
    out = docs.limit(50).select(
        tok.bpe_ids(F.col("text"), corpus_model).alias("ids"))
    mx = out.select(F.max(F.array_max("ids")).alias("m"),
                    F.min(F.array_min("ids")).alias("lo")).first()
    assert 0 < mx["m"] < len(corpus_model["vocab"])
    # training corpus == encoding corpus: every piece is known, no <unk>=0
    assert mx["lo"] >= 1


def test_null_and_empty_text(spark, corpus_model):
    df = spark.createDataFrame([(1, None), (2, "")], "id int, text string")
    rows = df.select(tok.bpe_encode(F.col("text"), corpus_model)
                     .alias("p")).collect()
    assert [list(r["p"]) for r in rows] == [[], []]


def test_bpe_worker_state_persists_pid_guards_and_bounds(monkeypatch):
    """r13 (VERDICT r12 #6): the BPE word cache is a module-global keyed
    by model fingerprint — persistent across calls within a process,
    rebuilt on a PID change (fork/fresh worker), cleared past the bound."""
    merges = [("a", "b"), ("ab", "c")]
    fp = tok._bpe_fingerprint(merges, True)
    tok._BPE_STATE.pop(fp, None)
    st1 = tok._bpe_state(fp, merges, True)
    assert st1["model"]["_ranks"] == {("a", "b"): 0, ("ab", "c"): 1}
    st1["cache"]["abc"] = ["abc"]
    st2 = tok._bpe_state(fp, merges, True)
    assert st2 is st1 and st2["cache"] == {"abc": ["abc"]}
    # stale-PID entry (a fork's parent state) is rebuilt empty
    st1["pid"] = -1
    st3 = tok._bpe_state(fp, merges, True)
    assert st3 is not st1 and st3["cache"] == {}
    # the cache is bounded: past the max it clears instead of growing
    monkeypatch.setattr(tok, "_BPE_CACHE_MAX", 3)
    st3["cache"].update({"w1": [], "w2": [], "w3": [], "w4": []})
    st4 = tok._bpe_state(fp, merges, True)
    assert st4 is st3 and st4["cache"] == {}
    tok._BPE_STATE.pop(fp, None)
