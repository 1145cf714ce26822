"""Gopher/C4 quality rules + repetition metrics (llm/quality_rules.py) —
each published rule triggered by a crafted document, values verified by
hand-computed expectations, and a no-Python-UDF plan check."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.quality_rules import (c4_rules, gopher_rules,
                                                   quality_filter,
                                                   repetition_metrics)

GOOD = ("The project began with a simple idea that would grow over time. "
        * 10) + "Researchers have found that consistent methods matter."


def _q(spark, texts, **overrides):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    rows = df.select("doc_id",
                     gopher_rules(F.col("text"), **overrides).alias("q")
                     ).collect()
    return {r["doc_id"]: r["q"].asDict() for r in rows}


def test_gopher_good_document_keeps(spark):
    q = _q(spark, [GOOD])[0]
    assert q["keep"] is True
    assert q["n_words"] >= 50 and 3.0 <= q["mean_word_len"] <= 10.0
    assert q["n_stop_words"] >= 2 and q["alpha_word_frac"] >= 0.8


def test_gopher_individual_rules_trigger(spark):
    docs = {
        "too_short": "Just five words right here.",
        "symbols": " ".join(["word#tag"] * 30 + ["the of and that be to"] * 5),
        "no_alpha": " ".join(["12345 67890 11111"] * 30),
        "no_stops": " ".join(["zorp blik quux flarn"] * 20),
        "bullets": "\n".join(["- item one two three"] * 20),
        "dup_lines": "\n".join(["This exact line repeats here often."] * 30),
    }
    keys = list(docs)
    qs = _q(spark, [docs[k] for k in keys])
    by = {k: qs[i] for i, k in enumerate(keys)}
    assert by["too_short"]["word_count_ok"] is False
    assert by["symbols"]["symbol_ratio_ok"] is False
    assert by["no_alpha"]["alpha_frac_ok"] is False
    assert by["no_stops"]["stop_words_ok"] is False
    assert by["bullets"]["bullet_frac_ok"] is False
    assert by["dup_lines"]["dup_line_ok"] is False
    assert by["dup_lines"]["dup_line_frac"] == pytest.approx(29 / 30)
    for k in keys:
        assert by[k]["keep"] is False, k


def test_gopher_threshold_overrides(spark):
    q = _q(spark, ["Ten tiny words make a short but real document here."],
           min_words=5)[0]
    assert q["word_count_ok"] is True


def test_c4_rules_line_filtering(spark):
    text = ("This is a proper sentence with enough words.\n"
            "short line\n"
            "Please enable javascript to view this page.\n"
            "function() { return 42; }\n"
            "Another good sentence follows the previous one here!\n")
    df = spark.createDataFrame([(1, text), (2, "Lorem ipsum dolor sit amet. "
                                           "It has sentences. Three of them.")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r["q"].asDict() for r in df.select(
        "doc_id", c4_rules(F.col("text")).alias("q")).collect()}
    clean = rows[1]["clean_text"].split("\n")
    assert clean == ["This is a proper sentence with enough words.",
                     "Another good sentence follows the previous one here!"]
    assert rows[1]["no_code_brace"] is False
    assert rows[2]["no_lorem_ipsum"] is False and rows[2]["sentences_ok"] is True


def test_repetition_metrics_values(spark):
    df = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham spam ham"),   # heavy 2-gram repeat
         (2, "every word here is different from all others entirely")],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           repetition_metrics(df, "doc_id", "text").collect()}
    # doc 1: words=8, chars("spam ham"*4 joined)=35; top 2-gram "spam ham"
    # occurs 4x, len 8 -> 32/35
    assert out[1]["top2gram_char_frac"] == pytest.approx(32 / 35)
    # doc 1's four 5-grams collapse to two distinct, each count 2 ->
    # covered 20 words over 8, clamped to 1.0
    assert out[1]["dup5gram_word_frac"] == 1.0
    assert out[2]["top2gram_char_frac"] < 0.35
    assert out[2]["dup5gram_word_frac"] == 0.0


def test_quality_filter_end_to_end_on_documents(spark, sf_dir):
    """quality_filter over the real documents table: returns one row per doc
    with an auditable metric struct, and the executed plan stays
    Python-free (pure codegen expressions)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the synthetic corpus is domain word-salad: most docs carry only one
    # of Gopher's required stop words, so relax that rule here
    out = quality_filter(docs, "doc_id", "text", min_words=5,
                         min_stop_words=1)
    assert out.count() == docs.count()
    kept = out.where("keep").count()
    assert 0 < kept <= docs.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_blocklist_paths_agree_and_match_python(spark):
    from transmogrifai_spark.llm.quality_rules import (blocklist_filter,
                                                       blocklist_hits)

    docs = spark.createDataFrame([
        (1, "a perfectly clean document about cats"),
        (2, "contains the word spam right here"),
        (3, "SPAM and scam together, twice spam"),
        (4, None),
        (5, "spammy is not spam-listed... or is spam"),
    ], "id int, text string")
    words = ["spam", "scam"]
    hits = {r["id"]: r["h"] for r in docs.select(
        "id", blocklist_hits(F.col("text"), words).alias("h")).collect()}
    # distinct whole-word, case-insensitive: doc3 has both words -> 2;
    # 'spammy' is not a hit, tokenized 'spam' is
    assert hits == {1: 0, 2: 1, 3: 2, 4: 0, 5: 1}
    small = blocklist_filter(docs, "text", words)
    big = blocklist_filter(docs, "text", words, large=True)
    assert sorted(r["id"] for r in small.collect()) == \
        sorted(r["id"] for r in big.collect()) == [1, 4]
    lax = blocklist_filter(docs, "text", words, max_hits=1, large=True)
    assert sorted(r["id"] for r in lax.collect()) == [1, 2, 4, 5]
