"""Benchmark decontamination vs a pure-Python n-gram-set oracle."""
import re

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.decontam import (
    contamination_report, decontaminate, word_ngram_hashes)


def _py_ngrams(text: str, n: int) -> set:
    toks = [t for t in re.sub(r"[^0-9A-Za-z]+", " ", text.lower()).split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select("doc_id", "text").persist()


def test_report_matches_python_oracle(spark, docs):
    """Held-out 'eval set' = every 10th doc; contaminated doc ids and match
    counts from the Spark broadcast-join path == string-set oracle."""
    n = 8
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    eval_rows = [r for r in rows if r[0] % 10 == 0]
    eval_grams = set().union(*(_py_ngrams(t, n) for _, t in eval_rows)) \
        if eval_rows else set()
    expected = {}
    for doc_id, text in rows:
        g = _py_ngrams(text, n)
        hit = len(g & eval_grams)
        if hit:
            expected[doc_id] = (hit, len(g))

    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    rep = contamination_report(docs, eval_df, n=n)
    got = {r["doc_id"]: (r["matched_ngrams"], r["total_ngrams"])
           for r in rep.collect()}
    assert got == expected
    assert eval_rows and all(r[0] in got for r in eval_rows
                             if len(_py_ngrams(r[1], n)) > 0)


def test_decontaminate_removes_exactly_flagged(spark, docs):
    n, min_matches = 8, 3
    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    rep = contamination_report(docs, eval_df, n=n)
    flagged = {r["doc_id"] for r in
               rep.where(F.col("matched_ngrams") >= min_matches).collect()}
    kept = decontaminate(docs, eval_df, n=n, min_matches=min_matches)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - flagged
    assert flagged  # the eval subset itself must be flagged


def test_short_docs_produce_no_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "only four words here"), (2, None), (3, "")],
        "doc_id long, text string")
    out = df.select(F.size(word_ngram_hashes(F.col("text"), 13)).alias("k")) \
        .collect()
    # NULL text: size(toks) is NULL -> when() falls to the empty-array branch
    assert [r["k"] for r in out] == [0, 0, 0]


def test_ngrams_normalize_case_and_punct(spark):
    a = "The quick-brown FOX, jumps over; the lazy dog today!"
    b = "the quick brown fox jumps over the lazy dog today"
    df = spark.createDataFrame([(a, b)], "a string, b string")
    row = df.select(
        word_ngram_hashes(F.col("a"), 5).alias("ga"),
        word_ngram_hashes(F.col("b"), 5).alias("gb")).first()
    assert sorted(row["ga"]) == sorted(row["gb"])


def test_shuffle_join_path_matches_broadcast(spark, docs):
    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    a = contamination_report(docs, eval_df, n=8, broadcast_eval=True)
    b = contamination_report(docs, eval_df, n=8, broadcast_eval=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_broadcast_plan_has_no_big_side_shuffle(spark, docs):
    """The train side must reach the join via BroadcastHashJoin: the only
    Exchange allowed below the join is the broadcast of eval grams."""
    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    rep = contamination_report(docs, eval_df, n=8)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_mode_exact_at_large_m_conservative_at_small_m(spark, docs):
    """bloom_bits mode: with a roomy bitmap (fpp ~ 0) the report equals the
    exact broadcast-set mode; with a cramped bitmap the kept set is a
    SUBSET of the exact kept set (false positives only ever over-remove)."""
    n = 6
    eval_df = docs.where(F.col("doc_id") % 10 == 0)

    def rep_set(rep):
        return {(r["doc_id"], r["matched_ngrams"], r["total_ngrams"])
                for r in rep.collect()}

    exact = rep_set(contamination_report(docs, eval_df, n=n))
    roomy = rep_set(contamination_report(docs, eval_df, n=n,
                                         bloom_bits=1 << 22))
    assert roomy == exact and exact

    kept_exact = {r["doc_id"]
                  for r in decontaminate(docs, eval_df, n=n).collect()}
    kept_tight = {r["doc_id"]
                  for r in decontaminate(docs, eval_df, n=n,
                                         bloom_bits=1 << 10,
                                         bloom_k=3).collect()}
    assert kept_tight <= kept_exact
