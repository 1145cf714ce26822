"""BM25 laws: python brute-force reference equality (quantized mode),
indexed == in-memory, append convergence, shard directory pruning,
max_df stop-term guard."""
import math

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.retrieval import (append_bm25_index,
                                               bm25_topk,
                                               bm25_topk_indexed,
                                               build_bm25_index)
from transmogrifai_spark.sources.tables import load_table


def _py_bm25(texts: dict[int, str], query: str, k1=1.2, b=0.75, q6=True):
    """Brute-force reference implementing the same formula + 6dp-decimal
    accumulation (integer micro-units — exact like DECIMAL(18,6))."""
    from itertools import groupby

    def tok(s):
        # mirror [^\p{L}\p{N}]+ splitting: runs of Unicode-alnum chars
        # (str.isalnum == categories L* + N*, matching the Spark pattern;
        # \w would wrongly keep underscores)
        return ["".join(g) for isaln, g in
                groupby(s.lower(), key=str.isalnum) if isaln]
    docs = {i: tok(t) for i, t in texts.items()}
    n = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / n
    dfreq = {}
    for d in docs.values():
        for t in set(d):
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for i, d in docs.items():
        s = 0
        for t in set(tok(query)):
            if t not in dfreq or t not in d:
                continue
            tf = d.count(t)
            idf = math.log(1.0 + (float(n) - float(dfreq[t]) + 0.5)
                           / (float(dfreq[t]) + 0.5))
            term = idf * ((float(tf) * (k1 + 1.0))
                          / (float(tf) + k1 * ((1.0 - b) + (b * float(len(d))) / avgdl)))
            s += round(round(term, 6) * 1e6)  # DECIMAL(18,6) micro-units
        if s:
            scores[i] = s / 1e6
    return scores


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(200).persist()


def test_bm25_matches_python_reference(spark, docs):
    queries = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 1, 120).alias("qtext"))
    got = bm25_topk(docs, queries, "doc_id", "text", "qid", "qtext",
                    k=5, quantize=6).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    qrows = {r["qid"]: r["qtext"] for r in queries.collect()}
    for qid, qtext in qrows.items():
        ref = _py_bm25(texts, qtext)
        want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        mine = [(r["doc_id"], r["score"]) for r in
                sorted((x for x in got if x["query_id"] == qid),
                       key=lambda r: r["rank"])]
        assert [d for d, _ in mine] == [d for d, _ in want], qid
        for (d1, s1), (d2, s2) in zip(mine, want):
            assert abs(s1 - s2) < 1e-9, (qid, d1)


def test_bm25_indexed_equals_inmemory_and_append(spark, docs, tmp_path):
    queries = docs.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 1, 100).alias("qtext"))

    def key(rows):
        return sorted((r["query_id"], r["rank"], r["doc_id"],
                       round(r["score"], 6)) for r in rows)

    p = str(tmp_path / "bm25")
    a = docs.where(F.col("doc_id") % 2 == 0)
    c = docs.where(F.col("doc_id") % 2 == 1)
    build_bm25_index(a, "doc_id", "text", p, n_shards=8, batch_id=0)
    # index(A) == one-shot over A
    got_a = key(bm25_topk_indexed(spark, p, queries, "qid", "qtext", k=5,
                                  quantize=6).collect())
    want_a = key(bm25_topk(a, queries, "doc_id", "text", "qid", "qtext",
                           k=5, quantize=6).collect())
    assert got_a == want_a and got_a
    # append B (replayed twice) -> index == one-shot over the UNION, with
    # exact df/N/avgdl across batches
    append_bm25_index(spark, p, c, "doc_id", "text", batch_id=1)
    append_bm25_index(spark, p, c, "doc_id", "text", batch_id=1)
    got = key(bm25_topk_indexed(spark, p, queries, "qid", "qtext", k=5,
                                quantize=6).collect())
    want = key(bm25_topk(docs, queries, "doc_id", "text", "qid", "qtext",
                         k=5, quantize=6).collect())
    assert got == want and got


def test_bm25_index_prunes_shard_directories(spark, docs, tmp_path):
    p = str(tmp_path / "bm25")
    build_bm25_index(docs, "doc_id", "text", p, n_shards=16, batch_id=0)
    queries = spark.createDataFrame([(0, "alpha")], ["qid", "qtext"])
    from transmogrifai_spark.llm.retrieval import _query_terms
    qt = _query_terms(queries, "qid", "qtext").withColumn(
        "_shard", F.pmod(F.xxhash64("term"), F.lit(16)))
    shards = {r["_shard"] for r in qt.select("_shard").distinct().collect()}
    idx = spark.read.parquet(f"{p}/postings") \
        .where(F.col("_shard").isin(sorted(shards)))
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_shard" in plan
    touched = {r["f"].split("_shard=")[1].split("/")[0] for r in
               idx.select(F.input_file_name().alias("f")).distinct().collect()}
    assert touched <= {str(s) for s in shards}
    assert len(touched) < 16


def test_bm25_max_df_drops_stop_terms(spark, docs):
    # a term present in (almost) every doc scores ~0 idf; max_df removes it
    n = docs.count()
    boosted = docs.withColumn("text", F.concat(F.lit("thecommon "), "text"))
    queries = spark.createDataFrame([(0, "thecommon")], ["qid", "qtext"])
    full = bm25_topk(boosted, queries, "doc_id", "text", "qid", "qtext", k=5)
    capped = bm25_topk(boosted, queries, "doc_id", "text", "qid", "qtext",
                       k=5, max_df=n - 1)
    assert full.count() == 5 and capped.count() == 0


def test_rrf_fusion_known_values_and_hybrid(spark, docs, sf_dir):
    from transmogrifai_spark.llm.retrieval import reciprocal_rank_fusion

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["query_id", "doc_id", "rank"])
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["query_id", "doc_id", "rank"])
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in
           reciprocal_rank_fusion([lex, sem], k=4).collect()}
    want_scores = {10: 1 / 61, 11: 1 / 62 + 1 / 61, 12: 1 / 63, 13: 1 / 62}
    order = sorted(want_scores, key=lambda d: (-want_scores[d], d))
    for rank, d in enumerate(order, 1):
        assert got[d][0] == rank
        assert abs(got[d][1] - want_scores[d]) < 1e-15
    # doc 11 (in both lists) wins
    assert got[11][0] == 1

    # end-to-end hybrid: BM25 + embedding ANN over real tables
    from transmogrifai_spark.llm.similarity import brute_force_topk
    emb = load_table(spark, sf_dir, "embeddings")
    queries = docs.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("qid"), F.substring("text", 1, 80).alias("qtext"))
    lexical = bm25_topk(docs, queries, "doc_id", "text", "qid", "qtext", k=10)
    semantic = (brute_force_topk(
        emb, emb.where(F.col("vec_id") < 2), "vec_id", "embedding", k=10)
        .select(F.col("query_id"), F.col("neighbor_id").alias("doc_id"),
                "rank"))
    fused = reciprocal_rank_fusion([lexical, semantic], k=5)
    assert fused.groupBy("query_id").count().collect()
    rows = fused.collect()
    assert all(1 <= r["rank"] <= 5 for r in rows) and rows


def test_stream_bm25_index_equals_batch(spark, docs, tmp_path):
    """Streaming index maintenance == one-shot over the full corpus, after
    a bootstrap build over an EMPTY frame (probe on the empty index
    returns no rows instead of failing)."""
    from transmogrifai_spark.llm.retrieval import stream_bm25_index

    queries = docs.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 1, 100).alias("qtext"))
    p = str(tmp_path / "bm25s")
    build_bm25_index(docs.limit(0), "doc_id", "text", p, n_shards=8,
                     batch_id=0)
    assert bm25_topk_indexed(spark, p, queries, "qid", "qtext",
                             k=5).count() == 0
    src = str(tmp_path / "src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_bm25_index(stream, p, "doc_id", "text",
                          checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()

    def key(rows):
        return sorted((r["query_id"], r["rank"], r["doc_id"],
                       round(r["score"], 6)) for r in rows)

    got = key(bm25_topk_indexed(spark, p, queries, "qid", "qtext", k=5,
                                quantize=6).collect())
    want = key(bm25_topk(docs, queries, "doc_id", "text", "qid", "qtext",
                         k=5, quantize=6).collect())
    assert got == want and got
