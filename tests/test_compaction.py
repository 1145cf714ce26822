"""Index compaction laws: probe results are IDENTICAL before and after
merging batch subdirectories (LSH / SimHash / BM25), file counts shrink,
negative consolidated ids never collide with replay exclusion, and the
BM25 sidecar manifest makes half-done compactions invisible."""
import glob
import os

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.dedup import (build_lsh_index,
                                           append_lsh_index,
                                           build_simhash_index,
                                           compact_lsh_index,
                                           compact_simhash_index,
                                           lsh_dedup_incremental,
                                           simhash_dedup_incremental)
from transmogrifai_spark.llm.retrieval import (append_bm25_index,
                                               bm25_topk_indexed,
                                               build_bm25_index,
                                               compact_bm25_index)
from transmogrifai_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(240).persist()


def _batch_dirs(root):
    return sorted(d for d in os.listdir(root) if d.startswith("batch="))


def _pairs(df):
    return {tuple(r) for r in df.select("id1", "id2").collect()}


def test_lsh_compaction_preserves_probe(spark, docs, tmp_path):
    path = str(tmp_path / "lsh")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    probe_docs = docs.where(F.col("doc_id") % 3 == 2)
    build_lsh_index(b0, "doc_id", "text", path, batch_id=0)
    append_lsh_index(spark, path, b1, "doc_id", "text", batch_id=1)
    before = _pairs(lsh_dedup_incremental(spark, path, probe_docs,
                                          "doc_id", "text",
                                          within_batch=False))
    n_files_before = len(glob.glob(os.path.join(path, "bands", "batch=*",
                                                "_shard=*", "*.parquet")))
    stats = compact_lsh_index(spark, path, upto_batch=1)
    assert stats["merged_batches"] == [0, 1]
    assert stats["compacted_id"] == -1
    assert _batch_dirs(os.path.join(path, "bands")) == ["batch=-1"]
    after = _pairs(lsh_dedup_incremental(spark, path, probe_docs,
                                         "doc_id", "text",
                                         within_batch=False))
    assert after == before and before
    n_files_after = len(glob.glob(os.path.join(path, "bands", "batch=*",
                                               "_shard=*", "*.parquet")))
    assert n_files_after < n_files_before
    # appends keep working; a second compaction folds them in
    b2 = probe_docs
    append_lsh_index(spark, path, b2, "doc_id", "text", batch_id=2)
    again = compact_lsh_index(spark, path, upto_batch=2)
    assert again["merged_batches"] == [-1, 2]
    assert again["compacted_id"] == -2
    # replay-style exclusion of a POSITIVE id can never name the
    # consolidated dir
    ex = lsh_dedup_incremental(spark, path, probe_docs, "doc_id", "text",
                               within_batch=False, exclude_batches=[3])
    assert _pairs(ex)  # still probing the compacted corpus


def test_lsh_compaction_noop_cases(spark, docs, tmp_path):
    path = str(tmp_path / "lsh1")
    build_lsh_index(docs.where(F.col("doc_id") % 3 == 0),
                    "doc_id", "text", path, batch_id=0)
    assert compact_lsh_index(spark, path, upto_batch=5)["merged_batches"] == []
    # upto below every batch id: nothing merged either
    append_lsh_index(spark, path,
                     docs.where(F.col("doc_id") % 3 == 1),
                     "doc_id", "text", batch_id=7)
    assert compact_lsh_index(spark, path, upto_batch=-5)["merged_batches"] == []


def test_simhash_compaction_preserves_probe(spark, docs, tmp_path):
    path = str(tmp_path / "sim")
    build_simhash_index(docs.where(F.col("doc_id") % 3 == 0),
                        "doc_id", "text", path, batch_id=0)
    # clone some batch-0 docs so the probe has real hits
    clones = docs.where(F.col("doc_id") % 3 == 0).limit(20).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text")
    before = _pairs(simhash_dedup_incremental(spark, path, clones,
                                              "doc_id", "text",
                                              within_batch=False))
    build_simhash_index(docs.where(F.col("doc_id") % 3 == 1),
                        "doc_id", "text", path, batch_id=1)
    before2 = _pairs(simhash_dedup_incremental(spark, path, clones,
                                               "doc_id", "text",
                                               within_batch=False))
    compact_simhash_index(spark, path, upto_batch=1)
    assert _batch_dirs(os.path.join(path, "bands")) == ["batch=-1"]
    after = _pairs(simhash_dedup_incremental(spark, path, clones,
                                             "doc_id", "text",
                                             within_batch=False))
    assert after == before2 and before <= before2 and before


def _topk_rows(df):
    return {(r.query_id, r.doc_id, r.rank, r.score) for r in df.collect()}


def test_bm25_compaction_exact_scores(spark, docs, tmp_path):
    path = str(tmp_path / "bm25")
    queries = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), F.substring("text", 1, 120).alias("qtext"))
    build_bm25_index(docs.where(F.col("doc_id") % 3 == 0),
                     "doc_id", "text", path, n_shards=8, batch_id=0)
    append_bm25_index(spark, path, docs.where(F.col("doc_id") % 3 == 1),
                      "doc_id", "text", batch_id=1)
    append_bm25_index(spark, path, docs.where(F.col("doc_id") % 3 == 2),
                      "doc_id", "text", batch_id=2)
    before = _topk_rows(bm25_topk_indexed(spark, path, queries, "qid",
                                          "qtext", k=5, quantize=6))
    stats = compact_bm25_index(spark, path, upto_batch=1)
    assert stats["merged_batches"] == [0, 1] and stats["compacted_id"] == -1
    assert _batch_dirs(os.path.join(path, "postings")) == \
        ["batch=-1", "batch=2"]
    after = _topk_rows(bm25_topk_indexed(spark, path, queries, "qid",
                                         "qtext", k=5, quantize=6))
    assert after == before and before
    # sidecars: consolidated one covers 0 and 1, batch 2 still live
    import json
    with open(os.path.join(path, "stats", "batch_-1.json")) as f:
        side = json.load(f)
    assert side["covers"] == [0, 1]
    # second-level compaction folds the consolidated dir itself
    stats2 = compact_bm25_index(spark, path, upto_batch=2)
    assert stats2["merged_batches"] == [-1, 2] and stats2["compacted_id"] == -2
    final = _topk_rows(bm25_topk_indexed(spark, path, queries, "qid",
                                         "qtext", k=5, quantize=6))
    assert final == before
    with open(os.path.join(path, "stats", "batch_-2.json")) as f:
        side2 = json.load(f)
    assert side2["covers"] == [-1, 0, 1, 2]


def test_bm25_orphan_postings_dir_is_invisible(spark, docs, tmp_path):
    """A postings dir without a stats sidecar (crash between rename and
    sidecar commit) must not change scores — the sidecars are the
    manifest."""
    path = str(tmp_path / "bm25o")
    queries = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), F.substring("text", 1, 120).alias("qtext"))
    build_bm25_index(docs.where(F.col("doc_id") % 2 == 0),
                     "doc_id", "text", path, n_shards=8, batch_id=0)
    before = _topk_rows(bm25_topk_indexed(spark, path, queries, "qid",
                                          "qtext", k=5, quantize=6))
    # orphan: postings for batch 9 appear with no sidecar
    append_bm25_index(spark, path, docs.where(F.col("doc_id") % 2 == 1),
                      "doc_id", "text", batch_id=9)
    os.remove(os.path.join(path, "stats", "batch_9.json"))
    assert _topk_rows(bm25_topk_indexed(spark, path, queries, "qid",
                                        "qtext", k=5, quantize=6)) == before


def test_ivf_compaction_preserves_topk_even_mid_crash(spark, sf_dir, tmp_path):
    """IVF compaction law: top-k identical after merging batch dirs, AND
    identical in the crash window where the consolidated dir coexists with
    the source dirs (the probe's lag-dedup guard collapses the transient
    duplicates before ranking)."""
    import shutil

    from transmogrifai_spark.llm.similarity import (append_ivf_index,
                                                    build_ivf_index,
                                                    compact_ivf_index,
                                                    ivf_topk_indexed)
    from transmogrifai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 3 != 0)
    b = emb.where(F.col("vec_id") % 3 == 0)
    q = emb.where(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    cells = os.path.join(path, "cells")
    build_ivf_index(a, "vec_id", "embedding", path, n_lists=8, seed=11)
    append_ivf_index(spark, path, b, batch_id=1)

    def topk():
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in
            ivf_topk_indexed(spark, path, q, "vec_id", "embedding",
                             k=5, n_probe=8).collect())

    before = topk()
    # crash window: consolidated dir present, sources NOT yet deleted ->
    # every vector transiently duplicated; top-k must not change
    shutil.copytree(os.path.join(cells, "batch=1"),
                    os.path.join(cells, "batch=-1"))
    assert topk() == before
    shutil.rmtree(os.path.join(cells, "batch=-1"))

    stats = compact_ivf_index(spark, path, upto_batch=1)
    assert stats["merged_batches"] == [0, 1] and stats["compacted_id"] == -1
    assert _batch_dirs(cells) == ["batch=-1"]
    assert topk() == before and before
    # appends continue against the compacted index
    append_ivf_index(spark, path, b.limit(0), batch_id=2)
    assert topk() == before


def test_ivfpq_index_equals_in_memory_prunes_and_compacts(spark, sf_dir,
                                                          tmp_path):
    """IVF-PQ index laws (r8): (1) a two-batch on-disk index (build even
    ids, append odd with the sidecar model — no refit) lands on EXACTLY
    the one-shot in-memory ivf_pq_topk answer, because encoding is
    per-row with an injected model; (2) the probed-cell read is a
    partition-column filter at the scan; (3) compaction preserves top-k,
    including in the crash window where consolidated and source batch
    dirs coexist (the lag-dedup guard)."""
    import shutil

    from transmogrifai_spark.llm.similarity import (append_ivfpq_index,
                                                    build_ivfpq_index,
                                                    compact_ivfpq_index,
                                                    ivf_pq_topk,
                                                    ivfpq_topk_indexed)
    from transmogrifai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.where(F.col("vec_id") < 18).orderBy("vec_id").collect()
    cv = [[float(x) for x in r["embedding"]] for r in rows]
    model = {"centroids": [cv[0], cv[1]],
             "codebooks": [[cv[2 + c][j * 8:(j + 1) * 8]
                            for c in range(16)] for j in range(8)]}
    q = emb.where(F.col("vec_id") < 10)
    path = str(tmp_path / "ivfpq")
    cells = os.path.join(path, "cells")
    build_ivfpq_index(emb.where(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", path, 64, m=8, model=model)
    append_ivfpq_index(spark, path, emb.where(F.col("vec_id") % 2 == 1),
                       batch_id=1)

    def topk(n_probe=2):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in ivfpq_topk_indexed(spark, path, q, "vec_id",
                                        "embedding", k=5, n_probe=n_probe,
                                        quantize=6).collect())

    before = topk()
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ivf_pq_topk(emb, q, "vec_id", "embedding", 64, k=5,
                             n_probe=2, m=8, model=model,
                             quantize=6).collect())
    assert before == want and before

    # probed-cell partition filter reaches the scan node
    one = ivfpq_topk_indexed(spark, path,
                             emb.where(F.col("vec_id") == 0), "vec_id",
                             "embedding", k=3, n_probe=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("PartitionFilters"):]
    assert "_cell" in scan.split("]")[0]

    # crash window: consolidated copy coexists with sources
    shutil.copytree(os.path.join(cells, "batch=1"),
                    os.path.join(cells, "batch=-1"))
    assert topk() == before
    shutil.rmtree(os.path.join(cells, "batch=-1"))

    stats = compact_ivfpq_index(spark, path, upto_batch=1)
    assert stats["merged_batches"] == [0, 1] and stats["compacted_id"] == -1
    assert _batch_dirs(cells) == ["batch=-1"]
    assert topk() == before
    # appends continue against the compacted index
    append_ivfpq_index(spark, path, emb.limit(0), batch_id=2)
    assert topk() == before


def test_stream_ivfpq_index_equals_batch(spark, sf_dir, tmp_path):
    """Streaming IVF-PQ maintenance == one-shot over the full corpus,
    after a bootstrap build over an EMPTY frame with an injected model
    (the pure-streaming ingest shape; probing the empty index returns no
    rows instead of failing)."""
    from transmogrifai_spark.llm.similarity import (build_ivfpq_index,
                                                    ivf_pq_topk,
                                                    ivfpq_topk_indexed,
                                                    stream_ivfpq_index)
    from transmogrifai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.where(F.col("vec_id") < 18).orderBy("vec_id").collect()
    cv = [[float(x) for x in r["embedding"]] for r in rows]
    model = {"centroids": [cv[0], cv[1]],
             "codebooks": [[cv[2 + c][j * 8:(j + 1) * 8]
                            for c in range(16)] for j in range(8)]}
    q = emb.where(F.col("vec_id") < 8)
    path = str(tmp_path / "ivfpqs")
    build_ivfpq_index(emb.limit(0), "vec_id", "embedding", path, 64, m=8,
                      model=model)
    assert ivfpq_topk_indexed(spark, path, q, "vec_id", "embedding",
                              k=5, n_probe=2).count() == 0
    src = str(tmp_path / "src")
    emb.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sq = stream_ivfpq_index(stream, path, checkpoint=str(tmp_path / "ck"))
    sq.awaitTermination()

    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in
        ivfpq_topk_indexed(spark, path, q, "vec_id", "embedding", k=5,
                           n_probe=2, quantize=6).collect())
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in
        ivf_pq_topk(emb, q, "vec_id", "embedding", 64, k=5, n_probe=2,
                    m=8, model=model, quantize=6).collect())
    assert got == want and got


def test_stream_ivf_index_appends(spark, sf_dir, tmp_path):
    """stream_ivf_index: bootstrap fit on an initial corpus, stream the
    rest — top-k equals the build+append batch path (assignment is
    per-row against the stored centroids either way)."""
    from transmogrifai_spark.llm.similarity import (append_ivf_index,
                                                    build_ivf_index,
                                                    ivf_topk_indexed,
                                                    stream_ivf_index)
    from transmogrifai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 3 == 0)
    b = emb.where(F.col("vec_id") % 3 != 0)
    q = emb.where(F.col("vec_id") < 6)
    p1, p2 = str(tmp_path / "s"), str(tmp_path / "b")
    for p in (p1, p2):
        build_ivf_index(a, "vec_id", "embedding", p, n_lists=8, seed=11)
    src = str(tmp_path / "src")
    b.repartition(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sq = stream_ivf_index(stream, p1, checkpoint=str(tmp_path / "ck"))
    sq.awaitTermination()
    append_ivf_index(spark, p2, b, batch_id=1)

    def topk(p):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in
            ivf_topk_indexed(spark, p, q, "vec_id", "embedding", k=5,
                             n_probe=8).collect())

    assert topk(p1) == topk(p2) and topk(p1)
