"""Public word-vector file ingestion + mean-pooled document embeddings
(llm/embeddings.py) — the text front door of the similarity/ANN stack.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.embeddings import (embed_documents,
                                                load_word_vectors)

_VEC = """4 3
the 0.1 0.2 0.3
quick -1 0 1
fox 2.5 2.5 2.5
dog 0 0 -2
"""

_GLOVE = """the 0.1 0.2 0.3
quick -1 0 1
"""


def test_load_vec_and_glove_formats(spark, tmp_path):
    p = tmp_path / "toy.vec"
    p.write_text(_VEC)
    vecs = load_word_vectors(spark, str(p))
    rows = {r["word"]: r["vec"] for r in vecs.collect()}
    assert set(rows) == {"the", "quick", "fox", "dog"}
    assert rows["quick"] == [-1.0, 0.0, 1.0]
    g = tmp_path / "toy.glove.txt"
    g.write_text(_GLOVE)
    gv = {r["word"]: r["vec"] for r in
          load_word_vectors(spark, str(g)).collect()}
    assert gv["the"] == pytest.approx([0.1, 0.2, 0.3], rel=1e-6)


def test_load_rejects_truncated_and_nonnumeric(spark, tmp_path):
    bad = tmp_path / "trunc.vec"
    bad.write_text("2 3\nthe 0.1 0.2 0.3\nquick -1 0\n")
    with pytest.raises(ValueError, match="disagree with dim"):
        load_word_vectors(spark, str(bad)).collect()
    nn = tmp_path / "nn.vec"
    nn.write_text("1 3\nthe 0.1 xx 0.3\n")
    with pytest.raises(Exception, match="non-numeric"):
        load_word_vectors(spark, str(nn)).collect()


def test_embed_documents_mean_pool(spark, tmp_path):
    p = tmp_path / "toy.vec"
    p.write_text(_VEC)
    vecs = load_word_vectors(spark, str(p))
    df = spark.createDataFrame(
        [(1, "The quick FOX"), (2, "dog"), (3, "zzz unknown words"),
         (4, None)], "i long, t string")
    out = {r["i"]: r["embedding"] for r in
           embed_documents(df, "t", vecs, id_col="i").collect()}
    want1 = np.mean([[0.1, 0.2, 0.3], [-1, 0, 1], [2.5, 2.5, 2.5]],
                    axis=0)
    assert out[1] == pytest.approx(list(want1), rel=1e-6)
    assert out[2] == pytest.approx([0.0, 0.0, -2.0], rel=1e-6)
    # no in-vocab token / NULL text -> NULL embedding (explicit abstain)
    assert out[3] is None and out[4] is None


def test_embeddings_feed_the_ann_stack(spark, tmp_path):
    """End-to-end: text -> embeddings -> brute-force cosine top-k."""
    from transmogrifai_spark.llm.similarity import brute_force_topk
    p = tmp_path / "toy.vec"
    p.write_text(_VEC)
    vecs = load_word_vectors(spark, str(p))
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "quick fox"), (3, "dog dog the")],
        "i long, t string")
    emb = embed_documents(df, "t", vecs, id_col="i") \
        .where(F.col("embedding").isNotNull())
    top = brute_force_topk(emb.select(F.col("i").alias("vec_id"),
                                      F.col("embedding")),
                           emb.select(F.col("i").alias("vec_id"),
                                      F.col("embedding"))
                           .where(F.col("vec_id") == 1),
                           "vec_id", "embedding", k=2)
    got = [r["neighbor_id"] for r in top.orderBy("rank").collect()]
    # self-matches are excluded: nearest to doc1 is doc2 (shares
    # quick+fox), then doc3
    assert got == [2, 3]


def test_portable_pooling_matches_default(spark, tmp_path):
    """portable=True (decimal per-position means) agrees with the
    Summarizer running mean to float precision, and is layout-invariant
    (the determinism contract that makes it oracle-gateable)."""
    p = tmp_path / "toy.vec"
    p.write_text(_VEC)
    vecs = load_word_vectors(spark, str(p))
    df = spark.createDataFrame(
        [(1, "the quick fox dog the"), (2, "dog quick")],
        "i long, t string")
    fast = {r["i"]: r["embedding"] for r in
            embed_documents(df, "t", vecs, id_col="i").collect()}
    port = {r["i"]: r["embedding"] for r in
            embed_documents(df, "t", vecs, id_col="i",
                            portable=True).collect()}
    for i in fast:
        assert port[i] == pytest.approx(fast[i], rel=1e-5)
    # layout invariance: repartitioned input produces BIT-equal output
    port2 = {r["i"]: r["embedding"] for r in
             embed_documents(df.repartition(7), "t", vecs, id_col="i",
                             portable=True).collect()}
    assert port2 == port
