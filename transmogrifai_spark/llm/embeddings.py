"""Text -> embedding ingestion from PUBLIC word-vector file formats.

The similarity/ANN/SemDeDup stack (`llm/similarity.py`, `llm/dedup.py`)
consumes an ``array<float>`` embedding column; the testdata ships one
pre-computed. What was missing is the front door a real pipeline needs:
EMBED THE TEXT ITSELF from data the user already has. The dominant
public interchange formats for word embeddings are plain text — the
``.vec`` layout (header line ``<count> <dim>``, then
``word v1 .. vd`` per line; fastText's text export) and the
header-less GloVe layout — and classic mean-pooled word vectors remain
the standard cheap document embedding (the fastText
``get_sentence_vector`` family, minus subword ngrams — documented
delta below).

Scale shape: the vector FILE is parsed DISTRIBUTED (``spark.read.text``
+ split expressions — public embedding files run to GBs; never
driver-side), the per-document mean is ONE groupBy on the document id
with `pyspark.ml.stat.Summarizer` doing the element-wise running mean
JVM-side (no collect_list of per-token vectors, no dim-many aggregate
columns), and the token->vector join broadcasts when the vocabulary
fits (caller-controlled) or hash-joins otherwise.

Reference anchor: TransmogrifAI's text side stops at Word2Vec features
(core/.../impl/feature/OpWord2Vec.scala trains in-pipeline); ingesting
pre-trained public embedding files is part of the LLM-pipeline
extension set.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["load_word_vectors", "embed_documents"]


def load_word_vectors(spark, path: str, dim: int | None = None) -> DataFrame:
    """Parse a text word-vector file (``.vec`` with its ``count dim``
    header, or header-less GloVe) into ``(word string, vec
    array<float>)`` — distributed: one ``spark.read.text`` scan, split
    expressions, no driver materialization.

    ``dim`` pins the expected dimensionality; when omitted it is
    sniffed from the first data line (one small collect). Lines whose
    token count disagrees with ``dim``+1 are REJECTED with a count in
    the raised error rather than silently dropped — a truncated
    download should fail loudly. A 2-token line counts as the .vec
    ``count dim`` header ONLY when both tokens are plain integers; a
    truncated vector line ('word 0.12') is a bad line, not a header."""
    raw = spark.read.text(path).select(F.col("value").alias("ln"))
    toks = F.split(F.trim("ln"), r"\s+")
    parsed = raw.where(F.length(F.trim("ln")) > 0) \
        .select(toks.alias("t"))
    if dim is None:
        head = parsed.where(F.size("t") > 2).select(F.size("t")).head()
        if head is None:
            raise ValueError(f"{path!r} has no vector lines")
        dim = head[0] - 1
    good = parsed.where(F.size("t") == dim + 1)
    is_header = (F.size("t") == 2) & \
        F.element_at("t", 1).rlike("^[0-9]+$") & \
        F.element_at("t", 2).rlike("^[0-9]+$")
    n_bad = parsed.where((F.size("t") != dim + 1) & ~is_header).count()
    if n_bad:
        raise ValueError(
            f"{path!r}: {n_bad} lines disagree with dim={dim} "
            "(truncated file or wrong dim)")
    # try_cast, not cast: ANSI sessions would throw their own opaque
    # CAST_INVALID_INPUT from inside codegen before the explicit
    # non-numeric guard below can name the offending word
    vec = F.transform(F.slice("t", 2, dim),
                      lambda x: x.try_cast("float"))
    out = good.select(F.element_at("t", 1).alias("word"),
                      vec.alias("vec"))
    # a parse failure (non-numeric token) must fail loudly too: nulls
    # inside the cast vectors mean the file is not a vector table
    return out.withColumn(
        "vec",
        F.when(F.exists("vec", lambda x: x.isNull()),
               F.raise_error(F.concat(
                   F.lit("non-numeric vector component for word '"),
                   F.col("word"), F.lit("'"))))
        .otherwise(F.col("vec")))


def embed_documents(df: DataFrame, text_col: str, vectors: DataFrame,
                    id_col: str, out_col: str = "embedding",
                    lowercase: bool = True,
                    broadcast_vectors: bool = True,
                    portable: bool = False) -> DataFrame:
    """Mean-pooled word-vector document embeddings: tokenize ->
    token->vector join -> ONE id-keyed element-wise mean
    (``Summarizer.mean`` — the JVM running-mean aggregator, so no
    per-token vector list is ever materialized). Adds ``out_col``
    (array<float>); documents with NO in-vocabulary token (and
    empty/NULL text) get NULL — an explicit abstain, never a silent
    zero vector that would cosine-match everything equally.

    OOV tokens are skipped (the inner join) — fastText's subword-ngram
    backoff is a documented delta; supply subword-enriched .vec exports
    if OOV coverage matters. ``broadcast_vectors=False`` switches the
    vocabulary join to a shuffle hash join for vector tables past
    broadcast size (2M+ words x 300d).

    ``portable=True`` swaps the running-mean aggregator for the
    engine-portable decimal form (the geo_midpoint/BM25 determinism
    contract): per-position DECIMAL(30,8) sums divided by the token
    count — order-independent and SQL-replicable bit for bit, at the
    cost of a positions-explode (tokens x dim rows through the
    aggregation; the default Summarizer path never materializes them).
    Use it when embeddings feed a hash-compared or cross-engine
    pipeline; the default is the cheap path."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    from .textqual import TOKEN_PATTERN
    text = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        text = F.lower(text)
    toks = df.select(id_col, F.explode(
        F.regexp_extract_all(text, F.lit(f"({TOKEN_PATTERN})"), 1))
        .alias("word"))
    vt = vectors.select("word", "vec")
    joined = toks.join(F.broadcast(vt) if broadcast_vectors else vt,
                       "word", "inner")
    if portable:
        ex = joined.select(id_col,
                           F.posexplode("vec").alias("_pos", "_v"))
        dims = ex.groupBy(id_col, "_pos").agg(
            (F.sum(F.col("_v").cast("decimal(30,8)")).cast("double")
             / F.count(F.lit(1))).alias("_m"))
        means = dims.groupBy(id_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda s: s["_m"].cast("float")).alias(out_col))
    else:
        means = joined.groupBy(id_col).agg(
            Summarizer.mean(array_to_vector(F.col("vec"))).alias("_mv"))
        means = means.select(
            id_col,
            F.transform(vector_to_array("_mv"),
                        lambda x: x.cast("float")).alias(out_col))
    return df.join(means, id_col, "left")
