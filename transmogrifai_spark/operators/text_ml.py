"""Spark-ML-wrapped text/vector stages (SURVEY.md §2.10 tail).

Re-expression of the reference's thin ml wrappers:
  * OpCountVectorizer  core/.../impl/feature/OpCountVectorizer.scala:44
  * OpHashingTF        OpHashingTF.scala:50 (expression form in vectorizers.py)
  * TF-IDF             core/.../dsl/RichListFeature.scala:59-93
  * OpWord2Vec         OpWord2Vec.scala:41
  * OpLDA              OpLDA.scala:41
  * OpNGram            OpNGram.scala:52 (expression form in functions/text.py)
  * OpStopWordsRemover OpStopWordsRemover.scala:48 (expression form ditto)

These are DataFrameTransformer stages: the wrapped ``pyspark.ml`` estimator
fits on the token column and its model transforms the frame (the reference's
SwUnaryEstimator pattern, core/.../sparkwrappers/generic/). Vector outputs
are converted to array<double> to stay within the engine's physical model.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..feature import Feature
from ..stages.base import DataFrameTransformer, Estimator


def _vec_to_array(df: DataFrame, col: str) -> DataFrame:
    from pyspark.ml.functions import vector_to_array
    return df.withColumn(col, vector_to_array(F.col(col)))


def count_vectorizer(feat: Feature, vocab_size: int = 1 << 10, min_df: float = 1.0,
                     output_name: str | None = None) -> Estimator:
    """OpCountVectorizer.scala:44 — vocabulary count vectors over a token
    array column."""
    out = output_name or f"{feat.name}_counts"

    def fit(stage: Estimator, df: DataFrame):
        from pyspark.ml.feature import CountVectorizer
        cv = CountVectorizer(inputCol=feat.name, outputCol=out,
                             vocabSize=vocab_size, minDF=min_df).fit(df)
        st = DataFrameTransformer("countVectorizer", [feat], out, "OPVector",
                                  lambda d: _vec_to_array(cv.transform(d), out))
        st.vocabulary = list(cv.vocabulary)
        return st

    return Estimator("countVectorizer", [feat], out, "OPVector", fit)


def tfidf(feat: Feature, num_features: int = 1 << 9,
          output_name: str | None = None) -> Estimator:
    """TF-IDF (RichListFeature.tfidf): HashingTF -> IDF, fitted document
    frequencies."""
    out = output_name or f"{feat.name}_tfidf"

    def fit(stage: Estimator, df: DataFrame):
        from pyspark.ml.feature import IDF, HashingTF
        tf = HashingTF(inputCol=feat.name, outputCol="_tf", numFeatures=num_features)
        with_tf = tf.transform(df)
        idf = IDF(inputCol="_tf", outputCol=out).fit(with_tf)

        def transform(d: DataFrame) -> DataFrame:
            return _vec_to_array(
                idf.transform(tf.transform(d)).drop("_tf"), out)

        return DataFrameTransformer("tfidf", [feat], out, "OPVector", transform)

    return Estimator("tfidf", [feat], out, "OPVector", fit)


def word2vec(feat: Feature, vector_size: int = 32, min_count: int = 1,
             seed: int = 42, output_name: str | None = None) -> Estimator:
    """OpWord2Vec.scala:41 — token embeddings averaged per document."""
    out = output_name or f"{feat.name}_w2v"

    def fit(stage: Estimator, df: DataFrame):
        from pyspark.ml.feature import Word2Vec
        w2v = Word2Vec(inputCol=feat.name, outputCol=out, vectorSize=vector_size,
                       minCount=min_count, seed=seed).fit(df)
        return DataFrameTransformer("word2vec", [feat], out, "OPVector",
                                    lambda d: _vec_to_array(w2v.transform(d), out))

    return Estimator("word2vec", [feat], out, "OPVector", fit)


def lda_topics(feat: Feature, k: int = 5, max_iter: int = 10, seed: int = 42,
               vocab_size: int = 1 << 10, output_name: str | None = None) -> Estimator:
    """OpLDA.scala:41 — topic distribution vectors (CountVectorizer -> LDA)."""
    out = output_name or f"{feat.name}_topics"

    def fit(stage: Estimator, df: DataFrame):
        from pyspark.ml.clustering import LDA
        from pyspark.ml.feature import CountVectorizer
        cv = CountVectorizer(inputCol=feat.name, outputCol="_counts",
                             vocabSize=vocab_size).fit(df)
        lda = LDA(featuresCol="_counts", topicDistributionCol=out, k=k,
                  maxIter=max_iter, seed=seed, optimizer="online").fit(cv.transform(df))

        def transform(d: DataFrame) -> DataFrame:
            return _vec_to_array(lda.transform(cv.transform(d)).drop("_counts"), out)

        return DataFrameTransformer("lda", [feat], out, "OPVector", transform)

    return Estimator("lda", [feat], out, "OPVector", fit)
