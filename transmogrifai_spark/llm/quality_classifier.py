"""Supervised quality classification for corpus curation — the
fastText-style quality-filter pattern used by large training-data
pipelines (GPT-3 appendix A's WebText-vs-CommonCrawl logistic filter;
CCNet's target-domain classifier; DCLM's fastText filter): train a
LINEAR classifier on hashed token-n-gram features over small seed sets of
"high-quality" vs "low-quality" documents, score the whole corpus, then
keep documents by a Pareto-smoothed rule rather than a hard cutoff.

Scale design:
  * Features are hashed (HashingTF — no vocabulary fit, no driver state),
    so training reads the seed sets once and corpus scoring is a single
    map-side pass; the model is O(num_features) coefficients.
  * Scoring runs through Spark ML's JVM transform (vectorized, no Python
    row UDFs — asserted by the plan-audit test).
  * The Pareto keep rule is a pure column expression on a deterministic
    per-document unit hash — pushable, reproducible across runs and
    partition layouts, and monotone in the quality score (law-tested):
    keep iff  u^(-1/alpha) - 1 > 1 - score  (u uniform from the id hash),
    the published np.random.pareto(alpha) > 1 - score rule made
    deterministic.

Related surface: llm/lm_score.py is the UNsupervised quality signal
(perplexity head); llm/quality_rules.py the heuristic one (Gopher/C4).
This module is the supervised third leg.

Reference parity note: TransmogrifAI has no corpus-curation layer; the
nearest reference surface is the text vectorizer + model-selection spine
(core/.../impl/feature/OpHashingTF + classification wrappers), which this
composes Spark-first.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngrams, tokenize
from ..util import ensure_parallelism


def _feature_tokens(c: Column, use_bigrams: bool = True) -> Column:
    toks = tokenize(c)
    if use_bigrams:
        return F.concat(toks, ngrams(toks, 2))
    return toks


class QualityClassifier:
    """Fitted quality filter: hashed-n-gram logistic model + metadata.
    ``score`` adds a ``quality_prob`` column (P(high-quality))."""

    def __init__(self, model, num_features: int, use_bigrams: bool,
                 text_col: str):
        self.model = model
        self.num_features = num_features
        self.use_bigrams = use_bigrams
        self.text_col = text_col

    def score(self, df: DataFrame, text_col: str | None = None,
              out_col: str = "quality_prob") -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        tc = text_col or self.text_col
        feat = df.withColumn(
            "__qtoks", _feature_tokens(F.col(tc), self.use_bigrams))
        scored = self.model.transform(ensure_parallelism(feat))
        return (scored.withColumn(
            out_col, vector_to_array(F.col("__qprob")).getItem(1))
            .drop("__qtoks", "__qtf", "__qraw", "__qpred", "__qprob"))


def train_quality_classifier(pos: DataFrame, neg: DataFrame,
                             text_col: str = "text",
                             num_features: int = 1 << 16,
                             use_bigrams: bool = True,
                             reg_param: float = 1e-4,
                             max_iter: int = 50) -> QualityClassifier:
    """Fit the quality filter from seed sets: ``pos`` = documents like the
    corpus you want (reference text), ``neg`` = documents like the raw
    crawl you are filtering. Deterministic: LBFGS from a zero start on a
    fixed feature hashing — two fits on the same inputs agree."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    labeled = (pos.select(F.col(text_col).alias("__qt"),
                          F.lit(1.0).alias("__ql"))
               .unionByName(neg.select(F.col(text_col).alias("__qt"),
                                       F.lit(0.0).alias("__ql"))))
    feat = labeled.withColumn("__qtoks",
                              _feature_tokens(F.col("__qt"), use_bigrams))
    tf = HashingTF(inputCol="__qtoks", outputCol="__qtf",
                   numFeatures=num_features)
    lr = LogisticRegression(featuresCol="__qtf", labelCol="__ql",
                            regParam=reg_param, maxIter=max_iter,
                            rawPredictionCol="__qraw",
                            predictionCol="__qpred",
                            probabilityCol="__qprob")
    model = Pipeline(stages=[tf, lr]).fit(ensure_parallelism(feat))
    return QualityClassifier(model, num_features, use_bigrams, text_col)


def pareto_keep_expr(id_col: Column, score_col: Column, alpha: float = 9.0,
                     seed: int = 42) -> Column:
    """GPT-3's quality re-sampling rule as a deterministic expression:
    keep a document iff ``pareto(alpha) > 1 - score`` where the Pareto
    draw comes from the document's OWN id hash (u uniform in (0, 1],
    pareto = u^(-1/alpha) - 1 by inverse CDF). Properties the tests pin:

    * deterministic — same id, same verdict, any partition layout;
    * monotone — raising a doc's score can only flip drop -> keep;
    * score >= 1 always keeps (pareto > 0 for u < 1);
    * keep probability for score s < 1 is (2 - s)^(-alpha): low-quality
      docs survive occasionally (the smoothing that avoids a cliff at
      the classifier boundary), high-quality docs almost surely.
    """
    from .curation import hash_bucket

    u = (hash_bucket(id_col, seed) + F.lit(1.0)) / F.lit(1e6)  # (0, 1]
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return pareto > (F.lit(1.0) - score_col)


def pareto_quality_sample(df: DataFrame, id_col: str, score_col: str,
                          alpha: float = 9.0, seed: int = 42) -> DataFrame:
    """Filter ``df`` by the Pareto quality rule — a pure pushable
    predicate (no shuffle, no UDF)."""
    return df.where(pareto_keep_expr(F.col(id_col), F.col(score_col),
                                     alpha=alpha, seed=seed))
