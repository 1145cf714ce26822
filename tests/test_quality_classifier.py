"""Supervised quality filter laws: separation on held-out docs,
determinism, JVM-only scoring plan, and the Pareto keep rule
(determinism / monotonicity / always-keep-at-1 / empirical rate)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.llm.quality_classifier import (
    pareto_keep_expr, pareto_quality_sample, train_quality_classifier)
from transmogrifai_spark.util import plan_audit


def _seed_sets(spark):
    good_words = ["research", "analysis", "theory", "method", "result",
                  "evidence", "study", "model", "data", "experiment"]
    bad_words = ["click", "free", "winner", "casino", "pills", "cheap",
                 "viagra", "prize", "subscribe", "buy"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    pos = spark.createDataFrame(
        [(i, doc(good_words, i)) for i in range(80)], ["doc_id", "text"])
    neg = spark.createDataFrame(
        [(i + 1000, doc(bad_words, i)) for i in range(80)],
        ["doc_id", "text"])
    return pos, neg


def test_quality_classifier_separates_held_out(spark):
    pos, neg = _seed_sets(spark)
    clf = train_quality_classifier(pos.limit(60), neg.limit(60),
                                   num_features=1 << 12)
    held = (pos.where(F.col("doc_id") >= 60)
            .withColumn("want", F.lit(1))
            .unionByName(neg.where(F.col("doc_id") >= 1060)
                         .withColumn("want", F.lit(0))))
    rows = clf.score(held).select("want", "quality_prob").collect()
    assert rows
    correct = sum((r["quality_prob"] > 0.5) == (r["want"] == 1) for r in rows)
    assert correct / len(rows) >= 0.95


def test_quality_classifier_deterministic(spark):
    pos, neg = _seed_sets(spark)
    a = train_quality_classifier(pos, neg, num_features=1 << 12)
    b = train_quality_classifier(pos, neg, num_features=1 << 12)
    sa = {r["doc_id"]: r["quality_prob"] for r in a.score(pos).collect()}
    sb = {r["doc_id"]: r["quality_prob"] for r in b.score(pos).collect()}
    assert sa == sb


def test_quality_scoring_plan_is_jvm_only(spark):
    pos, neg = _seed_sets(spark)
    clf = train_quality_classifier(pos, neg, num_features=1 << 12)
    findings = plan_audit(clf.score(pos))
    assert not [f for f in findings if f["rule"] == "python_udf"], findings


def test_pareto_rule_laws(spark):
    ids = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
    # score 1.0 always keeps (u < 1 => pareto > 0)
    full = ids.withColumn("s", F.lit(1.0))
    assert pareto_quality_sample(full, "doc_id", "s").count() >= 20_000 - 1
    # monotone: kept at score s stays kept at any s' > s (same id hash)
    lo = ids.withColumn("s", F.lit(0.3))
    hi = ids.withColumn("s", F.lit(0.6))
    kept_lo = {r["doc_id"] for r in
               pareto_quality_sample(lo, "doc_id", "s").collect()}
    kept_hi = {r["doc_id"] for r in
               pareto_quality_sample(hi, "doc_id", "s").collect()}
    assert kept_lo <= kept_hi
    # empirical keep rate ~ (2 - s)^(-alpha)
    alpha = 9.0
    rate = len(kept_lo) / 20_000
    want = (2 - 0.3) ** (-alpha)
    assert want * 0.5 < rate < want * 2.0
    # deterministic under repartition
    kept_lo2 = {r["doc_id"] for r in
                pareto_quality_sample(lo.repartition(13), "doc_id", "s")
                .collect()}
    assert kept_lo2 == kept_lo


def test_pareto_expr_is_pushable_filter(spark):
    ids = spark.range(0, 100).select(F.col("id").alias("doc_id"),
                                     F.lit(0.5).alias("s"))
    plan = ids.where(pareto_keep_expr(F.col("doc_id"), F.col("s")))
    findings = plan_audit(plan)
    assert not [f for f in findings if f["rule"] == "python_udf"], findings
