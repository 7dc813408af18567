"""corpus/classifier.py — hashed-feature linear classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.classifier import (
    classifier_fit,
    classifier_score,
    feature_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def _toy(spark):
    # positives talk about spark engines, negatives about garden slugs
    rows = [(i, f"spark engine shuffle partition run {i}", True) for i in range(10)]
    rows += [(i + 10, f"slug garden rain leaf mud {i}", False) for i in range(10)]
    return _docs(spark, rows)


def test_separable_corpus_scores_separate(spark):
    d = _toy(spark)
    model = classifier_fit(d, "y", n_buckets=256)
    out = {
        r["doc_id"]: (r["score_permille"], r["predicted"])
        for r in classifier_score(d, model, n_buckets=256).collect()
    }
    for i in range(10):
        assert out[i][1] is True and out[i][0] > 500
        assert out[i + 10][1] is False and out[i + 10][0] < 500


def test_unseen_and_empty_text_get_neutral_default(spark):
    model = classifier_fit(_toy(spark), "y", n_buckets=256)
    probe = spark.createDataFrame(
        [(100, "zzz qqq vvv"), (101, ""), (102, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_feats"], r["score_permille"])
        for r in classifier_score(probe, model, n_buckets=256).collect()
    }
    # unseen tokens hash to buckets absent from the toy model with high
    # probability at 256 buckets and 10 distinct train tokens; empty/
    # null texts have zero features and keep the exact default
    assert out[101] == (0, 500)
    assert out[102] == (0, 500)
    assert out[100][0] == 3


def test_min_support_drops_hapax_buckets(spark):
    d = _docs(
        spark,
        [(1, "common common rare", True), (2, "common common", False)],
    )
    full = classifier_fit(d, "y", n_buckets=1024, min_support=1)
    pruned = classifier_fit(d, "y", n_buckets=1024, min_support=2)
    assert full.count() > pruned.count()
    assert pruned.filter(F.col("support") < 2).count() == 0


def test_feature_buckets_deterministic_and_bounded(spark):
    d = spark.range(1).select(F.lit("alpha beta alpha").alias("text"))
    a = d.select(feature_buckets(F.col("text"), 64).alias("b")).collect()[0]["b"]
    b = d.select(feature_buckets(F.col("text"), 64).alias("b")).collect()[0]["b"]
    assert a == b and len(a) == 3
    assert a[0] == a[2]  # same token, same bucket
    assert all(0 <= x < 64 for x in a)


def test_model_join_is_broadcast(spark):
    d = _toy(spark)
    model = classifier_fit(d, "y", n_buckets=256)
    plan = (
        classifier_score(d, model, n_buckets=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
