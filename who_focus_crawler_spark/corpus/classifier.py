"""Hashed-feature linear text classifier (the fastText / Vowpal-Wabbit
pattern, hashing trick per Weinberger et al., ICML 2009).

Production pipelines gate documents with a cheap linear classifier over
hashed token features (quality-vs-junk, domain-vs-out-of-domain — the
GPT-3/LLaMA "quality classifier" stage). Both halves are slim
relational aggregations, the same plan shape at sf0.001 and 100 TB:

  fit:    explode tokens → bucket = md5-hash mod n_buckets → one
          partial+final count aggregation per (bucket) with the label
          folded in — the "model" IS a (bucket, weight) table, at most
          ``n_buckets`` rows (a few MB — broadcastable by construction);
  score:  explode → broadcast-join the model (zero shuffle of the
          corpus side for the join) → per-doc integer mean, one shuffle
          of slim (doc_id, weight) pairs with map-side partial agg.

Weights are integer permille P(positive | bucket) rather than float
log-odds so both engines agree bit-for-bit (the repo-wide integer-
arithmetic determinism rule; the score is a monotone transform of
naive Bayes with uniform feature weighting, which is what a
separability gate needs). No Python UDFs anywhere.

Oracle: ``d_text_classifier`` fits on a hash-split train set and
scores every document, value-exact vs a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, tokens

DEFAULT_BUCKETS = 1 << 12


def feature_buckets(text: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Token → hashed feature bucket ids (array<long>, order kept)."""
    return F.transform(
        tokens(text),
        lambda tk: F.pmod(
            md5_hash60(F.concat(F.lit("feat|"), tk)), F.lit(n_buckets)
        ),
    )


def classifier_fit(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    min_support: int = 1,
) -> DataFrame:
    """Fit the bucket-weight table from labeled documents.

    ``label_col`` must be boolean. Output: (bucket, weight_permille,
    support) — weight = ⌊1000·positives/total⌋ among token occurrences
    landing in the bucket; buckets with support < ``min_support`` drop
    (hapax noise control).
    """
    ex = docs.select(
        F.col(label_col).alias("_y"),
        F.explode(feature_buckets(F.col(text_col), n_buckets)).alias("bucket"),
    )
    return (
        ex.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
            F.count("*").alias("support"),
        )
        .filter(F.col("support") >= min_support)
        .select(
            "bucket",
            F.expr("(1000 * _pos) div support").cast("long").alias(
                "weight_permille"
            ),
            F.col("support").cast("long"),
        )
    )


def classifier_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    default_permille: int = 500,
    threshold_permille: int = 500,
) -> DataFrame:
    """Score every document against a fitted model.

    Unseen buckets score the neutral ``default_permille``; documents
    with zero tokens keep it too. Output: (id, n_feats, score_permille,
    predicted) with score = ⌊mean feature weight⌋ — integer, engine-
    portable, monotone in the evidence.
    """
    ex = docs.select(
        F.col(id_col),
        F.explode(feature_buckets(F.col(text_col), n_buckets)).alias("bucket"),
    )
    scored = (
        ex.join(F.broadcast(model.select("bucket", "weight_permille")), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(
                F.coalesce("weight_permille", F.lit(default_permille))
            ).alias("_w"),
        )
        .select(
            id_col,
            F.col("n_feats").cast("long"),
            F.expr("_w div n_feats").cast("long").alias("score_permille"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("score_permille", F.lit(default_permille))
            .cast("long")
            .alias("score_permille"),
        )
        .withColumn(
            "predicted", F.col("score_permille") >= F.lit(threshold_permille)
        )
    )
