"""Skew diagnostics: uniform keys report no skew, planted skew yields
the salt fan-out that levels the hottest key."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.diagnostics import hot_keys, skew_summary


def test_uniform_keys_no_skew(spark):
    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    [s] = skew_summary(df, F.col("k")).collect()
    assert (s.n_rows, s.n_keys, s.max_n) == (1000, 50, 20)
    assert s.suggested_salt == 1
    assert hot_keys(df, F.col("k"), threshold_permille=50).count() == 0


def test_planted_skew_salt_and_hot_keys(spark):
    # one key with 600 rows, 40 keys with 10 each → total 1000
    df = spark.range(1000).select(
        F.when(F.col("id") < 600, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 40).cast("string")))
        .alias("k")
    )
    [s] = skew_summary(df, F.col("k")).collect()
    assert s.max_n == 600
    assert s.max_share_permille == 600
    # ceil(600 * 41 / 1000) = 25: hot key split 25 ways ≈ mean load
    assert s.suggested_salt == 25
    hot = hot_keys(df, F.col("k"), threshold_permille=100).collect()
    assert [(r.key, r.n, r.share_permille) for r in hot] == [("hot", 600, 600)]


def test_hot_keys_deterministic_order_and_cap(spark):
    df = spark.range(300).select(
        F.when(F.col("id") < 100, F.lit("a"))
        .when(F.col("id") < 200, F.lit("b"))
        .otherwise(F.lit("c"))
        .alias("k")
    )
    rows = hot_keys(df, F.col("k"), threshold_permille=1, top_k=2).collect()
    # equal counts → lexicographic tie-break, capped at 2
    assert [r.key for r in rows] == ["a", "b"]
