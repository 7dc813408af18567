"""Deterministic sampling/splitting: reproducibility, disjointness,
and the no-shuffle plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.sampling import (
    SAMPLE_BUCKETS,
    fraction_threshold,
    hash_sample,
    sample_bucket,
    split_assign,
    stratified_sample,
)


def _docs(spark, n=2000, parts=8):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_sample_deterministic_and_partition_invariant(spark):
    a = sorted(
        r.doc_id for r in hash_sample(_docs(spark, parts=3), "doc_id", 0.3).collect()
    )
    b = sorted(
        r.doc_id for r in hash_sample(_docs(spark, parts=17), "doc_id", 0.3).collect()
    )
    assert a == b
    # fraction lands near target (md5 buckets are uniform)
    assert 0.25 * 2000 < len(a) < 0.35 * 2000


def test_hash_sample_is_subset_monotone(spark):
    """A smaller fraction with the same seed selects a subset of a
    larger one (threshold semantics, key-stable sample growth)."""
    small = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.1).collect()}
    big = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.4).collect()}
    assert small <= big


def test_hash_sample_plan_has_no_exchange(spark):
    base = spark.range(1000).select(F.col("id").alias("doc_id"))
    plan = hash_sample(
        base, "doc_id", 0.25
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # scan-level filter, no shuffle


def test_split_assign_exhaustive_disjoint_and_weighted(spark):
    out = split_assign(
        _docs(spark), "doc_id", {"train": 8, "val": 1, "test": 1}
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive: every row labeled
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400  # ~1600 expected
    # splits and an equally-seeded sample agree: bucket ranges partition
    thr = fraction_threshold(0.8)
    train_ids = {r.doc_id for r in out.filter(F.col("split") == "train").collect()}
    bucket = sample_bucket(F.col("doc_id"), "split")
    expect = {
        r.doc_id
        for r in _docs(spark).filter(bucket < F.lit(thr)).collect()
    }
    assert train_ids == expect


def test_stratified_sample_per_stratum_rates(spark):
    out = stratified_sample(
        _docs(spark), "doc_id", "lang", {"en": 0.6, "fr": 0.2},
        default_fraction=0.0,
    )
    n = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert "de" not in n  # default 0: stratum fully excluded
    assert n["en"] > n.get("fr", 0) * 2  # 0.6 vs 0.2 on ~equal strata


def test_seeds_are_independent(spark):
    """Different seeds must not select correlated key sets."""
    a = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.5, "sA").collect()}
    b = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.5, "sB").collect()}
    overlap = len(a & b) / 2000
    assert 0.15 < overlap < 0.35  # ≈0.25 if independent; equal-seed would be 0.5


def test_threshold_bounds():
    assert fraction_threshold(0.0) == 0
    assert fraction_threshold(1.0) == SAMPLE_BUCKETS
    import pytest

    with pytest.raises(ValueError):
        fraction_threshold(1.5)


def test_mixture_excludes_zero_token_docs_of_unlisted_sources(spark):
    """Zero-budget (unlisted) sources select nothing, even docs whose
    running total is 0 because they carry 0 tokens."""
    from who_focus_crawler_spark.corpus.mixture import mixture_select

    rows = [(1, "listed", 10), (2, "unlisted", 0), (3, "unlisted", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = mixture_select(df, {"listed": 1.0}, 100).collect()
    assert {r.doc_id for r in out} == {1}


def test_sample_bucket_matches_hashlib_twin(spark):
    """The Spark md5-bucket expression is pinned to an independent
    hashlib derivation (the convention every oracle encodes)."""
    import hashlib

    from who_focus_crawler_spark.corpus.sampling import sample_bucket

    keys = [*range(50), 2**40 + 7, 999999937]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r.k: r.b
        for r in df.select(
            "k", sample_bucket(F.col("k"), "sX").alias("b")
        ).collect()
    }
    for k in keys:
        h = hashlib.md5(f"sX:{k}".encode()).hexdigest()[:15]
        assert got[k] == int(h, 16) % SAMPLE_BUCKETS, k


# ---------------------------------------------------------------- weighted


def _weighted(spark, n=600, parts=4):
    # weight grows with id; ids ≡0 (mod 50) get a dominating weight
    return _docs(spark, n, parts).withColumn(
        "w",
        F.when(F.col("doc_id") % 50 == 0, F.lit(10_000_000)).otherwise(
            F.col("doc_id") % 97 + 1
        ),
    )


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from who_focus_crawler_spark.corpus.sampling import weighted_sample

    a = sorted(
        r.doc_id
        for r in weighted_sample(_weighted(spark, parts=2), "doc_id", "w", 25).collect()
    )
    b = sorted(
        r.doc_id
        for r in weighted_sample(_weighted(spark, parts=7), "doc_id", "w", 25).collect()
    )
    assert a == b and len(a) == 25


def test_weighted_sample_prefers_heavy_rows(spark):
    from who_focus_crawler_spark.corpus.sampling import weighted_sample

    picked = {
        r.doc_id
        for r in weighted_sample(_weighted(spark), "doc_id", "w", 12).collect()
    }
    heavy = {i for i in range(0, 600, 50)}
    # 12 heavy rows carry >99.9% of total weight: E-S keys u^(1/w) for
    # w=10^7 are all ≈1, so all 12 must be drawn before any light row
    assert heavy <= picked


def test_weighted_sample_per_stratum_k_and_nonpositive_excluded(spark):
    from who_focus_crawler_spark.corpus.sampling import weighted_sample

    df = _weighted(spark).withColumn(
        "w", F.when(F.col("lang") == "de", F.lit(0)).otherwise(F.col("w"))
    )
    out = weighted_sample(df, "doc_id", "w", 7, strata_col="lang").collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert per == {"en": 7, "fr": 7}  # de has only zero weights → absent
