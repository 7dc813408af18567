"""C17 salting: the two-phase salted top-k must be EXACTLY equivalent to
the direct per-host window on a deliberately hot-domain-skewed frontier
(SURVEY.md §7 hard-part 6: salting exercised by tests, not just claimed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.frontier import host_order, select_candidates
from who_focus_crawler_spark.operators.salting import (
    detect_hot_hosts,
    topk_per_host_salted,
)


def _skewed_frontier(spark, n=20000, hot_share=0.6, n_hosts=30):
    """hot host h0 owns `hot_share` of all URLs."""
    hot_n = int(n * hot_share)
    df = spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit("h0.test"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % (n_hosts - 1) + 1).cast("string"), F.lit(".test")))
        .alias("host"),
        F.concat(F.lit("http://x/p/"), F.col("id").cast("string")).alias("canon_url"),
        (F.col("id") % 97).cast("double").alias("priority"),
        (F.col("id") % 5).cast("int").alias("depth"),
    ).withColumn("url_hash", F.xxhash64("canon_url"))
    return df


def test_salted_topk_equals_direct(spark):
    fr = _skewed_frontier(spark)
    direct = select_candidates(fr, 7, salt=1)
    salted = topk_per_host_salted(fr, 7, host_order(), s=16)
    key = ["host", "canon_url"]
    a = {tuple(r) for r in direct.select(*key).collect()}
    b = {tuple(r) for r in salted.select(*key).collect()}
    assert a == b
    assert len(a) > 0
    # no host exceeds k
    per_host = salted.groupBy("host").count().collect()
    assert all(r["count"] <= 7 for r in per_host)


def test_salted_topk_various_s(spark):
    fr = _skewed_frontier(spark, n=5000)
    base = {
        tuple(r)
        for r in select_candidates(fr, 3, salt=1).select("host", "canon_url").collect()
    }
    for s in (2, 5, 64):
        got = {
            tuple(r)
            for r in topk_per_host_salted(fr, 3, host_order(), s=s)
            .select("host", "canon_url")
            .collect()
        }
        assert got == base, s


def test_detect_hot_hosts(spark):
    fr = _skewed_frontier(spark, n=20000, hot_share=0.6)
    hot = detect_hot_hosts(fr, skew_ratio=4.0, min_rows=1000).collect()
    assert [r.host for r in hot] == ["h0.test"]
    assert hot[0].n_urls == 12000
