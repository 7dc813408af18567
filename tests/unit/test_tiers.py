"""Crawl-tier assignment: equal-population bands, geometric revisit
intervals, parallelism invariance of the distributed rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.tiers import assign_crawl_tiers


def _stats(spark, n=16):
    rows = [
        (f"h{i:02d}", (i * 37) % 100 + 1, (i * 13) % 50) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, ["host", "rank_units", "change_permille"]
    )


def test_tiers_match_python_reference(spark):
    got = {
        r.host: (r.tier_score, r.tier, r.revisit_batches)
        for r in assign_crawl_tiers(
            _stats(spark), n_tiers=4, base_interval=2
        ).collect()
    }
    rows = [(f"h{i:02d}", (i * 37) % 100 + 1, (i * 13) % 50) for i in range(16)]
    scored = sorted(
        ((-(r * (c + 1)), h) for h, r, c in rows)
    )  # desc score, asc host
    n = len(scored)
    want = {}
    for rk0, (neg, h) in enumerate(scored):
        tier = rk0 * 4 // n
        want[h] = (-neg, tier, 2 << tier)
    assert got == want
    # equal-population bands: 16 hosts / 4 tiers = 4 each
    from collections import Counter

    assert Counter(t for _, t, _ in got.values()) == {0: 4, 1: 4, 2: 4, 3: 4}


def test_tiers_parallelism_invariance(spark):
    s = _stats(spark, 40)
    one = sorted(
        (r.host, r.tier)
        for r in assign_crawl_tiers(s.repartition(1), n_tiers=3).collect()
    )
    many = sorted(
        (r.host, r.tier)
        for r in assign_crawl_tiers(s.repartition(11), n_tiers=3).collect()
    )
    assert one == many


def test_tiers_guard(spark):
    with pytest.raises(ValueError):
        assign_crawl_tiers(_stats(spark), n_tiers=0)


def test_single_tier_degenerates_to_constant(spark):
    out = assign_crawl_tiers(_stats(spark), n_tiers=1, base_interval=5)
    assert {r.tier for r in out.collect()} == {0}
    assert {r.revisit_batches for r in out.collect()} == {5}


def test_due_for_revisit_semantics(spark):
    from who_focus_crawler_spark.operators.tiers import due_for_revisit

    tiers = spark.createDataFrame(
        [("a", 0, 2), ("b", 1, 4), ("c", 2, 8), ("d", 0, 2)],
        ["host", "tier", "revisit_batches"],
    )
    lf = spark.createDataFrame(
        [("a", 10), ("b", 9), ("c", 1)], ["host", "last_batch"]
    )
    out = {
        r.host: (r.due, r.overdue)
        for r in due_for_revisit(tiers, lf, current_batch=12).collect()
    }
    assert out["a"] == (True, 0)     # 12-10=2 >= 2, exactly at deadline
    assert out["b"] == (False, -1)   # 12-9=3 < 4
    assert out["c"] == (True, 3)     # 12-1=11 >= 8
    assert out["d"][0] is True       # never fetched → due immediately
