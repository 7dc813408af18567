"""Largest-remainder budget apportionment (operators/apportion.py):
sums to the budget exactly, matches a Python Hamilton reference,
zero-weight and all-zero edge cases, parallelism invariance, negative
weights rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.apportion import apportion_budget


def w_df(spark, pairs):
    return spark.createDataFrame(pairs, "host string, weight long")


def hamilton(pairs, n):
    tw = sum(w for _, w in pairs)
    if tw == 0:
        return {h: 0 for h, _ in pairs}
    base = {h: (w * n) // tw for h, w in pairs}
    rem = {h: (w * n) % tw for h, w in pairs}
    r = n - sum(base.values())
    for h, _ in sorted(pairs, key=lambda p: (-rem[p[0]], p[0]))[:r]:
        base[h] += 1
    return base


WEIGHTS = [(f"h{i}", (i * 7919 + 13) % 997) for i in range(60)] + [
    ("zero", 0)
]


def test_matches_python_reference_and_sums_exactly(spark):
    for budget in (1, 17, 10_000):
        got = {
            r.host: r.budget
            for r in apportion_budget(w_df(spark, WEIGHTS), budget).collect()
        }
        assert got == hamilton(WEIGHTS, budget)
        assert sum(got.values()) == budget
    assert got["zero"] == 0


def test_all_zero_weights(spark):
    got = apportion_budget(
        w_df(spark, [("a", 0), ("b", 0)]), 5
    ).collect()
    assert {r.budget for r in got} == {0}


def test_parallelism_invariance(spark):
    df = w_df(spark, WEIGHTS)
    a = sorted(map(tuple, apportion_budget(df, 777).collect()))
    b = sorted(
        map(tuple, apportion_budget(df.repartition(13), 777).collect())
    )
    assert a == b


def test_negative_weight_rejected(spark):
    with pytest.raises(ValueError, match="negative"):
        apportion_budget(w_df(spark, [("a", -1)]), 10)
    with pytest.raises(ValueError, match="total_budget"):
        apportion_budget(w_df(spark, [("a", 1)]), -1)
