"""Two-pass Misra-Gries heavy hitters: exact equality with the plain
GROUP BY answer, candidate completeness across partitionings, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.heavy import heavy_hitters, mg_candidates


def _stream(spark, parts):
    # skewed stream: 'hot' 400x, 'warm' 150x, long tail of 300 singletons
    # repeated 3x each → n = 400 + 150 + 900 = 1450
    items = (
        ["hot"] * 400 + ["warm"] * 150 + [f"t{i}" for i in range(300)] * 3
    )
    return spark.createDataFrame(
        [(x,) for x in items], ["item"]
    ).repartition(parts)


def _exact(spark, df, k):
    n = df.count()
    return {
        (r.item, r.n_occurrences)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * (k + 1) > n)
        .collect()
    }


@pytest.mark.parametrize("parts", [1, 7])
def test_heavy_hitters_exact_across_partitionings(spark, parts):
    df = _stream(spark, parts)
    for k in (3, 10):
        got = {
            (r.item, r.n_occurrences)
            for r in heavy_hitters(df, k).collect()
        }
        assert got == _exact(spark, df, k)
    # k=3 → threshold n/4 = 362.5 → only 'hot'; non-vacuous check
    assert {r.item for r in heavy_hitters(df, 3).collect()} == {"hot"}


def test_candidates_superset_of_true_hitters(spark):
    # MG guarantee: every item with global count > n/(k+1) survives
    # pass 1, at any partitioning.
    for parts in (1, 4, 16):
        df = _stream(spark, parts)
        n = df.count()
        k = 5
        true_hh = {
            r.item
            for r in df.groupBy("item")
            .count()
            .filter(F.col("count") * (k + 1) > n)
            .collect()
        }
        cands = {
            r.item
            for r in mg_candidates(df, k).filter(F.col("kind") == 0).collect()
        }
        assert true_hh <= cands


def test_partition_row_counts_sum_to_n(spark):
    df = _stream(spark, 6)
    total = (
        mg_candidates(df, 4)
        .filter(F.col("kind") == 1)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total == df.count()


def test_guard(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_stream(spark, 1), 0)
