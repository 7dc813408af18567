"""Binned interval join (operators/rangejoin.py): identical row set to
the naive theta join for any bin width, exactly-once pair emission for
multi-bin overlaps, zero-length and negative-coordinate handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.rangejoin import binned_interval_join


def mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rows)],
        f"{prefix}_id long, start long, end long",
    )


LEFT = [
    (0, 10),      # long interval spanning many small bins
    (5, 6),       # point-sized
    (100, 230),   # far away, long
    (-20, -3),    # negative coordinates
    (7, 7),       # empty: matches nothing
]
RIGHT = [
    (3, 12),      # overlaps 0-10 and 5-6
    (9, 10),      # overlaps 0-10 only (end exclusive vs 10? 9 < 10 yes)
    (10, 11),     # does NOT overlap [0,10) (start == left end)
    (225, 300),   # overlaps 100-230
    (-5, -4),     # inside the negative interval
    (500, 501),   # matches nothing
]


def naive(spark, l, r):
    return (
        l.join(
            r.select(
                F.col("r_id"),
                F.col("start").alias("rs"),
                F.col("end").alias("re"),
            ),
            (F.greatest(F.col("start"), F.col("rs"))
             < F.least(F.col("end"), F.col("re"))),
        )
        .select("l_id", "r_id")
    )


@pytest.mark.parametrize("width", [1, 3, 7, 64, 10_000])
def test_matches_naive_theta_join(spark, width):
    l, r = mk(spark, LEFT, "l"), mk(spark, RIGHT, "r")
    exp = sorted(map(tuple, naive(spark, l, r).collect()))
    got_df = binned_interval_join(
        l, r.withColumnRenamed("start", "rstart").withColumnRenamed(
            "end", "rend"
        ),
        bin_width=width,
        right_start="rstart",
        right_end="rend",
    )
    got = sorted(map(tuple, got_df.select("l_id", "r_id").collect()))
    assert got == exp
    assert len(got) == len(set(got))  # exactly-once, no per-bin dupes


def test_expected_pairs(spark):
    l, r = mk(spark, LEFT, "l"), mk(spark, RIGHT, "r")
    got = sorted(
        map(
            tuple,
            binned_interval_join(
                l,
                r.withColumnRenamed("start", "rstart").withColumnRenamed(
                    "end", "rend"
                ),
                bin_width=4,
                right_start="rstart",
                right_end="rend",
            ).select("l_id", "r_id").collect(),
        )
    )
    assert got == [(0, 0), (0, 1), (1, 0), (2, 3), (3, 4)]


def test_rejects_bad_args(spark):
    l = mk(spark, LEFT, "l")
    with pytest.raises(ValueError, match="bin_width"):
        binned_interval_join(l, l, bin_width=0)
    with pytest.raises(ValueError, match="inner"):
        binned_interval_join(l, l, bin_width=5, how="left")
