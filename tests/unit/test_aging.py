"""Frontier aging (operators/frontier.py::age_boosted_view).

The starvation-free selection view: effective priority grows by
boost_milli/1000 per batch waited, computed only from persisted columns
(priority, discovered_in_batch) so a resumed run rebuilds the identical
view. Checks: exact boost values, wait-zero clamp, no compounding
(stored frontier is untouched), and the overtaking guarantee — a deep
waiting row overtakes a fresh shallow one after the documented number
of batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.frontier import (
    age_boosted_view,
    select_candidates,
)


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "host string, canon_url string, priority double, depth int, "
        "discovered_in_batch int"
    )


def test_boost_values_exact(spark):
    fr = _frontier(
        spark,
        [
            ("h0", "u/a", -2.0, 2, 0),  # waited 4 at batch 5
            ("h0", "u/b", -1.0, 1, 3),  # waited 1
            ("h0", "u/c", 0.0, 0, 4),   # discovered last batch: waited 0
            ("h0", "u/d", 0.0, 0, 5),   # discovered THIS batch: clamp to 0
        ],
    )
    got = {
        r.canon_url: r.priority
        for r in age_boosted_view(fr, current_batch=5, boost_milli=500).collect()
    }
    assert got == {
        "u/a": -2.0 + 4 * 0.5,
        "u/b": -1.0 + 1 * 0.5,
        "u/c": 0.0,
        "u/d": 0.0,
    }


def test_view_does_not_compound(spark):
    """Applying the view twice from the same persisted frontier gives the
    same answer as once — the boost derives from stored columns only."""
    fr = _frontier(spark, [("h0", "u/a", -3.0, 3, 1)])
    once = age_boosted_view(fr, 9, 250).collect()[0].priority
    again = age_boosted_view(fr, 9, 250).collect()[0].priority
    assert once == again == -3.0 + 7 * 0.25
    # and the source frontier still carries the stored priority
    assert fr.collect()[0].priority == -3.0


def test_overtaking_bound(spark):
    """With boost_milli=500, a row 2 depth levels deeper overtakes a
    fresh arrival after waiting 2/(0.5) = 4 more batches than it."""
    old_deep = ("h0", "u/deep", -2.0, 2, 0)
    for batch, expect_first in [(3, "u/fresh"), (4, "u/fresh"), (6, "u/deep")]:
        fresh = ("h0", "u/fresh", 0.0, 0, batch - 1)
        fr = _frontier(spark, [old_deep, fresh])
        aged = age_boosted_view(fr, batch, 500)
        top = select_candidates(aged, 1).collect()[0].canon_url
        assert top == expect_first, (batch, top)


def test_parallelism_invariance(spark):
    """Same aged top-k regardless of partitioning of the input."""
    rows = [
        (
            f"h{i % 5}",
            f"https://h{i % 5}.example.org/p/{i}",
            float(-(i % 4)),
            i % 4,
            i % 7,
        )
        for i in range(200)
    ]
    fr = _frontier(spark, rows)
    sel1 = sorted(
        (r.host, r.canon_url, r.priority)
        for r in select_candidates(
            age_boosted_view(fr.coalesce(1), 10, 300), 3
        ).collect()
    )
    sel8 = sorted(
        (r.host, r.canon_url, r.priority)
        for r in select_candidates(
            age_boosted_view(fr.repartition(8, "canon_url"), 10, 300), 3
        ).collect()
    )
    assert sel1 == sel8 and len(sel1) == 15
