"""SCD Type 2 (operators/scd.py): build collapses consecutive identical
observations, null-safe change detection, tie-broken event order,
incremental apply closes/inserts correctly, and as-of lookups honor the
half-open ranges. Plus: NOT IN plans as a NULL-AWARE anti join and its
semantics differ from plain left_anti exactly when NULLs are present."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.scd import (
    scd2_apply,
    scd2_asof,
    scd2_build,
)

D = dt.date


def ev_df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, status string, ts date, tb long"
    )


EVENTS = [
    # key 1: A, A (collapse), B, A again (new version, not merged back)
    (1, "A", D(2024, 1, 1), 1),
    (1, "A", D(2024, 1, 5), 2),
    (1, "B", D(2024, 2, 1), 3),
    (1, "A", D(2024, 3, 1), 4),
    # key 2: NULL -> value -> NULL are all real changes; NULL==NULL is not
    (2, None, D(2024, 1, 1), 1),
    (2, None, D(2024, 1, 2), 2),
    (2, "X", D(2024, 1, 3), 3),
    (2, None, D(2024, 1, 4), 4),
    # key 3: same-day events tie-broken by tb — the LAST write wins the
    # open version
    (3, "P", D(2024, 1, 1), 1),
    (3, "Q", D(2024, 1, 1), 2),
]


def build(spark):
    return scd2_build(
        ev_df(spark, EVENTS), ["k"], ["status"], "ts", tie_cols=["tb"]
    )


def test_build_versions(spark):
    got = {
        (r.k, r.status, r.effective_from, r.effective_to, r.is_current)
        for r in build(spark).collect()
    }
    assert got == {
        (1, "A", D(2024, 1, 1), D(2024, 2, 1), False),
        (1, "B", D(2024, 2, 1), D(2024, 3, 1), False),
        (1, "A", D(2024, 3, 1), None, True),
        (2, None, D(2024, 1, 1), D(2024, 1, 3), False),
        (2, "X", D(2024, 1, 3), D(2024, 1, 4), False),
        (2, None, D(2024, 1, 4), None, True),
        (3, "P", D(2024, 1, 1), D(2024, 1, 1), False),
        (3, "Q", D(2024, 1, 1), None, True),
    }


def test_apply_close_insert_untouched(spark):
    dim = build(spark)
    updates = spark.createDataFrame(
        [
            (1, "Z", D(2024, 4, 1)),  # changed: close A, open Z
            (3, "Q", D(2024, 4, 1)),  # unchanged: untouched
            (9, "N", D(2024, 4, 1)),  # new key: first version
        ],
        "k long, status string, ts date",
    )
    out = scd2_apply(dim, updates, ["k"], ["status"], "ts")
    got = {
        (r.k, r.status, r.effective_from, r.effective_to, r.is_current)
        for r in out.collect()
    }
    assert (1, "A", D(2024, 3, 1), D(2024, 4, 1), False) in got
    assert (1, "Z", D(2024, 4, 1), None, True) in got
    assert (3, "Q", D(2024, 1, 1), None, True) in got
    assert (9, "N", D(2024, 4, 1), None, True) in got
    # exactly one current row per key, history depth preserved
    assert len(got) == 8 + 2  # 8 built + close-replacement + new key
    currents = [g for g in got if g[4]]
    assert {c[0] for c in currents} == {1, 2, 3, 9}


def test_apply_rejects_duplicate_update_keys(spark):
    dim = build(spark)
    updates = spark.createDataFrame(
        [(1, "Z", D(2024, 4, 1)), (1, "Y", D(2024, 4, 2))],
        "k long, status string, ts date",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        scd2_apply(dim, updates, ["k"], ["status"], "ts")


def test_asof_half_open(spark):
    dim = build(spark)
    at = {
        r.k: r.status for r in scd2_asof(dim, D(2024, 2, 1)).collect()
    }
    # 2024-02-01 is B's start (inclusive) and A's end (exclusive)
    assert at[1] == "B"
    at2 = {
        r.k: r.status for r in scd2_asof(dim, D(2024, 1, 31)).collect()
    }
    assert at2[1] == "A"


def test_not_in_is_null_aware(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    right_nulls = spark.createDataFrame([(2,), (None,)], "y long")
    left.createOrReplaceTempView("_naaj_l")
    right_nulls.createOrReplaceTempView("_naaj_r")
    q = spark.sql("SELECT x FROM _naaj_l WHERE x NOT IN (SELECT y FROM _naaj_r)")
    # semantics: one NULL in the list poisons every non-member
    assert q.count() == 0
    # plain left_anti (NOT null-aware) would return 2 rows
    assert left.join(right_nulls, left.x == right_nulls.y, "left_anti").count() == 2
    # plan: broadcast hash join runs in null-aware anti mode
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight, true" in plan
