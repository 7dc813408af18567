"""MERGE/upsert operator: update vs preserve vs insert paths, NULL
handling, and the cardinality guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from who_focus_crawler_spark.operators.merge import merge_upsert


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "bal"],
    )
    source = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)], ["k", "name", "bal"]
    )
    return target, source


def test_update_all_and_insert(spark):
    target, source = _frames(spark)
    out = {r.k: (r.name, r.bal) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),   # untouched
        2: ("B2", 99.0),  # matched: all non-key cols updated
        3: ("c", 30.0),
        4: ("d", 40.0),   # inserted
    }


def test_partial_update_preserves_other_columns(spark):
    target, source = _frames(spark)
    out = {
        r.k: (r.name, r.bal)
        for r in merge_upsert(target, source, ["k"], update_cols=["bal"]).collect()
    }
    assert out[2] == ("b", 99.0)  # name preserved, bal updated
    assert out[4] == ("d", 40.0)  # insert takes every source column


def test_duplicate_source_keys_raise(spark):
    target, _ = _frames(spark)
    dup = spark.createDataFrame([(2, "x", 1.0), (2, "y", 2.0)], ["k", "name", "bal"])
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_upsert(target, dup, ["k"])
    # strict=False lets the caller accept the fan-out explicitly
    assert merge_upsert(target, dup, ["k"], strict=False).count() == 4


def test_null_keys_match_null_safely(spark):
    target = spark.createDataFrame([(None, "t", 1.0)], "k int, name string, bal double")
    source = spark.createDataFrame([(None, "s", 2.0)], "k int, name string, bal double")
    rows = merge_upsert(target, source, ["k"]).collect()
    assert len(rows) == 1 and rows[0].bal == 2.0  # NULL key upserts in place


def test_missing_source_column_rejected(spark):
    target, source = _frames(spark)
    with pytest.raises(ValueError, match="lacks target columns"):
        merge_upsert(target, source.drop("bal"), ["k"])
