"""Canonical URL election: each preference tier decides, singleton
groups self-elect, output is a total per-URL map."""

from __future__ import annotations

from who_focus_crawler_spark.operators.canonical import elect_canonical


def _run(spark, urls, h="h1"):
    df = spark.createDataFrame(
        [(u, h) for u in urls], ["canon_url", "content_hash"]
    )
    rows = elect_canonical(df).collect()
    winner = {r.canon_url for r in rows if r.is_canonical}
    assert len(winner) == 1
    assert all(r.canonical_url == next(iter(winner)) for r in rows)
    return next(iter(winner))


def test_https_beats_http(spark):
    assert _run(spark, [
        "http://a.org/p/1", "https://a.org/p/1",
    ]) == "https://a.org/p/1"


def test_fewer_params_beats_more(spark):
    assert _run(spark, [
        "https://a.org/p/1?utm=x&ref=y", "https://a.org/p/1?utm=x",
        "https://a.org/p/1",
    ]) == "https://a.org/p/1"


def test_shallower_path_beats_deeper(spark):
    assert _run(spark, [
        "https://a.org/arc/p/1", "https://a.org/p/1",
    ]) == "https://a.org/p/1"


def test_shorter_then_lexicographic(spark):
    assert _run(spark, [
        "https://mirror-a.org/p/1", "https://a.org/p/1",
    ]) == "https://a.org/p/1"
    assert _run(spark, [
        "https://b.org/p/1", "https://a.org/p/1",
    ]) == "https://a.org/p/1"


def test_scheme_dominates_params(spark):
    # https with params still beats http without: tiers are ordered
    assert _run(spark, [
        "http://a.org/p/1", "https://a.org/p/1?utm=x&ref=y",
    ]) == "https://a.org/p/1?utm=x&ref=y"


def test_singletons_self_elect_and_groups_isolated(spark):
    df = spark.createDataFrame(
        [
            ("https://a.org/1", "hA"),
            ("http://b.org/1", "hB"),
            ("https://b.org/1", "hB"),
        ],
        ["canon_url", "content_hash"],
    )
    got = {r.canon_url: r for r in elect_canonical(df).collect()}
    assert got["https://a.org/1"].is_canonical
    assert got["https://a.org/1"].canonical_url == "https://a.org/1"
    assert got["https://b.org/1"].is_canonical
    assert not got["http://b.org/1"].is_canonical
    assert got["http://b.org/1"].canonical_url == "https://b.org/1"
