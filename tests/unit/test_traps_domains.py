"""Crawl-trap URL scoring and registrable-domain extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.domains import registrable_domain
from who_focus_crawler_spark.functions.traps import flag_traps, trap_features


def _score(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["canon_url"])
    return {r.canon_url: (r.trap_score, r.is_trap) for r in flag_traps(df).collect()}


def test_trap_feature_axes(spark):
    df = spark.createDataFrame(
        [("http://h.example.org/a/b/a/b/a/b?x=1&y=2",)], ["canon_url"]
    )
    feats = {
        k: df.select(v.alias("v")).first().v
        for k, v in trap_features(F.col("canon_url")).items()
    }
    assert feats == {
        "depth": 6, "repeats": 4, "n_params": 2, "calendar": 0, "longnum": 0
    }


def test_trap_scores(spark):
    out = _score(
        spark,
        [
            "http://h.example.org/p/1",  # clean
            "http://h.example.org/a/b/a/b/a/b",  # cycles
            "http://h.example.org/blog/2023/07/post",  # calendar
            "http://h.example.org/s/1234567890",  # long id
            "http://h.example.org/p/1?a=1&b=2&c=3&d=4&e=5",  # param fan-out
            "http://h.example.org/a/b/c/d/e/f/g/h/i",  # deep
            "http://h.example.org/d/2023-07-14",  # ISO date
        ],
    )
    assert out["http://h.example.org/p/1"] == (0, False)
    assert out["http://h.example.org/a/b/a/b/a/b"] == (12, True)
    assert out["http://h.example.org/blog/2023/07/post"] == (1, False)
    assert out["http://h.example.org/s/1234567890"] == (2, False)
    assert out["http://h.example.org/p/1?a=1&b=2&c=3&d=4&e=5"] == (4, True)
    assert out["http://h.example.org/a/b/c/d/e/f/g/h/i"] == (3, False)
    assert out["http://h.example.org/d/2023-07-14"] == (1, False)


def test_trap_root_url_is_clean(spark):
    out = _score(spark, ["http://h.example.org/"])
    assert out["http://h.example.org/"] == (0, False)


def test_registrable_domain(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.news.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "deep.sub.site.org": "site.org",
        "example.com": "example.com",
        "com": "com",  # degenerate: fewer labels than the rule needs
        "co.uk": "co.uk",  # bare suffix: returned unchanged
        "x.coluk.uk": "coluk.uk",  # 'coluk.uk' is NOT in the suffix set
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    got = {
        r.host: r.d
        for r in df.select("host", registrable_domain(F.col("host")).alias("d"))
        .collect()
    }
    assert got == cases


def test_registrable_domain_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "host string")
    assert (
        df.select(registrable_domain(F.col("host")).alias("d")).first().d is None
    )


def test_trap_embedded_url_in_query_does_not_hijack_path(spark):
    """Features must come from the URL's own path, not from a URL
    embedded in a query parameter (redirect/next/u= links)."""
    out = _score(
        spark,
        [
            "http://h.example.org/a/b/c/d/e/f/g/h/i?u=http://x.com/",
            "http://h.example.org/ok?u=https://e.com/a/b/a/b/a/b",
        ],
    )
    # deep own path still scores 3 despite the clean embedded URL
    assert out["http://h.example.org/a/b/c/d/e/f/g/h/i?u=http://x.com/"][0] == 3
    # clean own path stays clean despite the trap-shaped embedded URL
    assert out["http://h.example.org/ok?u=https://e.com/a/b/a/b/a/b"] == (0, False)


def test_domain_budget_caps_across_hosts(spark):
    """10 hosts of one registrable domain each admit 2 by host
    politeness; a domain budget of 5 keeps only the 5 best overall,
    while a second domain is unaffected."""
    from who_focus_crawler_spark.operators.domain_budget import (
        apply_domain_budget,
    )
    from who_focus_crawler_spark.operators.politeness import apply_politeness

    rows = []
    for h in range(10):
        for i in range(3):
            rows.append(
                (f"h{h}.big.example.com", float(100 - h), 0,
                 f"http://h{h}.big.example.com/p/{i}", True)
            )
    rows.append(("solo.other.org", 1.0, 0, "http://solo.other.org/p/0", True))
    df = spark.createDataFrame(
        rows, ["host", "priority", "depth", "canon_url", "robots_ok"]
    )
    out = apply_domain_budget(apply_politeness(df, 2), 5)
    kept = out.filter(F.col("admitted")).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.host)
    assert len(by_dom["example.com"]) == 5
    # highest-priority hosts win the domain budget (priority 100..98)
    assert set(by_dom["example.com"]) <= {
        "h0.big.example.com", "h1.big.example.com", "h2.big.example.com"
    }
    assert by_dom["other.org"] == ["solo.other.org"]
    # non-admitted rows are preserved, just not admitted
    assert out.count() == len(rows)


def test_registrable_domain_ipv4_literal_kept_whole(spark):
    df = spark.createDataFrame(
        [("192.168.0.1",), ("10.9.0.1",), ("256.1.example.com",)], ["host"]
    )
    got = {
        r.host: r.d
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got["192.168.0.1"] == "192.168.0.1"
    assert got["10.9.0.1"] == "10.9.0.1"
    # a dotted-but-named host still follows the label rule
    assert got["256.1.example.com"] == "example.com"


def test_url_path_template(spark):
    from who_focus_crawler_spark.functions.traps import url_path_template

    cases = [
        ("http://h3.example.org/p/12345", "h3.example.org/p/{N}"),
        ("http://h.test/a/b/a/b", "h.test/a/b/a/b"),
        ("http://h.test/2023/07/x99", "h.test/{N}/{N}/x{N}"),
        ("http://h.test/p?a=1&b=&next=http://evil.test/9",
         "h.test/p?a={V}&b={V}&next={V}"),
        # digit runs in the HOST are preserved (templating is path-only)
        ("http://h42.test/x7", "h42.test/x{N}"),
        ("http://h.test/", "h.test/"),
    ]
    df = spark.createDataFrame(cases, ["u", "want"]).select(
        "want", url_path_template(F.col("u")).alias("got")
    )
    for r in df.collect():
        assert r.got == r.want, (r.want, r.got)
