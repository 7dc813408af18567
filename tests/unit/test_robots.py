"""C8 robots gate: TTL'd cache refresh + vectorized longest-match."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.operators.robots import (
    apply_robots,
    refresh_robots_cache,
)
from who_focus_crawler_spark.sources.fixture_web import WebConfig


def _cand(spark, host, paths):
    return spark.createDataFrame(
        [(host, f"http://{host}{p}") for p in paths], ["host", "canon_url"]
    )


def test_robots_ttl_refetches_and_gate_flips(spark):
    """A host whose cached rules predate the TTL gets re-fetched; a rule
    change (stale disallow-all → live allow) flips the gate."""
    cfg = WebConfig(robots_ttl_batches=3)
    host = "h1.example.test"  # live fixture rules: allow all
    stale = spark.createDataFrame(
        [(host, json.dumps([[False, "/"]]), None, 1)], schemas.ROBOTS_CACHE
    )
    cand = _cand(spark, host, ["/p/1", "/p/2"])
    # batch 2: within TTL → stale disallow still applies
    cache2 = refresh_robots_cache(cand, stale, cfg, batch=2)
    assert [r.fetched_in_batch for r in cache2.collect()] == [1]
    assert not any(r.robots_ok for r in apply_robots(cand, cache2).collect())
    # batch 5: expired → re-fetch live rules → allowed
    cache5 = refresh_robots_cache(cand, stale, cfg, batch=5)
    rows = cache5.collect()
    assert [r.fetched_in_batch for r in rows] == [5]
    assert json.loads(rows[0].rules_json) == [[True, "/"]]
    assert all(r.robots_ok for r in apply_robots(cand, cache5).collect())


def test_robots_ttl_none_caches_forever(spark):
    cfg = WebConfig()  # robots_ttl_batches=None
    host = "h1.example.test"
    stale = spark.createDataFrame(
        [(host, json.dumps([[False, "/"]]), None, 1)], schemas.ROBOTS_CACHE
    )
    cand = _cand(spark, host, ["/p/1"])
    cache = refresh_robots_cache(cand, stale, cfg, batch=500)
    assert [r.fetched_in_batch for r in cache.collect()] == [1]
    assert not apply_robots(cand, cache).collect()[0].robots_ok


def test_robots_ttl_evicts_expired_unused_hosts(spark):
    """Expired rows for hosts NOT in this batch leave the cache (they
    re-fetch on next use); fresh rows pass through."""
    cfg = WebConfig(robots_ttl_batches=3)
    cache = spark.createDataFrame(
        [
            ("h1.example.test", json.dumps([[True, "/"]]), None, 1),  # expired
            ("h2.example.test", json.dumps([[True, "/"]]), None, 9),  # fresh
        ],
        schemas.ROBOTS_CACHE,
    )
    cand = _cand(spark, "h2.example.test", ["/p/1"])
    out = refresh_robots_cache(cand, cache, cfg, batch=10)
    assert {r.host: r.fetched_in_batch for r in out.collect()} == {
        "h2.example.test": 9
    }


def test_robots_match_vectorized_longest_match(spark):
    """Multiple rule sets in one batch, longest-match per row, null rules
    allowed — exercised through the vectorized pandas UDF path."""
    rules_a = json.dumps([[False, "/private/"], [True, "/private/p/0"]])
    rules_b = json.dumps([[False, "/"]])
    cache = spark.createDataFrame(
        [("a.t", rules_a, None, 1), ("b.t", rules_b, None, 1)],
        schemas.ROBOTS_CACHE,
    )
    cand = spark.createDataFrame(
        [
            ("a.t", "http://a.t/p/1", True),
            ("a.t", "http://a.t/private/p/1", False),
            ("a.t", "http://a.t/private/p/0", True),   # longest match wins
            ("b.t", "http://b.t/anything", False),
            ("c.t", "http://c.t/x", True),             # no robots row
        ],
        ["host", "canon_url", "want"],
    )
    got = apply_robots(cand.select("host", "canon_url"), cache).collect()
    want = {r.canon_url: r.want for r in cand.collect()}
    for r in got:
        assert r.robots_ok == want[r.canon_url], r.canon_url


def test_wildcard_rules_rfc9309(spark):
    """RFC 9309 §2.2.3 '*' and '$' patterns (spec/Google examples),
    evaluated through the vectorized gate."""
    host = "wild.example.test"
    rules = [
        [False, "/fish*"],        # any path starting /fish...
        [True, "/fish/allowed"],  # longer allow carve-out
        [False, "/*.php$"],       # anchored extension match
        [False, "/private*/x"],   # infix wildcard
    ]
    cache = spark.createDataFrame(
        [(host, json.dumps(rules), None, 0)], schemas.ROBOTS_CACHE
    )
    paths = {
        "/fish": False,
        "/fishheads/yummy.html": False,
        "/fish/allowed/page": True,   # 13-octet allow beats 6-octet disallow
        "/index.php": False,          # $ anchors at end
        "/index.php?x=1": True,       # query breaks the anchor
        "/index.phpx": True,
        "/private/deep/x": False,     # '*' spans /deep
        "/privatex": True,
        "/other": True,
    }
    cand = _cand(spark, host, list(paths))
    got = {
        r.canon_url.removeprefix(f"http://{host}"): r.robots_ok
        for r in apply_robots(cand, cache).collect()
    }
    assert got == paths


def test_crawl_delay_budget_expression(spark):
    """apply_politeness with a crawl_delay column and a batch window:
    budget = min(k, max(1, window // delay)); NULL delay keeps k."""
    from who_focus_crawler_spark.operators.politeness import apply_politeness

    rows = []
    for host, delay in [("a", 2), ("b", 5), ("c", None), ("d", 60)]:
        for j in range(4):
            rows.append((f"http://{host}.t/p{j}", host, 1.0, 1, True, delay))
    df = spark.createDataFrame(
        rows,
        "canon_url string, host string, priority double, depth int, "
        "robots_ok boolean, crawl_delay int",
    )
    out = apply_politeness(df, 3, batch_window_s=10)
    admitted = {
        r.host: r.n
        for r in out.filter("admitted").groupBy("host").count()
        .withColumnRenamed("count", "n").collect()
    }
    #   a: 10//2=5 -> capped at k=3;  b: 10//5=2;  c: no delay -> 3
    #   d: 10//60=0 -> floor of 1
    assert admitted == {"a": 3, "b": 2, "c": 3, "d": 1}
    # window off: everyone gets k
    out0 = apply_politeness(df, 3)
    assert out0.filter("admitted").count() == 4 * 3


def test_json_quote_strips_control_chars(spark):
    """operators/robots.py::_json_quote — a rule pattern carrying a
    control char (tab, stray \\r) must still render VALID JSON for the
    rules_json cache; control chars are dropped."""
    from who_focus_crawler_spark.operators.robots import _json_quote

    df = spark.createDataFrame(
        [("/a\tb",), ("/c\r",), ('/q"\\d',)], "v string"
    )
    for r in df.select(_json_quote(F.col("v")).alias("j"), "v").collect():
        parsed = json.loads(r.j)
        assert parsed == "".join(
            ch for ch in r.v if ord(ch) >= 0x20
        )
