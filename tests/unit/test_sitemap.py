"""Sitemap fetch + native parse against the fixture generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.sitemap import (
    fetch_sitemaps_for_hosts,
    parse_sitemaps,
)
from who_focus_crawler_spark.sources.fixture_web import (
    UNIT_WEB,
    host_name,
    sitemap_entries,
)


def test_fetch_and_parse_round_trips_the_fixture(spark):
    hosts = spark.createDataFrame(
        [(host_name(i),) for i in range(UNIT_WEB.n_hosts)], ["host"]
    )
    parsed = parse_sitemaps(fetch_sitemaps_for_hosts(hosts, UNIT_WEB)).collect()
    got: dict[str, list[tuple[str, float]]] = {}
    for r in parsed:
        got.setdefault(r.host, []).append((r.loc, r.priority))
    for i in range(UNIT_WEB.n_hosts):
        h = host_name(i)
        want = sitemap_entries(h, UNIT_WEB)
        assert sorted(got.get(h, [])) == sorted(want), h
    # host 4 publishes no sitemap (i % 5 == 4)
    assert host_name(4) not in got


def test_parse_defaults_missing_priority(spark):
    xml = (
        "<urlset><url><loc>http://a.test/x</loc></url>"
        "<url><loc>http://a.test/y</loc><priority>0.9</priority></url>"
        "<url><loc></loc></url></urlset>"
    )
    df = spark.createDataFrame([("a.test", xml)], ["host", "sitemap_xml"])
    rows = {r.loc: r.priority for r in parse_sitemaps(df).collect()}
    # empty <loc> entries are dropped; missing priority → protocol 0.5
    assert rows == {"http://a.test/x": 0.5, "http://a.test/y": 0.9}


def test_parse_plan_is_native(spark):
    df = spark.createDataFrame([("a.test", "<urlset></urlset>")],
                               ["host", "sitemap_xml"])
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_parse_pretty_printed_and_entity_escaped(spark):
    """Real-world sitemap form: newlines inside <url> blocks and
    protocol-mandated XML entity escaping in <loc>."""
    xml = (
        "<urlset>\n"
        "  <url>\n    <loc>\n      http://a.test/b?x=1&amp;y=2\n    </loc>\n"
        "    <priority>0.7</priority>\n  </url>\n"
        "  <url><loc>http://a.test/&quot;q&quot;</loc></url>\n"
        "</urlset>"
    )
    df = spark.createDataFrame([("a.test", xml)], ["host", "sitemap_xml"])
    rows = {r.loc: r.priority for r in parse_sitemaps(df).collect()}
    assert rows == {
        "http://a.test/b?x=1&y=2": 0.7,
        'http://a.test/"q"': 0.5,
    }


def test_sitemap_index_one_level(spark):
    """operators/sitemap.py::parse_sitemaps_with_index — index documents
    resolve through their children under the parent host; plain urlsets
    parse directly; missing children contribute nothing; entities in
    child locs unescape."""
    from who_focus_crawler_spark.operators.sitemap import (
        parse_sitemaps_with_index,
    )

    idx_xml = (
        "<sitemapindex>"
        "<sitemap><loc> http://a.example/maps/part-0.xml </loc></sitemap>"
        "<sitemap><loc>http://a.example/maps/part-1.xml?v=1&amp;w=2</loc></sitemap>"
        "<sitemap><loc>http://a.example/maps/missing.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    plain_xml = (
        "<urlset><url><loc>http://b.example/p/1</loc>"
        "<priority>0.9</priority></url></urlset>"
    )
    tops = spark.createDataFrame(
        [("a.example", idx_xml), ("b.example", plain_xml), ("c.example", None)],
        "host string, sitemap_xml string",
    )
    children = spark.createDataFrame(
        [
            (
                "http://a.example/maps/part-0.xml",
                "<urlset><url><loc>http://a.example/p/10</loc></url>"
                "<url><loc>http://a.example/p/11</loc>"
                "<priority>0.2</priority></url></urlset>",
            ),
            (
                "http://a.example/maps/part-1.xml?v=1&w=2",
                "<urlset><url><loc>http://a.example/p/20</loc></url></urlset>",
            ),
        ],
        "loc string, xml string",
    )
    got = sorted(
        (r.host, r.loc, r.priority)
        for r in parse_sitemaps_with_index(tops, children).collect()
    )
    assert got == [
        ("a.example", "http://a.example/p/10", 0.5),
        ("a.example", "http://a.example/p/11", 0.2),
        ("a.example", "http://a.example/p/20", 0.5),
        ("b.example", "http://b.example/p/1", 0.9),
    ]
