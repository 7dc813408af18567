"""RFC 9309 robots.txt text parser (operators/robots_txt.py): group
formation, agent-specific group selection over '*', comment/blank/junk
tolerance, empty-Disallow = allow-all, global Sitemap lines, and
integration with the existing gate's rule matcher."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.robots_txt import parse_robots_txt

BASIC = """\
# site robots
User-Agent: *
Disallow: /private/
Allow: /private/p/0
Crawl-delay: 3

Sitemap: http://h0.example.test/sitemap.xml
"""

TWO_GROUPS = """\
User-agent: googlebot
Disallow: /

User-agent: wfc
Disallow: /only-wfc/
Crawl-delay: 7

User-agent: *
Disallow: /everyone/
"""

MULTI_UA_ONE_GROUP = """\
User-agent: alpha
User-agent: wfc-bot
Disallow: /shared/
"""

NO_MATCH = """\
User-agent: googlebot
Disallow: /
Sitemap: http://h3.example.test/map.xml
"""

JUNK = """\
Disallow: /ignored-before-any-group/
User-agent: *   # trailing comment
Disallow:
Disallow: /real/   # comment after pattern
Unknown-Field: whatever
Crawl-delay: fast
"""


def _parse(spark, pairs, agent="wfc-bot"):
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    rows = parse_robots_txt(df, agent=agent).collect()
    out: dict = {}
    # collect() row order is plan/partition-dependent; the parser's
    # order contract is the line_no column — sort on it (the gate's
    # longest-match evaluation is order-independent anyway)
    for r in sorted(rows, key=lambda r: (r.host, r.line_no)):
        out.setdefault(r.host, []).append((r.directive, r.allow, r.value))
    return out


def test_basic_group_and_global_sitemap(spark):
    got = _parse(spark, [("h0", BASIC)])["h0"]
    assert ("rule", False, "/private/") in got
    assert ("rule", True, "/private/p/0") in got
    assert ("crawl_delay", None, "3") in got
    assert ("sitemap", None, "http://h0.example.test/sitemap.xml") in got
    assert len(got) == 4


def test_specific_group_beats_star(spark):
    got = _parse(spark, [("h1", TWO_GROUPS)])["h1"]
    # 'wfc' (prefix of wfc-bot, len 3) beats '*' (len 0) and googlebot
    assert ("rule", False, "/only-wfc/") in got
    assert ("crawl_delay", None, "7") in got
    assert all(v != "/everyone/" and v != "/" for _, _, v in got)


def test_multi_ua_lines_share_one_group(spark):
    got = _parse(spark, [("h2", MULTI_UA_ONE_GROUP)])["h2"]
    assert got == [("rule", False, "/shared/")]


def test_no_matching_group_means_allow_all(spark):
    got = _parse(spark, [("h3", NO_MATCH)])["h3"]
    # only the global sitemap survives; no rules -> allow-all default
    assert got == [("sitemap", None, "http://h3.example.test/map.xml")]


def test_junk_tolerance(spark):
    got = _parse(spark, [("h4", JUNK)])["h4"]
    # leading out-of-group rule ignored, empty Disallow dropped,
    # comments stripped, unknown fields ignored, non-integer delay dropped
    assert got == [("rule", False, "/real/")]


def test_feeds_the_existing_gate_matcher(spark):
    """Parsed rules drive the same allow/deny decisions as the fixture's
    structured rules through sources/fixture_web.robots_allowed."""
    from who_focus_crawler_spark.sources.fixture_web import robots_allowed

    got = _parse(spark, [("h0", BASIC)])["h0"]
    rules = [(a, v) for d, a, v in got if d == "rule"]
    assert robots_allowed(rules, "/private/p/0")
    assert not robots_allowed(rules, "/private/p/9")
    assert robots_allowed(rules, "/public/x")


def test_fixture_roundtrip_text_to_rules(spark):
    """fixture_web.robots_txt_text renders each host's policy as a real
    robots.txt document; parsing it recovers exactly the structured
    rules + crawl-delay the gate consumes — for every fixture host."""
    from dataclasses import replace

    from who_focus_crawler_spark.sources.fixture_web import (
        UNIT_WEB,
        host_name,
        robots_crawl_delay,
        robots_rules,
        robots_txt_text,
    )

    cfg = replace(UNIT_WEB, n_hosts=10, batch_window_s=10)
    pairs = []
    expected = {}
    for i in range(cfg.n_hosts):
        h = host_name(i)
        txt = robots_txt_text(h, cfg)
        if txt is None:
            assert i == 3  # the fixture's no-robots host
            continue
        pairs.append((h, txt))
        expected[h] = {
            "rules": robots_rules(h, cfg),
            "delay": robots_crawl_delay(h, cfg),
        }
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    got: dict = {h: {"rules": [], "delay": None} for h, _ in pairs}
    for r in parse_robots_txt(df, agent=cfg.agent).collect():
        if r.directive == "rule":
            got[r.host]["rules"].append((r.line_no, (r.allow, r.value)))
        elif r.directive == "crawl_delay":
            got[r.host]["delay"] = int(r.value)
    for h in got:
        got[h]["rules"] = [x for _, x in sorted(got[h]["rules"])]
    assert got == expected


def test_crlf_and_cr_line_endings(spark):
    """RFC 9309 §2.1: lines may end in CR, LF, or CRLF. Real-world
    robots.txt is commonly CRLF; a \\n-only split leaves a trailing
    \\r on every value, which silently parses to allow-all."""
    crlf = BASIC.replace("\n", "\r\n")
    got = _parse(spark, [("hc", crlf)])["hc"]
    assert ("rule", False, "/private/") in got
    assert ("rule", True, "/private/p/0") in got
    assert ("crawl_delay", None, "3") in got
    assert ("sitemap", None, "http://h0.example.test/sitemap.xml") in got
    assert len(got) == 4
    # bare-CR endings (old-Mac style, still RFC-legal)
    cr = BASIC.replace("\n", "\r")
    assert _parse(spark, [("hr", cr)])["hr"] == got


def test_tab_whitespace_around_field_and_value(spark):
    """RFC 9309 WS is spaces AND tabs; F.trim strips only spaces."""
    txt = "User-agent:\t*\nDisallow:\t/tabbed/\t\nCrawl-delay:\t2\n"
    got = _parse(spark, [("ht", txt)])["ht"]
    assert ("rule", False, "/tabbed/") in got
    assert ("crawl_delay", None, "2") in got
