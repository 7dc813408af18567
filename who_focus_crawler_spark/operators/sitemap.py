"""Sitemap ingestion: fetch per-host sitemap.xml, parse natively,
emit frontier candidates.

Sitemaps (sitemaps.org protocol, referenced by RFC 9309 §2.4's informal
ecosystem) are the crawler's second discovery channel next to link
extraction: hosts publish `<urlset><url><loc>…</loc>
<priority>…</priority></url>…</urlset>`. Flow mirrors the robots gate
(operators/robots.py): the fetch is the only per-host I/O touchpoint
(mapInPandas; fixture-served here — no network), and everything after
is native column expressions — the XML is cut into `<url>` entries with
``regexp_extract_all`` + explode, so parsing scales JVM-side with zero
Python crossings and the per-host XML string never enters a shuffle
wider than (host, entry).

Sitemap-discovered URLs enter the frontier exactly like discovered
links: canonicalize → hash → dedup-against-seen → merge; the protocol's
``priority`` (0.0–1.0) maps onto the frontier priority column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.sources.fixture_web import (
    WebConfig,
    sitemap_xml,
)

SITEMAP_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("sitemap_xml", T.StringType()),
    ]
)


def fetch_sitemaps_for_hosts(hosts: DataFrame, cfg: WebConfig) -> DataFrame:
    """Vectorized sitemap fetch for distinct hosts (fixture-served;
    hosts without a sitemap yield NULL and drop out of parsing)."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "sitemap_xml": [sitemap_xml(h, cfg) for h in pdf["host"]],
                }
            )

    return (
        hosts.select("host").distinct().mapInPandas(fetch, SITEMAP_FETCH_SCHEMA)
    )


def parse_sitemaps(sitemaps: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, sitemap_xml) → one row per listed URL: (host, loc, priority).

    Native parse: split into ``<url>…</url>`` entries, then extract
    ``<loc>`` and optional ``<priority>`` per entry (missing priority →
    protocol default 0.5). Whole-stage codegen end to end.
    """
    # (?s): real sitemaps are pretty-printed — '.' must cross newlines
    entries = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)
    )
    exploded = (
        sitemaps.filter(F.col(xml_col).isNotNull())
        .select("host", F.explode(entries).alias("_entry"))
    )
    loc = _xml_unescape(
        F.trim(F.regexp_extract("_entry", r"(?s)<loc>\s*([^<]*?)\s*</loc>", 1))
    )
    prio = F.regexp_extract("_entry", r"<priority>([0-9.]+)</priority>", 1)
    return (
        exploded.select(
            "host",
            loc.alias("loc"),
            F.when(prio == "", F.lit(0.5))
            .otherwise(prio.cast("double"))
            .alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def _xml_unescape(s: Column) -> Column:
    """Undo the five predefined XML entities (the sitemaps.org protocol
    REQUIRES entity-escaping URLs — '&' in a query string arrives as
    '&amp;' and must not survive into the frontier). &amp; is decoded
    last so double-escapes like '&amp;lt;' resolve in document order."""
    out = s
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def is_sitemap_index(xml: Column) -> Column:
    """TRUE iff the document is a sitemap INDEX (sitemaps.org: large
    sites split their map into children listed under <sitemapindex>)."""
    return xml.isNotNull() & xml.contains("<sitemapindex")


def parse_sitemap_index(
    sitemaps: DataFrame, xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_xml) → one row per child map: (host, child_loc).

    Same native parse shape as `parse_sitemaps`: split on
    ``<sitemap>…</sitemap>`` entries, extract + unescape ``<loc>``.
    """
    entries = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), F.lit(1)
    )
    exploded = (
        sitemaps.filter(is_sitemap_index(F.col(xml_col)))
        .select("host", F.explode(entries).alias("_entry"))
    )
    loc = _xml_unescape(
        F.trim(F.regexp_extract("_entry", r"(?s)<loc>\s*([^<]*?)\s*</loc>", 1))
    )
    return exploded.select("host", loc.alias("child_loc")).filter(
        F.col("child_loc") != ""
    )


def parse_sitemaps_with_index(
    tops: DataFrame,
    children: DataFrame,
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Resolve one level of sitemap-index indirection (the protocol
    forbids indexes pointing at indexes): plain ``<urlset>`` documents
    parse directly; index documents join their children by ``<loc>``
    (the second fetch round's results, ``children``: (loc, xml)) and the
    child documents parse under the PARENT's host. Output matches
    `parse_sitemaps`: (host, loc, priority). Missing children simply
    contribute no rows — same as an unfetchable map.
    """
    direct = parse_sitemaps(
        tops.filter(~is_sitemap_index(F.col(xml_col))), xml_col
    )
    idx = parse_sitemap_index(tops, xml_col)
    child_docs = idx.join(
        children.select(
            F.col("loc").alias("child_loc"), F.col("xml").alias("sitemap_xml")
        ),
        "child_loc",
    ).select("host", "sitemap_xml")
    return direct.unionByName(parse_sitemaps(child_docs))
