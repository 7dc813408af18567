"""C13 — focus/relevance scoring (the "focused" in focused crawler).

Chakrabarti et al. (WWW 1999) focused crawling: the frontier priority of
a discovered URL combines the relevance of the page that linked to it
with cheap URL/anchor features, decayed by depth. The crawl loop's
DEFAULT priority stays the frozen v1 spec (−depth, SURVEY.md §5.3) so
golden fixtures are untouched; this operator is the pluggable scoring
mode (`CrawlConfig`-ready) and the harness exercises it value-exactly
against DuckDB.

All integer/ratio arithmetic (engine-portable, no float midpoints):
  parent_relevance = Σ keyword hits in the parent document's text spans
  url_bonus        = 10 per topic keyword appearing in the URL path
  priority_pts     = (parent_relevance * 100) // (1 + depth) + url_bonus
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import tokens

DEFAULT_TOPIC = ("query", "data", "stream", "table")


def relevance_score(text: Column, topic: tuple[str, ...] = DEFAULT_TOPIC) -> Column:
    """Keyword-hit count of a document against the topic list (long)."""
    return (
        F.size(F.filter(tokens(text), lambda t: t.isin(*topic))).cast("long")
    )


def url_topic_bonus(url: Column, topic: tuple[str, ...] = DEFAULT_TOPIC) -> Column:
    """10 points per topic keyword contained in the URL (long)."""
    bonus = F.lit(0)
    for kw in topic:
        bonus = bonus + F.when(F.lower(url).contains(kw), F.lit(10)).otherwise(
            F.lit(0)
        )
    return bonus.cast("long")


def focus_priority(
    parent_relevance: Column, depth: Column, url: Column,
    topic: tuple[str, ...] = DEFAULT_TOPIC,
) -> Column:
    """Frontier priority points (long), integer arithmetic end-to-end."""
    return (
        F.floor(parent_relevance * 100 / (F.lit(1) + depth)).cast("long")
        + url_topic_bonus(url, topic)
    )


def score_discoveries(
    events: DataFrame,
    parent_docs: DataFrame,
    topic: tuple[str, ...] = DEFAULT_TOPIC,
    parent_key: str = "parent_hash",
    doc_key: str = "url_hash",
    text_col: str = "text",
) -> DataFrame:
    """Attach `priority_pts` to discovered URLs by joining parent document
    relevance (broadcast when small) and applying the focus formula."""
    rel = parent_docs.select(
        F.col(doc_key).alias(parent_key),
        relevance_score(F.col(text_col), topic).alias("_parent_rel"),
    )
    return (
        events.join(rel, parent_key, "left")
        .withColumn(
            "priority_pts",
            focus_priority(
                F.coalesce(F.col("_parent_rel"), F.lit(0)),
                F.col("depth"),
                F.col("target_url"),
                topic,
            ),
        )
        .drop("_parent_rel")
    )
