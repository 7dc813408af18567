"""Anchor-text aggregation — the link-context relevance signal.

Focused crawling (Chakrabarti et al. 1999) scores a candidate URL
before fetching it, and the strongest pre-fetch evidence is the anchor
text of the links pointing at it (how search engines index pages they
never crawled). This operator folds discovered links into a per-target
signal: in-link count, referring-host spread, and the top anchor terms
— ready to join (broadcast or key-shuffle) onto the frontier as an
extra input to C13 focus scoring.

Frozen semantics (oracle-checked by ``c_anchor_text``):
- terms = lowercased anchor split on runs of non-[a-z0-9], dropping
  tokens shorter than ``min_term_len`` (default 2) — same tokenizer
  family as corpus/text.py;
- top terms ranked by (count desc, term asc) — fully deterministic —
  and emitted as a '|'-joined string (``top_terms``), engine-portable
  for value-exact comparison;
- a link row with NULL/empty anchor still counts as an in-link; it just
  contributes no terms.

Shape at scale: the term branch explodes anchors (bounded fan-out: a
few terms per link), aggregates (target_url, term) with map-side
partial aggregation, then ranks inside each target's term list — every
stage shuffles on target-keyed columns only. The counts branch is one
partial+final aggregate on target_url. The final join is key-aligned
(both sides hash-partitioned by target_url). No driver actions, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_signal(
    links: DataFrame, top_k_terms: int = 3, min_term_len: int = 2
) -> DataFrame:
    """Aggregate link evidence per target URL.

    ``links`` columns: src_host, target_url, anchor_text. Output:
    (target_url, n_inlinks, n_src_hosts, top_terms) — one row per
    distinct target_url.
    """
    counts = links.groupBy("target_url").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_src_hosts"),
    )
    terms = (
        links.select(
            "target_url",
            F.explode(
                F.split(F.lower(F.coalesce("anchor_text", F.lit(""))), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_term_len)
        .groupBy("target_url", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("target_url").orderBy(F.desc("cnt"), F.asc("term"))
    top = (
        terms.withColumn("_rk", F.row_number().over(wt))
        .filter(F.col("_rk") <= top_k_terms)
        .groupBy("target_url")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_rk").alias("rk"), "term"))
                    ),
                    lambda s: s["term"],
                ),
            ).alias("top_terms")
        )
    )
    return counts.join(top, "target_url", "left").select(
        "target_url",
        "n_inlinks",
        "n_src_hosts",
        F.coalesce("top_terms", F.lit("")).alias("top_terms"),
    )
