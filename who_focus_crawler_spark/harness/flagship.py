"""Flagship query (SURVEY.md §3.2): the frontier schedule+dedup pipeline
— the north-metric operation ("frontier URLs scheduled+deduped per
second") — run end-to-end over a frontier synthesized from `orders`.

C1 canonicalize → C2 hash → C3 host → C4 exact dedup (anti-join against
the seen set) → C6 top-k per host → C7 politeness admission → C9
deterministic global sequence. Every stage is the real engine operator;
the DuckDB oracle reconstructs the expected output analytically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import (
    canonicalize_df,
    url_hash,
    url_host,
)
from who_focus_crawler_spark.harness.crawl_queries import _messy_urls
from who_focus_crawler_spark.operators.sequencer import global_row_number

SELECT_K = 3
POLITE_K = 2


def flagship_schedule(spark: SparkSession, sf: str) -> DataFrame:
    cand = (
        canonicalize_df(_messy_urls(spark, sf), "url", "canon_url")
        .withColumn("url_hash", url_hash(F.col("canon_url")))
        .withColumn("host", url_host(F.col("canon_url")))
        .withColumn("priority", F.col("o_totalprice"))
    )
    # URL-seen set: every third order's URL was already crawled
    seen = cand.filter(F.col("o_orderkey") % 3 == 0).select(
        "url_hash", "canon_url"
    )
    new = cand.join(seen, ["url_hash", "canon_url"], "left_anti")

    wh = Window.partitionBy("host").orderBy(F.desc("priority"), "canon_url")
    admitted = (
        new.withColumn("rk", F.row_number().over(wh))
        .filter(F.col("rk") <= POLITE_K)
    )
    # C9 via the two-phase distributed rank (no single-task global window)
    seqd = global_row_number(
        admitted, [F.desc("priority"), F.asc("host"), F.asc("canon_url")], "seq", 0
    )
    return seqd.select(
        "seq",
        "canon_url",
        "host",
        F.round("priority", 2).alias("priority"),
    )


FLAGSHIP_SQL = f"""
WITH cand AS (
  SELECT concat('http://h', CAST(o_custkey % 12 AS VARCHAR), '.example.org/p/',
                CAST(o_orderkey AS VARCHAR),
                CASE WHEN o_orderkey % 5 = 4 THEN '?a=1&b=2' ELSE '' END)
           AS canon_url,
         concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         o_totalprice AS priority, o_orderkey
  FROM orders
), new AS (
  SELECT * FROM cand WHERE o_orderkey % 3 <> 0
), admitted AS (
  SELECT * FROM (
    SELECT canon_url, host, priority,
           row_number() OVER (
             PARTITION BY host ORDER BY priority DESC, canon_url
           ) AS rk
    FROM new
  ) WHERE rk <= {POLITE_K}
)
SELECT CAST(row_number() OVER (ORDER BY priority DESC, host, canon_url)
            AS BIGINT) AS seq,
       canon_url, host, round(priority, 2) AS priority
FROM admitted
"""
