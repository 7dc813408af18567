"""Freshness-driven recrawl scheduling (change-rate estimation).

A production crawler does not fetch a URL once: it must decide *when to
come back*. The classic policy (Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003) estimates each page's
change frequency from its observed fetch history and allocates revisit
budget by expected staleness. This operator is the Spark-native
estimator: it folds the engine's own fetch history (any table with one
row per completed fetch carrying the fetched content's hash) into a
per-URL change rate and an integer recrawl score that drops straight
into the frontier's ``priority`` column.

All arithmetic is integer (permille change rate, integer staleness
product) so the result is bit-identical across engines/partitionings —
the same reasoning as ``operators/hostrank.py``. The float MLE
refinement (-ln((n-X+0.5)/(n+0.5))) adds nothing for a RANKING signal
and would break value-exact oracles.

Shape at scale: one shuffle of the history on ``canon_url`` feeds BOTH
the change-detection window (partitioned by canon_url — billions of
small partitions, no skew) and the per-URL aggregate (same key ⇒
Catalyst reuses the exchange; no second shuffle). No driver actions.

Frozen semantics (oracle-checked by ``c_recrawl_priority``):
- fetches of one URL are ordered by (batch, content_hash) — the hash
  tie-break freezes the order if a URL is somehow fetched twice in one
  batch;
- a "change" is a fetch whose content_hash differs null-safely from the
  previous fetch's (the first fetch is never a change);
- change_permille = floor(1000 · n_changes / (n_fetches − 1)) when
  n_fetches ≥ 2, else ``prior_permille`` (no revisit evidence yet);
- staleness = current_batch − last fetched batch (≥ 0 in normal use);
- recrawl_score = staleness · (change_permille + 1): pages that change
  every visit age ~1000× faster than pages that never change, and the
  +1 keeps never-changing pages slowly accruing score so they are
  eventually revisited (bounded staleness, as in Cho's uniform floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priority(
    history: DataFrame,
    current_batch: int,
    prior_permille: int = 500,
) -> DataFrame:
    """Per-URL change-rate estimate + recrawl score from fetch history.

    ``history`` columns: canon_url, host, batch (long-castable fetch
    epoch), content_hash. Output: (canon_url, host, n_fetches,
    n_changes, change_permille, staleness, recrawl_score), one row per
    distinct canon_url.
    """
    w = Window.partitionBy("canon_url").orderBy("batch", "content_hash")
    marked = history.select(
        "canon_url",
        "host",
        F.col("batch").cast("long").alias("batch"),
        "content_hash",
    ).withColumn(
        "_fetch_no", F.row_number().over(w)
    ).withColumn(
        "_prev_hash", F.lag("content_hash").over(w)
    ).withColumn(
        "_changed",
        F.when(
            (F.col("_fetch_no") > 1)
            & ~F.col("content_hash").eqNullSafe(F.col("_prev_hash")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    per_url = marked.groupBy("canon_url").agg(
        F.min("host").alias("host"),  # one host per URL by construction
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("_changed").alias("n_changes"),
        F.max("batch").alias("last_batch"),
    )
    change_permille = F.when(
        F.col("n_fetches") >= 2,
        F.expr("(1000 * n_changes) div (n_fetches - 1)"),
    ).otherwise(F.lit(prior_permille).cast("long"))
    return (
        per_url.withColumn("change_permille", change_permille)
        .withColumn(
            "staleness", (F.lit(current_batch) - F.col("last_batch")).cast("long")
        )
        .withColumn(
            "recrawl_score",
            F.col("staleness") * (F.col("change_permille") + F.lit(1)),
        )
        .select(
            "canon_url",
            "host",
            "n_fetches",
            "n_changes",
            "change_permille",
            "staleness",
            "recrawl_score",
        )
    )


def select_recrawl(
    scored: DataFrame, k_per_host: int, min_score: int = 1
) -> DataFrame:
    """Top-k recrawl candidates per host (politeness-shaped admission).

    Deterministic total order inside a host: score desc, canon_url asc.
    Feed the result back into the frontier as (canon_url, host,
    priority=recrawl_score) rows — the scheduler treats revisits like
    any other candidate.
    """
    wh = Window.partitionBy("host").orderBy(
        F.desc("recrawl_score"), F.asc("canon_url")
    )
    return (
        scored.filter(F.col("recrawl_score") >= min_score)
        .withColumn("_rk", F.row_number().over(wh))
        .filter(F.col("_rk") <= k_per_host)
        .drop("_rk")
    )


def conditional_fetch_plan(history: DataFrame) -> DataFrame:
    """HTTP revalidation planning over the fetch history (RFC 9110 §13).

    A recrawl of a page whose server exposes a validator should be a
    conditional GET (``If-None-Match`` on the ETag, else
    ``If-Modified-Since``): an unchanged page answers 304 with no body,
    so the expected revisit cost collapses to headers. This operator
    turns the fetch history into a per-URL revisit plan: which validator
    to send, whether a 304 is the expected outcome, and the bytes that
    outcome saves — the bandwidth term a revisit scheduler weighs
    against ``recrawl_priority``'s staleness term.

    ``history`` columns: canon_url, host, batch, content_hash,
    etag (nullable), last_modified (nullable), content_length (long).
    Frozen semantics (oracle-checked by ``c_conditional_fetch``):

    - the plan is driven by the LAST fetch per URL, ordered by
      (batch, content_hash) — same tie-break as ``recrawl_priority``;
    - validator: 'etag' if the last fetch carried one, else
      'last_modified' if it did, else 'none' (full GET, nothing to
      revalidate against);
    - expect_304 iff a validator exists AND the URL has been fetched at
      least twice AND the last fetch's content hash null-safely equals
      the previous fetch's (most recent observation = stable);
    - saved_bytes = last content_length when expect_304, else 0.

    Scale shape: ONE shuffle of the history on canon_url feeds both the
    ordering window and nothing else — the per-URL partitions are tiny
    (fetch counts), no skew key exists, and the output is one row per
    URL.
    """
    # ONE window ordering for everything: a second (descending) window
    # operator would rank tie rows independently of this one, making the
    # result nondeterministic when the history carries exact duplicate
    # fetch rows. The last fetch is fetch_no == count over the same
    # partition instead.
    w = Window.partitionBy("canon_url").orderBy("batch", "content_hash")
    wp = Window.partitionBy("canon_url")
    marked = (
        history.select(
            "canon_url",
            "host",
            F.col("batch").cast("long").alias("batch"),
            "content_hash",
            "etag",
            "last_modified",
            F.col("content_length").cast("long").alias("content_length"),
        )
        .withColumn("_prev_hash", F.lag("content_hash").over(w))
        .withColumn("_fetch_no", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wp))
    )
    last = marked.filter(F.col("_fetch_no") == F.col("_n"))
    validator = (
        F.when(F.col("etag").isNotNull(), F.lit("etag"))
        .when(F.col("last_modified").isNotNull(), F.lit("last_modified"))
        .otherwise(F.lit("none"))
    )
    expect_304 = (
        (validator != F.lit("none"))
        & (F.col("_fetch_no") >= 2)
        & F.col("content_hash").eqNullSafe(F.col("_prev_hash"))
    )
    return last.select(
        "canon_url",
        "host",
        validator.alias("validator"),
        (validator != F.lit("none")).alias("revalidate"),
        expect_304.alias("expect_304"),
        F.when(expect_304, F.col("content_length"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("saved_bytes"),
    )
