"""Crawl-tier assignment: partition the host population into revisit
tiers by an integer (authority × change-rate) score.

Production schedulers (IRLbot's budget classes, BUbiNG's
visit-frequency bands, news-vs-archive splits in commercial crawlers)
do not give every host the same revisit cadence: the top slice of
hosts — high authority, frequently changing — gets short revisit
intervals and a large share of the fetch budget, while the long tail
is touched rarely. This operator produces that banding as data:

    (host, tier_score, tier, revisit_batches)

- ``tier_score`` = rank_units · (change_permille + 1): both factors
  already exist in this engine as exact integers
  (operators/hostrank.py authority, operators/recrawl.py change rate),
  so the product is engine-portable and order-independent;
- ``tier`` ∈ [0, n_tiers): equal-population bands by descending score
  — tier = floor(rank · n_tiers / n_hosts) over the EXACT global rank,
  which runs on the two-phase distributed sequencer
  (operators/sequencer.py): range-partitioned local sort +
  per-partition offsets, NO single-task global window, the same
  scale-path as C9;
- ``revisit_batches`` = base_interval << tier: tier 0 revisits every
  `base_interval` batches, each lower tier doubles the interval
  (geometric cadence, the standard freshness/budget trade).

Ties on score break by host so runs are reproducible under any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.sequencer import global_row_number


def assign_crawl_tiers(
    host_stats: DataFrame,
    n_tiers: int = 4,
    base_interval: int = 1,
    rank_col: str = "rank_units",
    change_col: str = "change_permille",
    host_col: str = "host",
) -> DataFrame:
    """(host, rank_units, change_permille) → tier banding (see module
    docstring). Scores, ranks, and intervals are all exact integers."""
    if n_tiers < 1:
        raise ValueError(f"n_tiers must be >= 1, got {n_tiers}")
    scored = host_stats.select(
        host_col,
        (F.col(rank_col) * (F.col(change_col) + F.lit(1)))
        .cast("long")
        .alias("tier_score"),
    )
    ranked = global_row_number(
        scored, [F.desc("tier_score"), F.asc(host_col)], "_rk", 0
    )
    total = scored.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            host_col,
            "tier_score",
            # _rk is 1-based; (rk-1)·T/n floors into [0, T) equal bands
            ((F.col("_rk") - 1) * n_tiers / F.col("_n"))
            .cast("long")
            .cast("int")
            .alias("tier"),
        )
        .withColumn(
            "revisit_batches",
            F.expr(f"CAST(shiftleft(CAST({base_interval} AS BIGINT), tier) AS BIGINT)"),
        )
    )


def due_for_revisit(
    tiers: DataFrame,
    last_fetch: DataFrame,
    current_batch: int,
    host_col: str = "host",
) -> DataFrame:
    """Close the tier loop operationally: which hosts' revisit interval
    has elapsed → (host, tier, revisit_batches, last_batch, overdue,
    due). ``overdue`` = batches past the deadline (≥ 0 when due) — the
    natural recrawl-priority tiebreaker. Hosts with no fetch history are
    due immediately (never-crawled backlog).

    One broadcast-or-shuffle join on host + a projection; composes
    :func:`assign_crawl_tiers` output with any (host, last_batch) fetch
    log aggregate."""
    lf = last_fetch.select(host_col, F.col("last_batch").cast("long"))
    j = tiers.join(lf, host_col, "left")
    gap = F.lit(current_batch) - F.coalesce(
        F.col("last_batch"), F.lit(-(1 << 31))
    )
    return j.select(
        host_col,
        "tier",
        "revisit_batches",
        F.col("last_batch"),
        (gap - F.col("revisit_batches")).cast("long").alias("overdue"),
        (gap >= F.col("revisit_batches")).alias("due"),
    )
