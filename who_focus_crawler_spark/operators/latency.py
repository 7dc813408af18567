"""Adaptive per-host politeness from observed fetch latency.

Production crawlers set the inter-fetch delay from the server's own
response time (Heritrix's ``delayFactor``: delay = k × recent fetch
duration; cf. the politeness discussion of Cho & Garcia-Molina, "The
Evolution of the Web and Implications for an Incremental Crawler", VLDB
2000): a slow host is a loaded host, so back off proportionally.

``adaptive_crawl_delay`` turns a fetch-latency history into the
``(host, crawl_delay)`` seconds table that
``operators/politeness.py::apply_politeness(batch_window_s=…)`` already
budgets by — robots-declared Crawl-delay and adaptive delay share one
contract (callers take the greatest of the two signals).

All arithmetic is integer and the percentile is NEAREST-RANK (the
ceil(q·n)-th smallest observation), so results are bit-identical across
engines and partitionings — no float interpolation. Shape at scale: one
shuffle on host for the rank window plus a per-host count (same
partitioning, one exchange); hosts with fewer than ``min_obs``
observations emit no row (callers fall back to the default politeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_latency_percentile(
    history: DataFrame,
    pct_permille: int = 950,
    latency_col: str = "latency_ms",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-host nearest-rank latency percentile:
    (host, n_obs, p_latency_ms) with p = the ceil(pct·n)-th smallest
    observation — exact integers end to end."""
    tie = tie_cols or []
    order = [F.col(latency_col).asc()] + [F.col(c).asc() for c in tie]
    w = Window.partitionBy("host").orderBy(*order)
    wn = Window.partitionBy("host")
    ranked = history.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    # ceil(pct_permille * n / 1000) in integers
    target = (F.col("_n") * pct_permille + 999) - (
        (F.col("_n") * pct_permille + 999) % 1000
    )
    return ranked.filter(F.col("_rn") * 1000 == target).select(
        "host",
        F.col("_n").alias("n_obs"),
        F.col(latency_col).alias("p_latency_ms"),
    )


def adaptive_crawl_delay(
    history: DataFrame,
    delay_factor_permille: int = 2000,
    min_delay_s: int = 1,
    max_delay_s: int = 60,
    min_obs: int = 3,
    pct_permille: int = 950,
    latency_col: str = "latency_ms",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """(host, n_obs, p_latency_ms, crawl_delay): crawl_delay =
    clamp(ceil(factor × p‰-latency), min, max) seconds, only for hosts
    with at least ``min_obs`` observations. ``delay_factor_permille`` =
    2000 means "wait 2× the host's p95 response time"."""
    stats = host_latency_percentile(
        history, pct_permille, latency_col, tie_cols
    ).filter(F.col("n_obs") >= min_obs)
    raw_ms = F.col("p_latency_ms") * delay_factor_permille  # micro-units
    ceil_s = (raw_ms + 999_999) - ((raw_ms + 999_999) % 1_000_000)
    delay = F.least(
        F.lit(max_delay_s),
        F.greatest(F.lit(min_delay_s), (ceil_s / 1_000_000).cast("long")),
    )
    return stats.select(
        "host", "n_obs", "p_latency_ms", delay.alias("crawl_delay")
    )
