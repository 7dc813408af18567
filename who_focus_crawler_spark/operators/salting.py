"""C17 — hot-domain salting (BASELINE.json north_star: "salted
repartitioning on host-hash to defuse hot-domain skew").

AQE's skew handling only splits skewed JOIN partitions; the skew-critical
crawl stage is C6's per-host top-k WINDOW over the frontier, where one
hot domain can hold a large share of all URLs (fixture web: 40%). The
fix is a two-phase top-k that is EXACTLY equivalent to the single
window:

  phase 1: partition by (host, salt) where salt = pmod(xxhash64(url), s)
           → local top-k inside each of the s sub-partitions
  phase 2: partition by host over the surviving ≤ s·k rows per host
           → final top-k

Top-k is a selection, so phase 2 over the union of per-salt top-k sets
yields the identical result to a direct per-host top-k (any row in the
true top-k is in its salt bucket's top-k). Phase 1's partitions are
bounded by |hot host| / s; phase 2's by s·k — no single task ever sees
the whole hot domain. Equivalence is property-tested on a deliberately
skewed frontier (tests/unit/test_salting.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salt_col(url_hash: Column, s: int) -> Column:
    """Deterministic sub-key in [0, s) from the URL signature."""
    return F.pmod(url_hash, F.lit(s)).cast("int")


def detect_hot_hosts(
    frontier: DataFrame, skew_ratio: float = 4.0, min_rows: int = 10000
) -> DataFrame:
    """Hosts whose frontier share exceeds `skew_ratio` × the mean (and at
    least `min_rows`): one partial-aggregated groupBy — map-side combine
    makes this skew-proof itself. Returns (host, n_urls)."""
    counts = frontier.groupBy("host").agg(F.count("*").alias("n_urls"))
    stats = counts.agg(F.avg("n_urls").alias("mean")).collect()[0]
    threshold = max(float(stats["mean"] or 0.0) * skew_ratio, float(min_rows))
    return counts.filter(F.col("n_urls") >= threshold)


def topk_per_host_salted(
    frontier: DataFrame,
    k: int,
    order: list[Column],
    s: int = 16,
    rn_name: str = "rn_sel",
) -> DataFrame:
    """Exact per-host top-k via salted two-phase windows (see module
    docstring). `order` must be a total order within a host (the engine's
    frozen order ends on canon_url) — required for exactness AND for the
    determinism contract."""
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        frontier.withColumn("_salt", salt_col(F.col("url_hash"), s))
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .withColumn(rn_name, F.row_number().over(w2))
        .filter(F.col(rn_name) <= k)
        .drop("_salt", "_rn1", rn_name)
    )
