"""Host-authority ranking over the host link graph (focused-crawl
prioritization signal, C13-adjacent): PageRank (Page et al. 1999) with
damping 0.85, computed ENTIRELY in integer micro-units.

Why integer: float PageRank sums contributions in partition order, so
two runs (or two engines) differ in final ulps and a value-exact oracle
is impossible. Here ranks live in units of 1/scale (default 1e9) and
every step is integer floor arithmetic — sums of longs are
order-independent, so the result is bit-identical across engines,
partitionings, and parallelism. Deflation from the floors (and from
dangling hosts, whose mass leaks as in the classic simplification) is
bounded and harmless for a RANKING signal.

Scale shape: per iteration one join (ranks ⋈ edges on src) + one
groupBy(dst) sum — both shuffle on host keys, O(|edges|); ranks are
localCheckpointed per round so lineage stays flat. Convergence needs
O(graph diameter · log) rounds; callers pick fixed `n_iters` (also what
makes the DuckDB oracle a finite CTE chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio


def host_rank(
    edges: DataFrame,
    n_iters: int = 10,
    scale: int = 10**9,
    checkpoint_each: bool = True,
) -> DataFrame:
    """PageRank over distinct (src, dst) host edges → (host, rank_units).

    rank_units is the integer rank in 1/scale units; rank_0 = scale // n
    for every host; per round:
        contrib(e)  = rank[src] // out_deg[src]
        rank'(v)    = (15 · (scale // n)) // 100
                      + (85 · Σ contrib into v) // 100
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    if checkpoint_each:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    total = nodes.agg(F.count(F.lit(1)).alias("_n"))  # broadcast scalar
    base = (
        nodes.crossJoin(F.broadcast(total))
        .withColumn("rank_units", (F.lit(scale) / F.col("_n")).cast("long"))
        .select("host", "rank_units", "_n")
    )
    ranks = base
    if checkpoint_each:
        ranks = ranks.localCheckpoint(eager=False)
    for _ in range(n_iters):
        contrib = (
            e.join(
                ranks.select(F.col("host").alias("src"), "rank_units"), "src"
            )
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("host"),
                (F.col("rank_units") / F.col("out_deg")).cast("long").alias(
                    "contrib"
                ),
            )
            .groupBy("host")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            ranks.select("host", "_n")
            .join(contrib, "host", "left")
            .select(
                "host",
                (
                    (F.lit(DAMP_DEN - DAMP_NUM) * (F.lit(scale) / F.col("_n")).cast("long"))
                    / F.lit(DAMP_DEN)
                ).cast("long")
                + (
                    (F.lit(DAMP_NUM) * F.coalesce(F.col("in_sum"), F.lit(0)))
                    / F.lit(DAMP_DEN)
                ).cast("long"),
                "_n",
            )
            .toDF("host", "rank_units", "_n")
        )
        if checkpoint_each:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("host", F.col("rank_units").cast("long"))
