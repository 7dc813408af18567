"""Bandit-based host scheduling: integer UCB1 over per-host crawl stats.

Focused crawling is an explore/exploit problem: hosts that yielded
relevant pages should get more of the politeness-bounded fetch budget
(exploit), but rarely-tried hosts must keep getting probes or the
crawler locks onto an early winner (explore). Casting the host
scheduler as a multi-armed bandit is standard in the crawl-scheduling
literature (freshness/harvest crawl scheduling as MAB; policy per
Auer, Cesa-Bianchi & Fischer 2002, "Finite-time Analysis of the
Multiarmed Bandit Problem" — UCB1).

UCB1 scores arm i at time t as  mean_i + c * sqrt(ln t / n_i).
This implementation quantizes it to engine-portable integer
arithmetic so the schedule is bit-identical across partitionings,
runs, and engines (the same discipline as the quality/scoring ops):

  mean_milli  = reward_milli_sum div pulls          (integer div)
  L           = floor(log10 t) = len(str(t)) - 1    (decimal digits —
                exact in any engine, no libm log)
  bonus_milli = c_permille * isqrt(1_000_000 * L div pulls) div 1000
  score_milli = mean_milli + bonus_milli

isqrt(x) = floor(sqrt(x)) on integer x is engine-portable here: both
Spark (Java Math.sqrt) and DuckDB use IEEE-754 correctly-rounded
sqrt, so the double result — and therefore its floor — is identical.
Rewards and pulls must be nonnegative (integer div truncation == floor
there). Never-pulled hosts get SCORE_UNTRIED_MILLI (an order of
magnitude above any reachable score), so every host is probed at least
once — the bandit's optimism-under-uncertainty rule.

c_permille=1414 ≈ sqrt(2)*1000, UCB1's canonical exploration constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_UNTRIED_MILLI = 10_000_000


def ucb_host_scores(stats: DataFrame, c_permille: int = 1414) -> DataFrame:
    """Score every host for the next batch's budget allocation.

    ``stats``: one row per host with ``pulls`` (long — batches in which
    the host was fetched) and ``reward_milli_sum`` (long — accumulated
    relevance/harvest reward in milli-units, e.g. relevant pages per
    fetch * 1000). Returns host, pulls, mean_milli, bonus_milli,
    score_milli. t (total pulls) is a 1-row aggregate broadcast back —
    no global window, no driver collect.
    """
    t = stats.agg(F.sum("pulls").cast("long").alias("_t"))
    bonus_expr = (
        f"({c_permille} * cast(floor(sqrt(cast("
        "(1000000 * L) div pulls as double))) as bigint)) div 1000"
    )
    return (
        stats.crossJoin(F.broadcast(t))
        .withColumn("L", (F.length(F.col("_t").cast("string")) - 1).cast("long"))
        .withColumn(
            "mean_milli",
            F.when(F.col("pulls") > 0, F.expr("reward_milli_sum div pulls"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "bonus_milli",
            F.when(F.col("pulls") > 0, F.expr(bonus_expr))
            .otherwise(F.lit(SCORE_UNTRIED_MILLI))
            .cast("long"),
        )
        .withColumn(
            "score_milli", (F.col("mean_milli") + F.col("bonus_milli")).cast("long")
        )
        .select("host", "pulls", "mean_milli", "bonus_milli", "score_milli")
    )


def select_bandit_hosts(stats: DataFrame, m: int, c_permille: int = 1414) -> DataFrame:
    """Top-m hosts by UCB score (ties broken by host asc) — the arms the
    next batch's extra fetch budget goes to. TakeOrderedAndProject-shaped:
    per-partition top-m then global top-m, never a single-task window."""
    scored = ucb_host_scores(stats, c_permille)
    return scored.orderBy(F.desc("score_milli"), F.asc("host")).limit(m)
