"""Exact integer apportionment of a global crawl budget across hosts.

A production scheduler divides "fetch N pages this cycle" across hosts
proportionally to a weight (authority rank, backlog size, quota class).
Float shares drift and never sum to N; the classic fix is Hamilton's
largest-remainder method: give every key floor(N·w/W), then hand the
R = N − Σfloor leftover slots to the largest fractional remainders.
The result sums to N EXACTLY and is deterministic (remainder ties break
on key order).

Distributed shape: one agg for the weight total (1-row broadcast), one
projection for base + integer remainder, and ONE global rank over the
remainder order via the two-phase distributed sequencer
(`operators/sequencer.py::global_row_number`) — no single-task window,
so apportioning 10^8 hosts is as parallel as the frontier itself. All
arithmetic is integer (remainders compared as N·w mod W numerators, no
float shares), so the allocation is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.sequencer import global_row_number


def apportion_budget(
    weights: DataFrame,
    total_budget: int,
    key_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """(key, weight) → (key, budget): largest-remainder shares of
    ``total_budget`` proportional to non-negative integer weights.
    Zero-weight keys get 0; Σ budget == total_budget exactly (0 if every
    weight is 0). Raises on negative weights."""
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    neg = weights.filter(F.col(weight_col) < 0)
    if not neg.isEmpty():
        raise ValueError("apportion_budget: negative weights")
    tot = weights.agg(
        F.coalesce(F.sum(weight_col), F.lit(0)).cast("long").alias("_w")
    )
    based = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn("_num", F.col(weight_col).cast("long") * total_budget)
        .withColumn(
            "_base",
            F.when(F.col("_w") > 0, F.expr("_num div _w")).otherwise(
                F.lit(0)
            ).cast("long"),
        )
        .withColumn(
            "_rem",
            F.when(F.col("_w") > 0, F.col("_num") % F.col("_w")).otherwise(
                F.lit(0)
            ).cast("long"),
        )
    )
    leftover = based.agg(
        (F.lit(total_budget) - F.coalesce(F.sum("_base"), F.lit(0)))
        .cast("long")
        .alias("_r")
    )
    # rows with _w == 0 have _rem 0 and leftover 0 ⇒ rank is irrelevant
    ranked = global_row_number(
        based,
        [F.desc("_rem"), F.asc(key_col)],
        out_col="_rank",
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            key_col,
            F.col(weight_col),
            (
                F.col("_base")
                + F.when(
                    (F.col("_rank") <= F.col("_r")) & (F.col("_rem") > 0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("budget"),
        )
    )
