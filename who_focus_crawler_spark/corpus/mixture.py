"""Token-budget corpus mixture selection.

A training run specifies a mixture — "X tokens total, 60% web, 30%
code, 10% reference" — and the pipeline must pick a deterministic,
reproducible subset of documents per source that lands on those
budgets. This operator does the canonical greedy prefix selection:

  1. every doc gets a deterministic priority = md5-bucket of its id
     (corpus/sampling.py convention), so "which docs fill the budget"
     is a pure function of (doc_id, seed) — an incremental re-run with
     more data keeps previously-selected docs stable except where new
     docs hash earlier;
  2. per source, docs are taken in (bucket, doc_id) order while the
     running token total stays within that source's share of the
     budget (docs are atomic — a doc that would cross the line is
     dropped, budgets are not overshot);
  3. the per-source running total uses the two-phase distributed
     prefix sum (operators/prefix.py) — NOT a PARTITION BY source
     window, which would drag a multi-billion-row source through one
     task at corpus scale.

Budgets are exact integer token counts; shares are computed on the
driver from the weights dict (a handful of sources — plan-side CASE,
no join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.sampling import sample_bucket
from who_focus_crawler_spark.operators.prefix import grouped_running_sum


def source_budgets(weights: dict[str, float], budget_tokens: int) -> dict[str, int]:
    """Integer per-source token budgets (floor of the weighted share).

    Floor keeps the total at or under ``budget_tokens``; sources absent
    from ``weights`` get 0 (excluded from the mixture).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    return {s: int(budget_tokens * (w / total)) for s, w in weights.items()}


def _budget_expr(source: Column, budgets: dict[str, int]) -> Column:
    expr: Column | None = None
    for name, b in budgets.items():
        cond = source == F.lit(name)
        expr = F.when(cond, F.lit(b)) if expr is None else expr.when(cond, F.lit(b))
    zero = F.lit(0)
    return zero if expr is None else expr.otherwise(zero)


def mixture_select(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    key_col: str = "doc_id",
    source_col: str = "source",
    token_col: str = "n_tokens",
    seed: str = "mix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Select docs per source up to its weighted share of the budget.

    Input must carry an integer ``token_col`` (use corpus/text.py
    ``tokens`` size upstream). Output: the selected rows plus
    ``cum_tokens`` (the running per-source total including the row) —
    callers can audit how full each source's budget is.
    """
    budgets = source_budgets(weights, budget_tokens)
    prio = sample_bucket(F.col(key_col), seed)
    ranked = docs.withColumn("_mix_prio", prio)
    cum = grouped_running_sum(
        ranked,
        [source_col],
        [F.asc("_mix_prio"), F.asc(key_col)],
        token_col,
        out_col="cum_tokens",
        num_partitions=num_partitions,
    )
    budget = _budget_expr(F.col(source_col), budgets)
    # budget > 0 guard: a zero-budget (unlisted) source must select
    # nothing — without it, zero-token docs satisfy cum <= 0 and leak
    return cum.filter(
        (budget > F.lit(0)) & (F.col("cum_tokens") <= budget)
    ).drop("_mix_prio")
