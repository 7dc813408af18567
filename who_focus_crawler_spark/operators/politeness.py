"""C7 — per-host politeness tokens + C9 deterministic sequencing.

Frozen v1 semantics (SURVEY.md §5.3): budget = ``politeness_k`` fetches per
host per batch; admission order inside a host is the frozen HOST_ORDER;
global fetch order is a reproducible total order independent of
parallelism — NEVER ``monotonically_increasing_id`` (partition-layout
dependent, SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.frontier import host_order
from who_focus_crawler_spark.operators.sequencer import global_row_number


def schedule_order() -> list:
    """Frozen global schedule key (batch-local)."""
    return [F.desc("priority"), F.asc("depth"), F.asc("host"), F.asc("canon_url")]


def apply_politeness(
    candidates: DataFrame,
    politeness_k: int,
    batch_window_s: int | None = None,
) -> DataFrame:
    """Attach ``admitted`` to robots-gated candidates.

    Rank only rows that passed robots (partition by (host, robots_ok) so
    blocked rows never consume a politeness slot); the first rows within
    a host's budget are admitted, the rest deferred (stay enqueued in
    the frontier).

    Budget = ``politeness_k``, unless ``batch_window_s`` is set and the
    host's robots.txt declared a Crawl-delay (the ``crawl_delay`` column
    apply_robots attaches): then
    ``min(politeness_k, max(1, batch_window_s // crawl_delay))`` — a
    batch models that many wall-clock seconds, and a host asking for d
    seconds between fetches gets at most window/d fetches in it. All
    plan-side integer arithmetic; None window (default) keeps the frozen
    v1 semantics bit-for-bit.
    """
    w = Window.partitionBy("host", "robots_ok").orderBy(*host_order())
    budget = F.lit(politeness_k)
    if batch_window_s is not None and "crawl_delay" in candidates.columns:
        budget = F.when(
            F.col("crawl_delay").isNotNull(),
            F.least(
                F.lit(politeness_k),
                F.greatest(
                    F.floor(F.lit(batch_window_s) / F.col("crawl_delay")),
                    F.lit(1),
                ),
            ),
        ).otherwise(F.lit(politeness_k))
    return candidates.withColumn("rn_pol", F.row_number().over(w)).withColumn(
        "admitted", F.col("robots_ok") & (F.col("rn_pol") <= budget)
    )


# Below this many rows the single-task window is cheaper than the
# two-phase rank's fixed overhead (checkpoint + 2 extra stages,
# measured ~3 s/batch at fixture scale); 10^5 rows through one window
# task is sub-second. The threshold is only honored when the caller
# PROVES the size with a known count — never guessed from the plan.
SMALL_BATCH_ROWS = 100_000


def assign_seq(
    admitted: DataFrame, base_seq: int, n_rows: int | None = None
) -> DataFrame:
    """C9 — global total order within the batch; seq continues from
    ``base_seq``.

    Two-phase distributed rank (``operators/sequencer.py``): the batch is
    ≤ hosts × politeness_k rows, which at production budgets is millions —
    a naive global ``Window.orderBy`` would pull all of them through ONE
    task. The two-phase rank assigns the identical sequence (schedule key
    ends in the unique canon_url ⇒ strict total order) with every stage
    partition-parallel.

    ``n_rows``: the batch's EXACT row count when the caller already has
    it (the crawl loop counts admitted rows for metrics before
    sequencing). A proven-small batch (≤ SMALL_BATCH_ROWS) takes the
    bounded one-window path — same total order, unit-tested equal —
    because 4 extra stages cost more than ranking 10^5 rows in one task.
    Unknown size ⇒ always two-phase (never an unbounded one-task stage).
    """
    if n_rows is not None and n_rows <= SMALL_BATCH_ROWS:
        w = Window.orderBy(*schedule_order())
        return admitted.withColumn(
            "seq", (F.row_number().over(w) + F.lit(base_seq)).cast("long")
        )
    return global_row_number(admitted, schedule_order(), "seq", base_seq)
