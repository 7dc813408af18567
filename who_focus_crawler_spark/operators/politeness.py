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


def apply_politeness(candidates: DataFrame, politeness_k: int) -> DataFrame:
    """Attach ``admitted`` to robots-gated candidates.

    Rank only rows that passed robots (partition by (host, robots_ok) so
    blocked rows never consume a politeness slot); first ``politeness_k``
    per host are admitted, the rest deferred (stay enqueued in the
    frontier).
    """
    w = Window.partitionBy("host", "robots_ok").orderBy(*host_order())
    return candidates.withColumn("rn_pol", F.row_number().over(w)).withColumn(
        "admitted", F.col("robots_ok") & (F.col("rn_pol") <= politeness_k)
    )


def assign_seq(admitted: DataFrame, base_seq: int) -> DataFrame:
    """C9 — global total order within the batch; seq continues from
    ``base_seq``.

    Two-phase distributed rank (``operators/sequencer.py``): the batch is
    ≤ hosts × politeness_k rows, which at production budgets is millions —
    a naive global ``Window.orderBy`` would pull all of them through ONE
    task. The two-phase rank assigns the identical sequence (schedule key
    ends in the unique canon_url ⇒ strict total order) with every stage
    partition-parallel.
    """
    return global_row_number(admitted, schedule_order(), "seq", base_seq)
