"""Fetch-failure retry scheduling with exponential backoff.

A production crawler never retries a failed fetch immediately: transient
failures (timeouts, 5xx, connection resets) get retried after an
exponentially growing delay, and persistently failing URLs are given up
on after a bounded number of attempts (the policy every major crawler
ships — cf. Heritrix's ``fetch-retries``/``retry-delay`` and the retry
discussion in Heydon & Najork, "Mercator: A scalable, extensible Web
crawler", WWW Journal 1999).

``schedule_retries`` folds an attempt log into the frontier's
re-admission schedule. Frozen semantics (oracle-checked by
``c_retry_backoff``):

- the attempt log has one row per fetch attempt ``(canon_url, host,
  batch, ok)``; attempts of one URL are summarized per URL;
- a URL that has ANY successful attempt is done (state ``done``) and
  never retried;
- a URL with ``n_attempts >= max_attempts`` failures and no success is
  dropped (state ``gave_up``);
- otherwise state ``retry`` with
  ``next_due_batch = last_batch + base_delay · 2^(n_attempts − 1)``,
  the classic doubling backoff, delay capped at ``max_delay``.

All arithmetic is integer (shiftleft for the power of two), so results
are bit-identical across engines and partitionings. Shape at scale: one
partial+final aggregation shuffled on ``canon_url`` — the log reduces to
|URLs| slim rows before anything else touches it; no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schedule_retries(
    attempts: DataFrame,
    base_delay: int = 1,
    max_attempts: int = 4,
    max_delay: int = 64,
) -> DataFrame:
    """Summarize an attempt log into per-URL retry decisions:
    (canon_url, host, n_attempts, last_batch, state, next_due_batch).

    ``next_due_batch`` is NULL unless state = 'retry'."""
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    per_url = attempts.groupBy("canon_url", "host").agg(
        F.count(F.lit(1)).cast("long").alias("n_attempts"),
        F.max("batch").cast("long").alias("last_batch"),
        F.max(F.col("ok").cast("int")).alias("_any_ok"),
    )
    delay = F.least(
        F.lit(base_delay)
        * F.expr("shiftleft(1L, cast(n_attempts - 1 as int))"),
        F.lit(max_delay).cast("long"),
    ).cast("long")
    state = (
        F.when(F.col("_any_ok") == 1, F.lit("done"))
        .when(F.col("n_attempts") >= max_attempts, F.lit("gave_up"))
        .otherwise(F.lit("retry"))
    )
    return per_url.select(
        "canon_url",
        "host",
        "n_attempts",
        "last_batch",
        state.alias("state"),
        F.when(state == "retry", F.col("last_batch") + delay)
        .cast("long")
        .alias("next_due_batch"),
    )
