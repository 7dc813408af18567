"""Shuffle-skew diagnostics: measure a key distribution BEFORE paying
for the shuffle it will feed.

Every big join/agg in this engine shuffles on a key (host, url_hash,
term, seg_hash); a skewed key turns one reducer into the job's critical
path. C17 fixes skew with salting — this module is the instrumentation
that says whether and how much: run it on a sampled or full keyed
projection, read ``suggested_salt``, feed that to
operators/salting.py. (AQE's skew-join handles sort-merge joins at
runtime; aggregations and custom bucket layouts still need the explicit
number.)

All outputs are integers or exact interpolated percentiles (the same
``percentile`` ≡ ``quantile_cont`` pair the r_quantiles oracle pins),
so the DuckDB twin checks values. One partial+final aggregation on the
key is the only shuffle — the stats reduce from the per-key counts
(|keys| rows, not |rows|) and collapse to one row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_counts(df: DataFrame, key: Column) -> DataFrame:
    """Per-key row counts: (key, n) — partial+final agg, one shuffle."""
    return df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def hot_keys(
    df: DataFrame, key: Column, threshold_permille: int = 10, top_k: int = 20
) -> DataFrame:
    """Keys holding at least ``threshold_permille``/1000 of all rows,
    strongest first (deterministic (n desc, key) order), capped at
    ``top_k``. Share is integer permille."""
    counts = key_counts(df, key)
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_permille", F.expr("(1000 * n) div _total"))
        .filter(F.col("n") * 1000 >= F.col("_total") * threshold_permille)
        .drop("_total")
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_k)
    )


def skew_summary(df: DataFrame, key: Column) -> DataFrame:
    """One-row distribution summary of the key:

    (n_rows, n_keys, max_n, p50_n, p99_n, max_share_permille,
    suggested_salt) — ``suggested_salt`` = ceil(max_n / mean_n), the
    fan-out that levels the hottest key to the average reducer load
    (what operators/salting.py takes as ``n_salts``); 1 = no skew.
    """
    counts = key_counts(df, key)
    return counts.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("p50_n"),
        F.expr("percentile(n, 0.99)").alias("p99_n"),
    ).select(
        "n_rows",
        "n_keys",
        "max_n",
        "p50_n",
        "p99_n",
        F.expr("(1000 * max_n) div n_rows").cast("long").alias(
            "max_share_permille"
        ),
        F.expr("(max_n * n_keys + n_rows - 1) div n_rows")
        .cast("long")
        .alias("suggested_salt"),
    )


def fairness_gini(df: DataFrame, key: Column) -> DataFrame:
    """Gini coefficient of the per-key row-count distribution — one row
    ``(n_keys, total_rows, s_rank_weighted, gini)``.

    The scheduler-fairness gauge: how evenly did the crawl spread its
    fetches across hosts? 0 = perfectly even, →1 = one host took
    everything. Uses the rank formula over counts sorted ascending
    (rank i = 1..n): G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i).

    Σ i·x_i needs a GLOBAL rank over per-key counts; that rank is the
    two-phase distributed sequencer (operators/sequencer.py) — no
    single-task window even with hundreds of millions of distinct
    hosts. All sums are exact integers; the one double division is the
    final expression, so the value is engine-portable.
    """
    from who_focus_crawler_spark.operators.sequencer import global_row_number

    counts = key_counts(df, key)
    ranked = global_row_number(
        counts, [F.asc("n"), F.asc("key")], out_col="_rank"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.sum(F.col("_rank") * F.col("n")).cast("long").alias("s_rank_weighted"),
    ).select(
        "n_keys",
        "total_rows",
        "s_rank_weighted",
        F.round(
            (2.0 * F.col("s_rank_weighted") - (F.col("n_keys") + 1.0) * F.col("total_rows"))
            / (F.col("n_keys").cast("double") * F.col("total_rows")),
            6,
        ).alias("gini"),
    )


def harvest_rate(
    fetched: DataFrame,
    batch_col: str = "batch",
    relevant_col: str = "relevant",
) -> DataFrame:
    """The focused-crawl quality curve (Chakrabarti, van den Berg & Dom,
    WWW 1999): per fetch batch, the share of fetched pages that are
    on-topic, plus the cumulative curve the crawl is judged by →
    (batch, n_fetched, n_relevant, cum_fetched, cum_relevant,
    harvest_permille, cum_harvest_permille).

    One partial+final agg collapses the fetch log to one row per batch;
    the running sums then run over THAT tiny per-batch frame (thousands
    of rows for any real crawl), never per-row — the same
    aggregate-first discipline as quality_percentile/fairness_gini.
    Rates are integer permille (floor), engine-portable.
    """
    from pyspark.sql import Window

    per = fetched.groupBy(batch_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetched"),
        F.sum(F.col(relevant_col).cast("long")).cast("long").alias("n_relevant"),
    )
    w = Window.orderBy(batch_col).rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        batch_col,
        "n_fetched",
        "n_relevant",
        F.sum("n_fetched").over(w).cast("long").alias("cum_fetched"),
        F.sum("n_relevant").over(w).cast("long").alias("cum_relevant"),
    ).select(
        batch_col,
        "n_fetched",
        "n_relevant",
        "cum_fetched",
        "cum_relevant",
        ((F.col("n_relevant") * 1000) / F.col("n_fetched"))
        .cast("long")
        .alias("harvest_permille"),
        ((F.col("cum_relevant") * 1000) / F.col("cum_fetched"))
        .cast("long")
        .alias("cum_harvest_permille"),
    )
