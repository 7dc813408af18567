"""Grouped prefix sum: exact equivalence with the naive per-group
window at several parallelism levels, and the mixture selector built on
top of it (budget never overshot, selection deterministic)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.mixture import mixture_select, source_budgets
from who_focus_crawler_spark.operators.prefix import grouped_running_sum


def _docs(spark, n=3000, parts=16):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
        (F.col("id") % 53 + 1).cast("long").alias("n_tokens"),
    )


def _naive(df):
    w = (
        Window.partitionBy("source")
        .orderBy("n_tokens", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("running", F.sum("n_tokens").over(w).cast("long"))


_COLS = ["doc_id", "source", "n_tokens", "running"]


def test_grouped_running_sum_equals_naive_window(spark):
    df = _docs(spark)
    naive = _naive(df).select(*_COLS)
    for nparts in (2, 7, 32):
        two = grouped_running_sum(
            df,
            ["source"],
            [F.asc("n_tokens"), F.asc("doc_id")],
            "n_tokens",
            out_col="running",
            num_partitions=nparts,
        ).select(*_COLS)
        assert naive.exceptAll(two).count() == 0, nparts
        assert two.exceptAll(naive).count() == 0, nparts


def test_grouped_running_sum_empty_and_single_group(spark):
    df = _docs(spark, n=50).withColumn("source", F.lit("only"))
    two = grouped_running_sum(
        df, ["source"], [F.asc("doc_id")], "n_tokens", "running"
    ).select(*_COLS)
    assert _naive_order_by_doc(df).select(*_COLS).exceptAll(two).count() == 0
    empty = df.filter(F.lit(False))
    assert grouped_running_sum(
        empty, ["source"], [F.asc("doc_id")], "n_tokens", "running"
    ).count() == 0


def _naive_order_by_doc(df):
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("running", F.sum("n_tokens").over(w).cast("long"))


def test_mixture_budgets_never_overshot(spark):
    df = _docs(spark)
    weights = {"src0": 2.0, "src1": 1.0, "src2": 1.0}
    budget = 2000
    out = mixture_select(df, weights, budget).collect()
    budgets = source_budgets(weights, budget)
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r.source] = per_source.get(r.source, 0) + r.n_tokens
    assert set(per_source) <= set(budgets)  # unlisted sources excluded
    for s, tot in per_source.items():
        assert tot <= budgets[s], (s, tot, budgets[s])
        # greedy prefix fills close to the line (can't add the next doc)
        assert tot > budgets[s] - 60  # max doc is 53 tokens


def test_mixture_deterministic_across_partitioning(spark):
    weights = {"src0": 1.0, "src3": 1.0}
    a = sorted(
        r.doc_id
        for r in mixture_select(_docs(spark, parts=4), weights, 1500).collect()
    )
    b = sorted(
        r.doc_id
        for r in mixture_select(_docs(spark, parts=29), weights, 1500).collect()
    )
    assert a == b and len(a) > 0


def test_null_group_keys_are_kept_as_one_group(spark):
    """The window this replaces groups NULL keys together; the
    re-attach join must be null-safe, not drop them."""
    rows = [(1, None, 5), (2, None, 7), (3, "s", 11)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = grouped_running_sum(
        df, ["source"], [F.asc("doc_id")], "n_tokens", "running"
    ).collect()
    got = {r.doc_id: r.running for r in out}
    assert got == {1: 5, 2: 12, 3: 11}
