"""C9 two-phase rank: exact equivalence with the naive global window,
and the executed plan must not push the big frame through one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.sequencer import global_row_number


def _frontier(spark, n=5000, parts=16):
    # unique key (host, url_id); skewed priority ties across hosts
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            (F.col("id") % 37).cast("double").alias("priority"),
            F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("host"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url_id"),
        )
    )


ORDER = lambda: [F.desc("priority"), F.asc("host"), F.asc("url_id")]  # noqa: E731


def test_two_phase_equals_naive_global_window(spark):
    df = _frontier(spark)
    naive = df.withColumn(
        "seq", F.row_number().over(Window.orderBy(*ORDER())).cast("long")
    )
    two = global_row_number(df, ORDER(), "seq", 0)
    assert two.count() == 5000
    assert naive.exceptAll(two).count() == 0
    assert two.exceptAll(naive).count() == 0


def test_base_offset_and_types(spark):
    df = _frontier(spark, n=100)
    out = global_row_number(df, ORDER(), "seq", 41)
    assert dict(out.dtypes)["seq"] == "bigint"
    lo, hi = out.agg(F.min("seq"), F.max("seq")).first()
    assert (lo, hi) == (42, 141)


def test_empty_input(spark):
    df = _frontier(spark).filter(F.lit(False))
    assert global_row_number(df, ORDER(), "seq", 0).count() == 0


def test_no_single_partition_window_over_rows(spark):
    out = global_row_number(_frontier(spark), ORDER(), "seq", 0)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rank window must be partitioned by the pinned range-partition id
    assert "windowspecdefinition(_seq_pid" in plan
    # the only unpartitioned window orders the |partitions|-row offsets
    for frag in plan.split("windowspecdefinition(")[1:]:
        if frag.startswith("_seq_pid"):  # partitioned big window — fine
            continue
        # unpartitioned ⇒ must be the offsets window (sums _seq_cnt)
        assert frag.split(")")[0].find("_seq_pid ASC") >= 0
        assert "_seq_cnt" in plan
    # offsets join back via broadcast, not another shuffle
    assert "BroadcastHashJoin" in plan


def test_assign_seq_small_batch_path_equals_two_phase(spark):
    """The proven-small one-window path and the two-phase rank assign the
    identical sequence (the crawl loop picks by known count)."""
    from pyspark.sql import functions as F

    from who_focus_crawler_spark.operators.politeness import assign_seq

    df = _frontier(spark, n=800).select(
        "priority",
        "host",
        F.col("url_id").alias("canon_url"),
        F.lit(1).alias("depth"),
    )
    small = assign_seq(df, 41, n_rows=800)
    big = assign_seq(df, 41, n_rows=200_000)  # forced two-phase
    assert small.exceptAll(big).count() == 0
    assert big.exceptAll(small).count() == 0


def test_partition_count_invariance(spark):
    # same sequence whatever the source layout / target partition count
    a = global_row_number(_frontier(spark, parts=2), ORDER(), "seq", 0,
                          num_partitions=3)
    b = global_row_number(_frontier(spark, parts=29), ORDER(), "seq", 0,
                          num_partitions=17)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
