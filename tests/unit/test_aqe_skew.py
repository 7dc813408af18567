"""AQE skew-join evidence: with a hot join key and no broadcast escape,
adaptive execution must split the skewed partition (SortMergeJoin
carries skew=true in the final plan) and the result is identical to the
non-adaptive run — the runtime half of the engine's skew story (the
planning half is operators/salting.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    # shrink every threshold so a ~MB-scale test partition counts as
    # "skewed" — same mechanism, laboratory scale
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    old = {}
    for k, v in SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def skewed_frames(spark):
    # left: one hot host carries 100k of 104k rows; right: 40 rows/host
    left = spark.range(104_000).select(
        F.when(F.col("id") < 100_000, F.lit(0))
        .otherwise((F.col("id") % 40) + 1)
        .alias("host"),
        (F.col("id") * 7).alias("payload"),
    )
    right = spark.range(41 * 40).select(
        (F.col("id") % 41).alias("host"),
        (F.col("id") + 1).alias("weight"),
    )
    return left, right


def test_aqe_splits_skewed_partition(spark, skew_conf):
    # NOTE: the aggregate after the join must NOT be keyed on the join
    # key — a same-key groupBy needs the join's hash partitioning intact,
    # and AQE (correctly) refuses to split the skewed partition then.
    left, right = skewed_frames(spark)
    # keep the incompressible payload column through the shuffle: a
    # constant-host-only row set compresses below any skew threshold
    joined = left.join(right, "host").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("payload") + F.col("weight")).alias("w"),
    )
    n, w = joined.collect()[0]
    # analytic expectation from the construction formulas
    lhost = lambda i: 0 if i < 100_000 else (i % 40) + 1
    lsum, lcnt = {}, {}
    for i in range(104_000):
        h = lhost(i)
        lcnt[h] = lcnt.get(h, 0) + 1
        lsum[h] = lsum.get(h, 0) + i * 7
    rws = {h: sum(h + 1 + 41 * k for k in range(40)) for h in range(41)}
    rc = {h: 40 for h in range(41)}
    assert n == sum(lcnt[h] * rc[h] for h in lcnt)
    assert w == sum(lsum[h] * rc[h] + lcnt[h] * rws[h] for h in lcnt)
    # evidence: the executed (adaptive, final) plan split the hot
    # partition — Spark tags the join node skew=true
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def test_skew_split_matches_non_adaptive_run(spark, skew_conf):
    left, right = skewed_frames(spark)
    adaptive = sorted(
        map(tuple, left.join(right, "host").groupBy("host")
            .agg(F.sum("payload").alias("p"), F.sum("weight").alias("w"))
            .collect())
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = sorted(
            map(tuple, left.join(right, "host").groupBy("host")
                .agg(F.sum("payload").alias("p"), F.sum("weight").alias("w"))
                .collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert adaptive == plain
