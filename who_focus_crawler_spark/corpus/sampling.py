"""Deterministic sampling & dataset splitting for training-data pipelines.

Every selection here is a pure function of (key, seed): sample
membership is decided by an md5-derived bucket of the row's stable key,
never by RNG state, partition layout, or row order. That gives the three
properties a 100 TB pipeline needs:

- reproducible: the same key set always yields the same sample, on any
  cluster size, any partitioning, any Spark version;
- disjoint-by-construction: train/val/test splits partition the bucket
  space, so no row can land in two splits even across separate runs;
- narrow: each op is a scan-level filter/projection — NO shuffle, no
  window, no driver collect. The plan is a single WholeStageCodegen map
  over the scan (asserted in tests/unit/test_plans.py).

Hash convention (shared with the DuckDB oracle in
harness/corpus_queries.py): bucket = md5-hex prefix (15 hex digits →
60-bit int, engine-portable) of "<seed>:<key>", mod SAMPLE_BUCKETS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60

# Bucket-space size. 2^20 buckets keeps fraction granularity ~1e-6 while
# the threshold arithmetic stays in exact int64 territory.
SAMPLE_BUCKETS = 1 << 20


def sample_bucket(key: Column, seed: str) -> Column:
    """Deterministic bucket in [0, SAMPLE_BUCKETS) for a row key.

    ``seed`` namespaces independent sampling decisions: different seeds
    give (empirically) independent buckets for the same key, so a 10%
    QA sample drawn with one seed does not bias a split drawn with
    another.
    """
    tagged = F.concat(F.lit(seed), F.lit(":"), key.cast("string"))
    return md5_hash60(tagged) % F.lit(SAMPLE_BUCKETS)


def fraction_threshold(fraction: float) -> int:
    """Integer bucket threshold for a [0,1] fraction (round-half-up on
    the bucket grid, exact int compare on both engines)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return int(round(fraction * SAMPLE_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key.

    Unlike ``DataFrame.sample`` (partition-order-dependent Bernoulli),
    membership depends only on (key, seed): re-running on a re-
    partitioned, re-sorted, or incrementally-grown table keeps exactly
    the same keys, which is what makes downstream eval sets stable.
    """
    thr = fraction_threshold(fraction)
    return df.filter(sample_bucket(F.col(key_col), seed) < F.lit(thr))


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name, by weighted bucket ranges.

    ``weights`` maps split name → relative weight (normalized here).
    Ranges are half-open and consecutive in iteration order, so the
    splits are exhaustive and pairwise disjoint by construction. The
    last split absorbs rounding remainder.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    names = list(weights)
    b = sample_bucket(F.col(key_col), seed)
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cond = b < F.lit(fraction_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    labeled = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, labeled)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
    seed: str = "weighted",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k).

    Efraimidis–Espirakis A-ES (IPL 2006): each row gets key
    u^(1/w) with u ~ Uniform(0,1]; the k largest keys are a weighted
    sample without replacement. Here u is md5-derived from (seed, key)
    — same convention as ``sample_bucket`` — so the sample is a pure
    function of the key set, reproducible across partitionings and
    incrementally-grown tables. Rows with NULL or non-positive weight
    are excluded (they can never be drawn).

    Ranking uses ln(u)/w (monotone in u^(1/w), numerically safer); the
    float only ORDERS rows and is not emitted, so engine-portable
    value-exactness holds unless two keys collide within 1 ulp
    (~2^-52 with 60-bit u — negligible). Tie-break: key asc.

    Shape at scale: global k ⇒ sort+limit (TakeOrderedAndProject:
    per-partition partial top-k, one tiny final merge — no full sort);
    per-stratum k ⇒ one window shuffled on the stratum key.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    tagged = F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string"))
    u = (md5_hash60(tagged) + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    es = F.log(u) / F.col(weight_col).cast("double")
    pos = df.filter(F.col(weight_col) > 0)
    if strata_col is None:
        return pos.orderBy(es.desc(), F.col(key_col).asc()).limit(k)
    w = Window.partitionBy(strata_col).orderBy(es.desc(), F.col(key_col).asc())
    return (
        pos.withColumn("_ws_rk", F.row_number().over(w))
        .filter(F.col("_ws_rk") <= k)
        .drop("_ws_rk")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    use ``default_fraction``. Still a single scan-level filter: the
    per-stratum threshold is a CASE expression, not a join — at 100 TB
    the strata list (languages, sources) is tiny and lives in the plan.
    """
    thr: Column | None = None
    s = F.col(strata_col)
    for value, frac in fractions.items():
        cond = s == F.lit(value)
        lit = F.lit(fraction_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    default_lit = F.lit(fraction_threshold(default_fraction))
    threshold = default_lit if thr is None else thr.otherwise(default_lit)
    return df.filter(sample_bucket(F.col(key_col), seed) < threshold)


def epoch_order(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
    seed: str = "epoch",
    curriculum: list[Column] | None = None,
) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard layout — the data
    loader's "shuffle each epoch" reproducibly, as a pure function of
    (seed, epoch, key).

    Every row gets an order key md5-derived from (seed, epoch, key), a
    shard in [0, n_shards) (order key mod n_shards — balanced in
    expectation, and a shard's rows stay spread across input partitions
    so no reader hot-spots one file), and ``pos`` = its 0-based position
    within the shard under (curriculum..., order key, key) ordering.
    Different epochs draw independent permutations; re-running an epoch
    reproduces it exactly on any partitioning.

    ``curriculum`` optionally prepends sort expressions (e.g. a
    difficulty/quality stage) so each shard reads easy→hard while the
    hash key still shuffles within a stage — curriculum learning
    without losing reproducibility.

    Scale shape: the per-shard rank runs on the two-phase distributed
    sequencer (operators/prefix.py) — never a PARTITION BY shard window
    funnelling n/n_shards rows through one task.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from who_focus_crawler_spark.operators.prefix import grouped_running_sum

    tagged = F.concat(
        F.lit(seed),
        F.lit(":"),
        F.lit(int(epoch)).cast("string"),
        F.lit(":"),
        F.col(key_col).cast("string"),
    )
    okey = md5_hash60(tagged)
    staged = df.withColumn("_eo_key", okey).withColumn(
        "shard", (F.col("_eo_key") % F.lit(n_shards)).cast("int")
    )
    order = list(curriculum or []) + [F.col("_eo_key"), F.col(key_col)]
    ranked = grouped_running_sum(
        staged.withColumn("_eo_one", F.lit(1)),
        group_cols=["shard"],
        order=order,
        value_col="_eo_one",
        out_col="_eo_rank",
    )
    return (
        ranked.withColumn("pos", (F.col("_eo_rank") - 1).cast("long"))
        .drop("_eo_key", "_eo_one", "_eo_rank")
    )
