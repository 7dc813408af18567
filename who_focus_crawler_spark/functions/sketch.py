"""R19 companion — DETERMINISTIC distinct-count sketch.

Spark's native HLL (`approx_count_distinct`) is the default sketch, but
its value depends on internal hashing and merge order, so the oracle can
only row-count it. This module adds the threshold/adaptive-sampling
estimator of the KMV family (Flajolet, "On adaptive sampling", 1990;
Bar-Yossef et al. 2002): hash every key to 60 bits (md5-derived — the
engine-portable convention of corpus/text.py), keep keys whose hash
falls below T = 2^threshold_bits, and estimate

    distinct ≈ |distinct sampled hashes| · 2^(60 − threshold_bits)

The estimate is a pure function of the key SET — bit-identical across
engines, partitionings, and merge orders — so the driver value-checks
it exactly. Standard error ~ 1/sqrt(n_sampled).

Scale shape: the hash-threshold filter runs AT THE SCAN, so only a
2^-(60−threshold_bits) fraction of rows ever shuffles; the final
distinct-count runs on that small sample. This is the sketch to use
when results must be reproducible (audits, regression gates); HLL when
a few ulps of drift don't matter and memory is tighter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60

HASH_BITS = 60


def sample_mask(key: Column, threshold_bits: int) -> Column:
    """True for keys inside the deterministic sample."""
    return md5_hash60(key) < F.lit(1 << threshold_bits)


def distinct_estimate(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    threshold_bits: int = 54,
) -> DataFrame:
    """Per-group (n_sampled, est_distinct) — both exact integers."""
    scale = HASH_BITS - threshold_bits
    sampled = df.filter(sample_mask(F.col(key_col), threshold_bits))
    grouped = sampled.groupBy(*(group_cols or []))
    return grouped.agg(
        F.countDistinct(key_col).alias("n_sampled")
    ).withColumn(
        "est_distinct", (F.col("n_sampled") * F.lit(1 << scale)).cast("long")
    )
