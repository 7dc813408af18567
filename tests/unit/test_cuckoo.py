"""Cuckoo filter (C4 alternative): no false negatives, delete support,
and exact-dedup equivalence through the same cogrouped probe path."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from who_focus_crawler_spark.operators.cuckoo import CuckooFilter


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=1, max_value=4000),
)
@settings(max_examples=40, deadline=None)
def test_cuckoo_no_false_negative(seed, n):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 12, slots=4)  # cap 16384, <=25% load
    assert f.insert(keys)
    assert f.maybe_contains(keys).all()


def test_cuckoo_false_positive_rate():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=8000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 12, slots=4)  # ~50% load
    assert f.insert(keys)
    fresh = rng.integers(0, 2**63, size=8000, dtype=np.int64).astype(np.uint64)
    assert f.maybe_contains(fresh).mean() < 0.05


def test_cuckoo_delete():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 11, slots=4)
    assert f.insert(keys)
    gone = keys[:500]
    assert f.delete(gone).all()
    # deleted keys may still collide with survivors' fingerprints, but the
    # surviving keys must all still be present (no false negatives)
    assert f.maybe_contains(keys[500:]).all()


def test_cuckoo_serialize_roundtrip():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 10, slots=4)
    f.insert(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), 1 << 10, 4)
    assert (g.maybe_contains(keys) == f.maybe_contains(keys)).all()


def test_cuckoo_dedup_equals_exact(spark):
    from pyspark.sql import functions as F

    from who_focus_crawler_spark.operators.dedup import (
        CUCKOO_KIND,
        build_seen_filters,
        dedup_against_seen,
        part_id,
    )

    P = 8
    seen = (
        spark.createDataFrame(
            [(f"http://h{i % 5}.t/p/{i}",) for i in range(0, 600, 2)], ["canon_url"]
        )
        .withColumn("url_hash", F.xxhash64("canon_url"))
        .withColumn("part_id", part_id(F.col("url_hash"), P))
    )
    cand = spark.createDataFrame(
        [(f"http://h{i % 5}.t/p/{i}",) for i in range(0, 900, 3)], ["target_url"]
    ).withColumn("url_hash", F.xxhash64("target_url"))
    filters = build_seen_filters(seen, P, kind=CUCKOO_KIND)
    assert {r.kind for r in filters.select("kind").distinct().collect()} == {"cuckoo"}
    with_f = {r.target_url for r in dedup_against_seen(cand, seen, filters, P).collect()}
    exact = {r.target_url for r in dedup_against_seen(cand, seen, None, P).collect()}
    assert with_f == exact
