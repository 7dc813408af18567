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


def test_cuckoo_power_of_two_required():
    import pytest

    with pytest.raises(ValueError):
        CuckooFilter(nbuckets=1000)
    with pytest.raises(ValueError):
        CuckooFilter.from_bytes(b"\x00" * 8000, 1000, 4)


def test_cuckoo_overflow_reported():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=8000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 10, slots=4)  # 4096 slots < 8000 keys
    assert f.insert(keys) is False


def test_cuckoo_bulk_insert_fills_delete_holes():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 2**63, size=1500, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 2**63, size=1500, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(nbuckets=1 << 11, slots=4)
    assert f.insert(a)
    f.delete(a[:700])  # punch holes mid-row
    assert f.insert(b)  # bulk path must target real free slots, not count
    assert f.maybe_contains(a[700:]).all()
    assert f.maybe_contains(b).all()


def test_cuckoo_saturation_keeps_dedup_exact(spark):
    """Overflow on incremental update demotes the partition to the exact
    anti-join path (ADVICE r1: silent overflow broke exactness)."""
    from pyspark.sql import functions as F

    from who_focus_crawler_spark.operators.dedup import (
        CUCKOO_KIND,
        SATURATED_KIND,
        build_seen_filters,
        dedup_against_seen,
        part_id,
        update_seen_filters,
    )

    P = 2
    seen0 = (
        spark.createDataFrame(
            [(f"http://h.t/p/{i}",) for i in range(50)], ["canon_url"]
        )
        .withColumn("url_hash", F.xxhash64("canon_url"))
        .withColumn("part_id", part_id(F.col("url_hash"), P))
    )
    # tiny capacity ⇒ nb=1024 (4096 slots); 9000 adds per 2 parts overflow it
    filters = build_seen_filters(seen0, P, capacity_per_part=100, kind=CUCKOO_KIND)
    adds = (
        spark.createDataFrame(
            [(f"http://h.t/n/{i}",) for i in range(9000)], ["canon_url"]
        )
        .withColumn("url_hash", F.xxhash64("canon_url"))
    )
    filters2 = update_seen_filters(
        filters, adds, P, capacity_per_part=100, kind=CUCKOO_KIND
    )
    kinds = {r.kind for r in filters2.select("kind").collect()}
    assert SATURATED_KIND in kinds
    # the full seen set after the update
    seen = seen0.unionByName(
        adds.withColumn("part_id", part_id(F.col("url_hash"), P))
    )
    cand = spark.createDataFrame(
        [(f"http://h.t/n/{i}",) for i in range(8000, 10000)]
        + [(f"http://h.t/p/{i}",) for i in range(40, 60)],
        ["target_url"],
    ).withColumn("url_hash", F.xxhash64("target_url"))
    with_f = {r.target_url for r in dedup_against_seen(cand, seen, filters2, P).collect()}
    exact = {r.target_url for r in dedup_against_seen(cand, seen, None, P).collect()}
    assert with_f == exact
    # a saturated filter stays saturated through further updates
    filters3 = update_seen_filters(
        filters2, adds.limit(5), P, capacity_per_part=100, kind=CUCKOO_KIND
    )
    assert SATURATED_KIND in {r.kind for r in filters3.select("kind").collect()}


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
