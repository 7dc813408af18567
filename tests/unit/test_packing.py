"""Sequence packing: start-fit semantics, boundary behavior,
determinism across parallelism, and pack-stat integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.packing import pack_assign, pack_stats

import pytest


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    ).repartition(parts)


def test_start_fit_layout_matches_sequential_reference(spark):
    """Re-derive the layout sequentially in Python (same hash order) and
    compare every pack_id/pack_offset."""
    import hashlib

    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 90) for i in range(60)]
    cap = 128
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_assign(_docs(spark, rows), capacity=cap).collect()
    }

    def bucket(doc_id):
        h = hashlib.md5(f"pack:{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) % (1 << 20)

    exp = {}
    for src in {"s0", "s1", "s2"}:
        ordered = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (bucket(r[0]), r[0]),
        )
        start = 0
        for doc_id, _, n in ordered:
            exp[doc_id] = (start // cap, start % cap)
            start += n
    assert got == exp


def test_parallelism_invariance(spark):
    rows = [(i, "s", 5 + i % 40) for i in range(500)]
    a = sorted(
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_assign(_docs(spark, rows, parts=2), capacity=256).collect()
    )
    b = sorted(
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_assign(_docs(spark, rows, parts=23), capacity=256).collect()
    )
    assert a == b


def test_straddle_and_fill_stats(spark):
    rows = [(i, "s", 100) for i in range(7)]  # 7 docs x 100 tokens, cap 250
    packed = pack_assign(_docs(spark, rows), capacity=250)
    stats = {
        r.pack_id: (r.n_docs, r.n_tokens, r.fill_permille, r.straddles)
        for r in pack_stats(packed, capacity=250).collect()
    }
    # layout: starts at 0,100,200,300,... → packs 0,0,0,1,1,2,2
    assert stats[0] == (3, 300, 1200, True)  # start 200 ends 300 > 250
    assert stats[1] == (2, 200, 800, False)  # offsets 50,150 → ends ≤ 250
    assert stats[2] == (2, 200, 800, False)  # offsets 0,100 → ends ≤ 250
    # every doc's tokens are accounted exactly once
    assert sum(s[1] for s in stats.values()) == 700


def test_capacity_validation(spark):
    with pytest.raises(ValueError):
        pack_assign(_docs(spark, [(1, "s", 5)]), capacity=0)
