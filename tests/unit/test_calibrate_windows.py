"""Sliding-window chunking (corpus/chunks.py::sliding_windows) and
per-source quality calibration (corpus/calibrate.py): window layout
matches the slice arithmetic, and the permille percent-rank matches a
Python reference with tie and single-row semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.calibrate import quality_percentile
from who_focus_crawler_spark.corpus.chunks import sliding_windows


def test_sliding_window_layout(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c")], "doc_id long, text string"
    )
    out = sorted(
        map(tuple, sliding_windows(docs, size=4, stride=3).collect())
    )
    # doc 1: 10 tokens, size 4, stride 3 -> ceil(6/3)+1 = 3 windows
    assert out == [
        (1, 0, "t0 t1 t2 t3", 4, 0),
        (1, 1, "t3 t4 t5 t6", 4, 3),
        (1, 2, "t6 t7 t8 t9", 4, 6),
        (2, 0, "a b c", 3, 0),  # shorter than size: one window
    ]
    with pytest.raises(ValueError, match="positive"):
        sliding_windows(docs, size=0)


def test_sliding_window_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))],
        "doc_id long, text string",
    )
    out = {r.window_idx: r for r in sliding_windows(
        docs, size=4, stride=3
    ).collect()}
    # 11 tokens -> ceil(7/3)+1 = 4 windows; last starts at 9, holds 2
    assert len(out) == 4
    assert (out[3].start_pos, out[3].n_tokens, out[3].window_text) == (
        9, 2, "t9 t10"
    )


def test_quality_percentile_matches_reference(spark):
    rows = [
        # source A: qualities with a tie
        ("A", 1, 10), ("A", 2, 20), ("A", 3, 20), ("A", 4, 30), ("A", 5, 40),
        # source B: different scale entirely
        ("B", 6, 900), ("B", 7, 905),
        # source C: single row
        ("C", 8, 7),
    ]
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, quality long"
    )
    got = {
        r.doc_id: r.quality_permille
        for r in quality_percentile(docs).collect()
    }
    def ref():
        import collections
        by = collections.defaultdict(list)
        for s, d, q in rows:
            by[s].append((d, q))
        out = {}
        for s, items in by.items():
            n = len(items)
            for d, q in items:
                below = sum(1 for _, q2 in items if q2 < q)
                out[d] = (below * 1000) // max(n - 1, 1)
        return out
    assert got == ref()
    assert got[2] == got[3]          # ties share the rank
    assert got[8] == 0               # single-row source
    assert got[1] == 0 and got[5] == 1000


def test_quality_percentile_partitioning_invariance(spark):
    rows = [("s%d" % (i % 3), i, (i * 37) % 50) for i in range(300)]
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, quality long"
    )
    a = sorted(map(tuple, quality_percentile(docs).collect()))
    b = sorted(
        map(tuple, quality_percentile(docs.repartition(11)).collect())
    )
    assert a == b
