"""Per-source boilerplate segment removal: planted-template detection,
threshold edges, trailing partial segments, and exact text rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.boilerplate import (
    boilerplate_segments,
    segments,
    strip_boilerplate,
)

HEADER = "cookie banner accept please"  # 4 tokens = 2 segments at seg_len=2


def _corpus(spark):
    """Source A: 5 docs sharing a 4-token header + unique tails.
    Source B: the same header in only 1 of 5 docs (below every
    threshold). One empty-text doc in A."""
    rows = []
    for i in range(5):
        rows.append((f"a{i}", "A", f"{HEADER} tail{i} word{i}"))
    rows.append(("a_empty", "A", ""))
    rows.append(("b0", "B", f"{HEADER} other beta tail"))
    for i in range(1, 5):
        rows.append((f"b{i}", "B", f"plain{i} beta{i} content{i} tail{i}"))
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_segments_nonoverlapping_with_trailing_partial(spark):
    df = spark.createDataFrame(
        [("d", "one two three four five six seven")], "doc_id string, text string"
    )
    from who_focus_crawler_spark.corpus.text import tokens

    [row] = df.select(segments(tokens(F.col("text")), 3).alias("s")).collect()
    assert row.s == ["one two three", "four five six", "seven"]
    [empty] = (
        spark.createDataFrame([("d", "")], "doc_id string, text string")
        .select(segments(tokens(F.col("text")), 3).alias("s"))
        .collect()
    )
    assert empty.s == []


def test_planted_header_detected_only_where_thresholds_met(spark):
    boiler = boilerplate_segments(
        _corpus(spark), seg_len=2, min_docs=3, share_permille=500
    ).collect()
    # exactly the 2 header segments, in source A only (5/6 docs = 833‰;
    # B has it in 1/5 docs — below min_docs AND share)
    assert sorted((r.source, r.df_docs) for r in boiler) == [("A", 5), ("A", 5)]


def test_strip_rebuilds_exact_text_and_counters(spark):
    out = {
        r.doc_id: r
        for r in strip_boilerplate(
            _corpus(spark), seg_len=2, min_docs=3, share_permille=500
        ).collect()
    }
    for i in range(5):
        r = out[f"a{i}"]
        # header gone, tail intact, order preserved
        assert r.text == f"tail{i} word{i}"
        assert (r.n_segs, r.n_boiler_segs) == (3, 2)
    # B docs pass through (token-normalized), zero removals
    assert out["b0"].text == f"{HEADER} other beta tail"
    assert out["b0"].n_boiler_segs == 0
    assert out["b2"].text == "plain2 beta2 content2 tail2"
    # empty doc survives with empty text and zero counters
    assert (out["a_empty"].text, out["a_empty"].n_segs) == ("", 0)


def test_midline_boilerplate_removal_preserves_order(spark):
    """Boilerplate segments in the MIDDLE of a doc: survivors re-join in
    original order around the gap."""
    rows = [(f"d{i}", "S", f"start{i} open mid common footer end{i} close")
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    # seg_len=2 segments: [start_i open] [mid common] [footer end_i]
    # [close] — both 'mid common' and the shared trailing partial
    # 'close' cross 900‰, the per-doc segments don't
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate(
            df, seg_len=2, min_docs=3, share_permille=900
        ).collect()
    }
    for i in range(4):
        assert out[f"d{i}"] == f"start{i} open footer end{i}"
