"""Inverted index + integer BM25: postings exactness and the three
ranking properties that make BM25 BM25 (idf ordering, tf saturation,
length normalization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.index import bm25_scores, postings, term_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_and_term_stats_exact(spark):
    d = _df(spark, [(1, "apple apple pear"), (2, "apple kiwi"), (3, "kiwi")])
    post = {
        (r.term, r.doc_id): r.tf for r in postings(d).collect()
    }
    assert post == {
        ("apple", 1): 2, ("pear", 1): 1, ("apple", 2): 1,
        ("kiwi", 2): 1, ("kiwi", 3): 1,
    }
    stats = {r.term: (r.df_docs, r.cf) for r in term_stats(postings(d)).collect()}
    assert stats == {"apple": (2, 3), "pear": (1, 1), "kiwi": (2, 2)}


def test_rare_term_outscores_common_term(spark):
    """Docs identical except one contains a corpus-rare term, the other a
    corpus-common term: idf must dominate."""
    rows = [(i, "filler common words here") for i in range(20)]
    rows += [(100, "rare common words here"), (101, "filler common words here")]
    d = _df(spark, rows)
    s = {
        r.doc_id: r.score_milli
        for r in bm25_scores(d, ["rare", "filler"]).collect()
    }
    assert s[100] > s[101]


def test_tf_saturates(spark):
    """Doubling tf must increase the score sublinearly (k1 saturation):
    score(tf=4) < 2 * score(tf=2), while still score(tf=4) > score(tf=2).
    Pads keep doc length equal so length-norm cancels."""
    d = _df(
        spark,
        [(1, "hit hit pad pad pad pad"), (2, "hit hit hit hit pad pad")],
    )
    s = {r.doc_id: r.score_milli for r in bm25_scores(d, ["hit"]).collect()}
    assert s[1] < s[2] < 2 * s[1]


def test_length_normalization(spark):
    """Same tf, longer doc → lower score."""
    d = _df(spark, [(1, "hit one two"), (2, "hit " + "pad " * 20)])
    s = {r.doc_id: r.score_milli for r in bm25_scores(d, ["hit"]).collect()}
    assert s[1] > s[2]


def test_only_matching_docs_returned_and_n_matched(spark):
    d = _df(spark, [(1, "alpha beta"), (2, "beta gamma"), (3, "delta")])
    got = {r.doc_id: r.n_matched for r in bm25_scores(d, ["alpha", "beta"]).collect()}
    assert got == {1: 2, 2: 1}


def test_positional_postings_and_phrase_search(spark):
    from who_focus_crawler_spark.corpus.index import (
        phrase_search,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat the cat sat here"),
            (3, "cat sat mat on the"),          # 'the cat' absent
            (4, "THE CAT sat"),                  # case folding
            (5, "cat"),                          # shorter than phrase
        ],
        "doc_id long, text string",
    )
    pp = {
        (r.term, r.doc_id): list(r.positions)
        for r in positional_postings(docs).collect()
    }
    assert pp[("the", 1)] == [0, 4]
    assert pp[("cat", 2)] == [1, 3]

    got = {r.doc_id: r.n_hits for r in phrase_search(docs, "the cat").collect()}
    assert got == {1: 1, 2: 2, 4: 1}
    got3 = {
        r.doc_id: r.n_hits for r in phrase_search(docs, "the cat sat").collect()
    }
    assert got3 == {1: 1, 2: 1, 4: 1}
    # probing a precomputed index gives identical results
    idx = positional_postings(docs)
    got_idx = {
        r.doc_id: r.n_hits
        for r in phrase_search(docs, "the cat", index=idx).collect()
    }
    assert got_idx == got
    # single-token phrase counts plain occurrences
    got1 = {r.doc_id: r.n_hits for r in phrase_search(docs, "cat").collect()}
    assert got1 == {1: 1, 2: 2, 3: 1, 4: 1, 5: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_min_window_span_known_values(spark):
    from who_focus_crawler_spark.corpus.index import min_window_span

    rows = [
        # terms at pos: a=0, b=3, c=5 → window [0,5]=6; later a=7 → [3,7]=5
        (1, "alpha x y beta z gamma q alpha"),
        # all adjacent → window 3
        (2, "x alpha beta gamma y"),
        # missing gamma → no row
        (3, "alpha beta alpha beta"),
        # two candidates same width → earliest start wins
        (4, "alpha beta gamma x alpha beta gamma"),
    ]
    out = {
        r.doc_id: (r.window, r.win_start, r.win_end)
        for r in min_window_span(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            ["alpha", "beta", "gamma"],
        ).collect()
    }
    assert out[1] == (5, 3, 7)
    assert out[2] == (3, 1, 3)
    assert 3 not in out
    assert out[4] == (3, 0, 2)


def test_min_window_span_single_term(spark):
    from who_focus_crawler_spark.corpus.index import min_window_span

    rows = [(1, "x alpha y alpha"), (2, "no match here")]
    out = {
        r.doc_id: (r.window, r.win_start)
        for r in min_window_span(
            spark.createDataFrame(rows, ["doc_id", "text"]), ["alpha"]
        ).collect()
    }
    assert out == {1: (1, 1)}
