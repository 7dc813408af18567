"""Gopher and C4 rule bundles (corpus/text.py): each rule flips keep at
its exact threshold, the C4 line filter keeps/drops the right lines, and
c4_filter rewrites text to the kept lines only."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import (
    GOPHER_MIN_WORDS,
    c4_filter,
    c4_stats,
    gopher_keep,
    gopher_stats,
)

GOOD = " ".join(
    ["the quick brown fox jumps over and over to the lazy dog of fame that"]
    * 5
)  # 70 words, all alphabetic, stopword-rich, mean len in [3,10]


def _eval(spark, texts: dict[str, str], fn):
    df = spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())], "name string, text string"
    )
    return {r.name: r.out for r in df.select("name", fn.alias("out")).collect()}


def test_gopher_rules_flip_at_threshold(spark):
    texts = {
        "good": GOOD,
        "too_short": "the quick brown fox of and that have",  # < 50 words
        "long_words": " ".join(["pneumonoultramicroscopic"] * 60)
        + " the of and",  # mean word len > 10
        "symbols": GOOD + " " + " ".join(["#"] * 10),  # > 0.1 symbols/word
        "no_stop": " ".join(["alpha beta gamma delta epsilon"] * 12),
        "numeric": " ".join(["12345 67890 11111 22222 33333"] * 12)
        + " the of",  # alpha ratio < 0.8
        "ellipsis": "\n".join([f"the line of and that {i}..." for i in range(10)]
                              + ["the good line of that have here"] * 10),
    }
    got = _eval(spark, texts, gopher_keep(F.col("text")))
    assert got["good"] is True
    for bad in ("too_short", "long_words", "symbols", "no_stop", "numeric"):
        assert got[bad] is False, bad
    # 10/20 ellipsis lines = 500 permille > 300
    assert got["ellipsis"] is False


def test_gopher_stats_exact(spark):
    text = "the cat sat\n- on the mat...\nword"
    rows = _eval(
        spark,
        {"t": text},
        F.struct(*[v.alias(k) for k, v in gopher_stats(F.col("text")).items()]),
    )["t"]
    assert rows.n_words == 8
    assert rows.n_lines == 3
    assert rows.sum_word_len == sum(
        len(w) for w in text.replace("\n", " ").split()
    )
    assert rows.bullet_permille == 333  # 1 of 3 lines
    assert rows.ellipsis_permille == 333
    assert rows.n_stopwords == 1  # only "the"


def test_c4_line_rules_and_filter(spark):
    keep1 = "this is a good long sentence."
    keep2 = 'he said "stop right there now!"'.replace("!", '!"')  # ends "
    drop_short = "too few words."
    drop_noterm = "this line has no terminal punctuation at all"
    drop_js = "enable javascript to view this page."
    text = "\n".join([keep1, drop_short, keep2, drop_noterm, drop_js])
    s = _eval(
        spark,
        {"t": text},
        F.struct(
            *[v.alias(k) for k, v in c4_stats(F.col("text")).items()]
        ),
    )["t"]
    assert s.n_lines == 5 and s.n_kept == 2
    assert s.kept_text == "\n".join([keep1, keep2])
    assert not s.has_lorem and not s.has_brace

    docs = spark.createDataFrame(
        [
            (1, "\n".join([keep1] * 4)),  # survives, text unchanged
            (2, "\n".join([keep1] * 4) + "\nlorem ipsum filler."),
            (3, "\n".join([keep1, drop_noterm, drop_short])),  # < 3 kept
            (4, "var x = function() {\n" + "\n".join([keep1] * 4)),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in c4_filter(docs).collect()}
    assert set(out) == {1}
    assert out[1] == "\n".join([keep1] * 4)


def test_good_doc_word_floor_is_exact(spark):
    words = ["that", "have", "with", "the"] * 13  # 52 words, mean len 3.75
    at = " ".join(words[:GOPHER_MIN_WORDS])
    below = " ".join(words[: GOPHER_MIN_WORDS - 1])
    got = _eval(spark, {"at": at, "below": below}, gopher_keep(F.col("text")))
    assert got["at"] is True and got["below"] is False
