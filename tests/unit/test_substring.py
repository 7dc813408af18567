"""Duplicated n-gram coverage: hand-built corpus with known shared
n-grams, per-position counting, and the coverage filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.substring import (
    dup_ngram_coverage,
    filter_by_dup_coverage,
    positional_ngrams,
)
from who_focus_crawler_spark.corpus.text import tokens


def _corpus(spark):
    rows = [
        # docs 1 and 2 share the trigram "the quick fox"; doc 2 repeats it
        (1, "the quick fox jumps high"),
        (2, "see the quick fox and the quick fox again"),
        (3, "entirely different words here"),
        (4, "ab"),  # < 3 tokens → zero grams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_positional_ngrams_keep_duplicates(spark):
    df = spark.createDataFrame([("a b a b a",)], ["text"])
    grams = df.select(
        positional_ngrams(tokens(F.col("text")), 2).alias("g")
    ).first().g
    assert grams == ["a b", "b a", "a b", "b a"]  # positions, not a set


def test_dup_ngram_coverage_counts(spark):
    out = {
        r.doc_id: (r.n_grams, r.n_dup)
        for r in dup_ngram_coverage(_corpus(spark), n=3).collect()
    }
    # doc1: 3 grams; "the quick fox" is shared → 1 dup position
    assert out[1] == (3, 1)
    # doc2: 7 grams; "the quick fox" occurs at 2 positions → 2 dup positions
    assert out[2] == (7, 2)
    assert out[3] == (2, 0)
    assert out[4] == (0, 0)  # short doc still present, zeros


def test_within_doc_repeats_do_not_count_as_cross_doc(spark):
    rows = [(1, "x y x y x y"), (2, "nothing shared at all")]
    out = {
        r.doc_id: r.n_dup
        for r in dup_ngram_coverage(
            spark.createDataFrame(rows, ["doc_id", "text"]), n=2
        ).collect()
    }
    # "x y"/"y x" repeat only inside doc 1 → doc frequency 1 → not dup
    assert out[1] == 0


def test_filter_by_dup_coverage(spark):
    # doc2 dup share 2/7 ≈ 286‰; doc1 1/3 ≈ 333‰
    kept_300 = {
        r.doc_id
        for r in filter_by_dup_coverage(_corpus(spark), n=3, max_dup_permille=300)
        .collect()
    }
    assert kept_300 == {2, 3, 4}
    kept_all = {
        r.doc_id
        for r in filter_by_dup_coverage(_corpus(spark), n=3, max_dup_permille=1000)
        .collect()
    }
    assert kept_all == {1, 2, 3, 4}


def test_remove_dup_runs_excises_shared_phrase(spark):
    from who_focus_crawler_spark.corpus.substring import remove_dup_runs

    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_dup_runs(_corpus(spark), n=3).collect()
    }
    # doc1: dup gram starts at pos 1 ("the quick fox") → positions 1-3
    # removed, "jumps high" survives
    assert out[1] == (5, 3, "jumps high")
    # doc2: dup starts at pos 2 and 6 → positions 2-4 and 6-8 removed;
    # kept = "see", "and", "again"
    assert out[2] == (9, 6, "see and again")
    # untouched docs: rebuilt text = whitespace-normalized original
    assert out[3] == (4, 0, "entirely different words here")
    # short doc (< n tokens, zero grams) passes through intact
    assert out[4] == (1, 0, "ab")


def test_remove_dup_runs_unique_corpus_unchanged(spark):
    from who_focus_crawler_spark.corpus.substring import remove_dup_runs

    rows = [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")]
    out = remove_dup_runs(
        spark.createDataFrame(rows, ["doc_id", "text"]), n=2
    ).collect()
    assert all(r.n_removed == 0 for r in out)
    assert {r.clean_text for r in out} == {
        "alpha beta gamma delta",
        "epsilon zeta eta theta",
    }


def test_remove_dup_runs_overlapping_grams_cover_once(spark):
    from who_focus_crawler_spark.corpus.substring import remove_dup_runs

    # shared 4-token run "a b c d" → two overlapping dup trigrams in each
    # doc; covered set is the union of their windows, counted once
    rows = [(1, "a b c d x"), (2, "y a b c d")]
    out = {
        r.doc_id: (r.n_removed, r.clean_text)
        for r in remove_dup_runs(
            spark.createDataFrame(rows, ["doc_id", "text"]), n=3
        ).collect()
    }
    assert out[1] == (4, "x")
    assert out[2] == (4, "y")


def test_dedup_lines_within_doc(spark):
    from who_focus_crawler_spark.corpus.text import dedup_lines

    rows = [
        (1, "home\nabout us\nhome\ncontact\nhome"),
        (2, "unique one\nunique two"),
        (3, "solo"),
        (4, "x\n\ny\n\nx"),  # empty lines dedup like any other line
    ]
    out = {
        r.doc_id: (r.n_lines, r.n_dup_lines, r.clean_text)
        for r in dedup_lines(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1] == (5, 2, "home\nabout us\ncontact")
    assert out[2] == (2, 0, "unique one\nunique two")
    assert out[3] == (1, 0, "solo")
    # both the repeated empty line and the repeated "x" dedup
    assert out[4] == (5, 2, "x\n\ny")


def test_dedup_lines_global_cross_doc(spark):
    """corpus/text.py::dedup_lines_global — CCNet-style corpus-wide line
    dedup: a boilerplate line survives only in the (doc_id, idx)-minimal
    position; short lines are exempt; texts rebuild in order."""
    from who_focus_crawler_spark.corpus.text import dedup_lines_global

    banner = "this cookie banner line repeats on every single page"
    rows = [
        (1, f"{banner}\nunique first document body line\nok"),
        (2, f"{banner}\nanother unique body line here\n{banner}"),
        (3, f"short\n{banner}\nthird unique line of text"),
        (4, "no duplicates anywhere in this document at all"),
    ]
    out = {
        r.doc_id: (r.n_lines, r.n_dropped, r.clean_text)
        for r in dedup_lines_global(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    # doc 1 holds the first occurrence; 'ok' is short-exempt
    assert out[1] == (3, 0, rows[0][1])
    # doc 2 loses both copies (cross-doc AND its intra-doc repeat)
    assert out[2] == (3, 2, "another unique body line here")
    # doc 3 keeps its short line and unique line, loses the banner
    assert out[3] == (3, 1, "short\nthird unique line of text")
    assert out[4] == (1, 0, rows[3][1])


def test_dedup_lines_global_parallelism_invariance(spark):
    from who_focus_crawler_spark.corpus.text import dedup_lines_global

    rows = [
        (i, f"shared boilerplate line appearing everywhere\nunique {i} body")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, dedup_lines_global(df.coalesce(1)).collect()))
    b = sorted(map(tuple, dedup_lines_global(df.repartition(8)).collect()))
    assert a == b
    # exactly one survivor of the shared line
    survivors = [t for t in a if "shared boilerplate" in t[3]]
    assert len(survivors) == 1 and survivors[0][0] == 0
