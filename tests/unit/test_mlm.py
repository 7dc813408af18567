"""MLM example generation (corpus/mlm.py): selection and action rates
track 15%/80-10-10, the corrupted stream agrees position-for-position
with the example rows, non-selected tokens pass through verbatim, and
the draws are deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.mlm import (
    MASK,
    mlm_corrupted_text,
    mlm_examples,
)


def docs_df(spark, n=80, words=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda i: F.concat(F.lit("w"), ((F.col("id") + i) % 97).cast("string")),
            ),
            " ",
        ).alias("text"),
    )


def test_rates_and_actions(spark):
    docs = docs_df(spark)
    total_tokens = 80 * 60
    ex = mlm_examples(docs).collect()
    frac = len(ex) / total_tokens
    assert 0.12 < frac < 0.18  # 15% +- sampling noise
    by_action = {a: 0 for a in ("mask", "random", "keep")}
    for r in ex:
        by_action[r.action] += 1
        if r.action == "mask":
            assert r.replacement == MASK
        elif r.action == "keep":
            assert r.replacement == r.original
        else:
            assert r.replacement != MASK  # drawn from the doc's tokens
    n = len(ex)
    assert 0.7 < by_action["mask"] / n < 0.9
    assert by_action["random"] / n < 0.2
    assert by_action["keep"] / n < 0.2


def test_corrupted_text_consistent_with_examples(spark):
    docs = docs_df(spark, n=20, words=40)
    ex = {
        (r.doc_id, r.pos): r
        for r in mlm_examples(docs).collect()
    }
    originals = {
        r.doc_id: r.text.split(" ") for r in docs.collect()
    }
    for r in mlm_corrupted_text(docs).collect():
        toks = r.corrupted.split(" ")
        orig = originals[r.doc_id]
        assert len(toks) == len(orig)
        for i, (got, o) in enumerate(zip(toks, orig), start=1):
            e = ex.get((r.doc_id, i))
            if e is None:
                assert got == o  # untouched position
            else:
                assert got == e.replacement


def test_deterministic(spark):
    docs = docs_df(spark, n=10)
    a = sorted(map(tuple, mlm_examples(docs).collect()))
    b = sorted(map(tuple, mlm_examples(docs.repartition(5)).collect()))
    assert a == b
