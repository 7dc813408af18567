"""DSIR (corpus/dsir.py — Xie et al. 2023): in-domain source docs
outscore out-of-domain ones, the float log mode matches an independent
Python reference, the model is dense/bounded, and resampling is
deterministic and importance-biased."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.dsir import (
    PPM,
    dsir_fit,
    dsir_resample,
    dsir_scores,
    dsir_topk,
)

B = 64

TARGET = [
    (100, "spark pipelines shuffle data across executors"),
    (101, "spark executors cache shuffle data"),
    (102, "pipelines schedule spark tasks"),
]
SOURCE = [
    (1, "spark pipelines shuffle tasks"),          # in-domain
    (2, "executors cache spark data"),              # in-domain
    (3, "the cat sat on the warm mat"),             # out-of-domain
    (4, "bananas ripen quickly in summer heat"),    # out-of-domain
]


def dfs(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(TARGET), mk(SOURCE)


def py_buckets(text: str) -> list[int]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split()]
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B for g in grams
    ]


def py_model(target_rows, source_rows):
    tc, sc = {}, {}
    for _, txt in target_rows:
        for b in py_buckets(txt):
            tc[b] = tc.get(b, 0) + 1
    for _, txt in source_rows:
        for b in py_buckets(txt):
            sc[b] = sc.get(b, 0) + 1
    nt, ns = sum(tc.values()), sum(sc.values())
    return {
        b: (PPM * (tc.get(b, 0) + 1) * (ns + B))
        // ((sc.get(b, 0) + 1) * (nt + B))
        for b in range(B)
    }


def test_in_domain_docs_outscore_out_of_domain(spark):
    target, source = dfs(spark)
    model = dsir_fit(target, source, n_buckets=B)
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(source, model, n_buckets=B).collect()
    }
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])
    top = dsir_topk(source, model, k=2, n_buckets=B)
    assert {r.doc_id for r in top.collect()} == {1, 2}


def test_integer_scores_match_python_reference(spark):
    target, source = dfs(spark)
    model = dsir_fit(target, source, n_buckets=B)
    ref_model = py_model(TARGET, SOURCE)
    got_model = {r.bucket: r.ratio_ppm for r in model.collect()}
    assert got_model == ref_model
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(source, model, n_buckets=B).collect()
    }
    for doc_id, txt in SOURCE:
        exp = sum(ref_model[b] - PPM for b in py_buckets(txt))
        assert scores[doc_id] == exp


def test_log_space_matches_python_reference(spark):
    target, source = dfs(spark)
    model = dsir_fit(target, source, n_buckets=B)
    ref_model = py_model(TARGET, SOURCE)
    logw = {
        r.doc_id: r.dsir_logw
        for r in dsir_scores(
            source, model, n_buckets=B, log_space=True
        ).collect()
    }
    for doc_id, txt in SOURCE:
        exp = sum(math.log(ref_model[b] / PPM) for b in py_buckets(txt))
        assert abs(logw[doc_id] - exp) < 1e-9


def test_model_dense_and_bounded(spark):
    target, source = dfs(spark)
    model = dsir_fit(target, source, n_buckets=B).collect()
    assert len(model) == B
    assert all(r.ratio_ppm > 0 for r in model)


def test_resample_deterministic_and_biased(spark):
    target, source = dfs(spark)
    model = dsir_fit(target, source, n_buckets=B)
    a = {r.doc_id for r in dsir_resample(source, model, 2, B).collect()}
    b = {
        r.doc_id
        for r in dsir_resample(
            source.repartition(5), model, 2, B
        ).collect()
    }
    assert a == b and len(a) == 2
    # exp(logw) gaps between in- and out-of-domain docs are orders of
    # magnitude here, so the weighted sample must pick the in-domain pair
    assert a == {1, 2}
