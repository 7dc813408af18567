"""Product quantization (corpus/similarity.py::pq_*): codes match a
plain-Python argmin reference, ADC distances equal the exact LUT sums,
trained codebooks beat the deterministic md5 ones on quantization error,
and fit is deterministic across partitionings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    rows = []
    for i in range(60):
        angle = (i % 3) * 2.0 + (i // 3) * 0.01
        rows.append(
            (i, [math.cos(angle), math.sin(angle), 0.1 * (i % 3), 0.2])
        )
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def py_encode(vec, books):
    m, subdim = len(books), len(books[0][0])
    codes = []
    for j in range(m):
        sv = vec[j * subdim : (j + 1) * subdim]
        best = min(
            range(len(books[j])),
            key=lambda c: (
                round(
                    sum((a - b) * (a - b) for a, b in zip(sv, books[j][c])), 9
                ),
                c,
            ),
        )
        codes.append(best)
    return codes


def test_pq_encode_matches_python_reference(vectors):
    books = S.pq_deterministic_codebooks(m=2, k=4, subdim=2)
    got = {
        r.vec_id: list(r.codes)
        for r in S.pq_encode(vectors, books).select("vec_id", "codes").collect()
    }
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in vectors.collect()}
    for vid, vec in raw.items():
        assert got[vid] == py_encode(vec, books), vid


def test_pq_adc_equals_lut_sum(vectors):
    books = S.pq_deterministic_codebooks(m=2, k=4, subdim=2)
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in vectors.collect()}
    q = raw[0]
    subdim = 2

    def lut_dist(vec):
        codes = py_encode(vec, books)
        d = 0.0
        for j, c in enumerate(codes):
            qs = q[j * subdim : (j + 1) * subdim]
            term = 0.0
            for a, b in zip(qs, books[j][c]):
                term += (a - b) * (a - b)
            d += term
        return round(d, 6)

    got = S.pq_adc_topk(vectors, books, query_vec_id=0, k=59).collect()
    assert len(got) == 59
    for r in got:
        assert r.adc_dist == lut_dist(raw[r.vec_id]), r.vec_id
    # ordering: ascending by distance, ties by vec_id
    seq = [(r.adc_dist, r.vec_id) for r in got]
    assert seq == sorted(seq)


def quant_error(vectors_df, books):
    raw = [[float(x) for x in r.embedding] for r in vectors_df.collect()]
    m, subdim = len(books), len(books[0][0])
    tot = 0.0
    for vec in raw:
        for j, c in enumerate(py_encode(vec, books)):
            sv = vec[j * subdim : (j + 1) * subdim]
            tot += sum((a - b) * (a - b) for a, b in zip(sv, books[j][c]))
    return tot


def test_pq_fit_beats_deterministic_codebooks(vectors):
    fitted = S.pq_fit_codebooks(vectors, m=2, k=4, iters=5)
    rand = S.pq_deterministic_codebooks(m=2, k=4, subdim=2)
    assert quant_error(vectors, fitted) < quant_error(vectors, rand) / 2
    # 3 natural clusters, 4 codewords per subspace: trained ADC must put a
    # same-cluster vector first (the true nearest neighbors of vec 0 are
    # vec 3, 6, ... on the same ray)
    top = S.pq_adc_topk(vectors, fitted, query_vec_id=0, k=5).collect()
    assert {r.vec_id % 3 for r in top} == {0}


def test_pq_fit_stable_across_layouts(vectors):
    # no RNG anywhere; the only layout sensitivity left is float summation
    # order in the centroid update, so codebooks agree to ~1 ulp
    a = S.pq_fit_codebooks(vectors, m=2, k=4, iters=3)
    b = S.pq_fit_codebooks(vectors.repartition(7), m=2, k=4, iters=3)
    for ja, jb in zip(a, b):
        for ca, cb in zip(ja, jb):
            for x, y in zip(ca, cb):
                assert abs(x - y) < 1e-9


def test_pq_rejects_indivisible_dim(vectors):
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_fit_codebooks(vectors, m=3, k=2)


def test_sq8_roundtrip_and_adc(spark):
    """SQ8 (corpus/similarity.py): codes in 0..255, exact Python
    reference agreement, self is ADC-nearest, and parallelism
    invariance of bounds + codes."""
    import math

    from who_focus_crawler_spark.corpus.similarity import (
        sq8_bounds,
        sq8_encode,
        sq8_topk,
    )

    vecs = [
        (i, [math.sin(i * 0.7 + d) for d in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def qv(v):
        # match quantize_vec: floor over the DOUBLE value of the float32
        return [math.floor(float(__import__("numpy").float32(x)) * 1e6) for x in v]

    qall = {i: qv(v) for i, v in vecs}
    dims = list(zip(*qall.values()))
    mins = [min(d) for d in dims]
    rngs = [max(max(d) - min(d), 1) for d in dims]

    bounds = sq8_bounds(df)
    got_b = {r.dim: (r.qmin, r.qmax) for r in bounds.collect()}
    assert [got_b[d][0] for d in sorted(got_b)] == mins

    codes = {r.vec_id: list(r.code) for r in sq8_encode(df, bounds).collect()}
    for i, v in qall.items():
        want = [((x - m) * 255) // r for x, m, r in zip(v, mins, rngs)]
        assert codes[i] == want
        assert all(0 <= c <= 255 for c in want)

    top = sq8_topk(df, query_id=13, k=3).collect()
    assert top[0].vec_id == 13  # self reconstructs nearest
    # exact reference distance for the runner-up
    def adc(i, j):
        rec = [m + (c * r) // 255 for c, m, r in zip(codes[i], mins, rngs)]
        return sum((a - b) ** 2 for a, b in zip(rec, qall[j]))
    want_order = sorted(qall, key=lambda i: (adc(i, 13), i))[:3]
    assert [r.vec_id for r in top] == want_order
