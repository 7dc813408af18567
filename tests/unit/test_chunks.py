"""Content-defined chunking (corpus/chunks.py): chunks match a pure-
Python reference of the frozen cut rule, partition the token stream,
re-synchronize after a prefix insertion (the CDC property a fixed-width
splitter lacks), and drive deterministic chunk-level keep decisions and
per-doc dup coverage."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.chunks import (
    cdc_chunks,
    cdc_dedup_keep,
    cdc_doc_coverage,
)

W, MASK_BITS = 2, 2  # small mask → plenty of cuts on short fixtures


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_chunks(text: str, w: int = W, mask_bits: int = MASK_BITS):
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    n = len(toks)
    starts = [0]
    for i in range(n - w + 1):
        gram = " ".join(toks[i : i + w])
        if h60(gram) % (1 << mask_bits) == 0 and i + w < n:
            starts.append(i + w)
    out = []
    for ci, s in enumerate(starts):
        e = starts[ci + 1] if ci + 1 < len(starts) else n
        if e > s:
            out.append((ci, h60(" ".join(toks[s:e])), e - s))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    base = " ".join(f"tok{(i * 7) % 23} w{i % 5}" for i in range(40))
    rows = [
        (0, base),
        (1, "zzz yyy xxx qqq " + base),  # prefix-shifted copy
        (2, "totally unrelated words appear only here once"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunks_match_python_reference_and_partition_stream(spark, docs):
    got = cdc_chunks(docs, w=W, mask_bits=MASK_BITS).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_hash, r.n_tokens)
        )
    for r in docs.collect():
        exp = py_chunks(r.text)
        assert sorted(by_doc.get(r.doc_id, [])) == sorted(exp), r.doc_id
        # chunks partition the token stream exactly
        import re

        assert sum(nt for _, _, nt in exp) == len(
            re.findall(r"[a-z0-9]+", r.text.lower())
        )
    assert 3 not in by_doc  # empty doc → no rows
    assert len(by_doc[0]) > 3  # the mask actually cuts


def test_cdc_resynchronizes_after_prefix_insert(spark, docs):
    ch = cdc_chunks(docs, w=W, mask_bits=MASK_BITS)
    h0 = {r.chunk_hash for r in ch.filter(F.col("doc_id") == 0).collect()}
    h1 = {r.chunk_hash for r in ch.filter(F.col("doc_id") == 1).collect()}
    shared = h0 & h1
    # after the first boundary past the 4-token insert, every cut (and
    # therefore every chunk) of doc 0 reappears in doc 1
    assert len(shared) >= len(h0) - 2, (len(shared), len(h0))
    h2 = {r.chunk_hash for r in ch.filter(F.col("doc_id") == 2).collect()}
    assert not (h0 & h2)


def test_dedup_keep_one_survivor_per_hash(spark, docs):
    kept = cdc_dedup_keep(cdc_chunks(docs, w=W, mask_bits=MASK_BITS))
    per_hash = (
        kept.groupBy("chunk_hash")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("nkeep"),
            F.min(F.when(F.col("keep"), F.col("doc_id"))).alias("keeper"),
            F.min("doc_id").alias("min_doc"),
        )
        .collect()
    )
    for r in per_hash:
        assert r.nkeep == 1
        assert r.keeper == r.min_doc  # first occurrence wins


def test_doc_coverage_flags_shared_blocks_only(spark, docs):
    cov = {
        r.doc_id: r
        for r in cdc_doc_coverage(
            cdc_chunks(docs, w=W, mask_bits=MASK_BITS)
        ).collect()
    }
    assert cov[0].n_dup_chunks >= cov[0].n_chunks - 2
    assert cov[0].dup_permille > 800
    assert cov[2].n_dup_chunks == 0 and cov[2].dup_permille == 0
    for r in cov.values():
        assert r.dup_tokens <= r.total_tokens
