"""T5 span corruption (corpus/t5.py) vs an exact Python reference of the
same md5-derived draws, plus structural invariants: sentinel numbering
is dense and ordered, targets reproduce exactly the corrupted tokens,
and overlapping draws merge into one sentinel."""

from __future__ import annotations

import hashlib
import re

from who_focus_crawler_spark.corpus.t5 import span_corruption


def _h(seed, tag, doc_id, pos):
    s = f"{seed}:{tag}|{doc_id}|{pos}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref(doc_id, text, seed="t5", start_permille=60, max_span=5):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    n = len(toks)
    covered = set()
    for pos in range(1, n + 1):
        if _h(seed, "start", doc_id, pos) % 1000 < start_permille:
            slen = _h(seed, "len", doc_id, pos) % max_span + 1
            covered |= set(range(pos, min(pos + slen - 1, n) + 1))
    spans = []
    for p in sorted(covered):
        if spans and p == spans[-1][1] + 1:
            spans[-1][1] = p
        else:
            spans.append([p, p])
    start2sid = {s: k for k, (s, _) in enumerate(spans)}
    inp = []
    for p in range(1, n + 1):
        if p in start2sid:
            inp.append(f"<extra_id_{start2sid[p]}>")
        elif p not in covered:
            inp.append(toks[p - 1])
    tgt = [
        f"<extra_id_{k}> " + " ".join(toks[s - 1 : e]) for k, (s, e) in enumerate(spans)
    ]
    return " ".join(inp), " ".join(tgt), len(spans)


TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog near the old river bank "
        "while seventeen sleepy badgers watch from a hollow log in the mist."),
    (2, "Data pipelines shuffle terabytes of tokens every day; span corruption "
        "turns raw text into denoising examples for sequence models."),
    (3, "short doc"),
    (4, ""),
    (5, "a b c d e f g h i j k l m n o p q r s t u v w x y z "
        "one two three four five six seven eight nine ten"),
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.input_text, r.targets_text, r.n_spans)
        for r in span_corruption(df).collect()
    }
    want = {d: _ref(d, t) for d, t in TEXTS}
    assert got == want
    # non-vacuity: at least one doc actually has >= 2 merged spans
    assert any(v[2] >= 2 for v in want.values())


def test_structural_invariants(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    rows = span_corruption(df, start_permille=200).collect()
    for r in rows:
        sids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r.input_text)]
        tids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r.targets_text)]
        # dense 0..k-1, same count and order on both sides
        assert sids == list(range(r.n_spans)) == tids
        # reassembling input's kept tokens + targets' span tokens
        # reproduces the full token stream length
        kept = [w for w in r.input_text.split() if not w.startswith("<extra_id_")]
        spanned = [w for w in r.targets_text.split() if not w.startswith("<extra_id_")]
        full = re.findall(r"[a-z0-9]+", dict(TEXTS)[r.doc_id].lower())
        assert len(kept) + len(spanned) == len(full)


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(TEXTS * 10, "doc_id long, text string").distinct()
    a = sorted(map(tuple, span_corruption(df.coalesce(1)).collect()))
    b = sorted(map(tuple, span_corruption(df.repartition(8)).collect()))
    assert a == b
