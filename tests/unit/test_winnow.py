"""Positional winnowing (corpus/text.py::winnow_fingerprints) vs an
independent pure-Python reference of Schleimer/Wilkerson/Aiken 2003,
plus the paper's detection guarantee."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import tokens, winnow_fingerprints

K, W = 4, 5


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, str]]:
    """Straight-from-the-paper reference: slide a window of w gram
    hashes, select each window's min (ties to the RIGHTMOST), record
    each selection once. Independent of the engine's sortable-key
    trick."""
    toks = re.findall("[a-z0-9]+", text.lower())
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
    if not hs:
        return set()
    out: set[tuple[int, str]] = set()
    n_win = max(len(hs) - w + 1, 1)
    for i in range(n_win):
        window = hs[i : i + w]
        mn = min(window)
        # rightmost occurrence of the min within the window
        j = max(p for p, h in enumerate(window) if h == mn)
        out.add((i + j + 1, mn))  # 1-based gram position
    return out


DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog again and again"),
    ("d2", "a a a a a a a a"),  # all-equal hashes: pure tie-break test
    ("d3", "short doc"),  # < k tokens -> no fingerprints
    ("d4", "one two three four"),  # exactly k tokens -> 1 gram < w window
    ("d5", "Punct, CASE and 123 numbers; mixed-up TOKENS appear here too"),
    (
        "d6",
        " ".join(f"w{i % 17}" for i in range(60)),  # repeating structure
    ),
]


def test_winnow_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.doc_id, r.fp.pos, r.fp.gram_hash)
        for r in df.select(
            "doc_id",
            F.explode(winnow_fingerprints(tokens(F.col("text")))).alias("fp"),
        ).collect()
    }
    want = {
        (doc_id, pos, h)
        for doc_id, text in DOCS
        for pos, h in _py_winnow(text)
    }
    assert got == want
    assert any(d == "d2" for d, _, _ in got)  # tie-break path exercised
    assert not any(d == "d3" for d, _, _ in got)
    assert sum(1 for d, _, _ in got if d == "d4") == 1  # short-doc window


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # Two docs sharing a run of w + k - 1 = 8 tokens in different
    # surroundings MUST share at least one fingerprint hash (SIGMOD
    # 2003 correctness property of winnowing).
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        ("a", f"unrelated lead-in words here {shared} tail x y z"),
        ("b", f"{shared} completely different continuation of text"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = df.select(
        "doc_id",
        F.explode(winnow_fingerprints(tokens(F.col("text")))).alias("fp"),
    ).collect()
    hashes = {d: set() for d in ("a", "b")}
    for r in rows:
        hashes[r.doc_id].add(r.fp.gram_hash)
    assert hashes["a"] & hashes["b"]


def test_winnow_density(spark):
    # Selection keeps roughly 2/(w+1) of grams on random-ish text —
    # sanity that it's LOCAL sampling, not the global min (1 per doc)
    # and not everything.
    text = " ".join(f"tok{(i * 7919) % 997}" for i in range(400))
    df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
    n = df.select(
        F.size(winnow_fingerprints(tokens(F.col("text")))).alias("n")
    ).collect()[0]["n"]
    n_grams = 400 - K + 1
    assert 0.05 * n_grams < n < 0.6 * n_grams
