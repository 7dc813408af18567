"""AllPairs exact Jaccard join (corpus/setjoin.py): result equals a
brute-force all-pairs Python reference (completeness — the prefix and
length filters lose nothing), thresholds bind exactly at the boundary,
and the canonical ordering is frequency-ascending."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.setjoin import (
    jaccard_similarity_join,
    ordered_sets,
)

WORDS = [f"w{i}" for i in range(40)]


def _text(idx: list[int]) -> str:
    return " ".join(WORDS[i % len(WORDS)] for i in idx)


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute(texts: list[str], tau_pm: int) -> dict[tuple[int, int], int]:
    out = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        sa, sb = _ref_shingles(texts[a]), _ref_shingles(texts[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if inter * 1000 >= tau_pm * uni:
            out[(a, b)] = (inter * 1_000_000) // uni
    return out


def test_matches_brute_force(spark):
    # families of near-identical docs + unrelated tails, lengths varied
    texts = []
    base = list(range(25))
    for fam in range(6):
        fam_base = [(x + fam * 7) % 40 for x in base]
        texts.append(_text(fam_base))
        texts.append(_text(fam_base[:-1] + [39]))  # one-token edit
        texts.append(_text(fam_base + [38, 37]))  # two appended
    texts += [_text([fam * 3 + x for x in range(8)]) for fam in range(8)]
    for tau in (500, 800, 900):
        got = {
            (r.doc_a, r.doc_b): r.jaccard_ppm
            for r in jaccard_similarity_join(
                _docs(spark, texts), tau_permille=tau
            ).collect()
        }
        assert got == _brute(texts, tau), f"tau={tau}"
    assert _brute(texts, 800)  # non-vacuous


def test_threshold_boundary_exact(spark):
    # two docs engineered to share exactly 8 of 10 union shingles:
    # a has shingles of 12 tokens (10 shingles), b differs in last token
    a = _text(list(range(12)))
    b = _text(list(range(11)) + [39])
    sa, sb = _ref_shingles(a), _ref_shingles(b)
    inter, uni = len(sa & sb), len(sa | sb)
    tau_at = (inter * 1000) // uni  # floor -> inclusive at this tau
    docs = _docs(spark, [a, b])
    assert (
        jaccard_similarity_join(docs, tau_permille=tau_at).count() == 1
    )
    assert (
        jaccard_similarity_join(docs, tau_permille=tau_at + 1).count() == 0
    )


def test_ordered_sets_rare_first(spark):
    texts = [_text([0, 1, 2, 3]), _text([0, 1, 2, 3]), _text([2, 3, 4, 5])]
    rows = {r.doc_id: r for r in ordered_sets(_docs(spark, texts)).collect()}
    # doc 2's unique shingles sort before the shared "2 3 4"-style ones
    tk = rows[2].tk
    shared = " ".join([WORDS[1], WORDS[2], WORDS[3]])
    assert shared not in tk or tk.index(shared) == len(tk) - 1
    assert rows[2].n == len(_ref_shingles(texts[2]))


def test_bad_tau_rejected(spark):
    with pytest.raises(ValueError):
        jaccard_similarity_join(_docs(spark, ["a b c d"]), tau_permille=0)
