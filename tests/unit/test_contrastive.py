"""Contrastive pair mining (corpus/contrastive.py): positives are the
same-cluster duplicate pairs (both directions), hard negatives are
same-cluster far pairs capped per anchor by a deterministic md5 rank,
cross-cluster candidates never appear, and the draw is partitioning-
invariant."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark.corpus.contrastive import contrastive_pairs

CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


# far vectors vary on axes 3/4 — orthogonal to BOTH centroids — so they
# stay assigned to cluster 0 (a big component along axis 2 would flip
# them into centroid 1's cell) while their cosine to the dup group is
# 1/sqrt(26) ~ 0.196 <= neg_tau
ROWS = [
    (1, [1.0, 0.00, 0.0, 0.0]),
    (2, [1.0, 0.01, 0.0, 0.0]),    # dup of 1
    (3, [1.0, 0.0, 5.0, 0.0]),     # same cluster, far (hard negative)
    (4, [1.0, 0.0, -5.0, 0.0]),    # far the other way
    (5, [1.0, 0.0, 0.0, 5.0]),     # far, fourth axis
    (6, [1.0, 0.0, 0.0, -5.0]),    # far, fourth axis negative
    (7, [0.0, 1.0, 0.0, 0.0]),     # other cluster
    (8, [0.0, 1.0, 0.001, 0.0]),   # dup of 7
]


def mine(spark, df, n_neg=2):
    return contrastive_pairs(
        df, CENTROIDS, pos_tau=0.99, neg_tau=0.2, n_neg=n_neg
    )


def test_positives_and_capped_hard_negatives(spark):
    df = emb_df(spark, ROWS)
    out = mine(spark, df).collect()
    pos = {(r.anchor, r.cand) for r in out if r.label == 1}
    assert (1, 2) in pos and (2, 1) in pos and (7, 8) in pos and (8, 7) in pos
    # negatives: same cluster, cosine <= 0.2, at most 2 per anchor
    neg = [r for r in out if r.label == 0]
    assert all(r.cosine_sim <= 0.2 for r in neg)
    per_anchor = {}
    for r in neg:
        per_anchor[r.anchor] = per_anchor.get(r.anchor, 0) + 1
    assert per_anchor and max(per_anchor.values()) <= 2
    # anchor 1 has 4 eligible far candidates (3,4,5,6) -> cap binds
    assert per_anchor.get(1) == 2
    # no cross-cluster contamination
    cluster = {i: (0 if i <= 6 else 1) for i, _ in ROWS}
    for r in out:
        assert cluster[r.anchor] == cluster[r.cand]


def test_deterministic_across_partitionings(spark):
    df = emb_df(spark, ROWS)
    a = sorted(map(tuple, mine(spark, df).collect()))
    b = sorted(map(tuple, mine(spark, df.repartition(7)).collect()))
    assert a == b


def test_threshold_guard(spark):
    df = emb_df(spark, ROWS)
    with pytest.raises(ValueError, match="must exceed"):
        contrastive_pairs(df, CENTROIDS, pos_tau=0.3, neg_tau=0.5)
