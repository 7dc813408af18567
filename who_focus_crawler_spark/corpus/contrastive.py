"""Contrastive training-pair mining over the embedding corpus.

Embedding/retriever training (DPR, Karpukhin et al. 2020; SimCSE, Gao
et al. 2021) consumes (anchor, candidate, label) pairs: positives are
semantic duplicates/paraphrases, and the pairs that actually teach the
model are HARD negatives — candidates from the same semantic
neighborhood that are nonetheless not duplicates (ANCE, Xiong et al.
2021 mines them from the nearest cluster). This module mines both from
one pass over the IVF-clustered corpus:

- positives:       same cluster, cosine ≥ pos_tau  (label 1)
- hard negatives:  same cluster, cosine ≤ neg_tau  (label 0),
                   at most ``n_neg`` per anchor, picked by a
                   deterministic md5 rank (no RNG state — same
                   convention as `corpus/sampling.py`)

Scale shape = SemDeDup's: ONE shuffle co-locates each coarse cluster,
the self-join is bounded at n²/k per cluster (k grows with the corpus),
and the per-anchor negative cap is a rank window partitioned by anchor —
never a global window. Everything is native expressions; the md5 rank
makes the selection value-exact across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.similarity import within_cluster_pairs


def _within_cluster(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    salt: int = 8,
) -> DataFrame:
    """Directed within-cluster candidate pairs (anchor ≠ cand, both
    directions — every doc serves as an anchor) with exact cosine.

    Runs on the shared salted pair core (similarity.py::
    within_cluster_pairs); each unordered pair's cosine is computed
    ONCE and mirrored for the reverse direction (IEEE multiplication is
    commutative and the fold order unchanged, so the mirrored value is
    bit-identical to recomputation).
    """
    half = within_cluster_pairs(
        embeddings, centroids, id_col=id_col, vec_col=vec_col, salt=salt
    ).select(
        F.col("vec_a").alias("anchor"),
        F.col("vec_b").alias("cand"),
        "cluster",
        "cosine_sim",
    )
    return half.unionByName(
        half.select(
            F.col("cand").alias("anchor"),
            F.col("anchor").alias("cand"),
            "cluster",
            "cosine_sim",
        )
    )


def contrastive_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    pos_tau: float = 0.95,
    neg_tau: float = 0.3,
    n_neg: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "contrastive",
) -> DataFrame:
    """(anchor, cand, label, cosine_sim): every same-cluster duplicate
    pair as a positive, plus up to ``n_neg`` deterministic hard
    negatives per anchor (same cluster, cosine ≤ neg_tau, md5-ranked so
    the draw is a pure function of ids). Requires pos_tau > neg_tau."""
    if not pos_tau > neg_tau:
        raise ValueError(
            f"pos_tau ({pos_tau}) must exceed neg_tau ({neg_tau})"
        )
    # two consumers (positive filter + negative rank) — pin the pair
    # table so the salted cosine join runs once
    pairs = _within_cluster(embeddings, centroids, id_col, vec_col)
    pairs = pairs.localCheckpoint(eager=False)
    pos = pairs.filter(F.col("cosine_sim") >= pos_tau).select(
        "anchor", "cand", F.lit(1).alias("label"), "cosine_sim"
    )
    rank_key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col("anchor"), F.col("cand"))
    )
    w = Window.partitionBy("anchor").orderBy(rank_key)
    neg = (
        pairs.filter(F.col("cosine_sim") <= neg_tau)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_neg)
        .select("anchor", "cand", F.lit(0).alias("label"), "cosine_sim")
    )
    return pos.unionByName(neg)
