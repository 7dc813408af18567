"""SemDeDup — semantic deduplication inside embedding clusters (Abbas,
Tirumala, Simig, Ganguli, Morcos, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023).

The published recipe: k-means the embedding space, then look for
duplicate SEMANTICS only *within* each cluster — pairwise cosine above a
threshold marks a semantic duplicate group, and one representative per
group survives. Restricting the pairwise comparison to clusters is the
whole trick: the all-pairs O(n²) becomes Σ nᵢ² ≈ n²/k, and k grows with
the corpus (the paper runs k ≈ n/10⁴ on LAION), so per-cluster work
stays bounded no matter how large the corpus gets.

Spark shape (one shuffle, no Python):

1. `ivf_assign` attaches the nearest-centroid id — centroids are plan
   literals (the offline k-means fit is `ivf_fit_centroids`; the
   harness uses deterministic md5-derived centroids so the DuckDB twin
   reproduces the assignment bit-for-bit).
2. ONE shuffle co-locates each cluster; the within-cluster self-join +
   native `cosine` expression emits candidate pairs. Cluster sizes are
   bounded by construction (k scales with n), so no task sees more than
   (max cluster)² candidate rows — and AQE's skew split covers an
   outlier cluster.
3. The pair graph goes through `near_dup_clusters` / fixed-round
   min-propagation: transitive duplicate chains (A~B, B~C) collapse to
   ONE group with the deterministic survivor keep = min vec_id.

Every stage is existing verified machinery (`ivf_assign`,
`cosine`, `near_dup_clusters`) — SemDeDup is their composition, which is
exactly how the paper describes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.clusters import near_dup_clusters
from who_focus_crawler_spark.corpus.similarity import (
    ivf_assign,
    ivf_assign_topn,
    within_cluster_pairs,
)


def semdedup_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster semantic-duplicate pairs.

    Output: (vec_a, vec_b, cluster, cosine_sim) with vec_a < vec_b and
    round(cosine, 6) >= threshold. Pairs are generated ONLY inside a
    cluster — a cross-cluster near-dup is invisible by design (the
    paper's accepted trade for the n²→n²/k cut; raise k's resolution or
    lower epsilon rather than widening the join). ``assigned`` forwards
    a precomputed cluster assignment (see ``within_cluster_pairs``).
    """
    return within_cluster_pairs(
        embeddings, centroids, id_col=id_col, vec_col=vec_col,
        assigned=assigned,
    ).filter(F.col("cosine_sim") >= threshold)


def semdedup_pairs_multiprobe(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe pair generation: each vector probes its ``n_probe``
    nearest centroids, so a duplicate pair STRADDLING a cluster boundary
    — invisible to single-probe SemDeDup, the paper's accepted blind
    spot — meets in at least one shared probed cluster whenever the two
    top-2 sets intersect. Cost factor ≈ n_probe² on the pair join
    (still n²/k-bounded, never all-pairs); keep/labeling semantics are
    the caller's, unchanged.

    Output: (vec_a, vec_b, cluster, cosine_sim) with vec_a < vec_b,
    DISTINCT pairs (a pair sharing both probed clusters would otherwise
    appear twice; cluster = the min shared cluster id).
    """
    asg = ivf_assign_topn(
        embeddings, centroids, n_probe=n_probe, id_col=id_col,
        vec_col=vec_col,
    )
    pairs = within_cluster_pairs(
        embeddings, centroids, id_col=id_col, vec_col=vec_col, assigned=asg
    ).filter(F.col("cosine_sim") >= threshold)
    return pairs.groupBy("vec_a", "vec_b").agg(
        F.min("cluster").alias("cluster"),
        F.min("cosine_sim").alias("cosine_sim"),  # identical per pair
    ).select("vec_a", "vec_b", "cluster", "cosine_sim")


def semdedup(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int | None = None,
) -> DataFrame:
    """Full SemDeDup labeling: every embedding row gets
    (vec_id, cluster, sem_cluster_id, keep).

    ``sem_cluster_id`` is the min vec id of the connected component in
    the within-cluster duplicate-pair graph (a vector with no duplicate
    is its own singleton group); ``keep`` marks the canonical survivor.
    Dropping `NOT keep` rows applies the paper's dedup.

    ``n_iters``: None = engine mode (min-propagation to fixpoint);
    k = exactly k lazy rounds, reproducible as a SQL CTE chain for the
    value-exact oracle.
    """
    # One evaluation of the k×dim centroid-distance tree, shared by the
    # pair join (both sides) and the final labeling — without the
    # checkpoint the 4-round propagation lineage re-inlines it ~8×,
    # which at small scale costs more in Catalyst optimization time
    # than the data does (measured 7-9 s → ~2 s at sf0.01).
    asg = ivf_assign(
        embeddings, centroids, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=False)
    pairs = semdedup_pairs(
        embeddings, centroids, threshold, id_col=id_col, vec_col=vec_col,
        assigned=asg,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labels = near_dup_clusters(pairs, n_iters=n_iters).select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id").alias("sem_cluster_id"),
    )
    out = asg.select(F.col(id_col).alias("vec_id"), "cluster").join(
        labels, "vec_id", "left"
    )
    sem = F.coalesce("sem_cluster_id", "vec_id")
    return out.select(
        "vec_id",
        "cluster",
        sem.alias("sem_cluster_id"),
        (F.col("vec_id") == sem).alias("keep"),
    )
