"""Large-star/small-star connected components (corpus/clusters.py::
connected_components — Kiveris et al., SoCC 2014): converged labels
equal a union-find reference and the hash-to-min operator, deep chains
converge in O(log² n) rounds (where hash-to-min needs O(diameter)),
and skewed hub graphs cluster correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.clusters import (
    connected_components,
    near_dup_clusters,
)


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def as_pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def check(spark, pairs, max_iters=30):
    stats = {}
    got = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in connected_components(
            as_pairs_df(spark, pairs), max_iters=max_iters, stats=stats
        ).collect()
    }
    exp = {
        (n, root, n == root) for n, root in union_find(pairs).items()
    }
    assert got == exp
    return stats["rounds"]


def test_small_mixed_graph_matches_union_find(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 20), (5, 3), (11, 12), (40, 10)]
    check(spark, pairs)


def test_deep_chain_converges_in_log_rounds(spark):
    # a 200-node path: hash-to-min needs ~199 rounds (one hop per round);
    # the star algorithm must land well inside O(log² n)
    pairs = [(i, i + 1) for i in range(200)]
    rounds = check(spark, pairs, max_iters=20)
    assert rounds <= 12


def test_skewed_hub_graph(spark):
    # one hub with 300 leaves plus a chain hanging off a leaf
    pairs = [(1000, i) for i in range(300)] + [
        (299, 2000), (2000, 2001), (2001, 2002)
    ]
    check(spark, pairs)


def test_matches_hash_to_min_on_random_graph(spark):
    # deterministic pseudo-random graph over 120 nodes
    pairs = [
        ((i * 37) % 120, (i * 59 + 11) % 120) for i in range(80)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    cc = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(as_pairs_df(spark, pairs)).collect()
    }
    htm = {
        (r.doc_id, r.cluster_id)
        for r in near_dup_clusters(as_pairs_df(spark, pairs)).collect()
    }
    assert cc == htm


def test_empty_and_self_loop_only_input(spark):
    empty = connected_components(
        as_pairs_df(spark, []).filter(F.lit(False))
    )
    assert empty.count() == 0
    only_self = connected_components(as_pairs_df(spark, [(7, 7)]))
    assert [(r.doc_id, r.cluster_id, r.keep) for r in only_self.collect()] == [
        (7, 7, True)
    ]


def test_dedup_keep_best_quality_aware(spark):
    """corpus/clusters.py::dedup_keep_best — inside each near-dup
    cluster the highest-score doc survives (ties to lowest id); docs in
    no pair keep themselves."""
    from who_focus_crawler_spark.corpus.clusters import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 900), (4, 50), (7, 10)],
        "doc_id long, quality long",
    )
    # clusters: {1,2,3} (transitive), {4} via no pair? 4 pairs with 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 7)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup_keep_best(docs, pairs, "quality", n_iters=4).collect()
    }
    assert out[2] == (1, True)   # highest quality, tie vs 3 -> lower id
    assert out[3] == (1, False)
    assert out[1] == (1, False)  # min id but LOW quality: not kept
    assert out[4] == (4, True)   # quality 50 beats 10
    assert out[7] == (4, False)
    # a doc in no pair keeps itself
    docs2 = docs.union(spark.createDataFrame([(9, 1)], docs.schema))
    out2 = {
        r.doc_id: r.keep
        for r in dedup_keep_best(docs2, pairs, "quality", n_iters=4).collect()
    }
    assert out2[9] is True


def test_dedup_keep_best_string_ids(spark):
    """The crawl documents table's doc_id is a STRING (canon_url); the
    election must not do arithmetic on the id (a -id encoding raises
    CAST_INVALID_INPUT under ANSI). Ties still break to the LOWEST id
    in string order."""
    from who_focus_crawler_spark.corpus.clusters import dedup_keep_best

    docs = spark.createDataFrame(
        [
            ("http://a/1", 100),
            ("http://a/2", 900),
            ("http://b/3", 900),
            ("http://c/9", 10),
        ],
        "doc_id string, quality long",
    )
    pairs = spark.createDataFrame(
        [("http://a/1", "http://a/2"), ("http://a/2", "http://b/3")],
        "doc_a string, doc_b string",
    )
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup_keep_best(docs, pairs, "quality", n_iters=4).collect()
    }
    # tie at 900 between a/2 and b/3 -> lexicographically lower id wins
    assert out["http://a/2"] == ("http://a/1", True)
    assert out["http://b/3"] == ("http://a/1", False)
    assert out["http://a/1"] == ("http://a/1", False)
    assert out["http://c/9"] == ("http://c/9", True)  # unpaired keeps itself


def test_dedup_keep_best_null_scores_never_beat_scored(spark):
    """ADVICE r3: struct ordering sorts NULLs FIRST under min, so an
    unguarded min(struct(-score, id)) would elect a NULL-scored doc over
    every scored sibling — the inversion of keep-best. The coalesce(+inf)
    guard sends missing scores to the back; an all-null cluster still
    elects deterministically (lowest id)."""
    from who_focus_crawler_spark.corpus.clusters import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, None)],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: r.keep
        for r in dedup_keep_best(docs, pairs, "quality", n_iters=4).collect()
    }
    assert out[2] is True   # the only scored member wins its cluster
    assert out[1] is False  # null score loses to ANY score
    assert out[3] is True   # all-null cluster: lowest id, deterministic
    assert out[4] is False
