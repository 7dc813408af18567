"""SemDeDup (corpus/semdedup.py — Abbas et al. 2023): within-cluster
semantic-duplicate groups get one deterministic survivor, transitive
chains collapse, cross-cluster duplicates are (by design) not compared,
and labels are partitioning-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.semdedup import semdedup, semdedup_pairs

# Two well-separated centroids in 4-d; vectors are near one of them.
CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_transitive_group_one_survivor(spark):
    # 1~2 (cos 0.99875) and 2~3 (0.99876) are above the 0.998 threshold,
    # 1~3 (0.99504) is below: the group must still collapse to ONE
    # cluster via the transitive pair graph.
    rows = [
        (1, [1.0, 0.00, 0.0, 0.0]),
        (2, [1.0, 0.05, 0.0, 0.0]),
        (3, [1.0, 0.10, 0.0, 0.0]),
        (4, [1.0, 9.00, 0.0, 0.0]),  # far from everything: no pair
        (5, [0.0, 1.00, 0.0, 0.0]),  # other cluster, alone
    ]
    out = {
        r.vec_id: (r.cluster, r.sem_cluster_id, r.keep)
        for r in semdedup(
            emb_df(spark, rows), CENTROIDS, threshold=0.998
        ).collect()
    }
    assert out[1] == (0, 1, True)
    assert out[2] == (0, 1, False)
    assert out[3] == (0, 1, False)
    assert out[4][1:] == (4, True)
    assert out[5] == (1, 5, True)


def test_cross_cluster_duplicates_not_compared(spark):
    # Identical vectors assigned to different clusters (each sits on a
    # different centroid) never form a pair — the paper's n²/k trade.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    pairs = semdedup_pairs(
        emb_df(spark, rows), CENTROIDS, threshold=0.9
    ).collect()
    got = {(r.vec_a, r.vec_b) for r in pairs}
    assert got == {(1, 3), (2, 4)}  # within-cluster only
    for r in pairs:
        assert r.cosine_sim == 1.0


def test_no_duplicates_all_kept(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.2, 0.0]),
        (3, [0.9, 0.0, 0.0, 0.4]),
    ]
    out = semdedup(emb_df(spark, rows), CENTROIDS, threshold=0.9999)
    rows_out = out.collect()
    assert all(r.keep for r in rows_out)
    assert {r.sem_cluster_id for r in rows_out} == {1, 2, 3}


def test_partitioning_invariance(spark):
    rows = [
        (i, [1.0 + (i % 3) * 0.001, 0.01 * i, 0.0, 0.0]) for i in range(40)
    ] + [(100 + i, [0.0, 1.0, 0.002 * i, 0.0]) for i in range(40)]
    df = emb_df(spark, rows)
    a = sorted(
        map(tuple, semdedup(df, CENTROIDS, threshold=0.999).collect())
    )
    b = sorted(
        map(
            tuple,
            semdedup(
                df.repartition(7, "vec_id"), CENTROIDS, threshold=0.999
            ).collect(),
        )
    )
    assert a == b
    assert any(not r[3] for r in a)  # scenario is non-vacuous: drops exist


def test_multiprobe_finds_boundary_pairs(spark):
    """semdedup_pairs_multiprobe — a near-dup pair straddling the
    cluster boundary (each side nearest a DIFFERENT centroid) is
    invisible to single-probe but found with n_probe=2; within-cluster
    pairs are unchanged and not duplicated."""
    from who_focus_crawler_spark.corpus.semdedup import (
        semdedup_pairs_multiprobe,
    )

    rows = [
        # boundary near-dups: 1 tips toward centroid 0, 2 toward 1
        (1, [1.0, 0.999, 0.0, 0.0]),
        (2, [0.999, 1.0, 0.0, 0.0]),
        # plain within-cluster dup pair near centroid 0
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [1.0, 0.01, 0.0, 0.0]),
    ]
    single = {
        (r.vec_a, r.vec_b)
        for r in semdedup_pairs(
            emb_df(spark, rows), CENTROIDS, threshold=0.99
        ).collect()
    }
    multi_rows = semdedup_pairs_multiprobe(
        emb_df(spark, rows), CENTROIDS, threshold=0.99, n_probe=2
    ).collect()
    multi = {(r.vec_a, r.vec_b) for r in multi_rows}
    assert (1, 2) not in single and (3, 4) in single
    assert (1, 2) in multi and multi >= single
    # DISTINCT pairs even when both probed clusters are shared
    assert len(multi_rows) == len(multi)
