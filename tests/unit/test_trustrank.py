"""TrustRank / spam mass (operators/hostrank.py — Gyöngyi et al. 2004,
2006): trust stays in the seed-reachable web and decays with distance;
a link farm accumulates rank but not trust, so its relative spam mass
separates it from legit hosts."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.hostrank import (
    host_rank,
    spam_mass,
    trust_rank,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def seeds_df(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], "host string")


# legit chain: seed -> a -> b ; farm: f1<->f2 clique pumping f0,
# with one hijacked legit link a -> f0 making the farm rank-reachable
GRAPH = [
    ("seed", "a"),
    ("a", "b"),
    ("b", "seed"),
    ("a", "f0"),
    ("f0", "f1"),
    ("f1", "f2"),
    ("f2", "f0"),
    ("f1", "f0"),
    ("f2", "f1"),
]


def test_trust_decays_from_seeds(spark):
    # pure chain (no cycles hoarding mass): each hop keeps 85% of the
    # previous node's trust, so decay is strict; off-chain host gets 0
    chain = [("seed", "a"), ("a", "b"), ("b", "c"), ("x", "y")]
    tr = {
        r.host: r.trust_units
        for r in trust_rank(
            edges_df(spark, chain), seeds_df(spark, ["seed"]), n_iters=8
        ).collect()
    }
    assert tr["seed"] > tr["a"] > tr["b"] > tr["c"] > 0
    assert tr["x"] == tr["y"] == 0


def test_spam_farm_has_high_spam_mass(spark):
    sm = {
        r.host: r
        for r in spam_mass(
            edges_df(spark, GRAPH), seeds_df(spark, ["seed"]), n_iters=8
        ).collect()
    }
    farm = [sm[h].spam_mass_permille for h in ("f0", "f1", "f2")]
    legit = [sm[h].spam_mass_permille for h in ("seed", "a", "b")]
    assert min(farm) > max(legit)
    # the clique really does pump rank: f0 outranks the legit tail
    assert sm["f0"].rank_units > sm["b"].rank_units // 2
    assert all(0 <= v <= 1000 for v in (farm + legit))


def test_all_seeds_means_no_spam_mass_signal(spark):
    allhosts = ["seed", "a", "b", "f0", "f1", "f2"]
    sm = spam_mass(
        edges_df(spark, GRAPH), seeds_df(spark, allhosts), n_iters=8
    ).collect()
    # teleport mass now reaches everyone: farm no longer separates
    by = {r.host: r.spam_mass_permille for r in sm}
    assert max(by[h] for h in ("f0", "f1", "f2")) < 900


def test_trust_rank_partitioning_invariance(spark):
    e = edges_df(spark, GRAPH)
    s = seeds_df(spark, ["seed"])
    a = sorted(map(tuple, trust_rank(e, s, n_iters=6).collect()))
    b = sorted(
        map(tuple, trust_rank(e.repartition(7), s, n_iters=6).collect())
    )
    assert a == b


def test_host_rank_consistency(spark):
    # spam_mass joins the two rank families — both must cover the graph
    e = edges_df(spark, GRAPH)
    hr = host_rank(e, n_iters=6)
    tr = trust_rank(e, seeds_df(spark, ["seed"]), n_iters=6)
    assert hr.count() == tr.count() == 6
