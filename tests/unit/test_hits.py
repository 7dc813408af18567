"""HITS (operators/hostrank.py::hits — Kleinberg 1999): hubs and
authorities separate on a bipartite-ish planted graph, scores match a
Python power-iteration reference with the identical integer
normalization, and results are partitioning-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.hostrank import hits

SCALE = 10**9

# hub1/hub2 point at the shared authorities; auth pages link nowhere
# except auth1 -> hub1 (a weak back-edge so hubs get some authority)
GRAPH = [
    ("hub1", "auth1"),
    ("hub1", "auth2"),
    ("hub1", "auth3"),
    ("hub2", "auth1"),
    ("hub2", "auth2"),
    ("auth1", "hub1"),
    ("loner", "auth3"),
]


def py_hits(pairs, n_iters, scale=SCALE):
    nodes = sorted({x for p in pairs for x in p})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(n_iters):
        raw_a = {n: 0 for n in nodes}
        for s, d in pairs:
            raw_a[d] += hub[s]
        m = max(raw_a.values())
        auth = {n: (v * scale) // m if m else 0 for n, v in raw_a.items()}
        raw_h = {n: 0 for n in nodes}
        for s, d in pairs:
            raw_h[s] += auth[d]
        m = max(raw_h.values())
        hub = {n: (v * scale) // m if m else 0 for n, v in raw_h.items()}
    return hub, auth


def edges_df(spark):
    return spark.createDataFrame(GRAPH, "src string, dst string")


def test_matches_python_reference_exactly(spark):
    got = {
        r.host: (r.hub_units, r.auth_units)
        for r in hits(edges_df(spark), n_iters=7).collect()
    }
    hub, auth = py_hits(GRAPH, 7)
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_hub_authority_separation(spark):
    got = {
        r.host: r for r in hits(edges_df(spark), n_iters=7).collect()
    }
    # hub1 links to every authority: the top hub (L-inf: exactly scale)
    assert got["hub1"].hub_units == SCALE
    assert got["hub1"].hub_units > got["auth2"].hub_units
    # auth1/auth2 are cited by both hubs: the top authorities
    assert max(got["auth1"].auth_units, got["auth2"].auth_units) == SCALE
    assert got["auth1"].auth_units > got["hub2"].auth_units
    # the weak back-edge gives hub1 SOME authority, but not top
    assert 0 < got["hub1"].auth_units < SCALE


def test_partitioning_invariance(spark):
    e = edges_df(spark)
    a = sorted(map(tuple, hits(e, n_iters=5).collect()))
    b = sorted(map(tuple, hits(e.repartition(7), n_iters=5).collect()))
    assert a == b
