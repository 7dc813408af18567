"""Integer PageRank (host authority): structure, determinism, mass."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.hostrank import host_rank

SCALE = 10**9


def _edges(spark, pairs, parts=1):
    return spark.createDataFrame(pairs, ["src", "dst"]).repartition(parts)


def test_hub_ranks_highest_and_symmetry(spark):
    # a, b, c, d all link to hub; hub links back to all of them — the
    # hub aggregates four full contributions and returns quarters, so it
    # dominates at the fixed point (no 2-cycle oscillation)
    leaves = ["a", "b", "c", "d"]
    pairs = [(x, "hub") for x in leaves] + [("hub", x) for x in leaves]
    r = {x.host: x.rank_units for x in host_rank(_edges(spark, pairs), 10).collect()}
    assert r["hub"] == max(r.values())
    assert r["a"] == r["b"] == r["c"] == r["d"]  # symmetric nodes
    # conservation: floors only shrink total mass (no dangling here)
    assert 0.9 * SCALE < sum(r.values()) <= SCALE


def test_hostrank_partitioning_invariance(spark):
    pairs = [
        (f"h{i % 13}", f"h{(i * 7 + 3) % 13}") for i in range(60)
    ] + [("h1", "h2"), ("h2", "h1")]
    a = {
        x.host: x.rank_units
        for x in host_rank(_edges(spark, pairs, parts=1), 8).collect()
    }
    b = {
        x.host: x.rank_units
        for x in host_rank(_edges(spark, pairs, parts=7), 8).collect()
    }
    assert a == b  # bit-identical: integer arithmetic, no float sums


def test_hostrank_matches_python_reference(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    got = {
        x.host: x.rank_units for x in host_rank(_edges(spark, pairs), 6).collect()
    }
    # plain-python twin of the exact integer recurrence
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(6):
        in_sum = dict.fromkeys(nodes, 0)
        for s, d in pairs:
            in_sum[d] += rank[s] // out[s]
        rank = {
            v: (15 * (SCALE // n)) // 100 + (85 * in_sum[v]) // 100
            for v in nodes
        }
    assert got == rank


def test_opic_matches_python_reference_with_dangling(spark):
    from who_focus_crawler_spark.operators.hostrank import opic

    # d is a sink: its cash must route through the virtual-page pool
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]
    iters = 5
    got = {
        r.host: (r.cash_units, r.history_units)
        for r in opic(_edges(spark, pairs), n_iters=iters, scale=SCALE).collect()
    }
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    deg: dict = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    cash = {v: SCALE // n for v in nodes}
    hist = dict.fromkeys(nodes, 0)
    for _ in range(iters):
        in_sum = dict.fromkeys(nodes, 0)
        for s, d in pairs:
            in_sum[d] += cash[s] // deg[s]
        vpool = sum(cash[v] for v in nodes if v not in deg)
        new_cash = {v: in_sum[v] + vpool // n for v in nodes}
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = new_cash
    assert got == {v: (cash[v], hist[v]) for v in nodes}
    # total mass is conserved up to floor deflation, never created
    assert sum(c for c, _ in got.values()) <= SCALE


def test_opic_parallelism_invariance(spark):
    from who_focus_crawler_spark.operators.hostrank import opic

    pairs = [(f"n{i % 17}", f"n{(i * 7 + 3) % 17}") for i in range(60)]
    e = _edges(spark, [(s, d) for s, d in pairs if s != d])
    one = {
        r.host: (r.cash_units, r.history_units)
        for r in opic(e.repartition(1), n_iters=4).collect()
    }
    many = {
        r.host: (r.cash_units, r.history_units)
        for r in opic(e.repartition(13), n_iters=4).collect()
    }
    assert one == many


def test_link_reciprocity_known_graph(spark):
    from who_focus_crawler_spark.operators.hostrank import link_reciprocity

    pairs = [
        ("a", "b"), ("b", "a"),          # mutual
        ("a", "c"),                       # one-way
        ("c", "d"), ("d", "c"), ("c", "e"),  # c: 1 of 2 reciprocal
        ("a", "a"),                       # self-loop dropped
        ("a", "b"),                       # duplicate edge dropped
    ]
    got = {
        r.host: (r.n_out, r.n_reciprocal, r.reciprocity_permille)
        for r in link_reciprocity(_edges(spark, pairs)).collect()
    }
    assert got["a"] == (2, 1, 500)
    assert got["b"] == (1, 1, 1000)
    assert got["c"] == (2, 1, 500)
    assert got["d"] == (1, 1, 1000)
    assert "e" not in got  # no outlinks → no row


def test_opic_weighted_splits_by_multiplicity(spark):
    from who_focus_crawler_spark.operators.hostrank import opic

    # a links to b 3× and to c 1× — weighted cash favors b 3:1;
    # unweighted (distinct) would split evenly
    rows = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    e = spark.createDataFrame(rows, ["src", "dst", "w"])
    got = {
        r.host: (r.cash_units, r.history_units)
        for r in opic(e, n_iters=3, scale=10**9, weight_col="w").collect()
    }
    nodes = ["a", "b", "c"]
    w = {("a", "b"): 3, ("a", "c"): 1, ("b", "a"): 1, ("c", "a"): 1}
    W = {"a": 4, "b": 1, "c": 1}
    n, scale = 3, 10**9
    cash = {v: scale // n for v in nodes}
    hist = dict.fromkeys(nodes, 0)
    for _ in range(3):
        in_sum = dict.fromkeys(nodes, 0)
        for (s, d), wt in w.items():
            in_sum[d] += cash[s] * wt // W[s]
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: in_sum[v] for v in nodes}  # no dangling nodes here
    assert got == {v: (cash[v], hist[v]) for v in nodes}
    assert got["b"][1] > got["c"][1]  # history favors the 3x-linked host
