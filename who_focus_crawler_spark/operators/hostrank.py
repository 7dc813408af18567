"""Host-authority ranking over the host link graph (focused-crawl
prioritization signal, C13-adjacent): PageRank (Page et al. 1999) with
damping 0.85, computed ENTIRELY in integer micro-units.

Why integer: float PageRank sums contributions in partition order, so
two runs (or two engines) differ in final ulps and a value-exact oracle
is impossible. Here ranks live in units of 1/scale (default 1e9) and
every step is integer floor arithmetic — sums of longs are
order-independent, so the result is bit-identical across engines,
partitionings, and parallelism. Deflation from the floors (and from
dangling hosts, whose mass leaks as in the classic simplification) is
bounded and harmless for a RANKING signal.

Scale shape: per iteration one join (ranks ⋈ edges on src) + one
groupBy(dst) sum — both shuffle on host keys, O(|edges|); ranks are
localCheckpointed per round so lineage stays flat. Convergence needs
O(graph diameter · log) rounds; callers pick fixed `n_iters` (also what
makes the DuckDB oracle a finite CTE chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio


def host_rank(
    edges: DataFrame,
    n_iters: int = 10,
    scale: int = 10**9,
    checkpoint_each: bool = True,
) -> DataFrame:
    """PageRank over distinct (src, dst) host edges → (host, rank_units).

    rank_units is the integer rank in 1/scale units; rank_0 = scale // n
    for every host; per round:
        contrib(e)  = rank[src] // out_deg[src]
        rank'(v)    = (15 · (scale // n)) // 100
                      + (85 · Σ contrib into v) // 100
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    if checkpoint_each:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    total = nodes.agg(F.count(F.lit(1)).alias("_n"))  # broadcast scalar
    base = (
        nodes.crossJoin(F.broadcast(total))
        .withColumn("rank_units", (F.lit(scale) / F.col("_n")).cast("long"))
        .select("host", "rank_units", "_n")
    )
    ranks = base
    if checkpoint_each:
        ranks = ranks.localCheckpoint(eager=False)
    for _ in range(n_iters):
        contrib = (
            e.join(
                ranks.select(F.col("host").alias("src"), "rank_units"), "src"
            )
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("host"),
                (F.col("rank_units") / F.col("out_deg")).cast("long").alias(
                    "contrib"
                ),
            )
            .groupBy("host")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            ranks.select("host", "_n")
            .join(contrib, "host", "left")
            .select(
                "host",
                (
                    (F.lit(DAMP_DEN - DAMP_NUM) * (F.lit(scale) / F.col("_n")).cast("long"))
                    / F.lit(DAMP_DEN)
                ).cast("long")
                + (
                    (F.lit(DAMP_NUM) * F.coalesce(F.col("in_sum"), F.lit(0)))
                    / F.lit(DAMP_DEN)
                ).cast("long"),
                "_n",
            )
            .toDF("host", "rank_units", "_n")
        )
        if checkpoint_each:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("host", F.col("rank_units").cast("long"))


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 10,
    scale: int = 10**9,
    checkpoint_each: bool = True,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam
    with TrustRank", VLDB 2004): PageRank whose teleport vector is
    restricted to a human-vetted SEED set — trust flows out of the seeds
    along links and decays with distance, so link-farm hosts (reachable
    mostly from other spam) end up with rank mass but little trust.

    ``seeds``: DataFrame with a ``host`` column. Same integer micro-unit
    discipline and per-round shape as :func:`host_rank` (one edge join +
    one groupBy per round, O(|edges|)); only the teleport term differs —
    (1−d)·scale∕|seeds| lands on seed hosts, 0 elsewhere. Output:
    (host, trust_units) for every host in the graph.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    s = seeds.select("host").distinct()
    if checkpoint_each:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n_seeds = s.agg(F.count(F.lit(1)).alias("_ns"))  # 1-row broadcast
    base = (
        nodes.join(s.withColumn("_seed", F.lit(1)), "host", "left")
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "host",
            F.when(
                F.col("_seed").isNotNull(),
                (F.lit(scale) / F.col("_ns")).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("seed_units"),
        )
    )
    if checkpoint_each:
        base = base.localCheckpoint(eager=False)
    ranks = base.select("host", F.col("seed_units").alias("trust_units"))
    for _ in range(n_iters):
        contrib = (
            e.join(
                ranks.select(F.col("host").alias("src"), "trust_units"),
                "src",
            )
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("host"),
                (F.col("trust_units") / F.col("out_deg"))
                .cast("long")
                .alias("contrib"),
            )
            .groupBy("host")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            base.join(contrib, "host", "left")
            .select(
                "host",
                (
                    (F.lit(DAMP_DEN - DAMP_NUM) * F.col("seed_units"))
                    / F.lit(DAMP_DEN)
                ).cast("long")
                + (
                    (F.lit(DAMP_NUM) * F.coalesce(F.col("in_sum"), F.lit(0)))
                    / F.lit(DAMP_DEN)
                ).cast("long"),
            )
            .toDF("host", "trust_units")
        )
        if checkpoint_each:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("host", F.col("trust_units").cast("long"))


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Relative spam mass (Gyöngyi et al., "Link Spam Detection Based on
    Mass Estimation", VLDB 2006): the share of a host's PageRank that
    does NOT come with trust — m = (rank − trust)/rank, here in integer
    permille, clamped at 0. High rank + high spam-mass = the link-farm
    signature; feed the permille into the frontier's priority/trap
    gating. Both ranks use the same micro-unit scale so the ratio is a
    pure integer expression."""
    r = host_rank(edges, n_iters=n_iters, scale=scale)
    t = trust_rank(edges, seeds, n_iters=n_iters, scale=scale)
    return (
        r.join(t, "host")
        .select(
            "host",
            "rank_units",
            "trust_units",
            F.greatest(
                F.lit(0),
                (
                    (F.col("rank_units") - F.col("trust_units"))
                    * F.lit(1000)
                    / F.greatest(F.col("rank_units"), F.lit(1))
                ).cast("long"),
            ).alias("spam_mass_permille"),
        )
    )


def hits(
    edges: DataFrame,
    n_iters: int = 10,
    scale: int = 10**9,
    checkpoint_each: bool = True,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) in integer
    micro-units: per round, authority(v) = Σ hub over in-edges and
    hub(v) = Σ authority over out-edges, each vector renormalized to
    L∞ = ``scale`` by exact integer division (max via a 1-row broadcast
    aggregate, no driver action). Deterministic and bit-identical across
    engines/partitionings — the fixed-round CTE twin value-checks it.

    A crawl scheduler reads the two sides differently: high-authority
    hosts are fetch targets, high-hub hosts are frontier EXPANSION
    targets (their link pages feed discovery). Per round: two edge joins
    + two aggs, O(|edges|) each, same shape as host_rank.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    if checkpoint_each:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    hubs = nodes.withColumn("hub_units", F.lit(scale).cast("long"))
    auths = None
    for _ in range(n_iters):
        a_raw = (
            e.join(hubs.select(F.col("host").alias("src"), "hub_units"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("hub_units").alias("_raw"))
        )
        auths = _linf_normalize(nodes, a_raw, scale, "auth_units")
        h_raw = (
            e.join(
                auths.select(F.col("host").alias("dst"), "auth_units"), "dst"
            )
            .groupBy(F.col("src").alias("host"))
            .agg(F.sum("auth_units").alias("_raw"))
        )
        hubs = _linf_normalize(nodes, h_raw, scale, "hub_units")
        if checkpoint_each:
            hubs = hubs.localCheckpoint(eager=False)
            auths = auths.localCheckpoint(eager=False)
    return hubs.join(auths, "host").select(
        "host",
        F.col("hub_units").cast("long"),
        F.col("auth_units").cast("long"),
    )


def _linf_normalize(nodes, raw, scale, out_col):
    """(host, _raw) → every node with out_col = (_raw·scale) div max(_raw)
    (0 for nodes with no mass; all-zero vectors stay zero).

    _raw·scale can reach in_degree·scale² ≫ 2^63, so the floor quotient
    is computed in DECIMAL(38,0): q = (num − num mod mx) / mx — the
    division's true result is an exact integer, so the decimal divide
    introduces no rounding (matches DuckDB's HUGEINT `//`)."""
    mx = raw.agg(
        F.coalesce(F.max("_raw"), F.lit(0)).cast("long").alias("_mx")
    )
    num = F.col("_r").cast("decimal(38,0)") * F.lit(scale)
    q = ((num - num % F.col("_mx")) / F.col("_mx")).cast("long")
    return (
        nodes.join(raw, "host", "left")
        .crossJoin(F.broadcast(mx))
        .withColumn("_r", F.coalesce(F.col("_raw"), F.lit(0)).cast("long"))
        .select(
            "host",
            F.when(F.col("_mx") > 0, q)
            .otherwise(F.lit(0))
            .cast("long")
            .alias(out_col),
        )
    )


def opic(
    edges: DataFrame,
    n_iters: int = 8,
    scale: int = 10**9,
    checkpoint_each: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda, Cobena, WWW 2003) over (src, dst) host edges, in integer
    cash units → (host, cash_units, history_units).

    The crawler-native importance measure: each host holds *cash*;
    every round (= every time the scheduler touches it) a host banks
    its cash into *history* and distributes it equally over its
    outlinks. Dangling hosts pay into the virtual page, whose pool is
    redistributed uniformly next round. Importance ≈ history + cash —
    available ONLINE, after any prefix of the crawl, which is why OPIC
    (not offline PageRank) is the classic frontier-priority signal.

    All arithmetic is integer floor division in 1/scale units (same
    rationale as :func:`host_rank`: long sums are order-independent, so
    results are bit-identical across engines and parallelism, and the
    DuckDB oracle is a finite CTE chain). Floor deflation only ever
    loses mass — rankings are unaffected.

    ``weight_col``: optional per-edge weight (e.g. page-level link
    multiplicity). Cash then splits proportionally —
    floor(cash·w / Σw(src)) per edge, computed in DECIMAL(38,0) so the
    product can't overflow a long at web-scale multiplicities. Without
    it, edges are distinct-uniform (each outlink gets cash // out_deg;
    identical to the weighted form with w ≡ 1). Uniform splitting on a
    DISTINCT host graph erases multiplicity structure — near-complete
    host graphs look symmetric and every symmetric host ties — so crawl
    prioritization should pass observed link counts.

    Scale shape per round: one join (cash ⋈ edges on src, pre-divided
    by out-weight) + one groupBy(dst) sum, O(|edges|) shuffled on host
    keys; the dangling pool is a scalar aggregate broadcast back into
    the plan. State is localCheckpointed per round to keep lineage flat
    over long crawls.
    """
    if weight_col is None:
        e = edges.select("src", "dst").distinct().withColumn(
            "w", F.lit(1).cast("long")
        )
    else:
        e = edges.groupBy("src", "dst").agg(
            F.sum(F.col(weight_col)).cast("long").alias("w")
        )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    if checkpoint_each:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    out_deg = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    total = nodes.agg(F.count(F.lit(1)).alias("_n"))
    state = (
        nodes.crossJoin(F.broadcast(total))
        .select(
            "host",
            (F.lit(scale) / F.col("_n")).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
            "_n",
        )
    )
    if checkpoint_each:
        state = state.localCheckpoint(eager=False)
    dangling = nodes.join(
        out_deg.select(F.col("src").alias("host")), "host", "left_anti"
    )
    # floor(cash·w / W) in DECIMAL(38,0): the quotient's true value is
    # not an integer in general, so subtract the mod first — then the
    # decimal divide is exact (same device as _linf_normalize)
    _num = F.col("cash").cast("decimal(38,0)") * F.col("w")
    _contrib = ((_num - _num % F.col("out_w")) / F.col("out_w")).cast("long")
    for _ in range(n_iters):
        inflow = (
            e.join(state.select(F.col("host").alias("src"), "cash"), "src")
            .join(out_deg, "src")
            .select(F.col("dst").alias("host"), _contrib.alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("in_sum"))
        )
        vpool = (
            state.join(dangling, "host", "left_semi")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).alias("_vp"))
        )
        state = (
            state.join(inflow, "host", "left")
            .crossJoin(F.broadcast(vpool))
            .select(
                "host",
                (
                    F.coalesce(F.col("in_sum"), F.lit(0))
                    + (F.col("_vp") / F.col("_n")).cast("long")
                ).cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
                "_n",
            )
        )
        if checkpoint_each:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "host",
        F.col("cash").cast("long").alias("cash_units"),
        F.col("hist").cast("long").alias("history_units"),
    )


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-host link reciprocity — (host, n_out, n_reciprocal,
    reciprocity_permille): the share of a host's distinct outlinks whose
    target links back. High reciprocity at host granularity is a
    link-exchange / spam-ring signal (Fetterly, Manasse & Najork,
    "Spam, damn spam, and statistics", WebDB 2004) and a cheap
    complement to TrustRank's seed-propagated trust.

    One self-join of the distinct edge set on the reversed key — a
    LEFT SEMI join, so only the (src, dst) pair columns shuffle and
    matched pairs carry no payload — then a partial+final count per
    src. Integer permille output, engine-portable."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("n_out"))
    n_rec = recip.groupBy("src").agg(F.count(F.lit(1)).alias("n_reciprocal"))
    return (
        out_deg.join(n_rec, "src", "left")
        .select(
            F.col("src").alias("host"),
            F.col("n_out").cast("long").alias("n_out"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
            (
                (F.coalesce("n_reciprocal", F.lit(0)) * 1000) / F.col("n_out")
            )
            .cast("long")
            .alias("reciprocity_permille"),
        )
    )
