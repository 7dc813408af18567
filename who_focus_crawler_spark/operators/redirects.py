"""Redirect-chain resolution: 3xx edge list → terminal URL mapping.

Every production crawl accumulates a table of HTTP redirects
(src_url → dst_url, one outgoing edge per source — a functional graph).
Downstream consumers need the *terminal* mapping: for each source, the
final non-redirecting URL, the hop count, and a verdict on loops —
this is the canonical-URL mapping table that dedup, link-graph, and
re-crawl logic all join against (the reference crawler follows
redirects inline per fetch; at corpus scale the batch equivalent is
resolving the whole edge table at once).

Algorithm: **pointer doubling** (a.k.a. path doubling, the classic
PRAM list-ranking technique — Wyllie 1979, standard in parallel graph
processing). Each round every pointer jumps to where its target
currently points, doubling the distance covered: a chain of length L
resolves in ⌈log2 L⌉ rounds of one self-join each — O(log L) shuffles,
never O(L) sequential lookups. At 100 TB frontier scale redirect
chains are short (browsers cap ~20 hops), so 5-6 rounds close
everything real; loops (a→b→a) and chains longer than ``max_hops``
are reported as unresolved rather than looping forever.

Determinism: pure integer/string relational ops, no floats, no UDFs —
bit-identical across engines and partitionings, so a DuckDB CTE chain
replays the identical per-round states (``n_rounds`` mode, same
pattern as corpus/clusters.py oracle mode).

Output contract (frozen, oracle-checked by ``c_redirect_chains``):
one row per redirect SOURCE — (src_url, terminal_url, hops, resolved);
unresolved rows (loop or > max_hops) carry NULL terminal/hops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTIVE, _RESOLVED, _UNRESOLVED = "active", "resolved", "unresolved"


def _init_pointers(edges: DataFrame) -> DataFrame:
    """Round-0 state: every source points one hop along its edge.

    A pointer is already resolved when its target has no outgoing edge
    (the terminal of the chain); sources pointing at another source
    stay active.
    """
    srcs = edges.select(F.col("src_url").alias("_s")).distinct()
    return (
        edges.join(srcs, edges.dst_url == srcs._s, "left")
        .select(
            F.col("src_url").alias("node"),
            F.col("dst_url").alias("ptr"),
            F.lit(1).cast("long").alias("hops"),
            F.when(F.col("_s").isNull(), F.lit(_RESOLVED))
            .otherwise(F.lit(_ACTIVE))
            .alias("state"),
        )
    )


def _double_once(ptrs: DataFrame, max_hops: int) -> DataFrame:
    """One doubling round: active pointers jump to their target's
    current pointer, adding its accumulated hops. A jump inherits the
    target's verdict (resolved/unresolved) when it has one; a hop
    count past ``max_hops`` (loop, or chain longer than the cap) is
    marked unresolved and frozen."""
    q = ptrs.select(
        F.col("node").alias("q_node"),
        F.col("ptr").alias("q_ptr"),
        F.col("hops").alias("q_hops"),
        F.col("state").alias("q_state"),
    )
    joined = ptrs.join(
        q, (ptrs.state == _ACTIVE) & (ptrs.ptr == q.q_node), "left"
    )
    # active ⇒ ptr is itself a source ⇒ the join always matches; the
    # left-join form just lets settled rows pass through untouched
    new_hops = F.col("hops") + F.col("q_hops")
    return joined.select(
        "node",
        F.when(F.col("state") == _ACTIVE, F.col("q_ptr"))
        .otherwise(F.col("ptr"))
        .alias("ptr"),
        F.when(F.col("state") == _ACTIVE, new_hops)
        .otherwise(F.col("hops"))
        .alias("hops"),
        F.when(F.col("state") != _ACTIVE, F.col("state"))
        .when(F.col("q_state") == _RESOLVED, F.lit(_RESOLVED))
        .when(F.col("q_state") == _UNRESOLVED, F.lit(_UNRESOLVED))
        .when(new_hops > max_hops, F.lit(_UNRESOLVED))
        .otherwise(F.lit(_ACTIVE))
        .alias("state"),
    )


def resolve_redirect_chains(
    edges: DataFrame,
    max_hops: int = 32,
    n_rounds: int | None = None,
) -> DataFrame:
    """Resolve every redirect source to its terminal URL.

    ``edges``: (src_url, dst_url[, ...]) — at most one outgoing edge
    per src_url (HTTP gives exactly one Location per URL); duplicate
    (src, dst) rows are collapsed, conflicting targets for one source
    raise.

    ``n_rounds=None`` (engine mode): double until no pointer is active
    — one count action per round, states localCheckpointed so lineage
    stays flat. ``n_rounds=k`` (oracle mode): exactly k lazy rounds, no
    actions, so a DuckDB CTE chain can replay identical intermediate
    states. Rounds needed: ⌈log2(max chain length)⌉; loops self-report
    via the hop cap because hops double past ``max_hops`` in
    ⌈log2(max_hops)⌉ rounds.

    Output: (src_url, terminal_url, hops, resolved) — one row per
    source; NULL terminal/hops when unresolved (loop or > max_hops).
    """
    e = edges.select("src_url", "dst_url").distinct()
    ptrs = _init_pointers(e)
    if n_rounds is not None:
        # Each round references ptrs TWICE (self-join), so a lazy plan
        # doubles per round — 2^k inlined copies of the base by round k,
        # and Catalyst optimization dwarfs the data. Truncate lineage
        # per round; values are unchanged, only the plan is pinned.
        ptrs = ptrs.localCheckpoint(eager=False)
        for _ in range(n_rounds):
            ptrs = _double_once(ptrs, max_hops).localCheckpoint(eager=False)
    else:
        if e.groupBy("src_url").count().filter(F.col("count") > 1).limit(1).count():
            raise ValueError(
                "resolve_redirect_chains: a src_url has multiple distinct "
                "targets — redirect edges must be functional"
            )
        ptrs = ptrs.localCheckpoint(eager=False)
        # ⌈log2⌉ rounds cover max_hops; +1 slack for the cap-detection
        # round. Bounded, so no unbounded driver loop even on bad input.
        for _ in range(max(1, max_hops.bit_length() + 1)):
            ptrs = _double_once(ptrs, max_hops).localCheckpoint(eager=False)
            if ptrs.filter(F.col("state") == _ACTIVE).limit(1).count() == 0:
                break
    # leftover actives (only possible in fixed-round oracle mode with
    # too few rounds) surface as unresolved in both engines alike.
    # The hop cap is re-applied on the final verdict: doubling can
    # land on the terminal with hops already past the cap (round
    # alignment), and "resolved" must mean "within max_hops" exactly.
    done = (F.col("state") == _RESOLVED) & (F.col("hops") <= max_hops)
    return ptrs.select(
        F.col("node").alias("src_url"),
        F.when(done, F.col("ptr")).alias("terminal_url"),
        F.when(done, F.col("hops")).alias("hops"),
        done.alias("resolved"),
    )
