"""Exact heavy hitters via two-pass Misra–Gries.

The classic bounded-memory route to EXACT frequent items at any scale
(Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
summaries", PODS 2012): pass 1 runs a k-counter Misra–Gries summary
over each partition — memory is O(k) per task no matter how many
distinct items stream through, and every item whose GLOBAL count
exceeds n/(k+1) is guaranteed to survive in at least one partition's
summary (pigeonhole: it must exceed n_p/(k+1) somewhere, and MG's
residual error within a partition is < n_p/(k+1)). Pass 2 rescans the
corpus counting ONLY the ≤ P·k surviving candidates (broadcast
semi-join) and keeps items with count·(k+1) > n — an exact answer from
two scans, which is the information-theoretic minimum for exact heavy
hitters in bounded memory.

Contrast with the one-pass sketches already in the engine
(count_min_sketch, KMV): those are approximate by nature; this operator
is the exact tier a production vocabulary/stopword/hot-key audit wants,
and its final output is value-checkable against a plain GROUP BY —
which is exactly what the ``d_heavy_hitters`` oracle does. The MG
candidate-completeness property itself (the part a GROUP BY can't see)
is pinned by unit tests across partitionings.

Scale shape: pass 1 is a mapInPandas with O(k) state and NO shuffle;
the candidate set (≤ partitions × k rows) broadcasts; pass 2 is one
partial+final hash aggregate over the semi-joined stream. Nothing ever
shuffles the raw item stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MG_SCHEMA = "item string, kind int, cnt long"


def _mg_partition(k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            col = pdf["item"].dropna()
            n_rows += len(col)
            # vectorized batch counts, then one mergeable-summary merge:
            # add batch counts; if over k counters, subtract the
            # (k+1)-th largest and drop non-positive (Agarwal et al.).
            for item, c in col.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - cut for i, c in counters.items() if c - cut > 0
                }
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [""],
                "kind": [0] * len(counters) + [1],
                "cnt": list(counters.values()) + [n_rows],
            }
        )
        yield out.astype({"item": "string", "kind": "int32", "cnt": "int64"})

    return gen


def mg_candidates(items: DataFrame, k: int, item_col: str = "item") -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries.

    Returns (item, kind, cnt) rows: kind 0 = surviving candidate with
    its residual count, kind 1 = one per partition carrying the
    partition's row count (so pass 2 can compute the exact threshold
    without a third scan).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return items.select(F.col(item_col).alias("item")).mapInPandas(
        _mg_partition(k), schema=_MG_SCHEMA
    )


def heavy_hitters(items: DataFrame, k: int, item_col: str = "item") -> DataFrame:
    """Exact items with count · (k+1) > n, via MG candidates + rescan.

    Output: (item, n_occurrences), exact — identical to the plain
    GROUP BY answer, computed without ever shuffling the raw stream.
    """
    stream = items.select(F.col(item_col).alias("item"))
    summaries = mg_candidates(stream, k).localCheckpoint(eager=False)
    cands = summaries.filter(F.col("kind") == 0).select("item").distinct()
    total = summaries.filter(F.col("kind") == 1).agg(
        F.sum("cnt").alias("_total")
    )
    counted = (
        stream.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * (k + 1) > F.col("_total"))
        .select("item", "n_occurrences")
    )
