"""Sequence packing / shard assignment for training output.

The last step of a training-data pipeline writes the kept corpus as
fixed-capacity shards (webdataset tars, tfrecord shards, or packed
context windows): documents are laid out in a deterministic order and
cut into units of ``capacity`` tokens. The frozen policy here is
**start-fit packing**: with ``start(d)`` = tokens preceding doc *d* in
the layout order, *d* belongs to pack ``start(d) div capacity``. A doc
straddling a boundary stays in the pack where it starts (packs may
overflow by at most one doc's tail — the standard streaming-packer
contract, no doc is ever split or reordered to fit).

Layout order is ``(hash-bucket(seed, doc), doc_id)`` **within each
group** (source by default) — the md5 convention of corpus/sampling.py,
so the layout is a pure function of doc ids: both engines, any
partitioning, and any re-run reproduce the identical shard map.

Scale shape: the running start offset is the two-phase distributed
grouped prefix sum (operators/prefix.py) — no ``PARTITION BY source``
single-reducer window. Rows cross exactly one range-repartition
exchange; pass a slim ``(group, doc_id, n_tokens)`` projection and
join text back at write time if the full row is wide. Per-pack stats
are one partial+final agg keyed by (group, pack_id).

DuckDB twin: harness/pipeline_queries.py::d_pack_assign (window form —
at oracle scale the naive window is exact, which is the point: the
distributed prefix sum must match it value-for-value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.sampling import sample_bucket
from who_focus_crawler_spark.operators.prefix import grouped_running_sum


def pack_assign(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    doc_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seed: str = "pack",
) -> DataFrame:
    """Assign every doc a ``pack_id`` (within its group) and its
    ``pack_offset`` (token start position inside the pack).

    Returns the input columns + (pack_id, pack_offset). Docs with more
    tokens than ``capacity`` still get the pack where they start (the
    pack simply runs long — callers who forbid that filter first).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    prio = sample_bucket(F.col(doc_col), seed)
    with_run = grouped_running_sum(
        docs,
        [group_col],
        [prio, F.col(doc_col).asc()],
        tokens_col,
        out_col="_cum",
    )
    start = F.col("_cum") - F.col(tokens_col)
    return with_run.select(
        *docs.columns,
        F.expr(f"(_cum - {tokens_col}) div {capacity}")
        .cast("long")
        .alias("pack_id"),
        (start % F.lit(capacity)).cast("long").alias("pack_offset"),
    )


def pack_stats(
    packed: DataFrame,
    capacity: int,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-pack layout stats: (group, pack_id, n_docs, n_tokens,
    fill_permille, straddles) — ``straddles`` marks a pack whose last
    doc runs past capacity (integer arithmetic throughout)."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
        F.expr(f"(1000 * sum({tokens_col})) div {capacity}")
        .cast("long")
        .alias("fill_permille"),
        F.max(
            (F.col("pack_offset") + F.col(tokens_col) > F.lit(capacity)).cast(
                "int"
            )
        )
        .cast("boolean")
        .alias("straddles"),
    )
