"""Bridge: crawled interleaved documents → training-data pipeline.

The crawl loop emits `documents(doc_id, spans, batch)` where spans is
the ordered array<struct<kind,text,media_ref,offset>> mandated by
BASELINE.json's input_hint. These helpers project that shape into the
inputs the corpus ops consume (plain text, media tables) — all native
higher-order array functions, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_of_spans(spans: Column) -> Column:
    """Document text = text spans concatenated in sequence order with
    single spaces (order is the array order — already the span order)."""
    texts = F.transform(
        F.filter(spans, lambda s: s["kind"] == F.lit("text")),
        lambda s: s["text"],
    )
    return F.array_join(texts, " ")


def media_refs_of_spans(spans: Column) -> Column:
    """Ordered media references (kind='media')."""
    return F.transform(
        F.filter(spans, lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )


def link_targets_of_spans(spans: Column) -> Column:
    """Ordered raw link targets (kind='link')."""
    return F.transform(
        F.filter(spans, lambda s: s["kind"] == F.lit("link")),
        lambda s: s["media_ref"],
    )


def corpus_view(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Flat corpus over interleaved docs: doc_id, text, media/link arrays,
    span stats — the input shape for dedup/quality/fingerprint ops."""
    spans = F.col(spans_col)
    return documents.select(
        "doc_id",
        text_of_spans(spans).alias("text"),
        media_refs_of_spans(spans).alias("media_refs"),
        link_targets_of_spans(spans).alias("link_targets"),
        F.size(spans).cast("int").alias("n_spans"),
    )


def media_table(documents: DataFrame, spans_col: str = "spans") -> DataFrame:
    """One row per media occurrence: (doc_id, pos, media_ref) — the join
    point for binary payload fetch/decode (corpus/multimodal.py)."""
    return documents.select(
        "doc_id", F.posexplode(F.col(spans_col)).alias("pos", "span")
    ).filter(F.col("span.kind") == "media").select(
        "doc_id",
        F.col("pos").cast("int"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
