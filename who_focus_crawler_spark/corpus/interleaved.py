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


def media_caption_pairs(
    docs: DataFrame,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Caption-candidate mining over the interleaved corpus: for every
    media span, the nearest PRECEDING and FOLLOWING text spans in
    document order → (doc_id, media_ref, offset, caption_before,
    caption_after).

    This is how an image/caption training set falls out of the
    `BASELINE.json` input shape — spans interleave text and media in
    authoring order, so the adjacent text spans are the best local
    caption evidence (alt-text/figure-caption heuristic used by
    LAION-style pair mining, Schuhmann et al. 2022).

    Pure per-doc window functions over the exploded span sequence:
    running last/first text span with IGNORE NULLS, partitioned by
    doc — no cross-doc shuffle, parallel in the number of documents.
    """
    from pyspark.sql import Window

    sp = docs.select(doc_col, F.posexplode(spans_col).alias("idx", "s"))
    w = Window.partitionBy(doc_col).orderBy("idx")
    prev_t = F.last(
        F.when(F.col("s.kind") == "text", F.col("s.text")), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    next_t = F.first(
        F.when(F.col("s.kind") == "text", F.col("s.text")), ignorenulls=True
    ).over(w.rowsBetween(1, Window.unboundedFollowing))
    return (
        sp.select(
            doc_col,
            "s",
            prev_t.alias("caption_before"),
            next_t.alias("caption_after"),
        )
        .filter(F.col("s.kind") == "media")
        .select(
            doc_col,
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").cast("int").alias("offset"),
            "caption_before",
            "caption_after",
        )
    )
