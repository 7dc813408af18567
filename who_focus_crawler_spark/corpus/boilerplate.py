"""Per-source boilerplate segment removal (CCNet-style line dedup,
Wenzek et al. 2020 §3.1, adapted to segment granularity).

Web pages from one site share chrome — navigation, footers, cookie
banners. Training pipelines strip text units that repeat across a large
share of a source's documents before anything else sees the text (CCNet
dedups by raw line; trafilatura/jusText drop boilerplate blocks). Our
corpus text has no line structure, so the frozen unit is the
*non-overlapping k-token segment*: segment i of a doc is tokens
``[i*k+1 .. (i+1)*k]`` under the frozen tokenizer, the trailing
partial segment included. A segment value is boilerplate **within its
source** when it occurs in at least ``min_docs`` documents AND in at
least ``share_permille``/1000 of the source's documents.

Scale shape (the 100 TB plan):

1. detection shuffles only slim ``(source, seg_hash, doc_id)`` triples
   (60-bit hashes, never segment text), distinct-ed and counted with
   partial+final aggregation; per-source doc totals are a tiny dim
   joined in (broadcast);
2. the boilerplate set is, by construction, small — only values crossing
   the high-share threshold survive — so stripping joins the corpus's
   slim ``(doc_id, seg_idx, seg_hash)`` pairs against it and reduces to
   a per-doc bad-index list;
3. text is rebuilt IN PLACE with native array expressions (re-segment,
   filter by index, re-join) — full document text never shuffles, and
   the whole rebuild stays inside whole-stage codegen.

Integer outputs + md5-derived hashes keep every value engine-portable;
the DuckDB twin is harness/corpus_queries.py::d_boilerplate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, tokens


def segments(toks: Column, seg_len: int) -> Column:
    """Non-overlapping ``seg_len``-token segments, in order, each joined
    by one space; the trailing partial segment is kept; [] for no tokens.

    (Spark's ``sequence(1, 0)`` counts DOWN — guard the empty case
    explicitly so both engines agree on [].)
    """
    n = F.size(toks)
    n_segs = (n + F.lit(seg_len - 1)) / F.lit(seg_len)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n_segs.cast("int")),
            lambda i: F.array_join(
                F.slice(toks, (i - 1) * seg_len + 1, seg_len), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_segments(
    docs: DataFrame,
    seg_len: int = 5,
    min_docs: int = 2,
    share_permille: int = 500,
    source_col: str = "source",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Detect boilerplate: (source, seg_hash, df_docs, n_docs) for every
    segment value crossing both thresholds in its source.

    The share test is integer: ``1000 * df_docs >= share_permille *
    n_docs`` — no float division, value-exact across engines.
    """
    segs = docs.select(
        source_col,
        doc_col,
        F.explode(segments(tokens(F.col(text_col)), seg_len)).alias("_seg"),
    ).select(
        source_col, doc_col, md5_hash60(F.col("_seg")).alias("seg_hash")
    )
    per_source = docs.groupBy(source_col).agg(
        F.countDistinct(doc_col).alias("n_docs")
    )
    df_docs = (
        segs.distinct()
        .groupBy(source_col, "seg_hash")
        .agg(F.count(F.lit(1)).alias("df_docs"))
    )
    return df_docs.join(F.broadcast(per_source), source_col).filter(
        (F.col("df_docs") >= F.lit(min_docs))
        & (F.col("df_docs") * 1000 >= F.col("n_docs") * F.lit(share_permille))
    )


def strip_boilerplate(
    docs: DataFrame,
    seg_len: int = 5,
    min_docs: int = 2,
    share_permille: int = 500,
    source_col: str = "source",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove each source's boilerplate segments from its documents.

    Returns the input with ``text_col`` rewritten (surviving segments
    re-joined by one space, original order) plus ``n_segs`` /
    ``n_boiler_segs`` counters. Docs with no boilerplate pass through
    with ``n_boiler_segs = 0`` and text equal to the segment re-join of
    the original (token-normalized — the frozen tokenizer is the corpus
    text contract).

    Only slim hash pairs shuffle; the doc side joins the per-doc
    bad-index lists (aggregated, small) and rebuilds text natively.
    """
    boiler = boilerplate_segments(
        docs, seg_len, min_docs, share_permille, source_col, doc_col, text_col
    ).select(source_col, "seg_hash")

    pairs = docs.select(
        source_col,
        doc_col,
        F.posexplode(segments(tokens(F.col(text_col)), seg_len)).alias(
            "seg_idx", "_seg"
        ),
    ).select(
        source_col,
        doc_col,
        "seg_idx",
        md5_hash60(F.col("_seg")).alias("seg_hash"),
    )
    bad_idx = (
        pairs.join(boiler, [source_col, "seg_hash"])
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list("seg_idx")).alias("_bad"))
    )

    segs = segments(tokens(F.col(text_col)), seg_len)
    bad = F.coalesce(F.col("_bad"), F.array().cast("array<int>"))
    kept = F.filter(segs, lambda s, i: ~F.array_contains(bad, i))
    return (
        docs.join(bad_idx, doc_col, "left")
        .select(
            *[c for c in docs.columns if c != text_col],
            F.array_join(kept, " ").alias(text_col),
            F.size(segs).cast("long").alias("n_segs"),
            F.size(bad).cast("long").alias("n_boiler_segs"),
        )
    )
