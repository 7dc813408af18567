"""Content-defined chunking (CDC) for sub-document dedup.

Whole-document dedup (exact / MinHash / SimHash) misses the common
corpus failure where documents share large verbatim BLOCKS (quoted
articles, licence headers, templated sections) inside otherwise-distinct
pages. The storage-systems answer is content-defined chunking (LBFS —
Muthitacharoen, Chen, Mazières, "A Low-Bandwidth Network File System",
SOSP 2001): cut at positions where a rolling window's hash satisfies a
mask, so chunk boundaries survive insertions/deletions (a byte-offset
splitter would shift every boundary after an edit; a content-defined one
re-synchronizes). Applied to token streams it yields chunk-level dedup
decisions — the actionable counterpart to the dup-ngram coverage signal
(corpus/substring.py).

Frozen v1 semantics (engine-portable, DuckDB twin in
harness/corpus_queries.py::d_cdc_chunks):
- window    = ``w`` consecutive tokens (the frozen corpus tokenizer);
- boundary  BEFORE token ``i + w`` (1-based) for every gram starting at
  ``i`` with md5_hash60(gram) % 2**mask_bits == 0 and ``i + w <= n``
  (a cut at end-of-doc is a no-op);
- chunks    = token ranges between cuts; chunk id = md5_hash60 of the
  space-joined chunk tokens. Expected chunk length ≈ w + 2**mask_bits
  tokens.

Scale shape: chunking is per-row native array expressions (zero shuffle,
zero Python); the only exchange carries (chunk_hash:long, doc_id,
chunk_idx, n_tokens) — never chunk text — and duplicate detection is one
partial+final agg on chunk_hash. Nothing is ever all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import (
    md5_hash60,
    positional_ngrams,
    tokens,
)


def cdc_cut_starts(toks: Column, w: int = 3, mask_bits: int = 4) -> Column:
    """1-based start positions of every chunk: [1] ++ one entry per
    boundary gram (strictly increasing, all ≤ size(toks))."""
    grams = positional_ngrams(toks, w)
    mask = F.lit(1 << mask_bits)
    cuts = F.filter(
        F.transform(
            grams,
            lambda g, i: F.when(
                (md5_hash60(g) % mask == 0) & (i + F.lit(w) + 1 <= F.size(toks)),
                i + F.lit(w) + 1,  # i is 0-based; gram starts at token i+1
            ).otherwise(F.lit(None).cast("int")),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(F.array(F.lit(1)), cuts)


def cdc_chunks(
    docs: DataFrame,
    w: int = 3,
    mask_bits: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: (doc_id, chunk_idx, chunk_hash, n_tokens).

    Empty documents produce no rows. All chunking work happens inside
    per-row array expressions before anything is exploded, so the
    exploded frame is already the slim shuffle payload."""
    # _spread: the rolling-hash + per-chunk md5 maps are interpreted
    # higher-order expressions (~10^3 hash ops per doc) — a single-file
    # corpus parquet would serialize them on one core (see dedup._spread;
    # no-op whenever the scan already has >= cores partitions)
    from who_focus_crawler_spark.corpus.dedup import _spread

    docs = _spread(docs.select(F.col(id_col), F.col(text_col)))
    toks = tokens(F.col(text_col))
    starts = cdc_cut_starts(toks, w, mask_bits)
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(F.size(toks) + 1))
    chunk_structs = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            md5_hash60(F.array_join(F.slice(toks, s, e - s), " ")).alias("h"),
            (e - s).alias("nt"),
        ),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(chunk_structs).alias("chunk_idx", "ch"),
        )
        .filter(F.col("ch.nt") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.col("ch.h").alias("chunk_hash"),
            F.col("ch.nt").alias("n_tokens"),
        )
    )


def cdc_dedup_keep(chunks: DataFrame) -> DataFrame:
    """Chunk-level keep decision: the first occurrence of each chunk hash
    (min (doc_id, chunk_idx) — deterministic) survives; later copies are
    droppable. One window over the chunk_hash shuffle."""
    wk = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return chunks.withColumn("keep", F.row_number().over(wk) == 1)


def cdc_doc_coverage(chunks: DataFrame) -> DataFrame:
    """Per-doc duplicated-chunk coverage: a chunk is *duplicated* when its
    hash occurs in ≥ 2 distinct documents. Returns one row per doc:
    (doc_id, n_chunks, n_dup_chunks, dup_tokens, total_tokens,
    dup_permille). Detection is a partial+final agg on chunk_hash plus a
    broadcast-friendly semi-join re-attach — O(|chunks|), no text."""
    dup_hashes = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("chunk_hash")
    )
    flagged = chunks.join(
        dup_hashes.withColumn("_dup", F.lit(1)), "chunk_hash", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).alias(
            "n_dup_chunks"
        ),
        F.sum(
            F.when(F.col("_dup").isNotNull(), F.col("n_tokens")).otherwise(0)
        ).alias("dup_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    ).withColumn(
        "dup_permille",
        F.floor(
            F.col("dup_tokens") * 1000 / F.greatest(F.col("total_tokens"), F.lit(1))
        ).cast("long"),
    )


def sliding_windows(
    docs: DataFrame,
    size: int = 256,
    stride: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping token windows — the retrieval/RAG chunking
    counterpart to CDC's dedup chunking: every document becomes
    ceil(max(n - size, 0) / stride) + 1 windows of ``size`` tokens
    stepping by ``stride`` (the final window is the shorter tail; a
    document shorter than ``size`` yields exactly one window).

    Pure per-row native array work (sequence → transform → slice) with a
    posexplode — no shuffle, no Python; window text re-joins with single
    spaces under the frozen tokenizer. Output: (doc_id, window_idx,
    window_text, n_tokens, start_pos) with window_idx/start_pos 0-based.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"size/stride must be positive, got {size}/{stride}")
    # same single-input-partition hazard as cdc_chunks above
    from who_focus_crawler_spark.corpus.dedup import _spread

    docs = _spread(docs.select(F.col(id_col), F.col(text_col)))
    tk = tokens(F.col(text_col))
    n = F.size(tk)
    n_windows = (
        F.floor(
            (F.greatest(n - size, F.lit(0)) + stride - 1) / stride
        ).cast("int")
        + 1
    )
    wins = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda w: F.slice(tk, w * stride + 1, size),
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(wins).alias("window_idx", "_wtk"),
    )
    return out.select(
        "doc_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        F.array_join("_wtk", " ").alias("window_text"),
        F.size("_wtk").cast("long").alias("n_tokens"),
        (F.col("window_idx") * stride).cast("long").alias("start_pos"),
    )
