"""Benchmark decontamination: flag / drop corpus documents that overlap
an evaluation set.

Training pipelines must remove eval-set contamination before training
(published practice: Brown et al. 2020 appendix C uses 13-gram overlap;
Llama/Chinchilla reports use similar n-gram collision tests). The
scalable shape is a *set-membership join on hashed n-grams*:

  1. the benchmark side is reduced to DISTINCT n-gram hashes — at real
     scale this is tiny (eval suites are MBs while the corpus is TBs),
     so the gram set broadcasts and the 100 TB corpus side never
     shuffles;
  2. the corpus side explodes each doc's distinct n-grams to slim
     ``(doc_id, gram_hash)`` pairs — 60-bit ints, never gram text —
     and joins;
  3. per-doc hit counts come from a partial+final count over the join
     output; docs with ``hits >= min_hits`` are contaminated.

Hash/tokenizer conventions are the frozen corpus/text.py ones so the
DuckDB oracle (harness/corpus_queries.py::d_decontaminate) verifies
values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, shingles, tokens


def bench_gram_hashes(
    bench: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: one ``g`` column.

    This is the broadcast side — at corpus scale it holds one 8-byte
    hash per distinct eval n-gram (an eval suite of 100k questions ×
    ~100 grams ≈ 10M rows ≈ 80 MB, comfortably broadcastable)."""
    return (
        bench.select(
            F.explode(shingles(tokens(F.col(text_col)), n)).alias("_gram")
        )
        .select(md5_hash60(F.col("_gram")).alias("g"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc contamination counts: (doc_id, n_grams, n_hits).

    ``n_grams`` = the doc's distinct n-gram count (0 when shorter than
    n tokens); ``n_hits`` = how many of those grams appear anywhere in
    the benchmark set. Integer outputs only — value-exact across
    engines; thresholds are applied downstream.

    Plan shape: corpus explodes once to (doc_id, g); the bench gram set
    is broadcast; the join is an inner hash join followed by a per-doc
    count — no shuffle of the corpus side beyond the per-doc partial
    aggregation, no all-pairs step.
    """
    base = docs.select(doc_col, text_col)
    grams = base.select(
        doc_col,
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("_gram"),
    ).select(doc_col, md5_hash60(F.col("_gram")).alias("g"))
    per_doc_total = grams.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        grams.join(F.broadcast(bench_gram_hashes(bench, n, text_col)), "g")
        .groupBy(doc_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.select(doc_col)
        .join(per_doc_total, doc_col, "left")
        .join(hits, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents with ``>= min_hits`` benchmark n-gram collisions
    (min_hits=1 is the published-practice default: any shared n-gram of
    length n marks the doc). Left-anti join on the contaminated id set,
    so clean docs stream through untouched."""
    dirty = (
        contamination(docs, bench, n=n, doc_col=doc_col, text_col=text_col)
        .filter(F.col("n_hits") >= F.lit(min_hits))
        .select(doc_col)
    )
    return docs.join(dirty, doc_col, "left_anti")
