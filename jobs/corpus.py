"""spark-submit entrypoint for the training-data corpus pipeline.

    spark-submit --py-files dist/who_focus_crawler_spark.zip \
        jobs/corpus.py --input /path/documents.parquet --output /tmp/kept

Input: either a parquet of (doc_id, text[, ...]) via --input, or a crawl
checkpoint via --from-crawl (the engine's interleaved documents table,
projected through corpus_view). Pipeline: exact dedup → MinHash-LSH
near-dup clusters (keep = min doc id per component) → PII redaction →
language gate + quality & repetition thresholds → kept corpus parquet +
one JSON stats line on stdout.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_corpus_pipeline(
    docs: DataFrame,
    output: str | None = None,
    minhash_threshold: float = 0.8,
    min_quality: int = 200,
    max_repetition: float = 0.5,
    lang: str = "en",
) -> dict:
    """docs(doc_id, text) → kept corpus + stats. Returns the stats dict."""
    from who_focus_crawler_spark.corpus.clusters import dedup_keep
    from who_focus_crawler_spark.corpus.dedup import (
        exact_dedup_keep,
        minhash_lsh_pairs,
    )
    from who_focus_crawler_spark.corpus.text import (
        predict_lang,
        quality_score,
        redact_pii,
        repetition_stats,
        tokens,
    )

    n_in = docs.count()
    # exact-dedup output feeds three consumers (pair mining, keep join,
    # count) — materialize once instead of re-running the scan + md5
    # window per action
    exact = exact_dedup_keep(docs).persist()
    n_exact = exact.count()
    pairs = minhash_lsh_pairs(exact, jaccard_threshold=minhash_threshold)
    kept = dedup_keep(exact, pairs).filter(F.col("keep"))
    rep = repetition_stats(F.col("text"))
    final = (
        kept.select(
            "doc_id",
            redact_pii(F.col("text")).alias("text"),
            predict_lang(tokens(F.col("text"))).alias("lang"),
            quality_score(F.col("text")).alias("quality"),
            rep["top_gram_frac"].alias("rep_frac"),
        )
        .filter(
            (F.col("lang") == lang)
            & (F.col("quality") >= min_quality)
            & (F.col("rep_frac") < max_repetition)
        )
        .select("doc_id", "text", "quality")
        .persist()
    )
    n_kept = final.count()  # one pipeline execution; the write below reuses it
    if output:
        final.write.mode("overwrite").parquet(output)
    stats = {
        "n_input": n_in,
        "n_after_exact_dedup": n_exact,
        "n_kept": n_kept,
        "dropped_exact_dup": n_in - n_exact,
        "dropped_neardup_or_filtered": n_exact - n_kept,
    }
    final.unpersist()
    exact.unpersist()
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description="training-data corpus pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet with (doc_id, text)")
    src.add_argument("--from-crawl", help="crawl checkpoint dir (C14 catalog)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--min-quality", type=int, default=200)
    ap.add_argument("--max-repetition", type=float, default=0.5)
    ap.add_argument("--lang", default="en")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("wfc-corpus").getOrCreate()
    if args.from_crawl:
        from who_focus_crawler_spark import schemas
        from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
        from who_focus_crawler_spark.corpus.interleaved import corpus_view

        cat = SnapshotCatalog(args.from_crawl)
        docs = corpus_view(
            cat.read_table(spark, "documents", schemas.DOCUMENTS_OUT)
        ).select("doc_id", "text")
    else:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    stats = run_corpus_pipeline(
        docs,
        output=args.output,
        minhash_threshold=args.minhash_threshold,
        min_quality=args.min_quality,
        max_repetition=args.max_repetition,
        lang=args.lang,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
