"""Corpus-trained n-gram language-model scoring (quality signal).

Production data pipelines score documents with a cheap n-gram LM
trained on the corpus itself (or a trusted slice of it) and drop the
tails — the CCNet / KenLM-perplexity pattern (Wenzek et al. 2020).
Both halves distribute as slim hash-keyed aggregations:

  train:  explode k-grams → partial+final count per gram hash
          (the "model" IS a (gram_hash, count) table);
  score:  explode each doc's k-grams, hash-join against the model,
          aggregate per doc.

Nothing here is a Python UDF; the model table shuffles 8-byte hashes,
never gram text, and the per-doc aggregation is a standard partial+
final count — the same plan shape at sf0.001 and at 100 TB (the model
table for a trillion-token corpus is O(distinct grams), which the
join keys by hash; no broadcast assumption on the model side).

Two scores:

- ``doc_gram_frequency`` — integer-exact: per doc, (n_grams, freq_sum,
  freq_min): total corpus occurrences of the doc's grams and the count
  of its rarest gram. A high-mass / no-rare-gram doc is "common"
  boilerplate-like text; freq_min == 1 flags docs with novel content.
  Integer end-to-end → value-exact vs the DuckDB oracle
  (harness/corpus_queries.py::d_text_lm_common).
- ``doc_logprob`` — the classical add-one-smoothed conditional bigram
  log-probability, normalized per gram. Float (log) output: summation
  order makes the last ulps engine/partitioning-dependent, so it is
  covered by a unit tolerance test rather than the hash-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import (
    md5_hash60,
    positional_ngrams,
    tokens,
)


def _doc_grams(
    docs: DataFrame, k: int, doc_col: str, text_col: str
) -> DataFrame:
    """(doc_id, g) — one row per positional k-gram occurrence."""
    return docs.select(
        doc_col,
        F.explode(positional_ngrams(tokens(F.col(text_col)), k)).alias("_gram"),
    ).select(doc_col, md5_hash60(F.col("_gram")).alias("g"))


def ngram_model(
    docs: DataFrame, k: int = 2, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train: corpus-level k-gram occurrence counts ``(g, c)``.

    This is the persisted "model" artifact — write it once (snapshot
    table), reuse across scoring runs; ``score_*`` takes it as an
    argument so training never re-runs per query (the IVF fit/probe
    lesson applied here from the start)."""
    return (
        _doc_grams(docs, k, doc_col, text_col)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def doc_gram_frequency(
    docs: DataFrame,
    model: DataFrame,
    k: int = 2,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score: per-doc (n_grams, freq_sum, freq_min) against ``model``.

    Every gram of a corpus-trained model is present by construction, but
    the join stays LEFT + coalesce(0 count → per-gram 0) so a model
    trained on a different slice scores unseen grams as frequency 0
    instead of silently dropping them."""
    grams = _doc_grams(docs, k, doc_col, text_col)
    scored = grams.join(model, "g", "left").select(
        doc_col, F.coalesce("c", F.lit(0)).alias("c")
    )
    per_doc = scored.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("c").alias("freq_sum"),
        F.min("c").alias("freq_min"),
    )
    return (
        docs.select(doc_col)
        .join(per_doc, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("freq_sum", F.lit(0)).cast("long").alias("freq_sum"),
            F.coalesce("freq_min", F.lit(0)).cast("long").alias("freq_min"),
        )
    )


def doc_logprob(
    docs: DataFrame,
    bigram_model: DataFrame,
    unigram_model: DataFrame,
    vocab_size: int,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Add-one-smoothed conditional bigram log-probability per doc:

        mean over bigrams (w1 w2) of ln((c(w1 w2) + 1) / (c(w1) + V))

    ``bigram_model`` / ``unigram_model`` are ``ngram_model(k=2)`` /
    ``ngram_model(k=1)`` outputs (persisted); V = vocab_size. Returns
    (doc_id, n_bigrams, mean_logprob) — mean_logprob NULL for docs with
    no bigram. More negative = more surprising under the corpus LM."""
    grams = docs.select(
        doc_col,
        F.explode(
            positional_ngrams(tokens(F.col(text_col)), 2)
        ).alias("_gram"),
    ).select(
        doc_col,
        md5_hash60(F.col("_gram")).alias("g"),
        md5_hash60(F.split(F.col("_gram"), " ").getItem(0)).alias("g1"),
    )
    joined = (
        grams.join(bigram_model.withColumnRenamed("c", "c2"), "g", "left")
        .join(
            unigram_model.select(
                F.col("g").alias("g1"), F.col("c").alias("c1")
            ),
            "g1",
            "left",
        )
        .select(
            doc_col,
            (
                F.log(
                    (F.coalesce("c2", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("c1", F.lit(0)) + vocab_size).cast("double")
                )
            ).alias("lp"),
        )
    )
    per_doc = joined.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("mean_logprob"),
    )
    return (
        docs.select(doc_col)
        .join(per_doc, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("mean_logprob"),
        )
    )
