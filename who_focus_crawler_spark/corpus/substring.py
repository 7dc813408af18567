"""Cross-document duplicated n-gram coverage (substring-level dup signal).

MinHash/SimHash flag whole documents that look alike; training corpora
also need the finer signal "what fraction of THIS doc is boilerplate
that recurs elsewhere" (the motivation behind exact-substring dedup in
Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022). Suffix-array exact-substring matching doesn't distribute
cheaply; the standard scalable proxy — used here — is positional
token n-gram coverage:

  a doc position is *duplicated* if its n-gram occurs in ≥ 2 distinct
  documents; a doc's dup coverage is (# duplicated positions, # total
  positions).

Shapes at 100 TB (everything shuffles slim):
  - positional n-grams are hashed to a 60-bit int BEFORE any shuffle —
    the exchange carries (gram_hash:long, doc_id), never gram text;
  - document frequency is a partial+final count over distinct
    (gram_hash, doc_id) pairs;
  - the "is duplicated" test re-attaches via LEFT SEMI join on
    gram_hash — no payload widening, no all-pairs step anywhere.

Tokenizer/hash conventions are the frozen corpus/text.py ones, so the
DuckDB oracle (harness/corpus_queries.py::d_dup_ngrams) checks values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.dedup import _spread
from who_focus_crawler_spark.corpus.text import (  # noqa: F401 — re-export
    md5_hash60,
    positional_ngrams,
    tokens,
)


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-position counts: (doc_id, n_grams, n_dup).

    ``n_grams`` = number of n-gram positions in the doc (0 when the doc
    has fewer than n tokens); ``n_dup`` = positions whose gram appears
    in at least 2 distinct docs. Integer outputs only — engine-portable
    for value-exact oracle comparison; compute ratios downstream.
    """
    # _spread: the positional n-gram build is an interpreted higher-order
    # map — serialize-on-one-core pathology on single-file inputs, same
    # fix as setjoin.ordered_sets (conditional; no-op at warehouse scale)
    base = _spread(docs.select(doc_col, text_col))
    # Explicit not-null on the doc key: the outer joins below infer
    # IsNotNull(doc_id) into two of the three per_gram consumers but not
    # the third, which would break structural plan equality and defeat
    # ReuseExchange — pinning the filter here keeps all three branches
    # canonically identical (r1 lesson: inferred join-key filters).
    grams = base.filter(F.col(doc_col).isNotNull()).select(
        doc_col,
        F.explode(positional_ngrams(tokens(F.col(text_col)), n)).alias("_gram"),
    ).select(doc_col, md5_hash60(F.col("_gram")).alias("g"))
    # Aggregate to (doc, gram, multiplicity) FIRST so the tokenize +
    # explode + hash pipeline and its shuffle run ONCE for the three
    # consumers below. ReuseExchange alone can't dedupe these subtrees
    # (each consumer prunes different columns off the aggregate, so the
    # canonical plans differ); pin one materialization with a lazy
    # localCheckpoint — the same 3-consumer pattern as the MinHash
    # signature table (corpus/dedup.py). The checkpointed frame is the
    # slim (doc_id, g, m) triple, far smaller than the corpus text.
    per_gram = (
        grams.groupBy(doc_col, "g")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    # document frequency counts each doc once regardless of how often it
    # repeats the gram internally
    dup_grams = (
        per_gram.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    per_doc_total = per_gram.groupBy(doc_col).agg(F.sum("m").alias("n_grams"))
    per_doc_dup = (
        per_gram.join(dup_grams, "g", "left_semi")
        .groupBy(doc_col)
        .agg(F.sum("m").alias("n_dup"))
    )
    return (
        base.select(doc_col)
        .join(per_doc_total, doc_col, "left")
        .join(per_doc_dup, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
        )
    )


def remove_dup_runs(
    docs: DataFrame,
    n: int = 5,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Excise cross-document duplicated runs and rebuild each doc's text.

    Lee et al. (ACL 2022) drop the duplicated *substrings* themselves,
    not whole documents — boilerplate disappears while the unique prose
    survives. Positional form of that rule: a token position is removed
    iff it is covered by at least one n-gram (starting in
    ``[pos-n+1, pos]``) that occurs in ≥ 2 distinct documents; the
    surviving tokens are re-joined in order with single spaces.

    Output: ``(doc_id, n_tokens, n_removed, clean_text)`` — integer
    counts plus the rebuilt text, all engine-portable (frozen tokenizer +
    md5-60-bit gram hashes), so the DuckDB oracle checks the rebuilt
    strings byte-for-byte.

    Shapes at 100 TB:
      - the duplicate-gram test shuffles only ``(gram_hash, doc_id)``
        pairs (hashed before the exchange — gram text never moves);
      - covered positions are a slim ``(doc_id, pos)`` anti-join feed;
      - the rebuild groups each doc's kept tokens once — O(corpus
        tokens), the floor for any operator that rewrites text;
      - the token table is derived once and lazily checkpointed — three
        consumers (grams, totals, rebuild) share one tokenize pass.
    """
    base = _spread(
        docs.select(doc_col, text_col).filter(F.col(doc_col).isNotNull())
    )
    tk = base.select(
        doc_col, tokens(F.col(text_col)).alias("tk")
    ).localCheckpoint(eager=False)
    # 1-based positions to match the SQL twin's generate_series(1, …)
    toks = tk.select(
        doc_col, F.posexplode(F.col("tk")).alias("p0", "tok")
    ).select(doc_col, (F.col("p0") + 1).alias("pos"), "tok")
    grams = tk.select(
        doc_col,
        F.posexplode(positional_ngrams(F.col("tk"), n)).alias("g0", "gram"),
    ).select(
        doc_col,
        (F.col("g0") + 1).alias("pos"),
        md5_hash60(F.col("gram")).alias("g"),
    )
    dup_grams = (
        grams.select(doc_col, "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    covered = (
        grams.join(dup_grams, "g", "left_semi")
        .select(
            doc_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, [doc_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = tk.select(doc_col, F.size("tk").cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, doc_col, "left")
        .select(
            doc_col,
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def filter_by_dup_coverage(
    docs: DataFrame,
    n: int = 5,
    max_dup_permille: int = 500,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop docs whose duplicated-position share exceeds the threshold
    (integer per-mille compare — no float thresholds in the plan)."""
    cov = dup_ngram_coverage(docs, n=n, doc_col=doc_col, text_col=text_col)
    keep = cov.filter(
        F.col("n_dup") * F.lit(1000) <= F.lit(max_dup_permille) * F.col("n_grams")
    ).select(doc_col)
    return docs.join(keep, doc_col, "left_semi")
