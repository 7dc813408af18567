"""Inverted index construction and BM25-shaped ranked retrieval.

A training-data platform needs term-level access to the corpus — for
corpus exploration ("which docs mention X"), for targeted relevance
signals feeding the focused crawler, and for keyword eval-set mining.
The scalable shapes:

- **postings**: explode tokens → ``(term, doc_id, tf)`` via partial+
  final count aggregation — one shuffle keyed by ``(term, doc_id)``,
  no text beyond the term itself on the wire. Per-term document
  frequency / collection frequency follow with a second slim partial
  agg on ``term``.
- **ranked retrieval**: for a small query-term set the filter pushes to
  the token explode (only query-term postings materialize), per-term
  stats broadcast back, and document length joins in once. The 100 TB
  corpus is touched by exactly one scan; per-doc scores reduce with
  partial aggregation and top-k is a ``TakeOrderedAndProject`` (no
  global sort).

Scoring is the BM25 shape (Robertson–Spärck Jones probabilistic idf ×
saturating tf with length normalization, k1/b) **frozen as integer
permille arithmetic** so both engines reproduce identical values —
the same engine-portability convention as corpus/text.py's quality
score. The float-log idf of textbook BM25 is deliberately replaced by
the raw probabilistic ratio ``(N - df)/(df + 1)`` in permille: monotone
in df, integer-exact, and rank-equivalent for single-term queries.

DuckDB twins: harness/pipeline_queries.py::d_index_postings / d_text_bm25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import tokens

K1_MILLI = 1200  # BM25 k1 = 1.2
B_MILLI = 750  # BM25 b = 0.75


def postings(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf), tf = positional
    occurrences of the term in the doc under the frozen tokenizer."""
    return (
        docs.select(doc_col, F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", doc_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def term_stats(post: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Per-term stats over a postings table: (term, df_docs, cf) —
    document frequency and collection frequency."""
    return post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs"),
        F.sum("tf").cast("long").alias("cf"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1_milli: int = K1_MILLI,
    b_milli: int = B_MILLI,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document containing >= 1 query term.

    Returns (doc_id, n_matched, score_milli): n_matched = distinct query
    terms present; score_milli = sum over matched terms of

        idf_milli(t) * tfn_milli(t, d) div 1000

        idf_milli = (1000 * (N - df) + 500) div (df + 1) + 1000
        tfn_milli = (1000 * tf * (k1 + 1000))
                    div (1000 * tf + (k1 * norm_milli) div 1000)
        norm_milli = 1000 - b + (b * dl_ratio_milli) div 1000
        dl_ratio_milli = (1000000 * dl) div avgdl_milli
        avgdl_milli = (1000 * sum(dl)) div N

    (all integer floor divisions on non-negative operands — identical in
    Spark ``div`` and DuckDB ``//``).

    Plan: the scoring side is ONE corpus scan — doc length and the
    query-term hits come out of the same projection (``size`` + native
    array ``filter`` before the explode, so only query-term tokens ever
    explode), and ``dl`` rides through the postings groupBy key instead
    of joining back on ``doc_col``. Term idf broadcasts; corpus-level
    (N, sum dl) is a second scan that collapses to one row map-side and
    rides in as a broadcast cross join. No shuffle touches anything
    wider than ``(term, doc_id, dl, tf)``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    slim = docs.select(
        doc_col,
        F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
        F.filter(
            tokens(F.col(text_col)), lambda t: t.isin(*query_terms)
        ).alias("_hits"),
    )
    corpus = slim.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus"),
        F.sum("dl").cast("long").alias("sum_dl"),
    ).withColumn("avgdl_milli", F.expr("(1000 * sum_dl) div n_corpus"))

    post = (
        slim.select(doc_col, "dl", F.explode("_hits").alias("term"))
        .groupBy("term", doc_col, "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idf = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
        .crossJoin(F.broadcast(corpus.select("n_corpus")))
        .withColumn(
            "idf_milli",
            F.expr("(1000 * (n_corpus - df_docs) + 500) div (df_docs + 1) + 1000"),
        )
        .select("term", "idf_milli")
    )
    b = F.lit(b_milli)
    return (
        post.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus.select("avgdl_milli")))
        .withColumn("dl_ratio_milli", F.expr("(1000000 * dl) div avgdl_milli"))
        .withColumn(
            "norm_milli",
            F.lit(1000) - b + F.expr(f"({b_milli} * dl_ratio_milli) div 1000"),
        )
        .withColumn(
            "tfn_milli",
            F.expr(
                f"(1000 * tf * ({k1_milli} + 1000)) div "
                f"(1000 * tf + ({k1_milli} * norm_milli) div 1000)"
            ),
        )
        .groupBy(doc_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(F.expr("(idf_milli * tfn_milli) div 1000"))
            .cast("long")
            .alias("score_milli"),
        )
    )


# ------------------------------------------------------------- phrases ---


def positional_postings(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings: (term, doc_id, positions) with 0-based token
    positions sorted ascending — the index artifact phrase and proximity
    queries run against. Same one-shuffle shape as ``postings``; only
    (term, doc_id, position) triples ever shuffle."""
    return (
        docs.select(
            doc_col,
            F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
        )
        .groupBy("term", doc_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact-phrase retrieval: (doc_id, n_hits) for documents containing
    the phrase's tokens CONSECUTIVELY, n_hits = occurrence count.

    The classic positional-intersection plan: each phrase term pulls its
    postings row (the term filter prunes the index scan to |phrase|
    terms), terms join on doc_id, and a hit is a start position p with
    term i at p+i for every i. Shapes at 100 TB: the postings rows for a
    handful of phrase terms are a sliver of the index; the per-doc
    adjacency check is a native higher-order intersection over position
    arrays (no Python, no explode of positions).

    ``index``: pass a precomputed ``positional_postings`` table to probe
    a persisted index instead of rebuilding one per query.
    """
    terms = [t.lower() for t in phrase.split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    post = (
        index
        if index is not None
        else positional_postings(docs, doc_col, text_col)
    )
    # distinct-term postings, filtered BEFORE any join: only |phrase|
    # terms' rows survive the scan
    need = post.filter(F.col("term").isin(*set(terms)))
    joined = None
    for i, term in enumerate(terms):
        side = need.filter(F.col("term") == term).select(
            F.col(doc_col),
            F.col("positions").alias(f"_p{i}"),
        )
        joined = side if joined is None else joined.join(side, doc_col)
    # start positions: p in _p0 with (p + i) in _pi for all i. The
    # lambda must take exactly ONE argument (F.filter passes the index
    # to 2-arg callables), so the offset binds via a closure factory.
    def _adjacent(idx: int):
        return lambda p: F.array_contains(F.col(f"_p{idx}"), p + F.lit(idx))

    starts = F.col("_p0")
    for i in range(1, len(terms)):
        starts = F.filter(starts, _adjacent(i))
    return (
        joined.withColumn("n_hits", F.size(starts).cast("long"))
        .filter(F.col("n_hits") > 0)
        .select(doc_col, "n_hits")
    )


def min_window_span(
    docs: DataFrame,
    terms: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Proximity retrieval: per doc containing ALL query terms, the
    smallest token window covering one occurrence of each (Clarke,
    Cormack & Tudhope, "Relevance ranking for one to three term
    queries", IP&M 2000) → (doc_id, window, win_start, win_end).

    Plane-sweep as window functions, not an all-tuples product: postings
    for the query terms only (the isin filter pushes into the token
    explode, so non-query terms never shuffle) are sorted per doc; at
    every occurrence the latest position of each term so far is a
    running conditional max, and the candidate window is
    [least(latest…), current]. The per-doc minimum (ties → earliest
    start) is a partial+final aggregate. Cost: O(occurrences of the
    query terms) shuffled by doc — never O(∏ per-term frequencies) —
    and the per-doc window state is k running columns, independent of
    doc length. Ties inside the sweep are impossible: token positions
    are distinct within a doc.
    """
    from functools import reduce
    from operator import and_

    from pyspark.sql import Window

    if not terms:
        raise ValueError("terms must be non-empty")
    occ = docs.select(
        doc_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "term")
    ).filter(F.col("term").isin([t.lower() for t in terms]))
    w = Window.partitionBy(doc_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lasts = [
        F.max(F.when(F.col("term") == t.lower(), F.col("pos"))).over(w).alias(
            f"_m{i}"
        )
        for i, t in enumerate(terms)
    ]
    cand = occ.select(doc_col, "pos", *lasts)
    all_seen = reduce(
        and_, [F.col(f"_m{i}").isNotNull() for i in range(len(terms))]
    )
    start = F.least(*[F.col(f"_m{i}") for i in range(len(terms))]) if len(
        terms
    ) > 1 else F.col("_m0")
    scored = cand.filter(all_seen).select(
        doc_col,
        (F.col("pos") - start + 1).cast("long").alias("window"),
        start.cast("long").alias("win_start"),
        F.col("pos").cast("long").alias("win_end"),
    )
    best = scored.groupBy(doc_col).agg(
        F.min(F.struct("window", "win_start", "win_end")).alias("_b")
    )
    return best.select(
        doc_col,
        F.col("_b.window").alias("window"),
        F.col("_b.win_start").alias("win_start"),
        F.col("_b.win_end").alias("win_end"),
    )
