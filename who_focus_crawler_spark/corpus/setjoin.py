"""Exact set-similarity self-join via prefix filtering (AllPairs:
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
WWW 2007; length filter per Arasu et al. VLDB 2006).

Unlike MinHash-LSH (corpus/dedup.py — approximate, probabilistic
recall), this finds EVERY pair with Jaccard(a, b) >= tau, exactly:

  1. per-doc distinct shingle set, globally ordered by (document
     frequency asc, shingle) — rare shingles first;
  2. prefix filter: two sets with Jaccard >= tau MUST share a shingle
     in their first  n - ceil(tau * n) + 1  ordered shingles, so only
     prefix shingles are exploded into the candidate join;
  3. length filter inside the join: |a| >= tau * |b| (both ways) —
     prunes before the exact verification;
  4. exact verification on candidates only: |a ∩ b| / |a ∪ b| >= tau
     in integer permille arithmetic (engine-portable, no floats).

Scale shape: the candidate join shuffles only (doc_id, n, shingle) for
PREFIX shingles — at tau = 0.8 that is 20% of each set, and rare-first
ordering makes prefix shingles the most selective join keys in the
corpus (frequent shingles never generate candidates). Verification
re-attaches full sets for surviving candidates only — never all pairs.
The frequency table is a partial+final agg; the per-doc reorder is one
explode + one groupBy — both plain shuffles on slim rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.dedup import _spread, shingles
from who_focus_crawler_spark.corpus.text import tokens


def ordered_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, tk, n): distinct shingle set ordered by global document
    frequency ascending (ties by shingle string) — the AllPairs
    canonical order every prefix derives from."""
    # _spread before the shingle build: higher-order array expressions
    # (transform/slice inside positional_ngrams) run interpreted per
    # element, so this map is CPU-bound, and a small corpus parquet is
    # one input partition — serializing it on a single core (measured:
    # steady-state 19 s → 8 s for the whole join at sf0.1 once spread).
    # Conditional: a warehouse-scale scan already has ≥ cores splits
    # and passes through untouched. A column-only repartition would NOT
    # work here — AQE coalesces it back to ~1 partition on few-MB input.
    sets = _spread(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select(
        "doc_id",
        shingles(tokens(F.col(text_col)), shingle_k).alias("tk"),
    )
    ex = sets.select("doc_id", F.explode("tk").alias("tok"))
    freq = ex.groupBy("tok").count()
    return (
        ex.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("count").alias("c"), F.col("tok").alias("t"))
                )
            ).alias("st")
        )
        .select(
            "doc_id",
            F.transform("st", lambda s: s["t"]).alias("tk"),
            F.size("st").alias("n"),
        )
    )


def jaccard_similarity_join(
    docs: DataFrame,
    tau_permille: int = 800,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """All pairs (doc_a < doc_b) with shingle-set Jaccard >= tau:
    (doc_a, doc_b, jaccard_ppm). Exact — complete recall by the prefix
    pigeonhole, verified in integer arithmetic."""
    if not 0 < tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in (0, 1000], got {tau_permille}")
    ordered = ordered_sets(docs, text_col, id_col, shingle_k)
    # two consumers (prefix explode + verification re-attach ×2): pin
    # the ordered sets so the freq join/sort runs once
    ordered = ordered.localCheckpoint(eager=False)
    # prefix length n - ceil(tau*n) + 1; ceil(a/b) = (a + b - 1) div b
    pref_len = (
        F.col("n")
        - F.floor((F.lit(tau_permille) * F.col("n") + 999) / 1000).cast("int")
        + 1
    )
    ex = ordered.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("tk", 1, pref_len.cast("int"))).alias(
            "pos", "tok"
        ),
    )
    # PPJoin positional filter (Xiao, Wang, Lin & Yu, WWW 2008): at the
    # pair's FIRST shared prefix token the total overlap is at most
    # 1 + min(remaining suffix lengths), and Jaccard >= tau needs
    # overlap >= ceil(tau·(n_a+n_b)/(1+tau)); a pair whose first match
    # can't reach that is pruned before the distinct. Sound because the
    # first shared token has no earlier matches (matched-so-far = 1
    # exactly), complete because every valid pair passes there.
    _required = F.ceil(
        (F.lit(tau_permille) * (F.col("a.n") + F.col("b.n")))
        / F.lit(1000 + tau_permille)
    )
    _upper = F.lit(1) + F.least(
        F.col("a.n") - (F.col("a.pos") + 1), F.col("b.n") - (F.col("b.pos") + 1)
    )
    cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: tau <= |a|/|b| <= 1/tau is necessary for
            # Jaccard >= tau — prune before verification
            & (F.col("b.n") * 1000 >= F.lit(tau_permille) * F.col("a.n"))
            & (F.col("a.n") * 1000 >= F.lit(tau_permille) * F.col("b.n"))
            & (_upper >= _required),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return (
        cand.join(
            ordered.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("_ta")),
            "doc_a",
        )
        .join(
            ordered.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("_tb")),
            "doc_b",
        )
        .withColumn("_i", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn("_u", F.size(F.array_union("_ta", "_tb")))
        .filter(F.col("_i") * 1000 >= F.lit(tau_permille) * F.col("_u"))
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.col("_i") * F.lit(1_000_000) / F.col("_u"))
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
