"""DSIR — data selection via importance resampling (Xie, Santurkar, Ma,
Liang, "Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The published recipe: represent every document as a bag of HASHED
n-gram features, fit two bucket-count distributions — the small
in-domain TARGET sample p_t and the raw SOURCE pool p_s — and weight
each source document by its importance ratio w(x) = Π_f (p_t(f)/p_s(f))
^ c_f(x); then sample the training subset with probability ∝ w (or take
the top-w slice). The hashing trick bounds the model at ``n_buckets``
rows no matter the corpus, so the fitted model always broadcasts.

Spark shape: gram → bucket is native expressions over the frozen
tokenizer (`corpus/text.py::tokens`, unigrams + bigrams with repeats);
fitting is one partial+final agg per side over slim (bucket) rows; the
bucket-ratio table is dense (one row per bucket, Laplace-smoothed) and
joins back broadcast. Only (doc_id, bucket) pairs ever shuffle — gram
text stays in the scan stage (the `corpus/lm.py` discipline).

Integer freeze (value-exactness across engines): the per-bucket ratio
is the EXACT integer

    ratio_ppm(f) = (10^6 · (c_t(f)+1) · (N_s+B)) div ((c_s(f)+1) · (N_t+B))

and the per-doc score is the integer Σ_f c_f(x)·(ratio_ppm(f) − 10^6) —
the first-order (log x ≈ x−1) linearization of the paper's log-
importance Σ c_f·log(p_t/p_s), in parts-per-million. It preserves the
paper's ranking direction and is bit-identical in any engine (the repo's
integer-permille discipline: classifier, BM25, collocations).
``log_space=True`` computes the paper's actual float log-importance for
serving; it is unit-tested against an independent Python reference
rather than oracle-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.sampling import weighted_sample
from who_focus_crawler_spark.corpus.text import md5_hash60, ngrams_all, tokens

PPM = 1_000_000


def gram_buckets(text, n_buckets: int):
    """Array column of hashed-feature bucket ids: every unigram and
    bigram occurrence (with repeats — DSIR counts occurrences), each
    mapped to md5_hash60(gram) % n_buckets."""
    tk = tokens(text)
    grams = F.concat(ngrams_all(tk, 1), ngrams_all(tk, 2))
    return F.transform(grams, lambda g: md5_hash60(g) % n_buckets)


def _doc_buckets(docs: DataFrame, n_buckets: int, id_col: str, text_col: str) -> DataFrame:
    # _spread: per-gram md5 inside an interpreted transform is the CPU
    # hot spot — single-file inputs would serialize it on one core
    # (conditional; no-op at warehouse scale; see dedup._spread)
    from who_focus_crawler_spark.corpus.dedup import _spread

    return _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(gram_buckets(F.col(text_col), n_buckets)).alias("bucket")
    )


def dsir_fit(
    target: DataFrame,
    source: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit the hashed-feature importance model: one dense row per bucket,
    ``(bucket, ratio_ppm)``, Laplace(+1)-smoothed so never-seen buckets
    get a finite neutral-ish ratio. Bounded at ``n_buckets`` rows —
    broadcastable regardless of corpus size. Totals ride as 1-row
    broadcast aggregates (no driver action)."""
    spark = target.sparkSession
    tb = (
        _doc_buckets(target, n_buckets, id_col, text_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    sb = (
        _doc_buckets(source, n_buckets, id_col, text_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    nt = tb.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    ns = sb.agg(F.coalesce(F.sum("cs"), F.lit(0)).alias("ns"))
    dense = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    num = (
        F.lit(PPM)
        * (F.coalesce("ct", F.lit(0)) + 1)
        * (F.col("ns") + n_buckets)
    ).cast("long")
    den = (
        (F.coalesce("cs", F.lit(0)) + 1) * (F.col("nt") + n_buckets)
    ).cast("long")
    return (
        dense.join(tb, "bucket", "left")
        .join(sb, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .withColumn("_num", num)
        .withColumn("_den", den)
        # numerators reach ~10^17 > 2^53: float `/` would round — use
        # exact integer division
        .select("bucket", F.expr("_num div _den").alias("ratio_ppm"))
    )


def dsir_scores(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
    log_space: bool = False,
) -> DataFrame:
    """Per-document importance score over the fitted model.

    Integer mode (default): ``dsir_score`` = Σ occurrences of each
    feature × (ratio_ppm − 10^6) — exact, engine-portable. Log mode:
    ``dsir_logw`` = Σ c_f · ln(ratio_ppm / 10^6), the paper's
    log-importance (float — serving path). A document with no grams
    scores 0 (neutral). ``n_buckets`` defaults to the model's row count
    only via explicit argument — pass the SAME value used in fit.
    """
    if n_buckets is None:
        raise ValueError("pass n_buckets — must equal the fit-time value")
    b = _doc_buckets(docs, n_buckets, id_col, text_col)
    if log_space:
        contrib = F.ln(F.col("ratio_ppm").cast("double") / PPM)
        out_col, zero = "dsir_logw", F.lit(0.0)
    else:
        contrib = (F.col("ratio_ppm") - PPM).cast("long")
        out_col, zero = "dsir_score", F.lit(0).cast("long")
    scored = (
        b.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum(contrib).alias(out_col))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce(out_col, zero).alias(out_col))
    )


def dsir_topk(
    docs: DataFrame,
    model: DataFrame,
    k: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic top-k selection by importance (the paper's
    'top-k heuristic' ablation): (score desc, id asc). Global k ⇒
    TakeOrderedAndProject — per-partition partial top-k, no full sort."""
    return (
        dsir_scores(docs, model, id_col, text_col, n_buckets=n_buckets)
        .orderBy(F.desc("dsir_score"), F.asc(id_col))
        .limit(k)
    )


def dsir_resample(
    docs: DataFrame,
    model: DataFrame,
    k: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
) -> DataFrame:
    """Importance RESAMPLING (the paper's headline selector): a
    deterministic weighted sample without replacement, weight ∝ the
    importance w(x) = exp(log-importance), via the verified
    Efraimidis–Spirakis sampler. The log-weight is clamped to ±20
    before exponentiation so one outlier document cannot saturate the
    float range."""
    logw = dsir_scores(
        docs, model, id_col, text_col, n_buckets=n_buckets, log_space=True
    )
    w = F.exp(F.greatest(F.least(F.col("dsir_logw"), F.lit(20.0)), F.lit(-20.0)))
    weighted = docs.join(logw, id_col).withColumn("_w", w)
    return weighted_sample(weighted, id_col, "_w", k, seed=seed).drop(
        "_w", "dsir_logw"
    )
