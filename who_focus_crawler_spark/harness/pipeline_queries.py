"""Training-pipeline queries (p-series) with DuckDB oracle SQL:
deterministic sampling / splitting / stratification, token-budget
mixture selection, and duplicated-n-gram coverage.

Hash parity: selection decisions are md5-bucket-derived with an
identical construction on both engines (corpus/sampling.py convention:
bucket = 60-bit md5-hex prefix of "<seed>:<key>" mod 2^20), so every
oracle here checks VALUES — which exact docs were chosen — not shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus import decontam as DC
from who_focus_crawler_spark.corpus import lm as LM
from who_focus_crawler_spark.corpus import mixture as MX
from who_focus_crawler_spark.corpus import sampling as SP
from who_focus_crawler_spark.corpus import substring as SUB
from who_focus_crawler_spark.corpus import text as X
from who_focus_crawler_spark.harness.corpus_queries import SQL_TOKS, _sql_shingles
from who_focus_crawler_spark.harness.util import t

QUERIES: dict = {}


def _sql_bucket(seed: str, key: str) -> str:
    """DuckDB twin of corpus/sampling.py::sample_bucket."""
    return (
        f"CAST(concat('0x', substring(md5(concat('{seed}', ':', "
        f"CAST({key} AS VARCHAR))), 1, 15)) AS BIGINT) % {SP.SAMPLE_BUCKETS}"
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling


def d_sample_hash(spark: SparkSession, sf: str) -> DataFrame:
    """25% deterministic sample of documents by doc_id (seed 's1')."""
    d = t(spark, sf, "documents")
    return SP.hash_sample(d, "doc_id", 0.25, seed="s1").select(
        "doc_id", "source", "lang"
    )


D_SAMPLE_HASH_SQL = f"""
SELECT doc_id, source, lang FROM documents
WHERE {_sql_bucket('s1', 'doc_id')} < {SP.fraction_threshold(0.25)}
"""

QUERIES["d_sample_hash"] = (d_sample_hash, D_SAMPLE_HASH_SQL)


# --------------------------------------------------------------------------
# Train/val/test split — per-split per-lang doc and token totals


def d_sample_split(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    labeled = SP.split_assign(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="sp"
    )
    return labeled.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(X.tokens(F.col("text"))).cast("long")).alias("n_tokens"),
    )


D_SAMPLE_SPLIT_SQL = f"""
WITH b AS (
  SELECT lang, len({SQL_TOKS}) AS n_toks,
         {_sql_bucket('sp', 'doc_id')} AS bk
  FROM documents
)
SELECT CASE WHEN bk < {SP.fraction_threshold(0.8)} THEN 'train'
            WHEN bk < {SP.fraction_threshold(0.9)} THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM b GROUP BY 1, 2
"""

QUERIES["d_sample_split"] = (d_sample_split, D_SAMPLE_SPLIT_SQL)


# --------------------------------------------------------------------------
# Stratified sampling — per-language quotas


def d_sample_strata(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return SP.stratified_sample(
        d,
        "doc_id",
        "lang",
        {"en": 0.5, "fr": 0.25},
        default_fraction=0.1,
        seed="st",
    ).select("doc_id", "lang")


D_SAMPLE_STRATA_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_sql_bucket('st', 'doc_id')} <
      CASE WHEN lang = 'en' THEN {SP.fraction_threshold(0.5)}
           WHEN lang = 'fr' THEN {SP.fraction_threshold(0.25)}
           ELSE {SP.fraction_threshold(0.1)} END
"""

QUERIES["d_sample_strata"] = (d_sample_strata, D_SAMPLE_STRATA_SQL)


# --------------------------------------------------------------------------
# Token-budget mixture selection (two-phase grouped prefix sum)

_MIX_WEIGHTS = {"src0": 3.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
_MIX_BUDGET = 3000


def d_mixture_budget(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").withColumn(
        "n_tokens", F.size(X.tokens(F.col("text"))).cast("long")
    )
    picked = MX.mixture_select(
        d, _MIX_WEIGHTS, _MIX_BUDGET, seed="mx",
    )
    return picked.select("doc_id", "source", "n_tokens", "cum_tokens")


def _mixture_sql() -> str:
    budgets = MX.source_budgets(_MIX_WEIGHTS, _MIX_BUDGET)
    case = " ".join(
        f"WHEN source = '{s}' THEN {b}" for s, b in budgets.items()
    )
    return f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
         {_sql_bucket('mx', 'doc_id')} AS prio
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source
              ORDER BY prio, doc_id ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS cum_tokens
  FROM d
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= CASE {case} ELSE 0 END
"""


QUERIES["d_mixture_budget"] = (d_mixture_budget, _mixture_sql())


# --------------------------------------------------------------------------
# Duplicated n-gram coverage (substring-level dup signal)

_DUP_N = 3


def d_dup_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return SUB.dup_ngram_coverage(d, n=_DUP_N)


D_DUP_NGRAMS_SQL = f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(tk) - {_DUP_N - 1}, 0)),
             i -> array_to_string(list_slice(tk, i, i + {_DUP_N - 1}), ' ')
           )) AS g
    FROM tk
  )
),
dupg AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
  WHERE df >= 2
)
SELECT t.doc_id,
       CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup
FROM tk t
LEFT JOIN (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id) tot
  USING (doc_id)
LEFT JOIN (SELECT doc_id, count(*) AS n_dup FROM grams
           WHERE g IN (SELECT g FROM dupg) GROUP BY doc_id) dup
  USING (doc_id)
"""

QUERIES["d_dup_ngrams"] = (d_dup_ngrams, D_DUP_NGRAMS_SQL)


# --------------------------------------------------------------------------
# Duplicated-run REMOVAL (exact-substring dedup, Lee et al. ACL 2022 shape):
# excise every token covered by a cross-document duplicated n-gram and
# rebuild the text — the oracle checks the rebuilt strings byte-for-byte.


def d_dup_remove(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return SUB.remove_dup_runs(d, n=_DUP_N)


D_DUP_REMOVE_SQL = f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
toks AS (
  SELECT doc_id, i AS pos, tk[i] AS tok
  FROM tk, LATERAL unnest(generate_series(1, len(tk))) AS u(i)
),
grams AS (
  SELECT doc_id, i AS pos,
         CAST(concat('0x', substring(md5(
           array_to_string(list_slice(tk, i, i + {_DUP_N - 1}), ' ')
         ), 1, 15)) AS BIGINT) AS g
  FROM tk,
       LATERAL unnest(generate_series(1, greatest(len(tk) - {_DUP_N - 1}, 0))) AS u(i)
),
dupg AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
  WHERE df >= 2
),
cov AS (
  SELECT DISTINCT doc_id, cp FROM (
    SELECT doc_id, unnest(generate_series(pos, pos + {_DUP_N - 1})) AS cp
    FROM grams WHERE g IN (SELECT g FROM dupg)
  )
),
kept AS (
  SELECT tt.doc_id, tt.pos, tt.tok FROM toks tt
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c WHERE c.doc_id = tt.doc_id AND c.cp = tt.pos
  )
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT tk.doc_id,
       CAST(len(tk.tk) AS BIGINT) AS n_tokens,
       CAST(len(tk.tk) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM tk LEFT JOIN agg USING (doc_id)
"""

QUERIES["d_dup_remove"] = (d_dup_remove, D_DUP_REMOVE_SQL)


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Espirakis A-ES)


def d_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 weighted sample per language, weight = n_chars: longer
    docs are proportionally likelier, yet the draw is a pure function
    of (seed, doc_id) — both engines re-derive the identical sample."""
    d = t(spark, sf, "documents")
    return SP.weighted_sample(
        d, "doc_id", "n_chars", 20, strata_col="lang", seed="ws"
    ).select("doc_id", "lang", "n_chars")


_U60 = float(1 << 60)

D_SAMPLE_WEIGHTED_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ln((CAST(concat('0x', substring(md5(concat('ws', ':',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1)
            / {_U60!r}) / n_chars AS es
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY es DESC, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rk <= 20
"""

QUERIES["d_sample_weighted"] = (d_sample_weighted, D_SAMPLE_WEIGHTED_SQL)


# --------------------------------------------------------------------------
# Benchmark decontamination (eval-set n-gram overlap)

_DC_N = 4  # gram length; docs are ~50 tokens, eval snippets are full docs


def d_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Contaminated docs vs a synthetic benchmark (docs with
    doc_id % 41 == 0 stand in for the eval set): per-doc distinct-gram
    and benchmark-hit counts for every doc with >= 1 hit. The bench
    members themselves are fully contaminated by construction, and any
    doc sharing a 4-gram with them is flagged — the published n-gram
    collision decontamination test, value-exact on both engines."""
    d = t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0)
    return (
        DC.contamination(d, bench, n=_DC_N)
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


def _decontam_sql() -> str:
    grams = _sql_shingles("tk", _DC_N)
    return f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) AS g
  FROM (SELECT doc_id, unnest({grams}) AS g FROM tk)
),
bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 41 = 0
),
tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM grams
  WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits
FROM tk t
LEFT JOIN tot USING (doc_id)
LEFT JOIN hits USING (doc_id)
WHERE coalesce(hits.n_hits, 0) > 0
ORDER BY t.doc_id
"""


QUERIES["d_decontaminate"] = (d_decontaminate, _decontam_sql())


# --------------------------------------------------------------------------
# Corpus-trained n-gram LM scoring (CCNet-style quality signal)

_LM_K = 2


def d_text_lm_common(spark: SparkSession, sf: str) -> DataFrame:
    """Train a bigram count model on the whole corpus, score every doc:
    (n_grams, freq_sum, freq_min) — total corpus mass of the doc's
    bigrams and its rarest bigram's count. Integer-exact LM commonness
    (the log-prob variant is float and unit-tested instead)."""
    d = t(spark, sf, "documents")
    model = LM.ngram_model(d, k=_LM_K)
    return LM.doc_gram_frequency(d, model, k=_LM_K).orderBy("doc_id")


D_TEXT_LM_COMMON_SQL = f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(tk) - {_LM_K - 1}, 0)),
             i -> array_to_string(list_slice(tk, i, i + {_LM_K - 1}), ' ')
           )) AS g
    FROM tk
  )
),
model AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
scored AS (
  SELECT grams.doc_id, model.c FROM grams JOIN model USING (g)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_grams, sum(c) AS freq_sum, min(c) AS freq_min
  FROM scored GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.freq_sum, 0) AS BIGINT) AS freq_sum,
       CAST(coalesce(p.freq_min, 0) AS BIGINT) AS freq_min
FROM tk t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""

QUERIES["d_text_lm_common"] = (d_text_lm_common, D_TEXT_LM_COMMON_SQL)


# --------------------------------------------------------------------------
# Hashed-feature linear classifier — corpus/classifier.py. Fit on a
# deterministic train split (doc_id % 3 != 0) with label lang='en',
# score EVERY document (train + held-out); weights and scores are
# integer permille so the whole fit→score pipeline is value-exact on
# both engines.

_CLF_BUCKETS = 4096


def d_text_classifier(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.classifier import (
        classifier_fit,
        classifier_score,
    )

    d = t(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % 3 != 0).withColumn(
        "is_en", F.col("lang") == "en"
    )
    model = classifier_fit(train, "is_en", n_buckets=_CLF_BUCKETS)
    return classifier_score(d, model, n_buckets=_CLF_BUCKETS)


D_TEXT_CLASSIFIER_SQL = f"""
WITH feats AS (
  SELECT doc_id, lang = 'en' AS y,
         CAST(concat('0x', substring(md5(concat('feat|', tok)), 1, 15))
              AS BIGINT) % {_CLF_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest({SQL_TOKS}) AS tok FROM documents)
),
model AS (
  SELECT bucket,
         (1000 * sum(CASE WHEN y THEN 1 ELSE 0 END)) // count(*) AS w
  FROM feats WHERE doc_id % 3 <> 0 GROUP BY bucket
),
scored AS (
  SELECT f.doc_id, count(*) AS n_feats,
         sum(coalesce(m.w, 500)) // count(*) AS score
  FROM feats f LEFT JOIN model m USING (bucket)
  GROUP BY f.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(coalesce(s.score, 500) AS BIGINT) AS score_permille,
       coalesce(s.score, 500) >= 500 AS predicted
FROM documents d LEFT JOIN scored s USING (doc_id)
"""

QUERIES["d_text_classifier"] = (d_text_classifier, D_TEXT_CLASSIFIER_SQL)


# --------------------------------------------------------------------------
# Per-source boilerplate segment removal (CCNet-style line dedup adapted
# to k-token segments). seg_len=1 here so the oracle is non-vacuous on
# the synthetic token-bag corpus (common vocabulary words cross the 85%
# per-source share threshold, rare ones don't); the multi-token segment
# path incl. the trailing partial segment is pinned by unit tests with
# planted boilerplate. text_md5 hashes the full rebuilt text per source
# — the oracle verifies the REBUILT documents byte-for-byte, not just
# the counters.

_BP_LEN, _BP_MIN_DOCS, _BP_SHARE = 1, 3, 850


def d_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus import boilerplate as BP

    d = t(spark, sf, "documents")
    stripped = BP.strip_boilerplate(
        d, seg_len=_BP_LEN, min_docs=_BP_MIN_DOCS, share_permille=_BP_SHARE
    )
    by_doc = F.array_sort(F.collect_list(F.struct("doc_id", "text")))
    return stripped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_boiler_segs") > 0).cast("long")).alias("docs_affected"),
        F.sum("n_segs").alias("segs_total"),
        F.sum("n_boiler_segs").alias("segs_removed"),
        F.md5(
            F.array_join(F.transform(by_doc, lambda s: s["text"]), "\x01")
        ).alias("text_md5"),
    )


D_BOILERPLATE_SQL = f"""
WITH base AS (SELECT source, doc_id, {SQL_TOKS} AS tk FROM documents),
segd AS (
  SELECT source, doc_id,
         CASE WHEN len(tk) >= 1 THEN list_transform(
           generate_series(1, (len(tk) + {_BP_LEN - 1}) // {_BP_LEN}),
           i -> array_to_string(
                  list_slice(tk, (i-1)*{_BP_LEN}+1, i*{_BP_LEN}), ' '))
         ELSE [] END AS segs
  FROM base
),
pairs AS (
  SELECT source, doc_id,
         unnest(generate_series(1, len(segs))) - 1 AS seg_idx,
         unnest(segs) AS seg
  FROM segd
),
hashed AS (
  SELECT source, doc_id, seg_idx, seg,
         CAST(concat('0x', substring(md5(seg), 1, 15)) AS BIGINT) AS h
  FROM pairs
),
nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM documents
       GROUP BY source),
boiler AS (
  SELECT df.source, df.h
  FROM (SELECT source, h, count(DISTINCT doc_id) AS dfd
        FROM hashed GROUP BY source, h) df
  JOIN nd USING (source)
  WHERE dfd >= {_BP_MIN_DOCS} AND dfd * 1000 >= n_docs * {_BP_SHARE}
),
rebuilt AS (
  SELECT p.source, p.doc_id,
         count(*) AS n_segs,
         sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler,
         coalesce(array_to_string(
           list(p.seg ORDER BY p.seg_idx) FILTER (WHERE b.h IS NULL), ' '),
           '') AS text2
  FROM hashed p
  LEFT JOIN boiler b ON b.source = p.source AND b.h = p.h
  GROUP BY p.source, p.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_boiler > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(sum(n_segs) AS BIGINT) AS segs_total,
       CAST(sum(n_boiler) AS BIGINT) AS segs_removed,
       md5(string_agg(text2, chr(1) ORDER BY doc_id)) AS text_md5
FROM rebuilt GROUP BY source
"""

QUERIES["d_boilerplate"] = (d_boilerplate, D_BOILERPLATE_SQL)


# --------------------------------------------------------------------------
# Inverted index + BM25-shaped ranked retrieval (corpus/index.py). The
# scoring arithmetic is frozen integer permille (probabilistic idf ×
# saturating length-normalized tf) so both engines produce identical
# scores; top-k is deterministic via (score desc, doc_id).

_BM25_TERMS = ["customer", "window", "spark"]
_BM25_TOPK = 50


def d_index_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Full term dictionary with df/cf and each term's strongest posting
    (max tf, doc_id tie-break) — the inverted-index build, value-exact."""
    from who_focus_crawler_spark.corpus import index as IX

    post = IX.postings(t(spark, sf, "documents"))
    best = F.min(
        F.struct((-F.col("tf")).alias("a"), F.col("doc_id").alias("b"))
    )
    return post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs"),
        F.sum("tf").cast("long").alias("cf"),
        (-best["a"]).cast("long").alias("best_tf"),
        best["b"].cast("long").alias("best_doc"),
    )


D_INDEX_POSTINGS_SQL = f"""
WITH post AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)
  GROUP BY term, doc_id
),
agg AS (
  SELECT term, count(*) AS df_docs, sum(tf) AS cf FROM post GROUP BY term
),
best AS (
  SELECT term, min(struct_pack(a := -tf, b := doc_id)) AS m
  FROM post GROUP BY term
)
SELECT a.term, CAST(a.df_docs AS BIGINT) AS df_docs,
       CAST(a.cf AS BIGINT) AS cf,
       CAST(-b.m.a AS BIGINT) AS best_tf,
       CAST(b.m.b AS BIGINT) AS best_doc
FROM agg a JOIN best b USING (term)
"""

QUERIES["d_index_postings"] = (d_index_postings, D_INDEX_POSTINGS_SQL)


def d_text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 docs for a 3-term query under the frozen integer BM25."""
    from who_focus_crawler_spark.corpus import index as IX

    scored = IX.bm25_scores(t(spark, sf, "documents"), _BM25_TERMS)
    return scored.orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    ).limit(_BM25_TOPK)


_BM25_IN = ", ".join(f"'{w}'" for w in _BM25_TERMS)
from who_focus_crawler_spark.corpus.index import B_MILLI as _B  # noqa: E402
from who_focus_crawler_spark.corpus.index import K1_MILLI as _K1  # noqa: E402

D_TEXT_BM25_SQL = f"""
WITH dl AS (SELECT doc_id, len({SQL_TOKS}) AS dl FROM documents),
corpus AS (
  SELECT count(*) AS n, sum(dl) AS sdl,
         (1000 * sum(dl)) // count(*) AS avgdl_milli
  FROM dl
),
post AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)
  WHERE term IN ({_BM25_IN})
  GROUP BY term, doc_id
),
idf AS (
  SELECT term,
         (1000 * (c.n - df_docs) + 500) // (df_docs + 1) + 1000 AS idf_milli
  FROM (SELECT term, count(*) AS df_docs FROM post GROUP BY term)
  CROSS JOIN corpus c
),
scored AS (
  SELECT p.doc_id,
         i.idf_milli *
           ((1000 * p.tf * ({_K1} + 1000)) //
            (1000 * p.tf + ({_K1} *
              (1000 - {_B} + ({_B} * ((1000000 * dl.dl) // c.avgdl_milli))
                 // 1000)) // 1000))
           // 1000 AS contrib
  FROM post p
  JOIN idf i USING (term)
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN corpus c
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum(contrib) AS BIGINT) AS score_milli
FROM scored GROUP BY doc_id
ORDER BY score_milli DESC, doc_id
LIMIT {_BM25_TOPK}
"""

QUERIES["d_text_bm25"] = (d_text_bm25, D_TEXT_BM25_SQL)


# --------------------------------------------------------------------------
# Sequence packing / shard assignment (corpus/packing.py). The oracle is
# the naive per-source window prefix sum — the two-phase distributed
# prefix sum must reproduce it value-for-value, per doc AND per pack.

_PACK_CAP = 600


def d_pack_assign(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus import packing as PK

    d = t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(X.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    packed = PK.pack_assign(d, capacity=_PACK_CAP)
    stats = PK.pack_stats(packed, capacity=_PACK_CAP).withColumnRenamed(
        "n_tokens", "pack_tokens"
    )
    return packed.join(stats, ["source", "pack_id"]).select(
        "doc_id",
        "source",
        "n_tokens",
        "pack_id",
        "pack_offset",
        "n_docs",
        "pack_tokens",
        "fill_permille",
        "straddles",
    )


D_PACK_ASSIGN_SQL = f"""
WITH d AS (
  SELECT doc_id, source, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
         {_sql_bucket('pack', 'doc_id')} AS prio
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source
              ORDER BY prio, doc_id ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS cum
  FROM d
),
packed AS (
  SELECT doc_id, source, n_tokens,
         (cum - n_tokens) // {_PACK_CAP} AS pack_id,
         (cum - n_tokens) % {_PACK_CAP} AS pack_offset
  FROM c
),
stats AS (
  SELECT source, pack_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         CAST((1000 * sum(n_tokens)) // {_PACK_CAP} AS BIGINT)
           AS fill_permille,
         max(pack_offset + n_tokens > {_PACK_CAP}) AS straddles
  FROM packed GROUP BY source, pack_id
)
SELECT p.doc_id, p.source, p.n_tokens,
       CAST(p.pack_id AS BIGINT) AS pack_id,
       CAST(p.pack_offset AS BIGINT) AS pack_offset,
       s.n_docs, s.pack_tokens, s.fill_permille, s.straddles
FROM packed p JOIN stats s USING (source, pack_id)
"""

QUERIES["d_pack_assign"] = (d_pack_assign, D_PACK_ASSIGN_SQL)


# --------------------------------------------------------------------------
# Deterministic epoch shuffle (corpus/sampling.py::epoch_order): the data
# loader's per-epoch global permutation — shard + in-shard position as a
# pure function of (seed, epoch, doc_id). The oracle reproduces the md5
# order key and ranks with a plain window; the engine runs the two-phase
# distributed sequencer — value equality proves the distributed rank
# reproduces the naive total order exactly.


def _sql_epoch_key(seed: str, epoch: int, key: str) -> str:
    return (
        f"CAST(concat('0x', substring(md5(concat('{seed}', ':', '{epoch}', "
        f"':', CAST({key} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


def d_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return SP.epoch_order(d, "doc_id", epoch=3, n_shards=8, seed="ep").select(
        "doc_id", "shard", "pos"
    )


D_EPOCH_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, {_sql_epoch_key('ep', 3, 'doc_id')} AS okey
  FROM documents
)
SELECT doc_id, CAST(okey % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY okey % 8 ORDER BY okey, doc_id)
            - 1 AS BIGINT) AS pos
FROM keyed
"""

QUERIES["d_epoch_shuffle"] = (d_epoch_shuffle, D_EPOCH_SHUFFLE_SQL)


# --------------------------------------------------------------------------
# Positional phrase search (corpus/index.py): the engine answers via the
# real positional-postings machinery (term-filtered index scan → doc_id
# joins → native position-array intersection); the oracle counts phrase
# starts with a direct sliding-window check over the token list —
# independent derivations, identical values.

from who_focus_crawler_spark.corpus import index as IDX


def d_index_phrase(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    p2 = IDX.phrase_search(d, "table value").select(
        F.lit("table value").alias("phrase"), "doc_id", "n_hits"
    )
    p3 = IDX.phrase_search(d, "value table part").select(
        F.lit("value table part").alias("phrase"), "doc_id", "n_hits"
    )
    return p2.unionByName(p3)


def _phrase_sql(phrase: str) -> str:
    terms = phrase.split()
    conds = " AND ".join(
        f"tk[s + {i}] = '{t}'" for i, t in enumerate(terms)
    )
    return f"""
SELECT * FROM (
  SELECT '{phrase}' AS phrase, doc_id,
         CAST(len(list_filter(generate_series(1, len(tk) - {len(terms) - 1}),
                              s -> {conds})) AS BIGINT) AS n_hits
  FROM (SELECT doc_id, {SQL_TOKS} AS tk FROM documents)
  WHERE len(tk) >= {len(terms)}
) WHERE n_hits > 0
"""


D_INDEX_PHRASE_SQL = (
    "SELECT * FROM ("
    + _phrase_sql("table value")
    + ") UNION ALL SELECT * FROM ("
    + _phrase_sql("value table part")
    + ")"
)

QUERIES["d_index_phrase"] = (d_index_phrase, D_INDEX_PHRASE_SQL)


# --------------------------------------------------------------------------
# Proximity retrieval: smallest token window covering all query terms
# (Clarke et al. 2000), plane-sweep window functions — value-exact.

_PROX_TERMS = ["table", "scan", "window"]


def d_index_proximity(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus import index as IX

    return IX.min_window_span(t(spark, sf, "documents"), _PROX_TERMS)


def _proximity_sql() -> str:
    ts = ", ".join(f"'{x}'" for x in _PROX_TERMS)
    ms = ", ".join(f"m{i}" for i in range(len(_PROX_TERMS)))
    conds = " AND ".join(
        f"m{i} IS NOT NULL" for i in range(len(_PROX_TERMS))
    )
    lasts = "\n".join(
        f"         max(CASE WHEN term = '{x}' THEN pos END) OVER w AS m{i},"
        for i, x in enumerate(_PROX_TERMS)
    )
    return f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS term
  FROM tk, LATERAL unnest(generate_series(1, len(tk))) AS u(i)
  WHERE tk[i] IN ({ts})
),
cand AS (
  SELECT doc_id, pos,
{lasts}
         pos AS _p
  FROM occ
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
),
sc AS (
  SELECT doc_id,
         CAST(pos - least({ms}) + 1 AS BIGINT) AS win,
         CAST(least({ms}) AS BIGINT) AS ws,
         CAST(pos AS BIGINT) AS we
  FROM cand WHERE {conds}
)
SELECT doc_id, win AS "window", ws AS win_start, we AS win_end
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY win, ws, we) AS rn
  FROM sc
) WHERE rn = 1
"""


QUERIES["d_index_proximity"] = (d_index_proximity, _proximity_sql())
