"""Training-data corpus queries (d-series) with DuckDB oracle SQL:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force + LSH ANN), text analysis (lang-ID, quality, tokens,
fingerprint), multimodal plumbing.

Hash parity: every pseudo-random quantity is md5-derived with an
identical construction on both engines (corpus/text.py conventions), so
the oracle checks VALUES, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus import dedup as D
from who_focus_crawler_spark.corpus import multimodal as MM
from who_focus_crawler_spark.corpus import similarity as S
from who_focus_crawler_spark.corpus import text as X
from who_focus_crawler_spark.harness.util import t

# Shared SQL fragments (frozen tokenizer / shingler, corpus/text.py)
SQL_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _sql_shingles(tk: str, k: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({tk}) - {k - 1}, 0)), "
        f"i -> array_to_string(list_slice({tk}, i, i + {k - 1}), ' ')))"
    )


# --------------------------------------------------------------------------
# Exact dedup


def d_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup summary: corpus size, distinct size, dup count."""
    d = t(spark, sf, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dupes"),
    )


D_DEDUP_EXACT_SQL = """
SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
       count(*) - count(DISTINCT md5(text)) AS n_dupes
FROM documents
"""


def d_dedup_head(spark: SparkSession, sf: str) -> DataFrame:
    """Head-fingerprint clusters (first 2 tokens): the hash-groupBy dedup
    mechanics with guaranteed non-trivial clusters on this corpus."""
    d = t(spark, sf, "documents")
    head = F.md5(F.array_join(F.slice(X.tokens(F.col("text")), 1, 2), " "))
    return (
        d.select(head.alias("head_hash"), "doc_id")
        .groupBy("head_hash")
        .agg(F.count("*").alias("cluster_size"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("cluster_size") > 1)
    )


D_DEDUP_HEAD_SQL = f"""
SELECT head_hash, count(*) AS cluster_size, min(doc_id) AS keep_id
FROM (
  SELECT md5(array_to_string(list_slice({SQL_TOKS}, 1, 2), ' ')) AS head_hash,
         doc_id
  FROM documents
) GROUP BY head_hash HAVING count(*) > 1
"""

# --------------------------------------------------------------------------
# n-gram Jaccard (adjacent pairs — the shingle/Jaccard core, value-checked)


def d_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_jaccard_adjacent(t(spark, sf, "documents"), k=3).filter(
        F.col("jaccard") > 0
    )


D_NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(SQL_TOKS, 3)} AS s FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE /
             greatest(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1),
             6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
WHERE len(list_intersect(a.s, b.s)) > 0
"""

# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs (8 hashes, 8 bands of 1 row, verify j >= 0.3)

_MH_HASHES, _MH_BANDS, _MH_K, _MH_THRESH = 8, 8, 3, 0.3


def d_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        t(spark, sf, "documents"),
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        shingle_k=_MH_K,
        jaccard_threshold=_MH_THRESH,
    )


D_DEDUP_MINHASH_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(SQL_TOKS, _MH_K)} AS s FROM documents
), sigs AS (
  SELECT doc_id, s,
         list_transform(generate_series(0, {_MH_HASHES - 1}), h ->
           list_aggregate(
             list_transform(s, g ->
               CAST(concat('0x', substring(
                 md5(concat(CAST(h AS VARCHAR), '|', g)), 1, 15)) AS BIGINT)),
             'min')) AS sig
  FROM sh
), banded AS (
  SELECT doc_id, s, u.band AS band, u.key AS key
  FROM (
    SELECT doc_id, s,
           unnest(list_transform(sig, (x, i) ->
             struct_pack(band := i, key := md5(CAST(x AS VARCHAR))))) AS u
    FROM sigs
  )
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa, sb))::DOUBLE /
             greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1),
             6) AS jaccard
FROM cand
WHERE round(len(list_intersect(sa, sb))::DOUBLE /
            greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1),
            6) >= {_MH_THRESH}
"""

# --------------------------------------------------------------------------
# Incremental MinHash near-dup: pairs a NEW batch introduces against the
# persisted signature index (new×old ∪ new×new, never old×old). The
# new/old split is a deterministic md5 tag so both engines agree; the
# oracle derives the same set from the full pair relation restricted to
# "at least one side new".

_INC_PRED = "substring(md5(concat('inc|', doc_id)), 1, 1) < '3'"


def d_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    tag = F.substring(F.md5(F.concat(F.lit("inc|"), F.col("doc_id"))), 1, 1)
    new_idx = D.minhash_index(
        docs.filter(tag < "3"), num_hashes=_MH_HASHES, shingle_k=_MH_K
    )
    old_idx = D.minhash_index(
        docs.filter(~(tag < "3")), num_hashes=_MH_HASHES, shingle_k=_MH_K
    )
    return D.minhash_lsh_pairs_incremental(
        new_idx, old_idx, bands=_MH_BANDS, jaccard_threshold=_MH_THRESH
    )


D_DEDUP_INCREMENTAL_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_INC_PRED} AS is_new,
         {_sql_shingles(SQL_TOKS, _MH_K)} AS s
  FROM documents
), sigs AS (
  SELECT doc_id, is_new, s,
         list_transform(generate_series(0, {_MH_HASHES - 1}), h ->
           list_aggregate(
             list_transform(s, g ->
               CAST(concat('0x', substring(
                 md5(concat(CAST(h AS VARCHAR), '|', g)), 1, 15)) AS BIGINT)),
             'min')) AS sig
  FROM sh
), banded AS (
  SELECT doc_id, is_new, s, u.band AS band, u.key AS key
  FROM (
    SELECT doc_id, is_new, s,
           unnest(list_transform(sig, (x, i) ->
             struct_pack(band := i, key := md5(CAST(x AS VARCHAR))))) AS u
    FROM sigs
  )
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  WHERE a.is_new OR b.is_new
)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa, sb))::DOUBLE /
             greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1),
             6) AS jaccard
FROM cand
WHERE round(len(list_intersect(sa, sb))::DOUBLE /
            greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1),
            6) >= {_MH_THRESH}
"""


# --------------------------------------------------------------------------
# SimHash near-dup pairs (64-bit, 4 × 16-bit bands, Hamming <= 3 complete)


def d_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return D.simhash_pairs(t(spark, sf, "documents"), max_hamming=3)


# DuckDB twin of corpus/dedup.py simhash64_bands: bit j (0..63) of a
# token = bit (j mod 4) of hex digit (j div 4) of md5(token); doc bit j
# = sign of the (2*bit - 1) sum; band k packs bits 16k..16k+15; pairs
# form inside equal (band, key) buckets; hamming over the 4-band xor.
D_DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), counters AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), j ->
           coalesce(list_aggregate(list_transform(tk, t ->
             CASE WHEN (CAST(concat('0x', substring(md5(t), (j // 4) + 1, 1))
                             AS INTEGER)
                        // CAST(pow(2, j % 4) AS INTEGER)) % 2 = 1
                  THEN 1 ELSE -1 END), 'sum'), 0)) AS cnt
  FROM toks
), bands AS (
  SELECT doc_id,
         list_transform(generate_series(0, 3), k ->
           list_aggregate(list_transform(generate_series(0, 15), i ->
             CASE WHEN cnt[k * 16 + i + 1] > 0
                  THEN CAST(pow(2, i) AS INTEGER) ELSE 0 END), 'sum')) AS b
  FROM counters
), banded AS (
  SELECT doc_id, b, u.band AS band, u.key AS key
  FROM (
    SELECT doc_id, b,
           unnest(list_transform(b, (x, i) ->
             struct_pack(band := i, key := x))) AS u
    FROM bands
  )
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.b AS ba, b.b AS bb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
          + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4]))
          AS INTEGER) AS hamming
FROM pairs
WHERE bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
    + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4])) <= 3
"""

# --------------------------------------------------------------------------
# Similarity search


def d_sim_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    return S.brute_force_topk(t(spark, sf, "embeddings"), query_vec_id=0, k=10)


D_SIM_COSINE_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(
         list_aggregate(list_transform(embedding,
           (x, i) -> x::DOUBLE * qv[i]::DOUBLE), 'sum')
         / greatest(
             sqrt(list_aggregate(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE), 'sum')) *
             sqrt(list_aggregate(list_transform(qv,
               x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12),
         6) AS cosine_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""

_ANN_PLANES = 4


def d_sim_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return S.lsh_topk(
        t(spark, sf, "embeddings"), query_vec_id=0, k=10, nplanes=_ANN_PLANES
    )


def _sig_sql(nplanes: int) -> str:
    # one projection term per hyperplane; sign(p, d) md5-derived, d 0-based
    projs = []
    for p in range(nplanes):
        sign = (
            f"(CASE WHEN CAST(concat('0x', substring(md5(concat('{p}', ':', "
            f"CAST(i - 1 AS VARCHAR))), 1, 1)) AS INTEGER) >= 8 "
            f"THEN 1.0 ELSE -1.0 END)"
        )
        proj = (
            f"list_aggregate(list_transform(embedding, (x, i) -> "
            f"x::DOUBLE * {sign}), 'sum')"
        )
        projs.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(projs)


def _ann_sql() -> str:
    sig = _sig_sql(_ANN_PLANES)
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS sig FROM embeddings
), q AS (
  SELECT embedding AS qv, sig AS qsig FROM sigs WHERE vec_id = 0
)
SELECT vec_id,
       round(
         list_aggregate(list_transform(embedding,
           (x, i) -> x::DOUBLE * qv[i]::DOUBLE), 'sum')
         / greatest(
             sqrt(list_aggregate(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE), 'sum')) *
             sqrt(list_aggregate(list_transform(qv,
               x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12),
         6) AS cosine_sim
FROM sigs, q
WHERE vec_id <> 0 AND sig = qsig
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


# --------------------------------------------------------------------------
# Text analysis


def d_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    toks = X.tokens(F.col("text"))
    n = F.size(toks).cast("long")
    nu = F.size(F.array_distinct(toks)).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        nu.alias("n_unique"),
        F.round(nu.cast("double") / F.greatest(n, F.lit(1)), 6).alias("ttr"),
    )


D_TEXT_TOKENS_SQL = f"""
SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tk)) AS BIGINT) AS n_unique,
       round(len(list_distinct(tk))::DOUBLE / greatest(len(tk), 1), 6) AS ttr
FROM (SELECT doc_id, {SQL_TOKS} AS tk FROM documents)
"""


def d_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    toks = X.tokens(F.col("text"))
    scores = X.lang_scores(toks)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.predict_lang(toks).alias("pred_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(scores)],
    )


def _langid_sql() -> str:
    score = {
        lang: (
            "CAST(len(list_filter(tk, x -> x IN ("
            + ", ".join(f"'{m}'" for m in markers)
            + "))) AS BIGINT)"
        )
        for lang, markers in X.LANG_MARKERS.items()
    }
    return f"""
SELECT doc_id, labeled_lang,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       s_de AS score_de, s_en AS score_en, s_es AS score_es, s_fr AS score_fr
FROM (
  SELECT doc_id, lang AS labeled_lang,
         {score['de']} AS s_de, {score['en']} AS s_en,
         {score['es']} AS s_es, {score['fr']} AS s_fr
  FROM (SELECT doc_id, lang, {SQL_TOKS} AS tk FROM documents)
)
"""


def d_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    feats = X.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
        X.quality_score(F.col("text")).alias("quality"),
    )


_SW = ", ".join(f"'{w}'" for w in X.QUALITY_STOPWORDS)
D_TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       punct_ratio, stopword_ratio,
       round(CASE WHEN n_tokens > 0
                  THEN tok_len_sum::DOUBLE / n_tokens ELSE 0.0 END, 6)
         AS mean_token_len,
       CAST(least(n_tokens, 100) * 5
            + least((n_stop * 1500) // greatest(n_tokens, 1), 300)
            + greatest(200 - (n_punct * 2000) // greatest(n_chars, 1), 0)
            AS BIGINT) AS quality
FROM (
  SELECT doc_id, length(text) AS n_chars, len(tk) AS n_tokens,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
         len(list_filter(tk, x -> x IN ({_SW}))) AS n_stop,
         round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(tk, x -> x IN ({_SW})))::DOUBLE
               / greatest(len(tk), 1), 6) AS stopword_ratio,
         list_aggregate(list_transform(tk, x -> strlen(x)), 'sum')
           AS tok_len_sum
  FROM (SELECT doc_id, text, {SQL_TOKS} AS tk FROM documents)
)
"""


def d_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        X.fingerprint(X.tokens(F.col("text")), k=4).alias("fingerprint"),
    )


D_TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_aggregate(list_transform({_sql_shingles(SQL_TOKS, 4)},
         g -> md5(g)), 'min') AS fingerprint
FROM documents
"""

# --------------------------------------------------------------------------
# Multimodal plumbing


def d_media_meta(spark: SparkSession, sf: str) -> DataFrame:
    media = MM.attach_media(t(spark, sf, "documents"))
    return media.select("media_id", "kind", "byte_len", "meta_json")


D_MEDIA_META_SQL = """
SELECT concat('m', CAST(doc_id AS VARCHAR)) AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       concat('{"src_doc":', CAST(doc_id AS VARCHAR),
              ',"n":', CAST(length(text) AS VARCHAR), '}') AS meta_json
FROM documents
"""


def d_media_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling through the mapInPandas decode stub (fake decoder —
    no codecs in this container). Value-exact oracle: the fake feature is
    integer byte statistics of payload slices, which DuckDB reproduces
    byte-for-byte on this ASCII corpus (f1 = sum(chunk bytes) mod 251)."""
    media = MM.attach_media(t(spark, sf, "documents"))
    frames = MM.decode_media(media, frames_per_item=3, fake=True)
    return frames.select(
        "media_id",
        "frame_idx",
        F.round(F.element_at("feature", 2).cast("double"), 2).alias("f1"),
    )


# chunk i (i=0..2) of the utf-8 payload, step = max(byte_len // 3, 1);
# empty chunk (never on this corpus — no sub-3-char docs) → b"\\x00" → 0
D_MEDIA_FRAMES_SQL = """
WITH m AS (
  SELECT concat('m', CAST(doc_id AS VARCHAR)) AS media_id, text,
         greatest(octet_length(CAST(text AS BLOB)) // 3, 1) AS step
  FROM documents
), fr AS (
  SELECT media_id,
         CAST(unnest(generate_series(0, 2)) AS INTEGER) AS frame_idx,
         text, step
  FROM m
), ch AS (
  SELECT media_id, frame_idx,
         substring(text, frame_idx * step + 1, step) AS chunk
  FROM fr
)
SELECT media_id, frame_idx,
       round(CASE WHEN length(chunk) = 0 THEN 0.0
                  ELSE (list_aggregate(list_transform(
                          generate_series(1, length(chunk)),
                          j -> ascii(substring(chunk, j, 1))), 'sum')
                        % 251)::DOUBLE END, 2) AS f1
FROM ch
"""


# --------------------------------------------------------------------------
# Scene-cut detection over the fake-decoded frame features (integer byte
# statistics — engine-portable): cut where |Δf1| ≥ threshold between
# consecutive sampled frames; scene_id = running cut count per media.

_SCENE_THRESHOLD = 60


def d_media_scenes(spark: SparkSession, sf: str) -> DataFrame:
    media = MM.attach_media(t(spark, sf, "documents"))
    frames = MM.decode_media(media, frames_per_item=3, fake=True).select(
        "media_id",
        "frame_idx",
        F.element_at("feature", 2).cast("long").alias("f1"),
    )
    return MM.scene_cuts(frames, _SCENE_THRESHOLD, feat_col="f1")


D_MEDIA_SCENES_SQL = f"""
WITH m AS (
  SELECT concat('m', CAST(doc_id AS VARCHAR)) AS media_id, text,
         greatest(octet_length(CAST(text AS BLOB)) // 3, 1) AS step
  FROM documents
), fr AS (
  SELECT media_id,
         CAST(unnest(generate_series(0, 2)) AS INTEGER) AS frame_idx,
         text, step
  FROM m
), ch AS (
  SELECT media_id, frame_idx,
         substring(text, frame_idx * step + 1, step) AS chunk
  FROM fr
), f AS (
  SELECT media_id, frame_idx,
         CAST(CASE WHEN length(chunk) = 0 THEN 0
              ELSE list_aggregate(list_transform(
                     generate_series(1, length(chunk)),
                     j -> ascii(substring(chunk, j, 1))), 'sum') % 251
         END AS BIGINT) AS f1
  FROM ch
), cut AS (
  SELECT media_id, frame_idx, f1,
         CASE WHEN lag(f1) OVER w IS NULL THEN FALSE
              ELSE abs(f1 - lag(f1) OVER w) >= {_SCENE_THRESHOLD} END AS is_cut
  FROM f
  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
)
SELECT media_id, frame_idx, f1, is_cut,
       CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (
         PARTITION BY media_id ORDER BY frame_idx
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
FROM cut
"""


QUERIES = {
    "d_dedup_exact": (d_dedup_exact, D_DEDUP_EXACT_SQL),
    "d_media_scenes": (d_media_scenes, D_MEDIA_SCENES_SQL),
    "d_dedup_head": (d_dedup_head, D_DEDUP_HEAD_SQL),
    "d_ngram_jaccard": (d_ngram_jaccard, D_NGRAM_JACCARD_SQL),
    "d_dedup_minhash": (d_dedup_minhash, D_DEDUP_MINHASH_SQL),
    "d_dedup_incremental": (d_dedup_incremental, D_DEDUP_INCREMENTAL_SQL),
    "d_dedup_simhash": (d_dedup_simhash, D_DEDUP_SIMHASH_SQL),
    "d_sim_cosine_topk": (d_sim_cosine_topk, D_SIM_COSINE_TOPK_SQL),
    "d_sim_ann_lsh": (d_sim_ann_lsh, _ann_sql()),
    "d_text_tokens": (d_text_tokens, D_TEXT_TOKENS_SQL),
    "d_text_langid": (d_text_langid, _langid_sql()),
    "d_text_quality": (d_text_quality, D_TEXT_QUALITY_SQL),
    "d_text_fingerprint": (d_text_fingerprint, D_TEXT_FINGERPRINT_SQL),
    "d_media_meta": (d_media_meta, D_MEDIA_META_SQL),
    "d_media_frames": (d_media_frames, D_MEDIA_FRAMES_SQL),
}


# --------------------------------------------------------------------------
# Interleaved-document span surface (BASELINE.json input_hint table shape):
# build spans array<struct<kind,text,media_ref,offset>> deterministically
# from each document's tokens, then compute per-doc span statistics.


def d_spans_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    toks9 = F.slice(X.tokens(F.col("text")), 1, 9)
    spans = F.transform(
        toks9,
        lambda tok, i: F.struct(
            F.when((i + 1) % 3 == 0, F.lit("link"))
            .when((i + 1) % 2 == 0, F.lit("media"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.when((i + 1) % 3 != 0, F.when((i + 1) % 2 != 0, tok)).alias("text"),
            F.when(
                ((i + 1) % 3 == 0) | ((i + 1) % 2 == 0),
                F.concat(F.lit("m://"), tok),
            ).alias("media_ref"),
            (i * 7).cast("int").alias("offset"),
        ),
    )
    return d.select(
        "doc_id",
        F.size(spans).cast("long").alias("n_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] == F.lit("text")))
        .cast("long")
        .alias("n_text"),
        F.size(F.filter(spans, lambda s: s["kind"] == F.lit("media")))
        .cast("long")
        .alias("n_media"),
        F.size(F.filter(spans, lambda s: s["kind"] == F.lit("link")))
        .cast("long")
        .alias("n_link"),
        F.coalesce(
            F.array_max(F.transform(spans, lambda s: s["offset"])), F.lit(0)
        )
        .cast("long")
        .alias("max_offset"),
    )


D_SPANS_STATS_SQL = f"""
WITH spans AS (
  SELECT doc_id,
         list_transform(list_slice({SQL_TOKS}, 1, 9), (tok, i) ->
           struct_pack(
             kind := CASE WHEN i % 3 = 0 THEN 'link'
                          WHEN i % 2 = 0 THEN 'media'
                          ELSE 'text' END,
             off := (i - 1) * 7)) AS sp
  FROM documents
)
SELECT doc_id,
       CAST(len(sp) AS BIGINT) AS n_spans,
       CAST(len(list_filter(sp, s -> s.kind = 'text')) AS BIGINT) AS n_text,
       CAST(len(list_filter(sp, s -> s.kind = 'media')) AS BIGINT) AS n_media,
       CAST(len(list_filter(sp, s -> s.kind = 'link')) AS BIGINT) AS n_link,
       CAST(coalesce(list_max(list_transform(sp, s -> s.off)), 0) AS BIGINT)
         AS max_offset
FROM spans
"""

QUERIES["d_spans_stats"] = (d_spans_stats, D_SPANS_STATS_SQL)


# --------------------------------------------------------------------------
# Media-caption pair mining over the interleaved span shape
# (corpus/interleaved.py::media_caption_pairs): each media span paired
# with its nearest preceding/following text spans. Same deterministic
# span synth as d_spans_stats, extended with text/media_ref payloads.


def d_media_captions(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.interleaved import media_caption_pairs

    d = t(spark, sf, "documents")
    toks9 = F.slice(X.tokens(F.col("text")), 1, 9)
    spans = F.transform(
        toks9,
        lambda tok, i: F.struct(
            F.when((i + 1) % 3 == 0, F.lit("link"))
            .when((i + 1) % 2 == 0, F.lit("media"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.when((i + 1) % 3 != 0, F.when((i + 1) % 2 != 0, tok)).alias("text"),
            F.when(
                ((i + 1) % 3 == 0) | ((i + 1) % 2 == 0),
                F.concat(F.lit("m://"), tok),
            ).alias("media_ref"),
            (i * 7).cast("int").alias("offset"),
        ),
    )
    return media_caption_pairs(d.select("doc_id", spans.alias("spans")))


D_MEDIA_CAPTIONS_SQL = f"""
WITH spans AS (
  SELECT doc_id,
         list_transform(list_slice({SQL_TOKS}, 1, 9), (tok, i) ->
           struct_pack(
             kind := CASE WHEN i % 3 = 0 THEN 'link'
                          WHEN i % 2 = 0 THEN 'media'
                          ELSE 'text' END,
             txt := CASE WHEN i % 3 <> 0 AND i % 2 <> 0 THEN tok END,
             media_ref := CASE WHEN i % 3 = 0 OR i % 2 = 0
                               THEN 'm://' || tok END,
             off := (i - 1) * 7)) AS sp
  FROM documents
), e AS (
  SELECT doc_id, i AS idx, sp[i] AS s
  FROM spans, LATERAL unnest(generate_series(1, len(sp))) u(i)
), wn AS (
  SELECT doc_id, s,
         last_value(CASE WHEN s.kind = 'text' THEN s.txt END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS caption_before,
         first_value(CASE WHEN s.kind = 'text' THEN s.txt END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY idx
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS caption_after
  FROM e
)
SELECT doc_id, s.media_ref AS media_ref, CAST(s.off AS INTEGER) AS "offset",
       caption_before, caption_after
FROM wn WHERE s.kind = 'media'
"""

QUERIES["d_media_captions"] = (d_media_captions, D_MEDIA_CAPTIONS_SQL)


def d_text_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub: deterministic synthetic PII is appended to each doc
    (emails/phone/IP keyed off doc_id — the corpus itself has none), then
    the native redaction chain runs; the oracle reproduces counts AND the
    full redacted text (compared by md5)."""
    d = t(spark, sf, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com or +1 555-000"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
    )
    base = d.select("doc_id", pii_text.alias("pt"))
    counts = X.pii_counts(F.col("pt"))
    return base.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        F.md5(X.redact_pii(F.col("pt"))).alias("redacted_md5"),
    )


D_TEXT_PII_SQL = rf"""
WITH p AS (
  SELECT doc_id,
         concat(text, ' contact u', CAST(doc_id AS VARCHAR), '@ex',
                CAST(doc_id % 7 AS VARCHAR), '.com or +1 555-000',
                CAST(doc_id % 10 AS VARCHAR), ' from 10.0.',
                CAST(doc_id % 256 AS VARCHAR), '.',
                CAST(doc_id % 100 AS VARCHAR)) AS pt
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(pt, '{X.PII_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(pt, '{X.PII_PHONE_RE}')) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(pt, '{X.PII_IPV4_RE}')) AS BIGINT)
         AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(pt,
             '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{X.PII_PHONE_RE}', '<PHONE>', 'g'),
             '{X.PII_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM p
"""

QUERIES["d_text_pii"] = (d_text_pii, D_TEXT_PII_SQL)


def d_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filter signal: the most frequent 2-gram's
    share of all 2-grams per document."""
    d = t(spark, sf, "documents")
    stats = X.repetition_stats(F.col("text"), k=2)
    return d.select(
        "doc_id",
        stats["n_grams"].alias("n_grams"),
        stats["top_gram_count"].alias("top_gram_count"),
        stats["top_gram_frac"].alias("top_gram_frac"),
    )


D_TEXT_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 2 THEN
           list_transform(generate_series(1, len(tk) - 1),
             i -> array_to_string(list_slice(tk, i, i + 1), ' '))
         ELSE [] END AS g
  FROM toks
), counted AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
  GROUP BY doc_id, gram
)
SELECT g.doc_id,
       CAST(len(g.g) AS BIGINT) AS n_grams,
       CAST(coalesce(mx.top, 0) AS BIGINT) AS top_gram_count,
       round(coalesce(mx.top, 0)::DOUBLE / greatest(len(g.g), 1), 6)
         AS top_gram_frac
FROM grams g
LEFT JOIN (SELECT doc_id, max(c) AS top FROM counted GROUP BY doc_id) mx
  ON g.doc_id = mx.doc_id
"""

QUERIES["d_text_repetition"] = (d_text_repetition, D_TEXT_REPETITION_SQL)


def d_text_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary statistics: top-50 tokens by total occurrences
    (tie-broken on the token — deterministic), with document frequency.
    The explode→agg→top-k shape every tokenizer/vocab-build pipeline
    runs; at 100 TB it is one shuffle on the token plus a
    TakeOrderedAndProject."""
    d = t(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(50)
    )


D_TEXT_VOCAB_SQL = f"""
SELECT token, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM (
  SELECT doc_id, unnest({SQL_TOKS}) AS token FROM documents
)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
"""

QUERIES["d_text_vocab"] = (d_text_vocab, D_TEXT_VOCAB_SQL)


def d_corpus_select(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-set selection: language gate (predicted 'en')
    + quality threshold, aggregated per source — the composition a real
    data pipeline runs over the verified text operators (integer sums
    only, so the oracle hash is exact)."""
    d = t(spark, sf, "documents")
    toks = X.tokens(F.col("text"))
    sel = d.select(
        "doc_id",
        "source",
        X.predict_lang(toks).alias("pred_lang"),
        X.quality_score(F.col("text")).alias("quality"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).filter((F.col("pred_lang") == "en") & (F.col("quality") >= 700))
    return sel.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality").cast("long").alias("sum_quality"),
    )


def _corpus_select_sql() -> str:
    return f"""
WITH q AS ({D_TEXT_QUALITY_SQL}), l AS ({_langid_sql()})
SELECT d.source AS source, count(*) AS n_docs,
       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(q.quality) AS BIGINT) AS sum_quality
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
WHERE l.pred_lang = 'en' AND q.quality >= 700
GROUP BY d.source
"""


QUERIES["d_corpus_select"] = (d_corpus_select, _corpus_select_sql())

_ND_THRESH, _ND_PLANES = 0.3, 4


def d_sim_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed + exact verify.

    Threshold 0.3 is tuned to the synthetic random embeddings (real
    near-dup corpora use ~0.95); it exercises the operator on 124
    value-checked pairs at sf0.01 instead of a vacuous 0-row pass."""
    return S.cosine_neardup_pairs(
        t(spark, sf, "embeddings"), threshold=_ND_THRESH, nplanes=_ND_PLANES
    )


def _neardup_sql() -> str:
    sig = _sig_sql(_ND_PLANES)
    cos = (
        "list_aggregate(list_transform(a.embedding,"
        " (x, i) -> x::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
        " / greatest("
        "sqrt(list_aggregate(list_transform(a.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
        " sqrt(list_aggregate(list_transform(b.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12)"
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS sig FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cos}, 6) AS cosine_sim
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE round({cos}, 6) >= {_ND_THRESH}
"""


QUERIES["d_sim_neardup"] = (d_sim_neardup, _neardup_sql())

_IVF_CENTROIDS: dict[str, list[list[int]]] = {}
_IVF_K, _IVF_ITERS, _IVF_QS = 4, 2, 10**6


def d_sim_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN, VALUE-exact: the coarse quantizer is Lloyd k-means in
    integer arithmetic (corpus/similarity.py::ivf_fit_centroids_exact),
    so the fixed-`iters` fit unrolls into a DuckDB CTE chain and the
    oracle pins fit + assignment + probe routing + cosine top-k — the
    r1 "iterative ⇒ rows-only" carve-out removed. The float serving fit
    (ivf_fit_centroids) stays unit-tested for recall.

    Fit once per sf_dir (the offline index build), probe-only after —
    the probe plan contains a single scan, no Lloyd refit (VERDICT r1)."""
    if sf not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf] = S.ivf_fit_centroids_exact(
            t(spark, sf, "embeddings"),
            n_clusters=_IVF_K,
            iters=_IVF_ITERS,
            qscale=_IVF_QS,
        )
    return S.ivf_topk_exact(
        t(spark, sf, "embeddings"),
        _IVF_CENTROIDS[sf],
        query_vec_id=0,
        k=10,
        nprobe=2,
        qscale=_IVF_QS,
    )


def _ivf_dist():
    return (
        "list_sum(list_transform(generate_series(1, len({v})), "
        "i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])))"
    )


def _ivf_prefix(query_id: int, nprobe: int) -> str:
    """Shared DuckDB CTE chain: integer-Lloyd fit (c0..cN), final
    assignment (af), query row (q0), probed clusters (probe) — reused by
    the cosine probe (d_sim_ann_ivf) and the SQ8 ADC probe
    (d_sim_ivf_sq8)."""
    dist = _ivf_dist()
    assign = """, a{i} AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT qq.vec_id, cc.cl,
           row_number() OVER (PARTITION BY qq.vec_id ORDER BY
             {d}, cc.cl) AS rn
    FROM q qq CROSS JOIN c{prev} cc
  ) WHERE rn = 1
), s{i} AS (
  SELECT a.cl, d.i AS dim, sum(qq.qv[d.i]) AS s, count(*) AS n
  FROM a{i} a JOIN q qq USING (vec_id),
       LATERAL unnest(generate_series(1, len(qq.qv))) d(i)
  GROUP BY a.cl, d.i
), c{i} AS MATERIALIZED (
  SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY dim) AS cv
  FROM s{i} GROUP BY cl
  UNION ALL
  SELECT cl, cv FROM c{prev} WHERE cl NOT IN (SELECT cl FROM s{i})
)""".replace("{d}", dist.format(v="qq.qv", c="cc.cv"))
    sql = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * {float(_IVF_QS)}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl,
         qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {_IVF_K})
)"""
    for i in range(1, _IVF_ITERS + 1):
        sql += assign.format(i=i, prev=i - 1)
    sql += """, af AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT qq.vec_id, cc.cl,
           row_number() OVER (PARTITION BY qq.vec_id ORDER BY
             {d}, cc.cl) AS rn
    FROM q qq CROSS JOIN c{last} cc
  ) WHERE rn = 1
), q0 AS (SELECT qv FROM q WHERE vec_id = {qid}),
probe AS (
  SELECT cl FROM (
    SELECT cc.cl, row_number() OVER (ORDER BY {dq}, cc.cl) AS rn
    FROM c{last} cc CROSS JOIN q0
  ) WHERE rn <= {nprobe}
)""".replace("{d}", dist.format(v="qq.qv", c="cc.cv")).replace(
        "{dq}", dist.format(v="q0.qv", c="cc.cv")
    ).replace("{last}", str(_IVF_ITERS)).replace("{qid}", str(query_id)).replace(
        "{nprobe}", str(nprobe)
    )
    return sql


def _ivf_sql() -> str:
    return _ivf_prefix(query_id=0, nprobe=2) + """, qe AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       round(
         list_aggregate(list_transform(e.embedding,
           (x, i) -> x::DOUBLE * qv[i]::DOUBLE), 'sum')
         / greatest(
             sqrt(list_aggregate(list_transform(e.embedding,
               x -> x::DOUBLE * x::DOUBLE), 'sum')) *
             sqrt(list_aggregate(list_transform(qv,
               x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12),
         6) AS cosine_sim
FROM embeddings e JOIN af ON e.vec_id = af.vec_id, qe
WHERE af.cl IN (SELECT cl FROM probe) AND e.vec_id <> 0
ORDER BY cosine_sim DESC, e.vec_id
LIMIT 10
"""


QUERIES["d_sim_ann_ivf"] = (d_sim_ann_ivf, _ivf_sql())


# --------------------------------------------------------------------------
# Product quantization + ADC probe (corpus/similarity.py::pq_encode /
# pq_adc_topk — Jégou et al., TPAMI 2011). The harness uses the
# DETERMINISTIC md5-derived codebooks (weak quantizers, bit-reproducible
# in SQL) so encode + lookup-table distance + top-k are all VALUE-exact;
# the trained path (pq_fit_codebooks) is unit-tested for recall instead.

_PQ_M, _PQ_K, _PQ_SUBDIM = 4, 8, 16  # 64-dim embeddings → 4×16


def d_sim_ann_pq(spark: SparkSession, sf: str) -> DataFrame:
    books = S.pq_deterministic_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM)
    return S.pq_adc_topk(
        t(spark, sf, "embeddings"), books, query_vec_id=0, k=10
    )


D_SIM_ANN_PQ_SQL = f"""
WITH cb AS (
  SELECT j, c,
         list_transform(generate_series(0, {_PQ_SUBDIM - 1}), t ->
           (CAST(concat('0x', substring(md5('pq|' || j || '|' || c || '|' || t),
                 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0) AS w
  FROM generate_series(0, {_PQ_M - 1}) g1(j),
       generate_series(0, {_PQ_K - 1}) g2(c)
), sub AS (
  SELECT vec_id, j,
         list_transform(generate_series(1, {_PQ_SUBDIM}), i ->
           CAST(embedding[j * {_PQ_SUBDIM} + i] AS DOUBLE)) AS sv
  FROM embeddings, generate_series(0, {_PQ_M - 1}) g(j)
), dist AS (
  SELECT s.vec_id, s.j, cb.c,
         round(list_aggregate(list_transform(
           generate_series(1, {_PQ_SUBDIM}), i ->
             (s.sv[i] - cb.w[i]) * (s.sv[i] - cb.w[i])), 'sum'), 9) AS d
  FROM sub s JOIN cb ON s.j = cb.j
), codes AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
    FROM dist
  ) WHERE rn = 1
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), lut AS (
  SELECT cb.j, cb.c,
         list_aggregate(list_transform(
           generate_series(1, {_PQ_SUBDIM}), i ->
             (CAST(qe[cb.j * {_PQ_SUBDIM} + i] AS DOUBLE) - cb.w[i])
             * (CAST(qe[cb.j * {_PQ_SUBDIM} + i] AS DOUBLE) - cb.w[i])),
           'sum') AS ld
  FROM cb, q
)
SELECT vec_id,
       round(list_aggregate(list(ld ORDER BY codes.j), 'sum'), 6) AS adc_dist
FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
WHERE codes.vec_id <> 0
GROUP BY vec_id
ORDER BY adc_dist, vec_id
LIMIT 10
"""

QUERIES["d_sim_ann_pq"] = (d_sim_ann_pq, D_SIM_ANN_PQ_SQL)


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup within embedding clusters (corpus/semdedup.py,
# Abbas et al. 2023). Deterministic md5 centroids make the cluster
# assignment bit-reproducible in SQL; threshold 0.35 is tuned to the
# synthetic random embeddings (159 within-cluster pairs at sf0.01 — real
# corpora use ~0.95+). Label propagation runs a FIXED 4 rounds on both
# engines (the d_dedup_clusters pattern: the oracle value-checks the
# round machinery; full convergence is unit-tested in engine mode).

_SD_K, _SD_DIM, _SD_TAU, _SD_ITERS = 8, 64, 0.35, 4


def _sd_centroids() -> list[list[float]]:
    return S.pq_deterministic_codebooks(1, _SD_K, _SD_DIM, salt="semdedup")[0]


def d_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.semdedup import semdedup

    return semdedup(
        t(spark, sf, "embeddings"),
        _sd_centroids(),
        threshold=_SD_TAU,
        n_iters=_SD_ITERS,
    )


def _semdedup_sql() -> str:
    cos = (
        "list_aggregate(list_transform(a.embedding,"
        " (x, i) -> x::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
        " / greatest("
        "sqrt(list_aggregate(list_transform(a.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
        " sqrt(list_aggregate(list_transform(b.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12)"
    )
    sql = f"""
WITH cents AS (
  SELECT c, list_transform(generate_series(0, {_SD_DIM - 1}), t ->
    (CAST(concat('0x', substring(md5('semdedup|0|' || c || '|' || t),
          1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0) AS w
  FROM generate_series(0, {_SD_K - 1}) g(c)
), dist AS (
  SELECT e.vec_id, e.embedding, c.c,
    round(list_aggregate(list_transform(generate_series(1, {_SD_DIM}), i ->
      (CAST(e.embedding[i] AS DOUBLE) - c.w[i])
      * (CAST(e.embedding[i] AS DOUBLE) - c.w[i])), 'sum'), 9) AS d
  FROM embeddings e, cents c
), asg AS (
  SELECT vec_id, embedding, c AS cluster FROM (
    SELECT vec_id, embedding, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist
  ) WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {_SD_TAU}
), edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM edges
)"""
    prev = "l0"
    # MATERIALIZED: each round references the previous one twice — see
    # the d_dedup_clusters chain for the measured inlining blowup
    for i in range(1, _SD_ITERS + 1):
        sql += f""", l{i} AS MATERIALIZED (
  SELECT l.node AS node,
         least(l.label, coalesce(m.nbr_min, l.label)) AS label
  FROM {prev} l LEFT JOIN (
    SELECT e.dst AS node, min(p.label) AS nbr_min
    FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst
  ) m ON l.node = m.node
)"""
        prev = f"l{i}"
    sql += f"""
SELECT asg.vec_id, asg.cluster,
       coalesce(lab.label, asg.vec_id) AS sem_cluster_id,
       asg.vec_id = coalesce(lab.label, asg.vec_id) AS keep
FROM asg LEFT JOIN {prev} lab ON asg.vec_id = lab.node
"""
    return sql


QUERIES["d_semdedup"] = (d_semdedup, _semdedup_sql())


def d_semdedup_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """The pairs single-probe SemDeDup MISSES: each vector probes its
    top-2 centroids for pair generation (corpus/semdedup.py::
    semdedup_pairs_multiprobe), and the single-probe pair set is
    anti-joined away — what remains are the boundary-straddling
    duplicates the paper's n²/k trade hides. Non-vacuous by
    construction on the synthetic embeddings (boundary vectors are
    common in random data); cost factor ≈ 4× the single-probe join,
    still cluster-bounded."""
    from who_focus_crawler_spark.corpus.semdedup import (
        semdedup_pairs,
        semdedup_pairs_multiprobe,
    )

    emb = t(spark, sf, "embeddings")
    cents = _sd_centroids()
    p2 = semdedup_pairs_multiprobe(
        emb, cents, threshold=_SD_TAU, n_probe=2
    )
    p1 = semdedup_pairs(emb, cents, threshold=_SD_TAU)
    return p2.join(
        p1.select("vec_a", "vec_b"), ["vec_a", "vec_b"], "left_anti"
    ).select("vec_a", "vec_b", "cosine_sim")


def _semdedup_multiprobe_sql() -> str:
    cos = (
        "list_aggregate(list_transform(a.embedding,"
        " (x, i) -> x::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
        " / greatest("
        "sqrt(list_aggregate(list_transform(a.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
        " sqrt(list_aggregate(list_transform(b.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12)"
    )
    return f"""
WITH cents AS (
  SELECT c, list_transform(generate_series(0, {_SD_DIM - 1}), t ->
    (CAST(concat('0x', substring(md5('semdedup|0|' || c || '|' || t),
          1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0) AS w
  FROM generate_series(0, {_SD_K - 1}) g(c)
), dist AS (
  SELECT e.vec_id, e.embedding, c.c,
    round(list_aggregate(list_transform(generate_series(1, {_SD_DIM}), i ->
      (CAST(e.embedding[i] AS DOUBLE) - c.w[i])
      * (CAST(e.embedding[i] AS DOUBLE) - c.w[i])), 'sum'), 9) AS d
  FROM embeddings e, cents c
), asg2 AS MATERIALIZED (
  SELECT vec_id, embedding, c AS cluster, rn FROM (
    SELECT vec_id, embedding, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist
  ) WHERE rn <= 2
), pairs2 AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({cos}, 6) AS cosine_sim
  FROM asg2 a JOIN asg2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {_SD_TAU}
), pairs1 AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM asg2 a JOIN asg2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           AND a.rn = 1 AND b.rn = 1
  WHERE round({cos}, 6) >= {_SD_TAU}
)
SELECT p2.vec_a, p2.vec_b, p2.cosine_sim
FROM pairs2 p2
WHERE NOT EXISTS (
  SELECT 1 FROM pairs1 p1
  WHERE p1.vec_a = p2.vec_a AND p1.vec_b = p2.vec_b
)
"""


QUERIES["d_semdedup_multiprobe"] = (
    d_semdedup_multiprobe,
    _semdedup_multiprobe_sql(),
)


# --------------------------------------------------------------------------
# Sliding-window chunking (corpus/chunks.py::sliding_windows — the
# retrieval/RAG splitter): fixed-size overlapping token windows, pure
# per-row array work. Oracle replays the identical slice arithmetic.

_SW_SIZE, _SW_STRIDE = 24, 16


def d_sliding_windows(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.chunks import sliding_windows

    return sliding_windows(
        t(spark, sf, "documents"), size=_SW_SIZE, stride=_SW_STRIDE
    )


D_SLIDING_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), wins AS (
  SELECT doc_id, tk,
         generate_series(0,
           CAST(ceil(greatest(len(tk) - {_SW_SIZE}, 0)
                     / {_SW_STRIDE}.0) AS BIGINT)) AS widx
  FROM toks
)
SELECT doc_id, CAST(w AS BIGINT) AS window_idx,
       array_to_string(
         list_slice(tk, w * {_SW_STRIDE} + 1,
                    w * {_SW_STRIDE} + {_SW_SIZE}), ' ') AS window_text,
       CAST(len(list_slice(tk, w * {_SW_STRIDE} + 1,
                           w * {_SW_STRIDE} + {_SW_SIZE})) AS BIGINT)
         AS n_tokens,
       CAST(w * {_SW_STRIDE} AS BIGINT) AS start_pos
FROM (SELECT doc_id, tk, unnest(widx) AS w FROM wins)
"""

QUERIES["d_sliding_windows"] = (d_sliding_windows, D_SLIDING_SQL)


# --------------------------------------------------------------------------
# Cross-source quality calibration (corpus/calibrate.py — CCNet-style
# per-source percentile bucketing): integer permille percent-rank of the
# verified quality score within each source; the running-below sum runs
# over the tiny per-(source, quality) aggregate, never per-row.


def d_quality_calibrate(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.calibrate import quality_percentile

    d = t(spark, sf, "documents").select(
        "doc_id", "source", X.quality_score(F.col("text")).alias("quality")
    )
    return quality_percentile(d)


D_QUALITY_CAL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, length(text) AS n_chars,
         len({SQL_TOKS}) AS n_tokens,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
         len(list_filter({SQL_TOKS}, x -> x IN ({_SW}))) AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, source,
         CAST(least(n_tokens, 100) * 5
              + least((n_stop * 1500) // greatest(n_tokens, 1), 300)
              + greatest(200 - (n_punct * 2000) // greatest(n_chars, 1), 0)
              AS BIGINT) AS quality
  FROM base
)
SELECT source, quality, doc_id,
       CAST((rank() OVER (PARTITION BY source ORDER BY quality) - 1) * 1000
            // greatest(count(*) OVER (PARTITION BY source) - 1, 1)
            AS BIGINT) AS quality_permille
FROM q
"""

QUERIES["d_quality_calibrate"] = (d_quality_calibrate, D_QUALITY_CAL_SQL)


# --------------------------------------------------------------------------
# MLM training-example generation (corpus/mlm.py — BERT 15%/80-10-10
# masking with md5-derived draws): one row per selected position with
# the applied corruption; value-exact because every "random" choice is
# a hash of (seed, doc_id, pos).


def d_mlm_examples(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.mlm import mlm_examples

    return mlm_examples(t(spark, sf, "documents"))


_MLM_H = (
    "CAST(concat('0x', substring(md5('mlm:{tag}|' || doc_id || '|' || pos),"
    " 1, 15)) AS BIGINT)"
)

D_MLM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), ex AS (
  SELECT doc_id, tk, u.pos AS pos, u.original AS original FROM (
    SELECT doc_id, tk,
           unnest(list_transform(generate_series(1, len(tk)), i ->
             struct_pack(pos := CAST(i AS BIGINT), original := tk[i]))) AS u
    FROM toks
  )
), sel AS (
  SELECT doc_id, tk, pos, original,
         {_MLM_H.format(tag='act')} % 10 AS act,
         {_MLM_H.format(tag='tok')} % greatest(len(tk), 1) + 1 AS rnd
  FROM ex
  WHERE {_MLM_H.format(tag='sel')} % 1000 < 150
)
SELECT doc_id, pos, original,
       CASE WHEN act < 8 THEN '[MASK]'
            WHEN act = 8 THEN tk[CAST(rnd AS INT)]
            ELSE original END AS replacement,
       CASE WHEN act < 8 THEN 'mask'
            WHEN act = 8 THEN 'random'
            ELSE 'keep' END AS action
FROM sel
"""

QUERIES["d_mlm_examples"] = (d_mlm_examples, D_MLM_SQL)


# --------------------------------------------------------------------------
# Contrastive pair mining (corpus/contrastive.py — DPR/ANCE shape):
# same-cluster duplicates as positives, md5-ranked same-cluster far
# pairs as hard negatives, over the SemDeDup centroids. Thresholds are
# tuned to the synthetic random embeddings (real corpora: 0.95 / 0.5).

_CT_POS, _CT_NEG, _CT_NNEG = 0.35, 0.0, 3


def d_contrastive(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.contrastive import contrastive_pairs

    return contrastive_pairs(
        t(spark, sf, "embeddings"),
        _sd_centroids(),
        pos_tau=_CT_POS,
        neg_tau=_CT_NEG,
        n_neg=_CT_NNEG,
    )


def _contrastive_sql() -> str:
    cos = (
        "list_aggregate(list_transform(a.embedding,"
        " (x, i) -> x::DOUBLE * b.embedding[i]::DOUBLE), 'sum')"
        " / greatest("
        "sqrt(list_aggregate(list_transform(a.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
        " sqrt(list_aggregate(list_transform(b.embedding,"
        " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12)"
    )
    return f"""
WITH cents AS (
  SELECT c, list_transform(generate_series(0, {_SD_DIM - 1}), t ->
    (CAST(concat('0x', substring(md5('semdedup|0|' || c || '|' || t),
          1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0) AS w
  FROM generate_series(0, {_SD_K - 1}) g(c)
), dist AS (
  SELECT e.vec_id, e.embedding, c.c,
    round(list_aggregate(list_transform(generate_series(1, {_SD_DIM}), i ->
      (CAST(e.embedding[i] AS DOUBLE) - c.w[i])
      * (CAST(e.embedding[i] AS DOUBLE) - c.w[i])), 'sum'), 9) AS d
  FROM embeddings e, cents c
), asg AS (
  SELECT vec_id, embedding, c AS cluster FROM (
    SELECT vec_id, embedding, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist
  ) WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS anchor, b.vec_id AS cand,
         round({cos}, 6) AS cosine_sim
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
), pos AS (
  SELECT anchor, cand, 1 AS label, cosine_sim
  FROM pairs WHERE cosine_sim >= {_CT_POS}
), neg AS (
  SELECT anchor, cand, 0 AS label, cosine_sim FROM (
    SELECT anchor, cand, cosine_sim,
           row_number() OVER (
             PARTITION BY anchor
             ORDER BY md5(concat_ws('|', 'contrastive', anchor, cand))
           ) AS rk
    FROM pairs WHERE cosine_sim <= {_CT_NEG}
  ) WHERE rk <= {_CT_NNEG}
)
SELECT * FROM pos UNION ALL SELECT * FROM neg
"""


QUERIES["d_contrastive"] = (d_contrastive, _contrastive_sql())


# --------------------------------------------------------------------------
# Near-dup cluster formation over the MinHash pair graph (corpus/clusters.py)
# — fixed-round min-label propagation so DuckDB reproduces the exact labels

_CL_ITERS = 4


def d_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.clusters import near_dup_clusters

    pairs = D.minhash_lsh_pairs(
        t(spark, sf, "documents"),
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        shingle_k=_MH_K,
        jaccard_threshold=_MH_THRESH,
    )
    return near_dup_clusters(pairs, n_iters=_CL_ITERS)


def _clusters_sql() -> str:
    # the minhash pair CTE (same construction as D_DEDUP_MINHASH_SQL),
    # then _CL_ITERS hash-to-min rounds as a CTE chain
    jac = (
        "round(len(list_intersect(sa, sb))::DOUBLE /"
        " greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1), 6)"
    )
    sql = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(SQL_TOKS, _MH_K)} AS s FROM documents
), sigs AS (
  SELECT doc_id, s,
         list_transform(generate_series(0, {_MH_HASHES - 1}), h ->
           list_aggregate(
             list_transform(s, g ->
               CAST(concat('0x', substring(
                 md5(concat(CAST(h AS VARCHAR), '|', g)), 1, 15)) AS BIGINT)),
             'min')) AS sig
  FROM sh
), banded AS (
  SELECT doc_id, s, u.band AS band, u.key AS key
  FROM (
    SELECT doc_id, s,
           unnest(list_transform(sig, (x, i) ->
             struct_pack(band := i, key := md5(CAST(x AS VARCHAR))))) AS u
    FROM sigs
  )
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM cand WHERE {jac} >= {_MH_THRESH}
), edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM edges
)"""
    prev = "l0"
    # MATERIALIZED pins each round — every l{{i}} references l{{i-1}}
    # twice, and DuckDB's default inlining would re-expand the whole
    # minhash base 2^i times (measured 60 s → ~2 s at sf0.1)
    for i in range(1, _CL_ITERS + 1):
        sql += f""", l{i} AS MATERIALIZED (
  SELECT l.node AS node,
         least(l.label, coalesce(m.nbr_min, l.label)) AS label
  FROM {prev} l LEFT JOIN (
    SELECT e.dst AS node, min(p.label) AS nbr_min
    FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst
  ) m ON l.node = m.node
)"""
        prev = f"l{i}"
    sql += f"""
SELECT node AS doc_id, label AS cluster_id, node = label AS keep FROM {prev}
"""
    return sql


QUERIES["d_dedup_clusters"] = (d_dedup_clusters, _clusters_sql())


# --------------------------------------------------------------------------
# Connected components, large-star/small-star (corpus/clusters.py::
# connected_components — Kiveris et al., SoCC 2014). The synthetic graph is
# chains of 50 consecutive doc_ids (depth-49 components — the regime where
# hash-to-min's O(diameter) rounds hurt and the star method's O(log² n)
# matters), with node 123 severed into a self-loop singleton, splitting its
# chain. Converged labels are min-of-component, so the oracle is ANALYTIC —
# it states the closed-form cluster id rather than re-running the rounds,
# making this a true independent check of convergence.


def d_dedup_cc(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.clusters import connected_components

    d = t(spark, sf, "documents").select("doc_id")
    mx = F.broadcast(d.agg(F.max("doc_id").alias("mx")))
    chain = (
        d.crossJoin(mx)
        .filter(
            (F.col("doc_id") % 50 != 49)
            & (F.col("doc_id") < F.col("mx"))
            & (F.col("doc_id") != 123)
            & (F.col("doc_id") != 122)
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
        )
    )
    loner = d.filter(F.col("doc_id") == 123).select(
        F.col("doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    return connected_components(chain.unionByName(loner))


D_DEDUP_CC_SQL = """
WITH pairs AS (
  SELECT doc_id AS doc_a, doc_id + 1 AS doc_b
  FROM documents
  WHERE doc_id % 50 <> 49
    AND doc_id < (SELECT max(doc_id) FROM documents)
    AND doc_id NOT IN (122, 123)
  UNION ALL
  SELECT doc_id, doc_id FROM documents WHERE doc_id = 123
), nodes AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION
  SELECT doc_b FROM pairs
), labeled AS (
  SELECT doc_id,
         CASE WHEN doc_id = 123 THEN 123
              WHEN doc_id BETWEEN 124 AND 149 THEN 124
              ELSE (doc_id // 50) * 50 END AS cluster_id
  FROM nodes
)
SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM labeled
"""

QUERIES["d_dedup_cc"] = (d_dedup_cc, D_DEDUP_CC_SQL)


# --------------------------------------------------------------------------
# Content-defined chunking (corpus/chunks.py — LBFS-style, SOSP 2001):
# token-stream CDC cuts → chunk hashes → per-doc duplicated-chunk
# coverage. Both engines run the identical frozen rule (w-gram
# md5_hash60 % 2^mask_bits == 0 cuts), so the rollup is value-exact.

_CDC_W, _CDC_MASK_BITS = 3, 4


def d_cdc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.chunks import (
        cdc_chunks,
        cdc_doc_coverage,
    )

    ch = cdc_chunks(
        t(spark, sf, "documents"), w=_CDC_W, mask_bits=_CDC_MASK_BITS
    )
    return cdc_doc_coverage(ch)


def _cdc_sql() -> str:
    w, mask = _CDC_W, 1 << _CDC_MASK_BITS
    gram = f"array_to_string(list_slice(tk, i, i + {w - 1}), ' ')"
    h60 = "CAST(concat('0x', substring(md5({0}), 1, 15)) AS BIGINT)"
    return f"""
WITH pre AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), cut AS (
  SELECT doc_id, tk,
    list_concat([1], list_filter(list_transform(
      generate_series(1, greatest(len(tk) - {w - 1}, 0)), i ->
        CASE WHEN {h60.format(gram)} % {mask} = 0
              AND i + {w} <= len(tk)
             THEN i + {w} END),
      x -> x IS NOT NULL)) AS starts
  FROM pre
), ch AS (
  SELECT doc_id, u.idx AS chunk_idx, u.h AS chunk_hash, u.nt AS n_tokens
  FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, len(starts)), ci ->
        struct_pack(
          idx := ci - 1,
          h := {h60.format(
            "array_to_string(list_slice(tk, starts[ci], "
            "coalesce(starts[ci + 1], len(tk) + 1) - 1), ' ')")},
          nt := coalesce(starts[ci + 1], len(tk) + 1) - starts[ci]))) AS u
    FROM cut
  ) WHERE u.nt > 0
), dup AS (
  SELECT chunk_hash FROM ch GROUP BY chunk_hash
  HAVING count(DISTINCT doc_id) >= 2
)
SELECT c.doc_id,
  count(*) AS n_chunks,
  CAST(sum(CASE WHEN d.chunk_hash IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_dup_chunks,
  CAST(sum(CASE WHEN d.chunk_hash IS NOT NULL THEN n_tokens ELSE 0 END)
       AS BIGINT) AS dup_tokens,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(floor(sum(CASE WHEN d.chunk_hash IS NOT NULL THEN n_tokens ELSE 0 END)
             * 1000.0 / greatest(sum(n_tokens), 1)) AS BIGINT) AS dup_permille
FROM ch c LEFT JOIN dup d USING (chunk_hash)
GROUP BY c.doc_id
"""


QUERIES["d_cdc_chunks"] = (d_cdc_chunks, _cdc_sql())


# --------------------------------------------------------------------------
# DSIR importance weighting (corpus/dsir.py — Xie et al., NeurIPS 2023):
# hashed unigram+bigram features, target/source bucket distributions,
# integer-ppm importance score per source doc, deterministic top-50.
# Target proxy = every 7th document. All arithmetic is integer (the
# linearized log-ratio freeze documented in the module) ⇒ value-exact.

_DS_B = 256


def d_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.dsir import dsir_fit, dsir_topk

    d = t(spark, sf, "documents")
    target = d.filter(F.col("doc_id") % 7 == 0)
    source = d.filter(F.col("doc_id") % 7 != 0)
    model = dsir_fit(target, source, n_buckets=_DS_B)
    return dsir_topk(source, model, k=50, n_buckets=_DS_B)


D_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), grams AS (
  SELECT doc_id, u.g AS g
  FROM toks, unnest(list_concat(
    tk,
    list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                   i -> array_to_string(list_slice(tk, i, i + 1), ' '))
  )) AS u(g)
), b AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) % {_DS_B}
           AS bucket
  FROM grams
), tcnt AS (
  SELECT bucket, count(*) AS c FROM b WHERE doc_id % 7 = 0 GROUP BY bucket
), scnt AS (
  SELECT bucket, count(*) AS c FROM b WHERE doc_id % 7 <> 0 GROUP BY bucket
), ratio AS (
  SELECT r.bucket,
         (1000000 * (coalesce(t.c, 0) + 1)
          * ((SELECT count(*) FROM b WHERE doc_id % 7 <> 0) + {_DS_B}))
         // ((coalesce(s.c, 0) + 1)
          * ((SELECT count(*) FROM b WHERE doc_id % 7 = 0) + {_DS_B}))
           AS ratio_ppm
  FROM (SELECT unnest(generate_series(0, {_DS_B - 1})) AS bucket) r
  LEFT JOIN tcnt t USING (bucket)
  LEFT JOIN scnt s USING (bucket)
), scored AS (
  SELECT b.doc_id, CAST(sum(ratio_ppm - 1000000) AS BIGINT) AS dsir_score
  FROM b JOIN ratio USING (bucket)
  WHERE b.doc_id % 7 <> 0
  GROUP BY b.doc_id
)
SELECT d.doc_id, coalesce(s.dsir_score, 0) AS dsir_score
FROM documents d LEFT JOIN scored s USING (doc_id)
WHERE d.doc_id % 7 <> 0
ORDER BY dsir_score DESC, d.doc_id
LIMIT 50
"""

QUERIES["d_dsir_weights"] = (d_dsir_weights, D_DSIR_SQL)


def d_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode normalization (corpus/text.py::normalize_nfc /
    strip_accents): the ascii corpus is decorated with deterministic
    unicode per doc_id — including DECOMPOSED sequences ('e' + U+0301)
    so NFC composition actually rewrites bytes — and the oracle pins the
    full normalized text (md5) plus the length change."""
    from who_focus_crawler_spark.corpus.text import normalize_nfc, strip_accents

    d = t(spark, sf, "documents")
    deco = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" Café visitée"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" Déjà vu ÅNGSTRÖM"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" niño señor"))
        .otherwise(F.lit(" plain ascii"))
    )
    u = d.select(
        "doc_id", F.concat(F.col("text"), deco).alias("ut")
    )
    return u.select(
        "doc_id",
        F.length("ut").cast("long").alias("len_raw"),
        F.length(normalize_nfc(F.col("ut"))).cast("long").alias("len_nfc"),
        F.md5(normalize_nfc(F.col("ut"))).alias("nfc_md5"),
        F.md5(strip_accents(F.col("ut"))).alias("strip_md5"),
    )


D_TEXT_NORMALIZE_SQL = """
WITH u AS (
  SELECT doc_id,
         concat(text,
           CASE WHEN doc_id % 4 = 0
                  THEN concat(' Cafe', chr(769), ' visite', chr(769), 'e')
                WHEN doc_id % 4 = 1 THEN ' Déjà vu ÅNGSTRÖM'
                WHEN doc_id % 4 = 2 THEN ' niño señor'
                ELSE ' plain ascii' END) AS ut
  FROM documents
)
SELECT doc_id,
       CAST(length(ut) AS BIGINT) AS len_raw,
       CAST(length(nfc_normalize(ut)) AS BIGINT) AS len_nfc,
       md5(nfc_normalize(ut)) AS nfc_md5,
       md5(strip_accents(ut)) AS strip_md5
FROM u
"""

QUERIES["d_text_normalize"] = (d_text_normalize, D_TEXT_NORMALIZE_SQL)


def d_media_sniff(spark: SparkSession, sf: str) -> DataFrame:
    """Magic-byte content-type sniffing (corpus/multimodal.py::
    sniff_media_type) over payloads carrying real container magic
    (PNG/JPEG/WAV/OGG/MP4/MKV, two formats per declared kind) — fully
    native hex-prefix dispatch, blob never crosses to Python."""
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_media_with_magic,
        sniff_media_type,
    )

    media = attach_media_with_magic(t(spark, sf, "documents"))
    return media.select(
        "media_id",
        "kind",
        sniff_media_type(F.col("payload")).alias("content_type"),
        "byte_len",
    )


D_MEDIA_SNIFF_SQL = r"""
WITH m AS (
  SELECT concat('m', CAST(doc_id AS VARCHAR)) AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         (CASE
            WHEN doc_id % 3 = 0 AND doc_id % 2 = 0
              THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB
            WHEN doc_id % 3 = 0 THEN '\xFF\xD8\xFF\xE0'::BLOB
            WHEN doc_id % 3 = 1 AND doc_id % 2 = 0
              THEN 'RIFF\x24\x00\x00\x00WAVE'::BLOB
            WHEN doc_id % 3 = 1 THEN 'OggS\x00\x02'::BLOB
            WHEN doc_id % 2 = 0 THEN '\x00\x00\x00\x18ftypisom'::BLOB
            ELSE '\x1A\x45\xDF\xA3\x93\x42\x82\x88'::BLOB
          END) || encode(text) AS payload
  FROM documents
)
SELECT media_id, kind,
       CASE
         WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image/png'
         WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         WHEN substring(hex(payload), 1, 8) = '52494646'
          AND substring(hex(payload), 17, 8) = '57415645' THEN 'audio/wav'
         WHEN substring(hex(payload), 1, 8) = '4F676753' THEN 'audio/ogg'
         WHEN substring(hex(payload), 9, 8) = '66747970' THEN 'video/mp4'
         WHEN substring(hex(payload), 1, 8) = '1A45DFA3'
           THEN 'video/x-matroska'
         ELSE 'application/octet-stream'
       END AS content_type,
       CAST(octet_length(payload) AS BIGINT) AS byte_len
FROM m
"""

QUERIES["d_media_sniff"] = (d_media_sniff, D_MEDIA_SNIFF_SQL)


def d_text_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: top-50 bigrams ranked by a PMI-style lift
    score computed as an EXACT integer fraction — score_ppm =
    (1,000,000 · c_xy · N) div (c_x · c_y), N = total unigram count —
    so no float log enters the ranking and the oracle hash-matches.
    Shape at 100 TB: one shuffle for unigram counts, one for bigram
    counts, two broadcast-sized joins on the bigram's parts (the heavy
    corpus never moves twice), TakeOrderedAndProject for the top-k."""
    from who_focus_crawler_spark.corpus.text import ngrams_all, tokens

    d = t(spark, sf, "documents")
    toks = d.select(tokens(F.col("text")).alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("long").alias("n"))
    big = (
        toks.select(F.explode(ngrams_all(F.col("tk"), 2)).alias("xy"))
        .groupBy("xy")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
        .withColumn("x", F.split_part(F.col("xy"), F.lit(" "), F.lit(1)))
        .withColumn("y", F.split_part(F.col("xy"), F.lit(" "), F.lit(2)))
    )
    return (
        big.join(uni.withColumnRenamed("w", "x").withColumnRenamed("c", "c_x"), "x")
        .join(uni.withColumnRenamed("w", "y").withColumnRenamed("c", "c_y"), "y")
        .crossJoin(F.broadcast(n_total))
        .select(
            "xy",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            F.expr("(1000000 * c_xy * n) div (c_x * c_y)")
            .cast("long")
            .alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "xy")
        .limit(50)
    )


D_TEXT_COLLOCATIONS_SQL = f"""
WITH tk AS (SELECT {SQL_TOKS} AS tk FROM documents),
uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY w
),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
big AS (
  SELECT xy, count(*) AS c_xy FROM (
    SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> array_to_string(list_slice(tk, i, i + 1), ' ')
           )) AS xy
    FROM tk
  ) GROUP BY xy HAVING count(*) >= 5
)
SELECT b.xy, CAST(b.c_xy AS BIGINT) AS c_xy,
       CAST(ux.c AS BIGINT) AS c_x, CAST(uy.c AS BIGINT) AS c_y,
       CAST((1000000 * b.c_xy * n.n) // (ux.c * uy.c) AS BIGINT) AS score_ppm
FROM big b
JOIN uni ux ON ux.w = split_part(b.xy, ' ', 1)
JOIN uni uy ON uy.w = split_part(b.xy, ' ', 2)
CROSS JOIN n
ORDER BY score_ppm DESC, xy
LIMIT 50
"""

QUERIES["d_text_collocations"] = (d_text_collocations, D_TEXT_COLLOCATIONS_SQL)


_BPE_MERGES, _BPE_MIN_COUNT = 20, 2


def d_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer (corpus/bpe.py): train 20 merges on the corpus
    word-frequency vocab, segment every document, report per-doc
    subword counts. The training loop is iterative (driver argmax per
    merge) but fully deterministic, so the DuckDB twin replays all 20
    rounds as an unrolled CTE chain — value-exact, not rows-only; exact
    train/apply semantics are additionally pinned against an independent
    reference in tests/unit/test_bpe.py."""
    from who_focus_crawler_spark.corpus.bpe import (
        bpe_apply,
        bpe_train_auto,
        word_vocab,
    )

    d = t(spark, sf, "documents")
    merges = bpe_train_auto(
        word_vocab(d), num_merges=_BPE_MERGES, min_count=_BPE_MIN_COUNT
    )
    return bpe_apply(d, merges).select(
        "doc_id",
        "n_subwords",
        F.md5(F.array_join("subwords", " ")).alias("subwords_md5"),
    )


def _bpe_sql(num_merges: int = _BPE_MERGES, min_count: int = _BPE_MIN_COUNT) -> str:
    """Unrolled-CTE replay of BPE training + apply.

    Round r: count adjacent symbol pairs over vocab v{r-1} weighted by
    word frequency, argmax (count desc, pair asc — Spark's exact tie
    order), rewrite every word by merging left-to-right non-overlapping
    occurrences. The sequential left-to-right scan is relationalized
    with the run-parity trick: a position is merged iff it is a
    candidate (syms[i]=a, syms[i+1]=b) at an ODD offset within its
    maximal run of consecutive candidates (runs only exceed length 1
    when a=b, e.g. 'aaa' + (a,a) -> 'aa','a'), and the position after a
    merged one is consumed. Early stop (top pair below min_count) is
    mirrored by the merge round becoming a no-op: the argmax CTE is
    empty, candidates coalesce to FALSE, the vocab passes through
    unchanged. Apply = the final vocab state itself (training rewrites
    ARE the greedy replay of the merge list), joined back onto the
    per-doc token stream."""
    parts = [
        f"WITH d AS MATERIALIZED (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),",
        """v0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS n,
         list_transform(generate_series(1, len(word)),
                        i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest(tk) AS word FROM d) GROUP BY word
)""",
    ]
    for r in range(1, num_merges + 1):
        pv = f"v{r - 1}"
        parts.append(
            f""",
p{r} AS MATERIALIZED (
  SELECT syms[pos] AS a, syms[pos + 1] AS b, sum(n) AS c
  FROM (SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS pos
        FROM {pv} WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
m{r} AS MATERIALIZED (SELECT a, b FROM p{r} WHERE c >= {min_count}
         ORDER BY c DESC, a ASC, b ASC LIMIT 1),
e{r} AS (
  SELECT word, n, pos, syms[pos] AS sym,
         coalesce(pos < len(syms)
                  AND syms[pos] = (SELECT a FROM m{r})
                  AND syms[pos + 1] = (SELECT b FROM m{r}), FALSE) AS cand
  FROM (SELECT word, n, syms, unnest(generate_series(1, len(syms))) AS pos
        FROM {pv})
),
x{r} AS (
  SELECT word, n, pos, sym,
         cand AND (pos - coalesce(max(CASE WHEN NOT cand THEN pos END)
             OVER (PARTITION BY word ORDER BY pos), 0)) % 2 = 1 AS taken
  FROM e{r}
),
v{r} AS MATERIALIZED (
  SELECT word, n,
         list(CASE WHEN taken THEN sym || (SELECT b FROM m{r})
              ELSE sym END ORDER BY pos) AS syms
  FROM (SELECT *, coalesce(lag(taken) OVER (PARTITION BY word ORDER BY pos),
                           FALSE) AS prev_taken FROM x{r})
  WHERE NOT prev_taken
  GROUP BY word, n
)"""
        )
    parts.append(
        f""",
tk2 AS (
  SELECT doc_id, unnest(tk) AS word,
         unnest(generate_series(1, len(tk))) AS pos
  FROM d
)
SELECT t.doc_id,
       CAST(len(flatten(list(s.syms ORDER BY t.pos))) AS BIGINT) AS n_subwords,
       md5(array_to_string(flatten(list(s.syms ORDER BY t.pos)), ' '))
         AS subwords_md5
FROM tk2 t JOIN v{num_merges} s USING (word)
GROUP BY t.doc_id"""
    )
    return "".join(parts)


QUERIES["d_bpe_tokens"] = (d_bpe_tokens, _bpe_sql())


# --------------------------------------------------------------------------
# Positional winnowing (Schleimer et al. SIGMOD 2003, corpus/text.py::
# winnow_fingerprints): per-window rightmost-min selection over k-gram
# hashes — the local document-fingerprinting algorithm (guaranteed hit
# for any shared run >= w+k-1 tokens). The sortable key construction
# (md5-15-hex || zero-padded inverted position) is reproduced verbatim
# in DuckDB, so selections are value-exact, not just counts.

_WN_K, _WN_W = 4, 5


def d_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.dedup import _spread

    d = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    fp = d.select(
        "doc_id",
        F.explode(
            X.winnow_fingerprints(X.tokens(F.col("text")), k=_WN_K, w=_WN_W)
        ).alias("fp"),
    )
    return fp.select("doc_id", F.col("fp.pos").alias("pos"), "fp.gram_hash")


D_WINNOWING_SQL = f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
ks AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(tk) - {_WN_K - 1}, 0)),
           i -> substr(md5(array_to_string(
                  list_slice(tk, i, i + {_WN_K - 1}), ' ')), 1, 15)
                || lpad(CAST(999999 - i AS VARCHAR), 6, '0')) AS keys
  FROM tk
),
sel AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(keys) - {_WN_W - 1}, 1)),
           i -> list_aggregate(
                  list_slice(keys, i, i + {_WN_W - 1}), 'min')))) AS key
  FROM ks WHERE len(keys) >= 1
)
SELECT doc_id,
       CAST(999999 - CAST(substr(key, 16, 6) AS INT) AS INT) AS pos,
       substr(key, 1, 15) AS gram_hash
FROM sel
"""

QUERIES["d_winnowing"] = (d_winnowing, D_WINNOWING_SQL)


# --------------------------------------------------------------------------
# Perceptual image near-dup (dHash, corpus/multimodal.py): the media
# table is documents' payload blobs plus a planted last-byte-edited
# variant for every 5th doc, so sub-threshold pairs exist by
# construction. Both engines compute the identical 72-probe pixel grid
# from the payload BYTES (Spark: hex(payload); DuckDB: hex(encode(text))
# — same utf-8 bytes), the 64-bit gradient hash, 4x16-bit band
# candidates, and exact Hamming verification.


def d_media_phash(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    base = d.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    var = d.filter(F.col("doc_id") % 5 == 0).select(
        F.concat(F.lit("v"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode(
            F.concat(
                F.expr("substring(text, 1, length(text)-1)"), F.lit("~")
            ),
            "utf-8",
        ).alias("payload"),
    )
    return MM.dhash_pairs(base.unionByName(var), max_hamming=3)


D_MEDIA_PHASH_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
  UNION ALL
  SELECT 'v' || CAST(doc_id AS VARCHAR),
         hex(encode(substring(text, 1, length(text)-1) || '~')),
         octet_length(encode(substring(text, 1, length(text)-1) || '~'))
  FROM documents WHERE doc_id % 5 = 0
),
px AS (
  SELECT media_id,
         list_transform(generate_series(0,71), i ->
           CAST(('0x' || substring(h, CAST((i*(n-1))//71 AS BIGINT)*2 + 1, 2))
                AS INTEGER)) AS p
  FROM m
),
bits AS (
  SELECT media_id,
         list_transform(generate_series(0,63), j ->
           CASE WHEN p[(j//8)*9 + (j%8) + 1] > p[(j//8)*9 + (j%8) + 2]
                THEN 1 ELSE 0 END) AS b
  FROM px
),
bands AS (
  SELECT media_id,
         list_transform(generate_series(0,3), k ->
           CAST(list_sum(list_transform(generate_series(0,15),
                t -> b[k*16+t+1] * (1<<t))) AS INTEGER)) AS bd
  FROM bits
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
  FROM bands a, bands b, generate_series(1,4) g(k)
  WHERE a.media_id < b.media_id AND a.bd[g.k] = b.bd[g.k]
),
ham AS (
  SELECT media_a, media_b,
         CAST(list_sum(list_transform(generate_series(1,4), k ->
           bit_count(xor(CAST(a.bd[k] AS BIGINT), CAST(b.bd[k] AS BIGINT)))))
           AS BIGINT) AS hamming
  FROM cand
  JOIN bands a ON a.media_id = media_a
  JOIN bands b ON b.media_id = media_b
)
SELECT media_a, media_b, hamming FROM ham WHERE hamming <= 3
"""

QUERIES["d_media_phash"] = (d_media_phash, D_MEDIA_PHASH_SQL)


# --------------------------------------------------------------------------
# Exact set-similarity join (AllPairs prefix filtering, corpus/setjoin.py):
# every pair with 3-shingle Jaccard >= 0.8, exact — the complete-recall
# complement of MinHash-LSH. The oracle replays the identical frozen
# pipeline (frequency-ordered sets, prefix+length filter, integer
# verification); completeness itself is pinned by the brute-force
# equivalence unit test.

from who_focus_crawler_spark.corpus.setjoin import jaccard_similarity_join


def d_jaccard_join(spark: SparkSession, sf: str) -> DataFrame:
    return jaccard_similarity_join(
        t(spark, sf, "documents"), tau_permille=800, shingle_k=3
    )


_JJ_SH = _sql_shingles(SQL_TOKS, 3)

D_JACCARD_JOIN_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_JJ_SH} AS tk FROM documents
),
freq AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY tok
),
ordered AS (
  SELECT doc_id,
         list_transform(list_sort(list(struct_pack(c := c, t := tok))),
                        s -> s.t) AS tk,
         count(*) AS n
  FROM (SELECT doc_id, unnest(tk) AS tok2 FROM toks) e
  JOIN freq ON freq.tok = e.tok2
  GROUP BY doc_id
),
pre AS (
  SELECT doc_id, n,
         list_slice(tk, 1, CAST(n - (((800 * n) + 999) // 1000) + 1 AS BIGINT))
           AS pref
  FROM ordered
),
ex AS (SELECT doc_id, n, unnest(pref) AS tok FROM pre),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND b.n * 1000 >= 800 * a.n AND a.n * 1000 >= 800 * b.n
),
res AS (
  SELECT doc_a, doc_b,
         len(list_intersect(oa.tk, ob.tk)) AS inter,
         len(oa.tk) + len(ob.tk) - len(list_intersect(oa.tk, ob.tk)) AS uni
  FROM cand
  JOIN ordered oa ON oa.doc_id = doc_a
  JOIN ordered ob ON ob.doc_id = doc_b
)
SELECT doc_a, doc_b, CAST((inter * 1000000) // uni AS BIGINT) AS jaccard_ppm
FROM res WHERE inter * 1000 >= 800 * uni
"""

QUERIES["d_jaccard_join"] = (d_jaccard_join, D_JACCARD_JOIN_SQL)


# --------------------------------------------------------------------------
# Gopher + C4 quality-rule bundles (corpus/text.py). The raw corpus text
# is single-line and punctuation-free, so both engines first synthesize
# the SAME structured multi-line document from each doc's tokens (lines
# of 7 tokens; deterministic bullet prefixes, terminal punctuation, an
# occasional planted 'lorem ipsum'/'{' marker keyed off doc_id) — then
# the real rule bundle runs on it. Every stat and the rebuilt C4 text
# (pinned via md5) is value-compared.


def _structured_text_spark(doc_id, text):
    toks = F.slice(X.tokens(text), 1, 28)  # 4 lines x 7 tokens
    n_lines = F.ceil(F.size(toks) / F.lit(7)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.when((doc_id + i) % 5 == 0, F.lit("- ")).otherwise(F.lit("")),
            F.array_join(F.slice(toks, i * 7 + 1, 7), " "),
            F.element_at(
                F.array(F.lit(""), F.lit("."), F.lit("!"), F.lit("...")),
                ((doc_id + i) % 4 + 1).cast("int"),
            ),
        ),
    )
    lines = F.when(
        doc_id % 97 == 0,
        F.concat(F.array(F.lit("lorem ipsum dolor sit amet consectetur.")), lines),
    ).otherwise(lines)
    lines = F.when(
        doc_id % 89 == 0, F.concat(lines, F.array(F.lit("function() {")))
    ).otherwise(lines)
    return F.array_join(lines, "\n")


_STRUCTURED_TEXT_SQL = """
  SELECT doc_id, array_to_string(CASE WHEN doc_id % 89 = 0
           THEN list_append(lns, 'function() {{')
           ELSE lns END, chr(10)) AS stext
  FROM (
    SELECT doc_id, CASE WHEN doc_id % 97 = 0
             THEN list_prepend('lorem ipsum dolor sit amet consectetur.', lns0)
             ELSE lns0 END AS lns
    FROM (
      SELECT doc_id,
             list_transform(generate_series(0,
                 CAST(ceil(len(tk) / 7.0) AS INTEGER) - 1), i ->
               concat(
                 CASE WHEN (doc_id + i) % 5 = 0 THEN '- ' ELSE '' END,
                 array_to_string(list_slice(tk, i*7 + 1, i*7 + 7), ' '),
                 ['', '.', '!', '...'][CAST((doc_id + i) % 4 AS INTEGER) + 1]
               )) AS lns0
      FROM (SELECT doc_id, list_slice({toks}, 1, 28) AS tk FROM documents)
    )
  )
"""


def d_text_gopher(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    st = _structured_text_spark(F.col("doc_id"), F.col("text"))
    stats = X.gopher_stats(st)
    return d.select(
        "doc_id",
        *[v.alias(k) for k, v in stats.items()],
        X.gopher_keep(st).alias("keep"),
    )


D_TEXT_GOPHER_SQL = f"""
WITH st AS ({_STRUCTURED_TEXT_SQL.format(toks=SQL_TOKS)}),
w AS (
  SELECT doc_id, stext,
         list_filter(str_split_regex(trim(stext), '\\s+'),
                     x -> len(x) > 0) AS ws,
         list_filter(str_split(stext, chr(10)),
                     l -> len(trim(l)) > 0) AS lns
  FROM st
),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(lns) AS BIGINT) AS n_lines,
         CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT)
           AS sum_word_len,
         len(str_split(stext, '#')) - 1
           + len(str_split(stext, '...')) - 1 AS n_symbol,
         len(list_filter(lns, l -> starts_with(trim(l), '- ')
                               OR starts_with(trim(l), '* '))) AS n_bullet,
         len(list_filter(lns, l -> ends_with(rtrim(l), '...'))) AS n_ellipsis,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         CAST(len(list_filter(
             {list(X.GOPHER_STOPWORDS)},
             s -> list_contains(list_transform(ws, x -> lower(x)), s)))
           AS BIGINT) AS n_stopwords
  FROM w
)
SELECT doc_id, n_words, n_lines,
       coalesce(sum_word_len, 0) AS sum_word_len,
       CAST(CASE WHEN n_words > 0
            THEN (n_symbol * 1000) // n_words ELSE 0 END AS BIGINT)
         AS symbol_permille,
       CAST(CASE WHEN n_lines > 0
            THEN (n_bullet * 1000) // n_lines ELSE 0 END AS BIGINT)
         AS bullet_permille,
       CAST(CASE WHEN n_lines > 0
            THEN (n_ellipsis * 1000) // n_lines ELSE 0 END AS BIGINT)
         AS ellipsis_permille,
       CAST(CASE WHEN n_words > 0
            THEN (n_alpha * 1000) // n_words ELSE 0 END AS BIGINT)
         AS alpha_permille,
       n_stopwords,
       (n_words >= {X.GOPHER_MIN_WORDS} AND n_words <= {X.GOPHER_MAX_WORDS}
        AND coalesce(sum_word_len, 0) >= {X.GOPHER_MIN_MEAN_WORD_LEN} * n_words
        AND coalesce(sum_word_len, 0) <= {X.GOPHER_MAX_MEAN_WORD_LEN} * n_words
        AND CASE WHEN n_words > 0 THEN (n_symbol * 1000) // n_words ELSE 0 END
            <= {X.GOPHER_MAX_SYMBOL_PERMILLE}
        AND CASE WHEN n_lines > 0 THEN (n_bullet * 1000) // n_lines ELSE 0 END
            <= {X.GOPHER_MAX_BULLET_PERMILLE}
        AND CASE WHEN n_lines > 0 THEN (n_ellipsis * 1000) // n_lines ELSE 0 END
            <= {X.GOPHER_MAX_ELLIPSIS_PERMILLE}
        AND CASE WHEN n_words > 0 THEN (n_alpha * 1000) // n_words ELSE 0 END
            >= {X.GOPHER_MIN_ALPHA_PERMILLE}
        AND n_stopwords >= {X.GOPHER_MIN_STOPWORDS}) AS keep
FROM m
"""

QUERIES["d_text_gopher"] = (d_text_gopher, D_TEXT_GOPHER_SQL)


def d_text_c4(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    st = _structured_text_spark(F.col("doc_id"), F.col("text"))
    stats = X.c4_stats(st)
    return d.select(
        "doc_id",
        stats["n_lines"].alias("n_lines"),
        stats["n_kept"].alias("n_kept"),
        stats["has_lorem"].alias("has_lorem"),
        stats["has_brace"].alias("has_brace"),
        F.md5(stats["kept_text"]).alias("kept_md5"),
    )


D_TEXT_C4_SQL = f"""
WITH st AS ({_STRUCTURED_TEXT_SQL.format(toks=SQL_TOKS)}),
l AS (
  SELECT doc_id, stext, str_split(stext, chr(10)) AS lns FROM st
),
k AS (
  SELECT doc_id, stext, lns,
         list_filter(lns, l ->
           (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
            OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
           AND len(list_filter(str_split_regex(trim(l), '\\s+'),
                               x -> len(x) > 0)) >= {X.C4_MIN_LINE_WORDS}
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM l
)
SELECT doc_id,
       CAST(len(lns) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       contains(lower(stext), 'lorem ipsum') AS has_lorem,
       contains(stext, '{{') AS has_brace,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_md5
FROM k
"""

QUERIES["d_text_c4"] = (d_text_c4, D_TEXT_C4_SQL)


# --------------------------------------------------------------------------
# Batch exact k-NN join (corpus/similarity.py::knn_join): queries = the
# five lowest-id embedding rows probing the whole embeddings table
# (self-match included at rank 1 — pins the score path end-to-end). The
# engine resolves top-k in two partition-local phases; the oracle ranks
# with a plain per-query window — value equality proves the distributed
# merge reproduces the naive ranking exactly.


def d_sim_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.knn_join(q, e, k=5)


_KNN_COS = (
    "round(list_aggregate(list_transform(q.embedding,"
    " (x, i) -> x::DOUBLE * c.embedding[i]::DOUBLE), 'sum')"
    " / greatest("
    "sqrt(list_aggregate(list_transform(q.embedding,"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
    " sqrt(list_aggregate(list_transform(c.embedding,"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12), 6)"
)

D_SIM_KNN_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_KNN_COS} AS cosine_sim
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, vec_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM ranked WHERE rank <= 5
"""

QUERIES["d_sim_knn_join"] = (d_sim_knn_join, D_SIM_KNN_SQL)


# --------------------------------------------------------------------------
# ANN quality evaluation (corpus/similarity.py::ann_recall): recall@k of
# the LSH-bucketed approximate top-k against the exact brute-force
# ground truth, per query. The engine resolves both sides with the
# two-phase distributed top-k; the oracle ranks both sides with plain
# windows over the same md5-derived signatures — value equality pins the
# bucketing, the ranking, and the recall arithmetic.


def d_sim_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    return S.ann_recall(
        t(spark, sf, "embeddings"), n_queries=8, k=10, nplanes=_ANN_PLANES
    )


_RECALL_COS = (
    "round(list_aggregate(list_transform(q.qv,"
    " (x, i) -> x::DOUBLE * s.embedding[i]::DOUBLE), 'sum')"
    " / greatest("
    "sqrt(list_aggregate(list_transform(q.qv,"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
    " sqrt(list_aggregate(list_transform(s.embedding,"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12), 6)"
)


def _ann_recall_sql() -> str:
    sig = _sig_sql(_ANN_PLANES)
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS sig FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, sig AS qsig
  FROM sigs WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, s.vec_id, {_RECALL_COS} AS cosine_sim,
         (s.sig = q.qsig) AS same_bucket
  FROM sigs s, q WHERE s.vec_id <> q.query_id
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, vec_id) AS r
    FROM scored) WHERE r <= 10
), ann AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, vec_id) AS r
    FROM scored WHERE same_bucket) WHERE r <= 10
)
SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
       round(count(a.vec_id)::DOUBLE / 10, 6) AS recall
FROM exact e LEFT JOIN ann a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
"""


QUERIES["d_sim_ann_recall"] = (d_sim_ann_recall, _ann_recall_sql())


# --------------------------------------------------------------------------
# Matryoshka truncation recall (Kusupati et al. 2022): how much top-k
# quality survives ranking by the first 16 of 64 embedding components —
# the memory/bandwidth knob BEFORE product quantization. Same two-phase
# top-k + recall-join shape as d_sim_ann_recall; value-exact.

_MRL_DIMS = 16


def d_sim_matryoshka(spark: SparkSession, sf: str) -> DataFrame:
    return S.matryoshka_recall(
        t(spark, sf, "embeddings"), n_queries=8, k=10, prefix_dims=_MRL_DIMS
    )


_MRL_TCOS = (
    "round(list_aggregate(list_transform(list_slice(q.qv, 1, {d}),"
    " (x, i) -> x::DOUBLE * s.embedding[i]::DOUBLE), 'sum')"
    " / greatest("
    "sqrt(list_aggregate(list_transform(list_slice(q.qv, 1, {d}),"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')) *"
    " sqrt(list_aggregate(list_transform(list_slice(s.embedding, 1, {d}),"
    " x -> x::DOUBLE * x::DOUBLE), 'sum')), 1e-12), 6)"
).format(d=_MRL_DIMS)


def _matryoshka_sql() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, s.vec_id,
         {_RECALL_COS} AS cos_full,
         {_MRL_TCOS} AS cos_trunc
  FROM embeddings s, q WHERE s.vec_id <> q.query_id
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_full DESC, vec_id) AS r
    FROM scored) WHERE r <= 10
), tr AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_trunc DESC, vec_id) AS r
    FROM scored) WHERE r <= 10
)
SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
       round(count(a.vec_id)::DOUBLE / 10, 6) AS recall
FROM exact e LEFT JOIN tr a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
"""


QUERIES["d_sim_matryoshka"] = (d_sim_matryoshka, _matryoshka_sql())


# --------------------------------------------------------------------------
# Intra-document line dedup (corpus/text.py::dedup_lines): repeated
# nav/footer lines inside ONE document are dropped (first occurrence
# wins, order preserved) and the text rebuilt. The synth plants in-doc
# duplicates two ways (doc_id % 3: repeat of line 0; doc_id % 4: a
# doubled boilerplate footer) so removal and pass-through are both
# non-vacuous; the oracle compares the rebuilt strings.


def d_dedup_lines(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import dedup_lines

    d = t(spark, sf, "documents")
    toks21 = F.slice(X.tokens(F.col("text")), 1, 21)
    l3 = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda i: F.array_join(F.slice(toks21, i * 7 + 1, 7), " "),
    )
    lines = F.when(
        F.col("doc_id") % 3 == 0, F.concat(l3, F.slice(l3, 1, 1))
    ).otherwise(l3)
    lines = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            lines,
            F.array(F.lit("all rights reserved"), F.lit("all rights reserved")),
        ),
    ).otherwise(lines)
    st = F.array_join(lines, "\n")
    return dedup_lines(d.select("doc_id", st.alias("text")))


D_DEDUP_LINES_SQL = f"""
WITH base AS (
  -- coalesce: DuckDB's array_to_string([]) is NULL (Spark's array_join
  -- is ''), and NULL elements would be silently skipped by the outer
  -- array_to_string — short docs would lose their empty lines
  SELECT doc_id, list_transform(generate_series(0, 2), i ->
      coalesce(array_to_string(list_slice(tk, i*7 + 1, i*7 + 7), ' '), ''))
    AS l
  FROM (SELECT doc_id, list_slice({SQL_TOKS}, 1, 21) AS tk FROM documents)
), lx AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0
    THEN list_concat(l, list_slice(l, 1, 1)) ELSE l END AS l FROM base
), ly AS (
  SELECT doc_id, CASE WHEN doc_id % 4 = 0
    THEN list_concat(l, ['all rights reserved', 'all rights reserved'])
    ELSE l END AS l FROM lx
), st AS (SELECT doc_id, array_to_string(l, chr(10)) AS stext FROM ly),
ln AS (
  SELECT doc_id, i - 1 AS idx, ls[i] AS line
  FROM (SELECT doc_id, str_split(stext, chr(10)) AS ls FROM st),
       LATERAL unnest(generate_series(1, len(ls))) u(i)
), firsts AS (
  SELECT doc_id, line, min(idx) AS idx FROM ln GROUP BY doc_id, line
), agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY idx) AS clean_text
  FROM firsts GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(len(str_split(s.stext, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(str_split(s.stext, chr(10))) - a.n_kept AS BIGINT)
         AS n_dup_lines,
       a.clean_text
FROM st s JOIN agg a USING (doc_id)
"""

QUERIES["d_dedup_lines"] = (d_dedup_lines, D_DEDUP_LINES_SQL)


# --------------------------------------------------------------------------
# Character-entropy junk detector (corpus/text.py::char_entropy_milli):
# millibit Shannon entropy of each doc's character distribution. A
# planted base64-ish blob (hex of md5, high entropy) and a degenerate
# repetition (low entropy) are grafted onto ~1/13 and ~1/17 of docs so
# both tails are non-vacuous.


def d_text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.dedup import _spread
    from who_focus_crawler_spark.corpus.text import char_entropy_milli

    d = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    synth = (
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("text"), F.lit(" "), F.md5(F.col("text"))),
        )
        .when(F.col("doc_id") % 17 == 0, F.lit("aaaaaaaaaaaaaaaaaaaab"))
        .otherwise(F.col("text"))
    )
    return d.select(
        "doc_id", char_entropy_milli(synth).alias("entropy_milli")
    )


D_TEXT_ENTROPY_SQL = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' ' || md5(text)
              WHEN doc_id % 17 = 0 THEN 'aaaaaaaaaaaaaaaaaaaab'
              ELSE text END AS stext
  FROM documents
), ch AS (
  SELECT doc_id,
         list_filter(str_split(stext, ''), c -> len(c) > 0) AS chars
  FROM s
)
SELECT doc_id,
       CASE WHEN len(chars) > 0 THEN
         CAST(floor(1000 * list_aggregate(list_transform(
           list_sort(list_distinct(chars)), c ->
             -(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE)
               / len(chars))
             * log2(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE)
               / len(chars))), 'sum')) AS BIGINT)
       ELSE 0 END AS entropy_milli
FROM ch
"""

QUERIES["d_text_entropy"] = (d_text_entropy, D_TEXT_ENTROPY_SQL)


# --------------------------------------------------------------------------
# Multimodal resize (corpus/multimodal.py::resize_nearest): the 9×8
# probe-pixel grid of each payload downsampled to 3×2 by nearest
# neighbor — pure native index arithmetic; the oracle recomputes the
# same ⌊r·src/dst⌋ mapping over the same hex-probed pixels.


def d_media_resize(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    base = d.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    rz = MM.resize_nearest(
        MM.dhash_pixels(F.col("payload")), src_w=9, src_h=8, dst_w=3, dst_h=2
    )
    out = base.select("media_id", rz.alias("_rz"))
    return out.select(
        "media_id",
        *[
            F.element_at("_rz", k + 1).cast("int").alias(f"p{k}")
            for k in range(6)
        ],
    )


D_MEDIA_RESIZE_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
),
px AS (
  SELECT media_id,
         list_transform(generate_series(0,71), i ->
           CAST(('0x' || substring(h, CAST((i*(n-1))//71 AS BIGINT)*2 + 1, 2))
                AS INTEGER)) AS p
  FROM m
),
rz AS (
  SELECT media_id,
         list_transform(generate_series(0,5), i ->
           p[((i//3)*8//2)*9 + ((i%3)*9//3) + 1]) AS q
  FROM px
)
SELECT media_id, CAST(q[1] AS INTEGER) AS p0, CAST(q[2] AS INTEGER) AS p1,
       CAST(q[3] AS INTEGER) AS p2, CAST(q[4] AS INTEGER) AS p3,
       CAST(q[5] AS INTEGER) AS p4, CAST(q[6] AS INTEGER) AS p5
FROM rz
"""

QUERIES["d_media_resize"] = (d_media_resize, D_MEDIA_RESIZE_SQL)


# --------------------------------------------------------------------------
# Exact heavy hitters (corpus/heavy.py): two-pass Misra-Gries — bounded
# O(k) memory per task, candidates broadcast, exact rescan. The oracle
# is the plain GROUP BY answer the two-pass route must reproduce
# exactly (threshold count*(k+1) > n).

_HH_K = 30


def d_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.heavy import heavy_hitters

    d = t(spark, sf, "documents")
    items = d.select(F.explode(X.tokens(F.col("text"))).alias("item"))
    return heavy_hitters(items, k=_HH_K)


D_HEAVY_HITTERS_SQL = f"""
WITH tok AS (
  SELECT unnest({SQL_TOKS}) AS item FROM documents
),
tot AS (SELECT count(*) AS n FROM tok)
SELECT item, count(*) AS n_occurrences
FROM tok, tot
GROUP BY item, n
HAVING count(*) * {_HH_K + 1} > n
"""

QUERIES["d_heavy_hitters"] = (d_heavy_hitters, D_HEAVY_HITTERS_SQL)


# --------------------------------------------------------------------------
# Readability (Flesch reading ease in integer milli-points)


def d_text_readability(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    st = X.readability_stats(F.col("text"))
    return d.select(
        "doc_id",
        st["n_words"].alias("n_words"),
        st["n_sentences"].alias("n_sentences"),
        st["n_syllables"].alias("n_syllables"),
        st["fre_milli"].alias("fre_milli"),
    )


D_TEXT_READABILITY_SQL = f"""
WITH s AS (
  SELECT doc_id,
         len({SQL_TOKS}) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sn,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM documents
)
SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(sn AS BIGINT) AS n_sentences,
       CAST(y AS BIGINT) AS n_syllables,
       CAST(CASE WHEN w > 0
                 THEN 206835 - (1015 * w) // sn - (84600 * y) // w
            END AS BIGINT) AS fre_milli
FROM s
"""

QUERIES["d_text_readability"] = (d_text_readability, D_TEXT_READABILITY_SQL)


# --------------------------------------------------------------------------
# Lexicon topic tagging: per-topic occurrence counts + deterministic
# argmax label, rolled up per (source, topic).


def d_text_topics(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    toks = X.tokens(F.col("text"))
    sc = X.topic_scores(toks)
    return (
        d.select(
            "source",
            X.predict_topic(toks).alias("topic"),
            sc["health"].alias("health_hits"),
            sc["data"].alias("data_hits"),
            sc["web"].alias("web_hits"),
        )
        .groupBy("source", "topic")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("health_hits").alias("health_hits"),
            F.sum("data_hits").alias("data_hits"),
            F.sum("web_hits").alias("web_hits"),
        )
    )


def _topics_sql() -> str:
    from who_focus_crawler_spark.corpus.text import TOPIC_LEXICON

    def hits(topic: str) -> str:
        lst = ", ".join(f"'{w}'" for w in TOPIC_LEXICON[topic])
        return (
            f"len(list_filter({SQL_TOKS}, "
            f"x -> list_contains([{lst}], x)))"
        )

    return f"""
WITH scored AS (
  SELECT source,
         {hits('health')} AS h,
         {hits('data')} AS d,
         {hits('web')} AS w
  FROM documents
),
labeled AS (
  SELECT source, h, d, w,
         CASE WHEN d = 0 AND h = 0 AND w = 0 THEN 'other'
              WHEN d >= h AND d >= w THEN 'data'
              WHEN h >= w THEN 'health'
              ELSE 'web' END AS topic
  FROM scored
)
SELECT source, topic, count(*) AS n_docs,
       CAST(sum(h) AS BIGINT) AS health_hits,
       CAST(sum(d) AS BIGINT) AS data_hits,
       CAST(sum(w) AS BIGINT) AS web_hits
FROM labeled GROUP BY source, topic
"""


QUERIES["d_text_topics"] = (d_text_topics, _topics_sql())

# --------------------------------------------------------------------------
# T5 span corruption (corpus/t5.py — Raffel et al. 2020 §3.1.4):
# md5-derived span draws, gaps-and-islands merge, sentinel numbering,
# and full input/target reconstruction — byte-compared per document.

_T5_H = (
    "CAST(concat('0x', substring(md5('t5:{tag}|' || doc_id || '|' || pos),"
    " 1, 15)) AS BIGINT)"
)


def d_t5_spans(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.t5 import span_corruption

    return span_corruption(t(spark, sf, "documents"))


D_T5_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS tk FROM documents
), ex AS (
  SELECT doc_id, len(tk) AS n, u.pos AS pos, u.tok AS tok FROM (
    SELECT doc_id, tk,
           unnest(list_transform(generate_series(1, len(tk)), i ->
             struct_pack(pos := CAST(i AS BIGINT), tok := tk[i]))) AS u
    FROM toks)
), starts AS (
  SELECT doc_id, pos, n, ({_T5_H.format(tag='len')} % 5) + 1 AS slen
  FROM ex WHERE {_T5_H.format(tag='start')} % 1000 < 60
), covered AS (
  SELECT DISTINCT doc_id, cpos FROM (
    SELECT doc_id,
           unnest(generate_series(pos, least(pos + slen - 1, n))) AS cpos
    FROM starts)
), isl AS (
  SELECT doc_id, cpos,
         cpos - row_number() OVER (PARTITION BY doc_id ORDER BY cpos) AS grp
  FROM covered
), spans AS (
  SELECT doc_id, min(cpos) AS spos, max(cpos) AS epos,
         row_number() OVER (PARTITION BY doc_id ORDER BY min(cpos)) - 1 AS sid
  FROM isl GROUP BY doc_id, grp
), per_span AS (
  SELECT s.doc_id, s.sid,
         '<extra_id_' || s.sid || '> ' ||
           string_agg(e.tok, ' ' ORDER BY e.pos) AS piece
  FROM spans s
  JOIN ex e ON e.doc_id = s.doc_id AND e.pos BETWEEN s.spos AND s.epos
  GROUP BY s.doc_id, s.sid
), targets AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY sid) AS targets_text,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM per_span GROUP BY doc_id
), inputs AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS input_text FROM (
    SELECT e.doc_id, e.pos, e.tok FROM ex e
      ANTI JOIN covered c ON c.doc_id = e.doc_id AND c.cpos = e.pos
    UNION ALL
    SELECT doc_id, spos AS pos, '<extra_id_' || sid || '>' AS tok FROM spans
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(i.input_text, '') AS input_text,
       coalesce(t.targets_text, '') AS targets_text,
       coalesce(t.n_spans, 0) AS n_spans
FROM documents d
LEFT JOIN inputs i USING (doc_id)
LEFT JOIN targets t USING (doc_id)
"""

QUERIES["d_t5_spans"] = (d_t5_spans, D_T5_SQL)

# --------------------------------------------------------------------------
# HTML entity unescaping (corpus/entities.py): escaped payloads built
# deterministically from documents; byte-compared after decoding. The
# DuckDB twin runs the same sentinel-split algorithm (chr() agrees
# across engines in the decoded 32..126 range by construction).


def d_text_unescape(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.entities import unescape_html

    esc = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit('A &amp; B &lt;i&gt; &quot;'),
            F.substring("text", 1, 40),
            F.lit("&quot; &#72;&#x69; &copy; &#8364; &nbsp;end &"),
        ).alias("t"),
    )
    return esc.select("doc_id", unescape_html(F.col("t")).alias("unescaped"))


_UE_DEC = "regexp_extract(p, '^&#([0-9]{1,7});', 1)"
_UE_HEX = "regexp_extract(p, '^&#[xX]([0-9A-Fa-f]{1,6});', 1)"

D_TEXT_UNESCAPE_SQL = f"""
WITH esc AS (
  SELECT doc_id,
         'A &amp; B &lt;i&gt; &quot;' || substr(text, 1, 40)
           || '&quot; &#72;&#x69; &copy; &#8364; &nbsp;end &' AS t
  FROM documents
)
SELECT doc_id,
  array_to_string(list_transform(
    string_split(regexp_replace(t, '&', chr(1) || '&', 'g'), chr(1)),
    p -> CASE
      WHEN starts_with(p, '&amp;')  THEN '&' || substr(p, 6)
      WHEN starts_with(p, '&lt;')   THEN '<' || substr(p, 5)
      WHEN starts_with(p, '&gt;')   THEN '>' || substr(p, 5)
      WHEN starts_with(p, '&quot;') THEN '"' || substr(p, 7)
      WHEN starts_with(p, '&apos;') THEN '''' || substr(p, 7)
      WHEN starts_with(p, '&nbsp;') THEN ' ' || substr(p, 7)
      WHEN {_UE_DEC} <> ''
           AND CAST({_UE_DEC} AS BIGINT) BETWEEN 32 AND 126
        THEN chr(CAST({_UE_DEC} AS INT)) || substr(p, len({_UE_DEC}) + 4)
      WHEN {_UE_HEX} <> ''
           AND CAST(concat('0x', {_UE_HEX}) AS BIGINT) BETWEEN 32 AND 126
        THEN chr(CAST(CAST(concat('0x', {_UE_HEX}) AS BIGINT) AS INT))
               || substr(p, len({_UE_HEX}) + 5)
      ELSE p END), '') AS unescaped
FROM esc
"""

QUERIES["d_text_unescape"] = (d_text_unescape, D_TEXT_UNESCAPE_SQL)

# --------------------------------------------------------------------------
# Cross-document line dedup (corpus/text.py::dedup_lines_global — the
# CCNet paragraph-dedup step at line granularity): two boilerplate
# lines planted around every document; each survives only in its
# (doc_id, idx)-minimal position corpus-wide. Rebuilt texts are
# byte-compared.


def d_dedup_lines_global(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import dedup_lines_global

    src = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("accept our cookies to continue reading this site\n"),
            F.col("text"),
            F.lit("\ncopyright example press syndicate all rights reserved"),
        ).alias("text"),
    )
    return dedup_lines_global(src)


D_DEDUP_LINES_GLOBAL_SQL = """
WITH src AS (
  SELECT doc_id,
         'accept our cookies to continue reading this site' || chr(10)
           || text || chr(10)
           || 'copyright example press syndicate all rights reserved' AS t
  FROM documents
), lines AS (
  SELECT doc_id, u.idx AS idx, u.line AS line FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(string_split(t, chr(10)))), i ->
               struct_pack(idx := CAST(i - 1 AS BIGINT),
                           line := string_split(t, chr(10))[i]))) AS u
    FROM src)
), winners AS (
  SELECT line, doc_id AS wd, idx AS wi FROM (
    SELECT line, doc_id, idx,
           row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
    FROM lines WHERE len(line) >= 10
  ) WHERE rn = 1
), kept AS (
  SELECT l.doc_id, l.idx, l.line
  FROM lines l LEFT JOIN winners w ON l.line = w.line
  WHERE len(l.line) < 10 OR (w.wd = l.doc_id AND w.wi = l.idx)
), rebuilt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(line, chr(10) ORDER BY idx) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(len(string_split(s.t, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(string_split(s.t, chr(10))) - coalesce(r.n_kept, 0) AS BIGINT)
         AS n_dropped,
       coalesce(r.clean_text, '') AS clean_text
FROM src s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
"""

QUERIES["d_dedup_lines_global"] = (d_dedup_lines_global, D_DEDUP_LINES_GLOBAL_SQL)

# --------------------------------------------------------------------------
# SQ8 scalar quantization + asymmetric-distance top-k
# (corpus/similarity.py::sq8_*): per-dimension integer bounds, 8-bit
# codes, reconstruction, and exact-integer ADC L2 — the full encode →
# probe path value-pinned against the identical integer CTE chain.

_SQ8_QUERY_ID = 7
_SQ8_K = 10


def d_sim_sq8(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.similarity import sq8_topk

    return sq8_topk(t(spark, sf, "embeddings"), query_id=_SQ8_QUERY_ID, k=_SQ8_K)


D_SIM_SQ8_SQL = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings
), dims AS (
  SELECT u.dim AS dim, u.x AS x FROM (
    SELECT unnest(list_transform(generate_series(1, len(qv)), i ->
      struct_pack(dim := i, x := qv[i]))) AS u
    FROM q)
), b AS (
  SELECT dim, min(x) AS qmin, max(x) AS qmax FROM dims GROUP BY dim
), arrs AS (
  SELECT list(qmin ORDER BY dim) AS mins,
         list(greatest(qmax - qmin, 1) ORDER BY dim) AS rngs
  FROM b
), codes AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(qv)),
           i -> ((qv[i] - mins[i]) * 255) // rngs[i]) AS code
  FROM q, arrs
), qy AS (SELECT qv AS y FROM q WHERE vec_id = {_SQ8_QUERY_ID})
SELECT vec_id, CAST(list_aggregate(
         list_transform(generate_series(1, len(code)), i ->
           ((mins[i] + (code[i] * rngs[i]) // 255) - y[i])
           * ((mins[i] + (code[i] * rngs[i]) // 255) - y[i])),
         'sum') AS BIGINT) AS dist2
FROM codes, arrs, qy
ORDER BY dist2, vec_id LIMIT {_SQ8_K}
"""

QUERIES["d_sim_sq8"] = (d_sim_sq8, D_SIM_SQ8_SQL)

# --------------------------------------------------------------------------
# Payment-card PII (corpus/text.py::card_candidates/luhn_valid):
# card-shaped spans planted per doc — half Luhn-valid by construction
# (check digit computed in SQL), half off-by-one invalid — exploded to
# one row per candidate with the validity verdict.


def d_pii_cards(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import card_candidates

    d = t(spark, sf, "documents")
    # 15 fixed digits derived from doc_id; the 16th is the Luhn check
    # digit (valid class) or check+1 mod 10 (invalid class)
    base = F.lpad((F.col("doc_id") % 10**9).cast("string"), 15, "4")
    # Luhn check digit over the 15-digit base, computed natively
    arr = F.reverse(F.split(base, ""))
    s = F.aggregate(
        F.zip_with(
            F.filter(arr, lambda c: c != ""),
            F.sequence(F.lit(0), F.lit(14)),
            lambda c, i: F.when(
                i % 2 == 0,
                F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
                    c.cast("int") * 2
                ),
            ).otherwise(c.cast("int")),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    check = (10 - s % 10) % 10
    digit = F.when(F.col("doc_id") % 2 == 0, check).otherwise((check + 1) % 10)
    txt = F.concat(
        F.lit("ref "), F.substring("text", 1, 24),
        F.lit(" card "), base, digit.cast("string"), F.lit(" end"),
    )
    ex = d.select("doc_id", F.explode(card_candidates(txt)).alias("c"))
    return ex.select(
        "doc_id",
        F.col("c.candidate").alias("candidate"),
        F.col("c.digits").alias("digits"),
        F.col("c.valid").alias("valid"),
    )


D_PII_CARDS_SQL = """
WITH base AS (
  SELECT doc_id,
         lpad(CAST(doc_id % 1000000000 AS VARCHAR), 15, '4') AS b
  FROM documents
), summed AS (
  SELECT doc_id, b,
         list_sum(list_transform(generate_series(1, 15), i ->
           CASE WHEN (i - 1) % 2 = 0 THEN
             CASE WHEN CAST(substr(reverse(b), i, 1) AS INT) * 2 > 9
                  THEN CAST(substr(reverse(b), i, 1) AS INT) * 2 - 9
                  ELSE CAST(substr(reverse(b), i, 1) AS INT) * 2 END
           ELSE CAST(substr(reverse(b), i, 1) AS INT) END)) AS s
  FROM base
), cards AS (
  SELECT doc_id,
         b || CAST(CASE WHEN doc_id % 2 = 0 THEN (10 - s % 10) % 10
                        ELSE ((10 - s % 10) % 10 + 1) % 10 END AS VARCHAR)
           AS card
  FROM summed
)
SELECT doc_id,
       card AS candidate,
       card AS digits,
       (len(card) BETWEEN 13 AND 19) AND
       list_sum(list_transform(generate_series(1, len(card)), i ->
         CASE WHEN (i - 1) % 2 = 1 THEN
           CASE WHEN CAST(substr(reverse(card), i, 1) AS INT) * 2 > 9
                THEN CAST(substr(reverse(card), i, 1) AS INT) * 2 - 9
                ELSE CAST(substr(reverse(card), i, 1) AS INT) * 2 END
         ELSE CAST(substr(reverse(card), i, 1) AS INT) END)) % 10 = 0
         AS valid
FROM cards
"""

QUERIES["d_pii_cards"] = (d_pii_cards, D_PII_CARDS_SQL)

# --------------------------------------------------------------------------
# Unicode script detection (corpus/text.py::predict_script /
# script_counts): eight planted script classes (Latin, Cyrillic, Greek,
# Arabic, Devanagari, CJK, Hangul, digits-only 'und'); the engine
# computes real per-codepoint counts, the oracle states the
# hand-computed ground truth by construction.

_SCRIPT_SAMPLES = [
    "the quick brown fox jumps over ref ok",
    "привет мир как дела сегодня ref ok",
    "γειά σου κόσμε τι κάνεις ref ok",
    "مرحبا بالعالم كيف الحال ref ok",
    "नमस्ते दुनिया कैसे हो ref ok",
    "こんにちは世界お元気ですか ref ok",
    "안녕하세요 세계 반갑습니다 ref ok",
    "1234 5678 --- 9012",
]


def d_text_script(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import predict_script, script_counts

    d = t(spark, sf, "documents").select("doc_id")
    k = (F.col("doc_id") % 8).cast("int")
    txt = F.lit(_SCRIPT_SAMPLES[0])
    for i in range(1, 8):
        txt = F.when(k == i, F.lit(_SCRIPT_SAMPLES[i])).otherwise(txt)
    counts = script_counts(txt)
    return d.select(
        "doc_id",
        predict_script(txt).alias("script"),
        counts["latin"].alias("n_latin"),
        counts["cyrillic"].alias("n_cyrillic"),
        counts["cjk"].alias("n_cjk"),
    )


D_TEXT_SCRIPT_SQL = """
SELECT doc_id,
       CASE doc_id % 8
         WHEN 0 THEN 'latin'    WHEN 1 THEN 'cyrillic'
         WHEN 2 THEN 'greek'    WHEN 3 THEN 'arabic'
         WHEN 4 THEN 'devanagari' WHEN 5 THEN 'cjk'
         WHEN 6 THEN 'hangul'   ELSE 'und' END AS script,
       CAST(CASE doc_id % 8 WHEN 0 THEN 30 WHEN 7 THEN 0 ELSE 5 END AS BIGINT)
         AS n_latin,
       CAST(CASE doc_id % 8 WHEN 1 THEN 23 ELSE 0 END AS BIGINT) AS n_cyrillic,
       CAST(CASE doc_id % 8 WHEN 5 THEN 13 ELSE 0 END AS BIGINT) AS n_cjk
FROM documents
"""

QUERIES["d_text_script"] = (d_text_script, D_TEXT_SCRIPT_SQL)

# --------------------------------------------------------------------------
# IVF-routed SQ8 ADC probe (corpus/similarity.py::ivf_sq8_topk): the
# production serving composition — the integer-Lloyd coarse quantizer
# routes to nprobe clusters, SQ8 codes + asymmetric L2 rank inside
# them. Routing AND scores are exact integers, so the whole composed
# path is value-pinned: the oracle reuses the shared IVF fit chain and
# appends the SQ8 CTEs over the probed subset.


def d_sim_ivf_sq8(spark: SparkSession, sf: str) -> DataFrame:
    if sf not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf] = S.ivf_fit_centroids_exact(
            t(spark, sf, "embeddings"),
            n_clusters=_IVF_K,
            iters=_IVF_ITERS,
            qscale=_IVF_QS,
        )
    return S.ivf_sq8_topk(
        t(spark, sf, "embeddings"),
        _IVF_CENTROIDS[sf],
        query_vec_id=0,
        k=10,
        nprobe=2,
        qscale=_IVF_QS,
    )


def _ivf_sq8_sql() -> str:
    return _ivf_prefix(query_id=0, nprobe=2) + """, dims AS (
  SELECT u.dim AS dim, u.x AS x FROM (
    SELECT unnest(list_transform(generate_series(1, len(qv)), i ->
      struct_pack(dim := i, x := qv[i]))) AS u
    FROM q)
), b AS (
  SELECT dim, min(x) AS qmin, max(x) AS qmax FROM dims GROUP BY dim
), arrs AS (
  SELECT list(qmin ORDER BY dim) AS mins,
         list(greatest(qmax - qmin, 1) ORDER BY dim) AS rngs
  FROM b
), probed AS (
  SELECT q.vec_id, q.qv FROM q JOIN af USING (vec_id)
  WHERE af.cl IN (SELECT cl FROM probe) AND q.vec_id <> 0
), codes AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(qv)),
           i -> ((qv[i] - mins[i]) * 255) // rngs[i]) AS code
  FROM probed, arrs
)
SELECT vec_id, CAST(list_sum(
         list_transform(generate_series(1, len(code)), i ->
           ((mins[i] + (code[i] * rngs[i]) // 255) - q0.qv[i])
           * ((mins[i] + (code[i] * rngs[i]) // 255) - q0.qv[i])))
       AS BIGINT) AS dist2
FROM codes, arrs, q0
ORDER BY dist2, vec_id LIMIT 10
"""


QUERIES["d_sim_ivf_sq8"] = (d_sim_ivf_sq8, _ivf_sq8_sql())

# --------------------------------------------------------------------------
# Quality-aware canonical selection (corpus/clusters.py::dedup_keep_best):
# inside each MinHash near-dup cluster the HIGHEST-quality doc survives
# (ties to the lowest id) — the production alternative to blind min-id
# keep. Oracle composes the shared cluster CTE chain with the frozen
# quality formula and a per-cluster argmax election.


def d_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.clusters import dedup_keep_best

    d = t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(
        d,
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        shingle_k=_MH_K,
        jaccard_threshold=_MH_THRESH,
    )
    scored = d.select("doc_id", X.quality_score(F.col("text")).alias("quality"))
    return dedup_keep_best(scored, pairs, "quality", n_iters=_CL_ITERS).select(
        "doc_id", "quality", "cluster_id", "keep"
    )


def _keep_best_sql() -> str:
    return f"""
WITH lbl AS ({_clusters_sql()}),
q AS ({D_TEXT_QUALITY_SQL}),
members AS (
  SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id, q.quality
  FROM q LEFT JOIN lbl l ON q.doc_id = l.doc_id
),
best AS (
  SELECT cluster_id, doc_id AS winner FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC, doc_id ASC) AS rn
    FROM members) WHERE rn = 1
)
SELECT m.doc_id, m.quality, m.cluster_id, m.doc_id = b.winner AS keep
FROM members m JOIN best b USING (cluster_id)
"""


QUERIES["d_dedup_keep_best"] = (d_dedup_keep_best, _keep_best_sql())


# --------------------------------------------------------------------------
# REAL PNG decode end-to-end (corpus/png.py + multimodal.attach_png_media
# / decode_png_stats): every document becomes a genuine 16x8 grayscale
# PNG — signature, CRC'd chunks, deflate, the all-five filter cycle —
# with pixel(r, c) = (md5(text)[c] + r) mod 256; the engine then decodes
# the compressed bytes (inflate + unfilter) and reports exact geometry +
# pixel sums. The pixel rule is analytic, so the DuckDB twin states the
# decoded statistics directly from md5(text) — if any unfilter path or
# the inflate plumbing were wrong, the sums would diverge.


def d_media_decode_png(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_media,
        decode_png_stats,
    )

    media = attach_png_media(t(spark, sf, "documents"))
    return decode_png_stats(media)


D_MEDIA_DECODE_PNG_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
)
SELECT media_id,
       16 AS width, 8 AS height, 1 AS channels,
       CAST(list_sum(list_transform(generate_series(0, 7), r ->
         list_sum(list_transform(generate_series(1, 16), c ->
           (bytes[c] + r) % 256)))) AS BIGINT) AS pixel_sum
FROM b
"""

QUERIES["d_media_decode_png"] = (d_media_decode_png, D_MEDIA_DECODE_PNG_SQL)


# --------------------------------------------------------------------------
# REAL WAV decode end-to-end (corpus/wav.py + multimodal.attach_wav_media
# / decode_wav_stats): every document becomes a genuine mono 16-bit PCM
# RIFF clip — container header, fmt validation, little-endian frames —
# with sample(i) = ((md5(text)[i mod 16] * 257 + i * 31) mod 65536) -
# 32768; the engine then decodes the RIFF bytes and reports exact format
# geometry + sample sums. The sample rule is analytic, so the DuckDB
# twin states the decoded statistics directly from md5(text) — if the
# chunk walk, the signed 16-bit unpack or the frame accounting were
# wrong, the sums would diverge. Audio twin of d_media_decode_png.


def d_media_decode_wav(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_wav_media,
        decode_wav_stats,
    )

    media = attach_wav_media(t(spark, sf, "documents"))
    return decode_wav_stats(media)


D_MEDIA_DECODE_WAV_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
)
SELECT media_id,
       8000 AS sample_rate, 1 AS channels, 16 AS bits, 64 AS n_samples,
       CAST(list_sum(list_transform(generate_series(0, 63), i ->
         ((bytes[(i % 16) + 1] * 257 + i * 31) % 65536) - 32768))
         AS BIGINT) AS sample_sum
FROM b
"""

QUERIES["d_media_decode_wav"] = (d_media_decode_wav, D_MEDIA_DECODE_WAV_SQL)


# --------------------------------------------------------------------------
# Mixed-format REAL decode dispatch: a media table holding genuine PNGs
# (even doc_id) AND genuine WAV clips (odd doc_id) flows through ONE
# decode_media(fake=False) mapInArrow stage, which dispatches per
# payload on magic bytes — the production shape, where a crawl's media
# column is format-heterogeneous and the decode stage must not fork the
# plan per format. Both fixture rules are analytic, so the twin states
# each kind's expected frame features directly from md5(text).


def d_media_mixed_decode(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_media,
        attach_wav_media,
        decode_media,
    )

    docs = t(spark, sf, "documents")
    media = attach_png_media(docs.where(F.col("doc_id") % 2 == 0)).unionAll(
        attach_wav_media(docs.where(F.col("doc_id") % 2 == 1))
    )
    frames = decode_media(media, frames_per_item=2, fake=False)
    return frames.select(
        "media_id",
        "frame_idx",
        F.element_at("feature", 1).cast("double").alias("f_geom"),
        F.element_at("feature", 2).cast("double").alias("f_extent"),
        F.element_at("feature", 3).cast("double").alias("f_band_sum"),
        F.element_at("feature", 4).cast("double").alias("f_band_n"),
    )


D_MEDIA_MIXED_DECODE_SQL = """
WITH m AS (
  SELECT doc_id, 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT doc_id, media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
),
png AS (  -- 16x8 gray, 2 bands of 4 rows: sum over (bytes[c]+r)%256
  SELECT media_id, f.frame_idx,
         16.0 AS f_geom, 8.0 AS f_extent,
         CAST(list_sum(list_transform(generate_series(0, 3), r ->
           list_sum(list_transform(generate_series(1, 16), c ->
             (bytes[c] + r + f.frame_idx * 4) % 256)))) AS DOUBLE)
           AS f_band_sum,
         64.0 AS f_band_n
  FROM b, (SELECT unnest(generate_series(0, 1)) AS frame_idx) f
  WHERE doc_id % 2 = 0
),
wav AS (  -- 64 mono samples, 2 slices of 32
  SELECT media_id, f.frame_idx,
         8000.0 AS f_geom, 64.0 AS f_extent,
         CAST(list_sum(list_transform(generate_series(0, 31), i ->
           ((bytes[((i + f.frame_idx * 32) % 16) + 1] * 257
             + (i + f.frame_idx * 32) * 31) % 65536) - 32768))
           AS DOUBLE) AS f_band_sum,
         32.0 AS f_band_n
  FROM b, (SELECT unnest(generate_series(0, 1)) AS frame_idx) f
  WHERE doc_id % 2 = 1
)
SELECT * FROM png UNION ALL SELECT * FROM wav
"""

QUERIES["d_media_mixed_decode"] = (
    d_media_mixed_decode,
    D_MEDIA_MIXED_DECODE_SQL,
)


# --------------------------------------------------------------------------
# FULL static-PNG decode surface in one payload (corpus/png.py round-4
# completion): every document becomes a 4-bit PALETTE PNG (PLTE + tRNS
# alpha) with ADAM7 interlacing and the all-five filter cycle across
# every pass — index(r, c) = (md5(text)[c] + r) mod 16 over the fixed
# palette entry i = (i*17, i*33 mod 256, i*53 mod 256), alpha 255-i*16.
# The engine inflates, unfilters each of the 7 passes independently,
# scatters pass pixels to frame coordinates, unpacks 4-bit indices and
# expands RGBA. The twin states the decoded statistics analytically;
# the POSITION-WEIGHTED sum (Σ (r*W+c+1)·pixel) is what catches a
# deinterlace that lands pixels at the wrong coordinates — a plain sum
# is permutation-invariant and would not.


def d_media_decode_palette(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_png_palette_media,
        decode_png_full_stats,
    )

    media = attach_png_palette_media(t(spark, sf, "documents"))
    return decode_png_full_stats(media)


D_MEDIA_DECODE_PALETTE_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
),
px AS (  -- per-pixel RGBA sum for index i = (bytes[c]+r)%16
  SELECT media_id, r, c,
         ((bytes[c] + r) % 16) * 17
         + (((bytes[c] + r) % 16) * 33) % 256
         + (((bytes[c] + r) % 16) * 53) % 256
         + 255 - ((bytes[c] + r) % 16) * 16 AS s
  FROM b,
       (SELECT unnest(generate_series(0, 7)) AS r) rr,
       (SELECT unnest(generate_series(1, 16)) AS c) cc
)
SELECT media_id,
       16 AS width, 8 AS height, 4 AS channels,
       CAST(sum(s) AS BIGINT) AS pixel_sum,
       CAST(sum((r * 16 + c) * s) AS BIGINT) AS weighted_sum
FROM px
GROUP BY media_id
"""

QUERIES["d_media_decode_palette"] = (
    d_media_decode_palette,
    D_MEDIA_DECODE_PALETTE_SQL,
)


# --------------------------------------------------------------------------
# FULL uncompressed-audio decode surface (corpus/wav.py round-4
# completion): every document becomes a STEREO 24-bit integer-PCM clip
# wrapped in WAVE_FORMAT_EXTENSIBLE (GUID sub-format resolution, packed
# 3-byte signed frames) — interleaved sample(i) = ((md5(text)[i mod 16]
# * 65793 + i*4099) mod 2^24) - 2^23. The POSITION-WEIGHTED sum is what
# catches a wrong channel interleave or a byte-order slip inside the
# 3-byte triples — a plain sum is permutation-invariant and would not.


def d_media_decode_wav24(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_wav24_media,
        decode_wav_full_stats,
    )

    media = attach_wav24_media(t(spark, sf, "documents"))
    return decode_wav_full_stats(media)


D_MEDIA_DECODE_WAV24_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
),
s AS (
  SELECT media_id, i,
         ((bytes[(i % 16) + 1] * 65793 + i * 4099) % 16777216)
           - 8388608 AS v
  FROM b, (SELECT unnest(generate_series(0, 127)) AS i) ii
)
SELECT media_id,
       48000 AS sample_rate, 2 AS channels, 24 AS bits, 128 AS n_samples,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(sum((i + 1) * v) AS BIGINT) AS weighted_sum
FROM s
GROUP BY media_id
"""

QUERIES["d_media_decode_wav24"] = (
    d_media_decode_wav24,
    D_MEDIA_DECODE_WAV24_SQL,
)


# --------------------------------------------------------------------------
# REAL baseline-JPEG decode end-to-end (corpus/jpeg.py +
# multimodal.attach_jpeg_media / decode_jpeg_stats): every document
# becomes a genuine baseline JPEG — DCT, Annex-K quantization,
# canonical Huffman with byte stuffing — from the wrap-free source rule
# pixel(r, c) = md5(text)[c] mod 240 + r; the engine then decodes the
# entropy stream (marker walk, Huffman, dequant, IDCT) and compares
# the recovered pixels to the rule. JPEG is LOSSY, so the contract is
# a bounded-error boolean: the oracle states geometry and
# within_tol=true (tol 24, ~2x the measured max error 13), exactly the
# value-exact-boolean pattern of the HLL error-bound queries — if the
# entropy decode, dequant or IDCT were wrong the booleans flip.


def d_media_decode_jpeg(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg_media,
        decode_jpeg_stats,
    )

    media = attach_jpeg_media(t(spark, sf, "documents"))
    return decode_jpeg_stats(media).select(
        "media_id", "width", "height", "channels", "within_tol"
    )


D_MEDIA_DECODE_JPEG_SQL = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       16 AS width, 8 AS height, 1 AS channels,
       TRUE AS within_tol
FROM documents
"""

QUERIES["d_media_decode_jpeg"] = (
    d_media_decode_jpeg,
    D_MEDIA_DECODE_JPEG_SQL,
)


# --------------------------------------------------------------------------
# REAL GIF decode end-to-end (corpus/gif.py + multimodal.attach_gif_media
# / decode_gif_full_stats): every document becomes a genuine INTERLACED
# GIF89a — variable-width LZW, 16-entry global color table (the same
# frozen palette formula as the palette-PNG fixture), GCE transparency
# on index 5 → RGBA. Index(r, c) = (md5(text)[c] + r) mod 16 is
# analytic, so the twin states the decoded RGBA statistics directly;
# the POSITION-WEIGHTED sum catches a wrong deinterlace row
# permutation, which a plain (permutation-invariant) sum cannot.


def d_media_decode_gif(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_gif_media,
        decode_gif_full_stats,
    )

    media = attach_gif_media(t(spark, sf, "documents"))
    return decode_gif_full_stats(media)


D_MEDIA_DECODE_GIF_SQL = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
),
px AS (  -- per-pixel RGBA sum for index i = (bytes[c]+r)%16,
         -- alpha 0 on the transparent index 5 and 255 otherwise
  SELECT media_id, r, c,
         ((bytes[c] + r) % 16) * 17
         + (((bytes[c] + r) % 16) * 33) % 256
         + (((bytes[c] + r) % 16) * 53) % 256
         + CASE WHEN (bytes[c] + r) % 16 = 5 THEN 0 ELSE 255 END AS s
  FROM b,
       (SELECT unnest(generate_series(0, 7)) AS r) rr,
       (SELECT unnest(generate_series(1, 16)) AS c) cc
)
SELECT media_id,
       16 AS width, 8 AS height, 4 AS channels,
       CAST(sum(s) AS BIGINT) AS pixel_sum,
       CAST(sum((r * 16 + c) * s) AS BIGINT) AS weighted_sum
FROM px
GROUP BY media_id
"""

QUERIES["d_media_decode_gif"] = (
    d_media_decode_gif,
    D_MEDIA_DECODE_GIF_SQL,
)


# --------------------------------------------------------------------------
# THREE-format real-decode dispatch (the production media-column shape,
# widened from d_media_mixed_decode's two): genuine PNGs (doc_id%3=0),
# WAV clips (%3=1) AND interlaced GIFs (%3=2) flow through ONE
# decode_media(fake=False) mapInArrow stage that dispatches per payload
# on magic bytes. All three fixture rules are analytic — lossless
# codecs — so the twin states every frame feature exactly (JPEG stays
# out of the mixed twin: lossy, its proof is the bounded-error query).


def d_media_mixed_decode3(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_gif_media,
        attach_png_media,
        attach_wav_media,
        decode_media,
    )

    docs = t(spark, sf, "documents")
    media = (
        attach_png_media(docs.where(F.col("doc_id") % 3 == 0))
        .unionAll(attach_wav_media(docs.where(F.col("doc_id") % 3 == 1)))
        .unionAll(attach_gif_media(docs.where(F.col("doc_id") % 3 == 2)))
    )
    frames = decode_media(media, frames_per_item=2, fake=False)
    return frames.select(
        "media_id",
        "frame_idx",
        F.element_at("feature", 1).cast("double").alias("f_geom"),
        F.element_at("feature", 2).cast("double").alias("f_extent"),
        F.element_at("feature", 3).cast("double").alias("f_band_sum"),
        F.element_at("feature", 4).cast("double").alias("f_band_n"),
    )


D_MEDIA_MIXED_DECODE3_SQL = """
WITH m AS (
  SELECT doc_id, 'm' || CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS h
  FROM documents
),
b AS (
  SELECT doc_id, media_id,
         list_transform(generate_series(0, 15), c ->
           CAST(('0x' || substring(h, c*2 + 1, 2)) AS INTEGER)) AS bytes
  FROM m
),
png AS (  -- 16x8 gray, 2 bands of 4 rows: sum over (bytes[c]+r)%256
  SELECT media_id, f.frame_idx,
         16.0 AS f_geom, 8.0 AS f_extent,
         CAST(list_sum(list_transform(generate_series(0, 3), r ->
           list_sum(list_transform(generate_series(1, 16), c ->
             (bytes[c] + r + f.frame_idx * 4) % 256)))) AS DOUBLE)
           AS f_band_sum,
         64.0 AS f_band_n
  FROM b, (SELECT unnest(generate_series(0, 1)) AS frame_idx) f
  WHERE doc_id % 3 = 0
),
wav AS (  -- 64 mono samples, 2 slices of 32
  SELECT media_id, f.frame_idx,
         8000.0 AS f_geom, 64.0 AS f_extent,
         CAST(list_sum(list_transform(generate_series(0, 31), i ->
           ((bytes[((i + f.frame_idx * 32) % 16) + 1] * 257
             + (i + f.frame_idx * 32) * 31) % 65536) - 32768))
           AS DOUBLE) AS f_band_sum,
         32.0 AS f_band_n
  FROM b, (SELECT unnest(generate_series(0, 1)) AS frame_idx) f
  WHERE doc_id % 3 = 1
),
gif AS (  -- 16x8 RGBA (transparent idx 5), 2 bands of 4 rows
  SELECT media_id, f.frame_idx,
         16.0 AS f_geom, 8.0 AS f_extent,
         CAST(list_sum(list_transform(generate_series(0, 3), r ->
           list_sum(list_transform(generate_series(1, 16), c ->
             ((bytes[c] + r + f.frame_idx * 4) % 16) * 17
             + (((bytes[c] + r + f.frame_idx * 4) % 16) * 33) % 256
             + (((bytes[c] + r + f.frame_idx * 4) % 16) * 53) % 256
             + CASE WHEN (bytes[c] + r + f.frame_idx * 4) % 16 = 5
                    THEN 0 ELSE 255 END)))) AS DOUBLE) AS f_band_sum,
         256.0 AS f_band_n
  FROM b, (SELECT unnest(generate_series(0, 1)) AS frame_idx) f
  WHERE doc_id % 3 = 2
)
SELECT * FROM png UNION ALL SELECT * FROM wav UNION ALL SELECT * FROM gif
"""

QUERIES["d_media_mixed_decode3"] = (
    d_media_mixed_decode3,
    D_MEDIA_MIXED_DECODE3_SQL,
)


# --------------------------------------------------------------------------
# REAL 4:2:0 JPEG decode end-to-end (round 5 — the real web's dominant
# JPEG layout): every document becomes an RGB baseline JPEG with 2×2
# luma / 1×1 chroma sampling factors AND a DRI=2 restart interval, so
# the engine's decode exercises MCU-interleaved entropy decoding,
# RSTn resync with DC-predictor resets, chroma replication upsampling
# and YCbCr→RGB. The fixture rule keeps chroma constant within every
# 2×2 group, so downsample+upsample are exact and the bounded-error
# boolean (tol 28, 2× the measured max 14) covers quantization only —
# a wrong MCU scatter, missed DC reset or swapped chroma plane flips
# the booleans.


def d_media_decode_jpeg420(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg420_media,
        decode_jpeg420_stats,
    )

    media = attach_jpeg420_media(t(spark, sf, "documents"))
    return decode_jpeg420_stats(media).select(
        "media_id", "width", "height", "channels", "within_tol"
    )


D_MEDIA_DECODE_JPEG420_SQL = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       16 AS width, 16 AS height, 3 AS channels,
       TRUE AS within_tol
FROM documents
"""

QUERIES["d_media_decode_jpeg420"] = (
    d_media_decode_jpeg420,
    D_MEDIA_DECODE_JPEG420_SQL,
)


# --------------------------------------------------------------------------
# Refusal telemetry (round 5): a crawler's media stage must report WHY
# payloads refused, not just that they did — the (fmt, refusal)
# histogram over a corpus decides which codec gap blocks the most
# bytes. The fixture plants a known six-way mix (real PNG / baseline
# JPEG / ARITHMETIC-coded JPEG / PCM WAV / MP4 / Ogg by doc_id mod 6 —
# progressive DECODES since late round 5, so the planted JPEG refusal
# is SOF9); the engine sniffs, attempts the real decode, and maps
# every typed codec error to a frozen category. The oracle recomputes
# the histogram analytically from doc_id — any misclassification
# (e.g. arithmetic reported as malformed) shifts a count and fails
# the hash.


def d_media_refusals(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_refusal_media,
        classify_media_refusals,
    )

    media = attach_refusal_media(t(spark, sf, "documents"))
    return (
        classify_media_refusals(media)
        .groupBy("fmt", "refusal")
        .agg(F.count(F.lit(1)).alias("n_payloads"))
    )


D_MEDIA_REFUSALS_SQL = """
SELECT CASE doc_id % 6
         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'jpeg'
         WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4' ELSE 'ogg' END AS fmt,
       CASE doc_id % 6
         WHEN 2 THEN 'unsupported:jpeg-feature'
         WHEN 4 THEN 'unsupported:video'
         WHEN 5 THEN 'unsupported:compressed-audio'
         ELSE 'ok' END AS refusal,
       COUNT(*) AS n_payloads
FROM documents
GROUP BY 1, 2
"""

QUERIES["d_media_refusals"] = (d_media_refusals, D_MEDIA_REFUSALS_SQL)


# --------------------------------------------------------------------------
# REAL PROGRESSIVE (SOF2) JPEG decode end-to-end (late round 5): the
# same 4:2:0 source rule encoded as a multi-scan progressive stream —
# interleaved DC first scan at Al=1, DC refinement, per-component AC
# first scans (EOB-run coded) and AC successive-approximation
# refinement scans — i.e. the layout libjpeg's default progressive
# script produces for most large web JPEGs. Quantization matches the
# baseline encoder, so the decode is bit-identical to the baseline
# stream's and the SAME bounded-error boolean oracle applies: a wrong
# EOB-run length, a missed DC-predictor reset or a mis-applied
# correction bit flips within_tol.


def d_media_decode_jpeg_prog(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_jpeg420_media,
        decode_jpeg420_stats,
    )

    media = attach_jpeg420_media(
        t(spark, sf, "documents"), progressive=True
    )
    return decode_jpeg420_stats(media).select(
        "media_id", "width", "height", "channels", "within_tol"
    )


D_MEDIA_DECODE_JPEG_PROG_SQL = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       16 AS width, 16 AS height, 3 AS channels,
       TRUE AS within_tol
FROM documents
"""

QUERIES["d_media_decode_jpeg_prog"] = (
    d_media_decode_jpeg_prog,
    D_MEDIA_DECODE_JPEG_PROG_SQL,
)


# --------------------------------------------------------------------------
# REAL MP4/ISO-BMFF container-metadata walk (late round 5): the video
# CODEC is honestly stubbed, but a crawler INDEXES container metadata
# — duration, geometry, codec fourccs, audio layout — and the ISO-BMFF
# box tree is plain struct arithmetic (corpus/mp4.py: typed Mp4Error,
# depth/box caps, mdat skipped by size so cost is O(box tree) not
# O(payload)). The fixture plants genuine minimal MP4 files whose
# every field follows an analytic doc_id rule the DuckDB twin states
# exactly — a wrong fixed-point shift, box-size walk or sample-entry
# offset flips real values, not booleans.


def d_media_mp4_meta(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.multimodal import (
        attach_mp4_media,
        parse_mp4_meta_df,
    )

    media = attach_mp4_media(t(spark, sf, "documents"))
    return parse_mp4_meta_df(media)


D_MEDIA_MP4_META_SQL = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       'isom' AS brand,
       1000 + (doc_id * 37) % 3600000 AS duration_ms,
       CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS n_tracks,
       'avc1' AS video_codec,
       CAST(320 + (doc_id % 4) * 160 AS INTEGER) AS width,
       CAST(((320 + (doc_id % 4) * 160) * 9) / 16 AS INTEGER) AS height,
       CASE WHEN doc_id % 2 = 0 THEN 2 END AS audio_channels,
       CASE WHEN doc_id % 4 = 0 THEN 44100
            WHEN doc_id % 2 = 0 THEN 48000 END AS sample_rate
FROM documents
"""

QUERIES["d_media_mp4_meta"] = (d_media_mp4_meta, D_MEDIA_MP4_META_SQL)
