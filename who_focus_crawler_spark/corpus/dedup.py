"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup (task brief: training-data pipeline).

Design for 100 TB:
- Exact dedup is one hash-groupBy — partial aggregation map-side, one
  shuffle on the content hash.
- MinHash+LSH never goes pairwise over the corpus: docs → (band_key)
  buckets via a shuffle on the band hash, pairs are generated only inside
  buckets (self-join on band_key), then verified by exact Jaccard on the
  candidate pairs only. O(candidates), not O(n²).
- SimHash reduces each doc to one 16-bit integer; near-dup = small
  Hamming distance, found by banding the bits (two 8-bit halves: any pair
  within Hamming ≤ r shares a half for r ≤ 1 — standard pigeonhole).
- All expressions are native Spark SQL (codegen'd, no UDFs); hashes are
  md5-derived so the DuckDB oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, shingles, tokens


# ----------------------------------------------------------- exact dedup ---


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate clusters by content hash.

    Returns one row per duplicated content hash: cluster size and the
    canonical (minimum) doc id kept. One shuffle on content_hash; partial
    count map-side."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )


def exact_dedup_keep(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: first doc (min id) per content hash."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# -------------------------------------------------------------- minhash ---


def minhash_signature(toks: Column, num_hashes: int, shingle_k: int = 3) -> Column:
    """MinHash signature as an array of `num_hashes` 60-bit ints.

    minhash_i = min over shingles of hash60(md5(i || '|' || shingle)) —
    md5-keyed per-permutation hashing, portable to the DuckDB oracle."""
    sh = shingles(toks, shingle_k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                sh, lambda s: md5_hash60(F.concat(i.cast("string"), F.lit("|"), s))
            )
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Scale path: signature is computed per doc (one pass), docs are
    exploded into `bands` rows keyed by the band hash (shuffle on
    band_key), pairs form only inside buckets, are deduped, then verified
    with exact shingle-set Jaccard. Returns (doc_a, doc_b, jaccard)."""
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens(F.col(text_col)), shingle_k).alias("sh"),
    ).withColumn("sig", minhash_signature_from_shingles(F.col("sh"), num_hashes))
    # materialize the shingle/signature table once (three consumers:
    # banding + both sides of the candidate re-join) — at corpus scale
    # this is a persisted artifact, not a recompute
    base = base.localCheckpoint(eager=False)

    # Scale shape: the band self-join shuffles only (band, band_key,
    # doc_id) — never the shingle arrays. Shingles re-attach to the
    # (few) surviving candidate pairs afterwards; at corpus scale that
    # turns an O(corpus)·|shingles| shuffle into O(candidates).
    banded = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_key"),
    )
    left = banded.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    right = banded.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    cand = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_tbl = base.select("doc_id", "sh")
    pairs = cand.join(
        sh_tbl.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        sh_tbl.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature_from_shingles(sh: Column, num_hashes: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                sh, lambda s: md5_hash60(F.concat(i.cast("string"), F.lit("|"), s))
            )
        ),
    )


# -------------------------------------------------------------- simhash ---

SIMHASH_BITS = 16


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over the token multiset.

    Bit j of a token = high bit of hex digit j of md5(token); document bit
    j is the sign of sum over tokens of (2·bit − 1). Engine-portable: the
    same per-hex-digit construction runs in DuckDB SQL."""
    bit_terms = [
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.conv(F.substring(F.md5(t), j + 1, 1), 16, 10).cast("int") >= 8,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        for j in range(SIMHASH_BITS)
    ]
    out = F.lit(0)
    for j, term in enumerate(bit_terms):
        out = out + F.when(term > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("long")


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 1,
) -> DataFrame:
    """Near-dup pairs by SimHash banding (two 8-bit halves ⇒ complete for
    Hamming ≤ 1 by pigeonhole). Returns (doc_a, doc_b, hamming)."""
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), simhash16(tokens(F.col(text_col))).alias("sig")
    )
    halves = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half"), (F.col("sig") % 256).alias("key")),
                F.struct(
                    F.lit(1).alias("half"),
                    F.floor(F.col("sig") / 256).cast("long").alias("key"),
                ),
            )
        ).alias("hk"),
    ).select("doc_id", "sig", F.col("hk.half").alias("half"), F.col("hk.key").alias("key"))
    a = halves.select("half", "key", F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = halves.select("half", "key", F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, ["half", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------- n-gram jaccard ---


def ngram_jaccard_adjacent(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Jaccard similarity of k-gram shingle sets between consecutive doc
    ids — the cheap oracle-friendly exercise of the shingle/Jaccard core
    used by MinHash verification."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens(F.col(text_col)), k).alias("sh"),
    )
    nxt = base.select((F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh", "sh_b"))
    union = F.size(F.array_union("sh", "sh_b"))
    return (
        base.join(nxt, "doc_id")
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias(
                "jaccard"
            ),
        )
    )
