"""Masked-language-model training-example generation (BERT, Devlin et
al. 2019 §3.1): select 15% of token positions; of those, 80% become
[MASK], 10% a random token, 10% stay verbatim — the model must predict
the original at every selected position.

Determinism discipline: the paper's RNG draws are md5-derived from
(seed, doc_id, position) — the repo's convention for every
pseudo-random quantity — so the same corpus always yields the same
examples (resume/repro-safe), the draw is independent of partitioning,
and a DuckDB twin reproduces the exact example set for the value-exact
oracle. The "random" replacement token is drawn from the document's own
token list by a second hash (self-contained — no broadcast vocabulary
needed; swap in a sampled global vocab table for production flavor).

Shape: tokenize → posexplode → per-position hash filters. All native
expressions; the only shuffle is whatever the caller does downstream.
Output is one row per SELECTED position (exploded, not nested) so the
driver compares scalar cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, tokens

MASK = "[MASK]"
SELECT_PERMILLE = 150  # 15% of positions
MASK_OF_10, RANDOM_OF_10 = 8, 9  # 0-7 mask, 8 random, 9 keep


def _h(seed: str, doc_id, pos):
    return md5_hash60(F.concat_ws("|", F.lit(seed), doc_id, pos))


def mlm_examples(
    docs: DataFrame,
    seed: str = "mlm",
    select_permille: int = SELECT_PERMILLE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, original, replacement, action): one row per selected
    position. ``pos`` is 1-based over the frozen tokenizer's stream;
    ``action`` ∈ {'mask','random','keep'}; ``replacement`` is what the
    corrupted input carries at that position ([MASK], the hash-drawn
    token, or the original)."""
    did = F.col(id_col)
    tk = tokens(F.col(text_col))
    exploded = docs.select(
        did.alias("doc_id"),
        tk.alias("_tk"),
        F.posexplode(tk).alias("_p0", "original"),
    ).withColumn("pos", F.col("_p0") + 1)
    sel = exploded.filter(
        _h(seed + ":sel", F.col("doc_id"), F.col("pos")) % 1000
        < select_permille
    )
    act = _h(seed + ":act", F.col("doc_id"), F.col("pos")) % 10
    rnd_idx = (
        _h(seed + ":tok", F.col("doc_id"), F.col("pos"))
        % F.greatest(F.size("_tk"), F.lit(1))
    ) + 1
    action = (
        F.when(act < MASK_OF_10, F.lit("mask"))
        .when(act == MASK_OF_10, F.lit("random"))
        .otherwise(F.lit("keep"))
    )
    replacement = (
        F.when(act < MASK_OF_10, F.lit(MASK))
        .when(act == MASK_OF_10, F.element_at("_tk", rnd_idx.cast("int")))
        .otherwise(F.col("original"))
    )
    return sel.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "original",
        replacement.alias("replacement"),
        action.alias("action"),
    )


def mlm_corrupted_text(
    docs: DataFrame,
    seed: str = "mlm",
    select_permille: int = SELECT_PERMILLE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, corrupted): the full corrupted token stream re-joined to
    one string per document — the model-input side of the example pair.
    Same hash draws as :func:`mlm_examples`, applied in-place with a
    positional transform (no explode, no shuffle)."""
    did = F.col(id_col)
    tk = tokens(F.col(text_col))

    def corrupt(t, i0):
        pos = i0 + 1
        sel = _h(seed + ":sel", did, pos) % 1000 < select_permille
        act = _h(seed + ":act", did, pos) % 10
        rnd_idx = (
            _h(seed + ":tok", did, pos) % F.greatest(F.size(tk), F.lit(1))
        ) + 1
        return F.when(
            sel,
            F.when(act < MASK_OF_10, F.lit(MASK))
            .when(act == MASK_OF_10, F.element_at(tk, rnd_idx.cast("int")))
            .otherwise(t),
        ).otherwise(t)

    return docs.select(
        did.alias("doc_id"),
        F.array_join(F.transform(tk, corrupt), " ").alias("corrupted"),
    )
