"""T5 span-corruption training-example generation (Raffel et al. 2020,
JMLR — "Exploring the Limits of Transfer Learning", §3.1.4): corrupt a
fraction of token positions in contiguous spans; each corrupted span is
replaced in the INPUT by one sentinel token (<extra_id_0>,
<extra_id_1>, ... in document order), and the TARGET is the sentinel
followed by the original span tokens.

Determinism discipline (repo convention, same as corpus/mlm.py): every
"random" draw is md5-derived from (seed, doc_id, position) — span
starts and span lengths are hash draws, so the corruption is identical
across runs, partitionings, and engines, and a DuckDB twin reproduces
the exact example set for the value-exact oracle. Overlapping /
adjacent drawn spans MERGE into one sentinel (the paper's corruption
also never emits two sentinels back-to-back); merging is the classic
gaps-and-islands trick: cpos - row_number() is constant within each
consecutive run of covered positions.

Scale shape: tokenize → posexplode → hash filters; every window is
partitioned by doc_id (never global); per-doc reconstruction is one
groupBy with an order-pinned array_sort aggregation. One shuffle by
doc_id dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.text import md5_hash60, tokens

START_PERMILLE = 60  # P(position starts a span) — with mean span 3,
MAX_SPAN = 5         # uniform 1..5 ⇒ ~15% of tokens corrupted


def _h(seed: str, doc_id, pos):
    return md5_hash60(F.concat_ws("|", F.lit(seed), doc_id, pos))


def _ordered_join(pos_col: str, tok_col: str):
    """Order-pinned string agg: collect (pos, tok) structs, sort by pos,
    join token fields — partitioning-independent, no ordered window."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(pos_col, tok_col))),
            lambda s: s[tok_col],
        ),
        " ",
    )


def span_corruption(
    docs: DataFrame,
    seed: str = "t5",
    start_permille: int = START_PERMILLE,
    max_span: int = MAX_SPAN,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, input_text, targets_text, n_spans): one row per document.

    ``input_text`` is the frozen-tokenizer stream with each corrupted
    span replaced by its sentinel; ``targets_text`` is
    '<extra_id_0> tok ... <extra_id_1> tok ...' in span order; docs
    where no span was drawn keep their full token stream and an empty
    target (n_spans = 0).
    """
    did = F.col(id_col)
    tk = tokens(F.col(text_col))
    toks = (
        docs.select(did.alias("doc_id"), tk.alias("_tk"))
        .select(
            "doc_id",
            F.size("_tk").alias("n"),
            F.posexplode("_tk").alias("_p0", "tok"),
        )
        .withColumn("pos", (F.col("_p0") + 1).cast("long"))
        .drop("_p0")
    )
    starts = toks.filter(
        _h(seed + ":start", F.col("doc_id"), F.col("pos")) % 1000 < start_permille
    ).withColumn(
        "slen", (_h(seed + ":len", F.col("doc_id"), F.col("pos")) % max_span) + 1
    )
    covered = starts.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("pos"), F.least(F.col("pos") + F.col("slen") - 1, F.col("n"))
            )
        ).alias("cpos"),
    ).distinct()
    w_doc = Window.partitionBy("doc_id").orderBy("cpos")
    spans = (
        covered.withColumn("grp", F.col("cpos") - F.row_number().over(w_doc))
        .groupBy("doc_id", "grp")
        .agg(F.min("cpos").alias("start"), F.max("cpos").alias("end"))
        .withColumn(
            "sid",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("start")) - 1,
        )
        .drop("grp")
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("sid").cast("string"), F.lit(">"))

    span_toks = toks.join(spans, "doc_id").filter(
        F.col("pos").between(F.col("start"), F.col("end"))
    )
    per_span = span_toks.groupBy("doc_id", "sid").agg(
        F.min("start").alias("start"),
        _ordered_join("pos", "tok").alias("body"),
    )
    targets = per_span.select(
        "doc_id",
        F.col("sid").alias("_ord"),
        F.concat(
            F.lit("<extra_id_"), F.col("sid").cast("string"), F.lit("> "),
            F.col("body"),
        ).alias("piece"),
    ).groupBy("doc_id").agg(
        _ordered_join("_ord", "piece").alias("targets_text"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )

    keep = toks.join(covered, (toks.doc_id == covered.doc_id) & (toks.pos == covered.cpos), "left_anti")
    sent_rows = spans.select("doc_id", F.col("start").alias("pos"), sentinel.alias("tok"))
    inputs = (
        keep.select("doc_id", "pos", "tok")
        .unionByName(sent_rows)
        .groupBy("doc_id")
        .agg(_ordered_join("pos", "tok").alias("input_text"))
    )

    return (
        docs.select(did.alias("doc_id"))
        .join(inputs, "doc_id", "left")
        .join(targets, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("input_text", F.lit("")).alias("input_text"),
            F.coalesce("targets_text", F.lit("")).alias("targets_text"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )
