"""Byte-pair-encoding tokenizer: distributed training + broadcast apply.

The classic LLM-tokenizer build (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"), shaped for Spark:

- **Training never touches the corpus after one pass.** The corpus
  collapses to a word-frequency VOCAB table (|distinct words| rows —
  orders of magnitude smaller than the corpus); every merge round
  counts adjacent symbol pairs over the vocab weighted by word count,
  takes the argmax (count desc, pair asc — deterministic), and rewrites
  only the vocab rows that contain the pair. At 100 TB the corpus scan
  happens once; the k-round loop runs over a table that fits in a few
  partitions.
- **The merge loop is DRIVER-LOCAL over the collected vocab** (the
  subword-nmt / HuggingFace-trainer shape): after the one corpus
  collapse, the (word, n) table is by construction the small side —
  distinct words, not corpus rows — so `bpe_train` collects it once
  and runs the classic incremental pair-count algorithm (argmax +
  touch-only-affected-words updates) entirely in memory. A 30k-merge
  vocabulary is 30k dict updates, not 30k sequential Spark jobs. The
  earlier one-job-per-round formulation is kept as
  `bpe_train_rounds` purely as an equivalence cross-check.
- **Apply is vocab-side Python, corpus-side join.** Segmenting applies
  the merge list per DISTINCT word (pandas UDF over the vocab), then a
  broadcast join maps corpus tokens to their segmentation — the corpus
  text itself never enters Python.

Symbols carry no end-of-word marker (word boundaries come from the
frozen tokenizer); merges apply greedily in training order, exactly as
trained — `_merge_word` is shared verbatim by train and apply, so a
segmentation can never disagree with the merge table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.corpus.text import tokens


def _merge_word(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """One merge pass over one word's symbol sequence (left-to-right,
    non-overlapping) — the reference semantics for train AND apply."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, n) frequency table (the only stage that
    sees corpus-sized data)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_SEG_SCHEMA = T.ArrayType(T.StringType())


def bpe_train(
    vocab: DataFrame, num_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a (word, n) vocab table.

    ONE Spark job total: the vocab (distinct words — by construction
    orders of magnitude smaller than the corpus, and the thing every
    in-memory BPE trainer holds anyway) is collected to the driver,
    then the merge loop runs locally with incremental pair-count
    maintenance: a pair→words index finds the rows a merge touches,
    and only their pair counts are diffed. Per merge that is
    O(words containing the pair), not O(|vocab|) and not a Spark job —
    a 30k-merge vocabulary trains in one scan + one collect.

    Deterministic: ties on pair count break on the pair itself
    (count desc, then (a, b) asc — UTF-8 order, identical to Spark's
    string sort). Stops early when no pair reaches ``min_count``.
    Returns the ordered merge list (the tokenizer model). Equivalence
    with the distributed per-round formulation (``bpe_train_rounds``)
    is pinned in tests/unit/test_bpe.py.
    """
    rows = vocab.select("word", "n").collect()
    words: list[list] = [[list(r["word"]), int(r["n"])] for r in rows]

    from collections import defaultdict

    def _pairs_in(syms: list[str]) -> dict:
        d: dict = defaultdict(int)
        for i in range(len(syms) - 1):
            d[(syms[i], syms[i + 1])] += 1
        return d

    pair_counts: dict = defaultdict(int)
    holders: dict = defaultdict(set)  # pair -> word ids containing it
    for wid, (syms, n) in enumerate(words):
        for p, c in _pairs_in(syms).items():
            pair_counts[p] += c * n
            holders[p].add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        pair, cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append(pair)
        for wid in list(holders.get(pair, ())):
            syms, n = words[wid]
            old = _pairs_in(syms)
            new_syms = _merge_word(syms, pair)
            new = _pairs_in(new_syms)
            for p in old.keys() | new.keys():
                delta = new.get(p, 0) - old.get(p, 0)
                if delta:
                    pair_counts[p] += delta * n
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if p in old and p not in new:
                    holders[p].discard(wid)
                elif p in new:
                    holders[p].add(wid)
            words[wid][0] = new_syms
        holders.pop(pair, None)
        pair_counts.pop(pair, None)
    return merges


def bpe_train_auto(
    vocab: DataFrame,
    num_merges: int,
    min_count: int = 2,
    max_driver_vocab_bytes: int | None = None,
    stats_out: dict | None = None,
) -> list[tuple[str, str]]:
    """Route training by MEASURED vocab size: one tiny agg (row count +
    summed word bytes) estimates the driver-side footprint of the
    collected vocab; under the budget → `bpe_train` (collect once, all
    merges local — the fast path), over it → `bpe_train_rounds` (the
    distributed per-round form; the vocab never leaves the cluster).

    The footprint model is deliberately conservative: each collected
    word becomes a Python list of 1-char strings plus a count —
    ~``_SYM_OVERHEAD`` bytes per character and ``_WORD_OVERHEAD`` per
    word (CPython object headers dominate the raw bytes). Budget
    defaults to $WFC_BPE_DRIVER_VOCAB_BYTES or 512 MiB — far below any
    real driver heap, so the fallback only fires when the vocab is
    genuinely pathological (e.g. no tokenization upstream).

    ``stats_out`` (optional) records {"path", "est_bytes", "budget",
    "vocab_rows"} for tests and ops visibility.
    """
    import os

    _SYM_OVERHEAD = 96  # 1-char str object + list slot, CPython 3.11
    _WORD_OVERHEAD = 160  # outer [syms, n] list + row overhead
    if max_driver_vocab_bytes is None:
        max_driver_vocab_bytes = int(
            os.environ.get(
                "WFC_BPE_DRIVER_VOCAB_BYTES", str(512 * 1024 * 1024)
            )
        )
    m = vocab.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("chars"),
    ).collect()[0]
    est = int(m["rows"]) * _WORD_OVERHEAD + int(m["chars"]) * _SYM_OVERHEAD
    path = "local" if est <= max_driver_vocab_bytes else "rounds"
    if stats_out is not None:
        stats_out.update(
            path=path,
            est_bytes=est,
            budget=max_driver_vocab_bytes,
            vocab_rows=int(m["rows"]),
        )
    if path == "local":
        return bpe_train(vocab, num_merges, min_count=min_count)
    return bpe_train_rounds(vocab, num_merges, min_count=min_count)


def bpe_train_rounds(
    vocab: DataFrame, num_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Distributed per-round formulation (one Spark job + 1-row collect
    per merge): kept as the equivalence cross-check for ``bpe_train``
    and for the hypothetical vocab-exceeds-driver-memory regime.
    """
    spark = vocab.sparkSession
    symed = vocab.select(
        "word", "n", F.split(F.col("word"), "").alias("syms")
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = symed.select(
            "n",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        pair = (top[0]["p"]["a"], top[0]["p"]["b"])
        merges.append(pair)

        @F.pandas_udf(_SEG_SCHEMA)
        def apply_one(s: pd.Series) -> pd.Series:
            return s.map(lambda syms: _merge_word(list(syms), pair))

        # rewrite only words containing the pair (everything else is
        # untouched — at real vocab sizes most rows skip the UDF)
        has = F.array_contains(
            F.transform(
                F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                lambda s, i: (s == pair[0])
                & (F.element_at(F.col("syms"), i + 2) == pair[1]),
            ),
            True,
        )
        symed = symed.withColumn(
            "syms", F.when(has, apply_one(F.col("syms"))).otherwise(F.col("syms"))
        ).localCheckpoint(eager=False)
    return merges


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference segmentation: greedy replay of the merge list."""
    syms = list(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, pair)
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document: (id, subwords array<string>, n_subwords).

    Python touches only the DISTINCT words of this input (segmentation
    table), which then broadcast-joins back onto the exploded corpus —
    at corpus scale the expensive side stays JVM-only.
    """
    frozen = list(merges)

    @F.pandas_udf(_SEG_SCHEMA)
    def seg_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda w: segment_word(w, frozen))

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .distinct()
        .withColumn("seg", seg_udf(F.col("word")))
    )
    tok = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    )
    return (
        tok.join(F.broadcast(words), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("seg")))
                    ),
                    lambda s: s["seg"],
                )
            ).alias("subwords")
        )
        .select(
            id_col,
            "subwords",
            F.size("subwords").cast("long").alias("n_subwords"),
        )
    )
