"""C10+C11 — fetch + extract as one fused vectorized row-transform.

``mapInPandas`` iterator form: one Python worker amortizes setup across
Arrow batches; the page body is synthesized deterministically from the
canonical URL by the same pure function the golden crawler uses
(sources/fixture_web.synth_spans), so span-sequence equality vs the frozen
reference semantics is exact by construction *and* verified row-by-row in
tests (BASELINE.json input_hint). In production the synth call is replaced
by an HTTP fetch + HTML tokenizer with the identical (kind, text,
media_ref, offset) output contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from who_focus_crawler_spark.schemas import SPANS
from who_focus_crawler_spark.sources.fixture_web import WebConfig, synth_spans

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("batch", T.IntegerType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seed_id", T.IntegerType()),
        T.StructField("spans", SPANS),
    ]
)

_PASSTHROUGH = ["seq", "batch", "canon_url", "url_hash", "host", "depth", "seed_id"]


def fetch_and_extract(admitted: DataFrame, cfg: WebConfig) -> DataFrame:
    """admitted (sequenced) rows → fetched documents with span sequences.

    PRIMARY path = mapInArrow (fetch_and_extract_arrow): span sequences
    are list<struct> and the pandas crossing materializes every span as
    a Python dict inside an object column TWICE (build + Arrow
    re-conversion); building the Arrow ListArray/StructArray directly
    from flat columns skips that entirely (~2× on the fetch stage at
    200k pages, measured round 5). fetch_and_extract_pandas is kept as
    the twin so a row-equality test pins both forms."""
    return fetch_and_extract_arrow(admitted, cfg)


def fetch_and_extract_pandas(admitted: DataFrame, cfg: WebConfig) -> DataFrame:
    """mapInPandas twin of fetch_and_extract — see its docstring."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[_PASSTHROUGH].copy()
            out["spans"] = [synth_spans(u, cfg) for u in pdf["canon_url"]]
            yield out

    # project to the minimal column set BEFORE the UDF: the pandas input
    # schema is the column-pruning boundary (SURVEY.md §4)
    return admitted.select(*_PASSTHROUGH).mapInPandas(run, FETCHED_SCHEMA)


def fetch_and_extract_arrow(admitted: DataFrame, cfg: WebConfig) -> DataFrame:
    """The RecordBatch fetch path (primary): identical rows to the
    pandas form, but spans are assembled as ONE Arrow ListArray over a
    StructArray of flat (kind, text, media_ref, offset) columns — no
    per-span Python dicts cross the boundary."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            urls = batch.column(2).to_pylist()  # canon_url (col order below)
            kinds: list[str] = []
            texts: list[str | None] = []
            refs: list[str | None] = []
            offs: list[int] = []
            offsets = [0]
            total = 0
            for u in urls:
                sp = synth_spans(u, cfg)
                for s in sp:
                    kinds.append(s["kind"])
                    texts.append(s["text"])
                    refs.append(s["media_ref"])
                    offs.append(s["offset"])
                total += len(sp)
                offsets.append(total)
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(kinds, pa.string()),
                    pa.array(texts, pa.string()),
                    pa.array(refs, pa.string()),
                    pa.array(offs, pa.int32()),
                ],
                names=["kind", "text", "media_ref", "offset"],
            )
            spans = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), struct
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(len(_PASSTHROUGH))]
                + [spans],
                names=_PASSTHROUGH + ["spans"],
            )

    return admitted.select(*_PASSTHROUGH).mapInArrow(run, FETCHED_SCHEMA)
