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
    """admitted (sequenced) rows → fetched documents with span sequences."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[_PASSTHROUGH].copy()
            out["spans"] = [synth_spans(u, cfg) for u in pdf["canon_url"]]
            yield out

    # project to the minimal column set BEFORE the UDF: the pandas input
    # schema is the column-pruning boundary (SURVEY.md §4)
    return admitted.select(*_PASSTHROUGH).mapInPandas(run, FETCHED_SCHEMA)
