"""Cross-source quality calibration.

Raw quality scores are not comparable across sources (a mid-tier web
page and a mid-tier code file score differently), so mixture pipelines
gate on the PER-SOURCE percentile instead — CCNet buckets each language
shard into perplexity head/middle/tail thirds by exactly this move
(Wenzek et al. 2020). ``quality_percentile`` attaches the integer
permille percent-rank of a document's quality within its source.

Scale shape — the naive form is a window PARTITION BY source, which at
corpus scale funnels each source's billions of rows through ONE task
(the C9 anti-pattern). Instead: quality is a bounded integer, so

  1. partial+final agg to per-(source, quality) counts — tiny frame,
  2. the running "rows strictly below" sum runs over THAT frame
     (|sources| × |distinct scores| rows; the per-source window is
     trivially small),
  3. one hash join attaches the permille back to the docs.

percent-rank semantics: permille = floor(1000 · below / (n − 1)), ties
share the rank of their first row (SQL ``rank()``), single-row sources
get 0. All integer arithmetic — value-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_percentile(
    docs: DataFrame,
    source_col: str = "source",
    quality_col: str = "quality",
    out_col: str = "quality_permille",
) -> DataFrame:
    """Attach ``out_col`` = per-source integer permille percent-rank of
    ``quality_col`` (0 = worst in source, 1000 = strictly best)."""
    counts = docs.groupBy(source_col, quality_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_below = (
        Window.partitionBy(source_col)
        .orderBy(quality_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(source_col)
    ranked = counts.select(
        source_col,
        quality_col,
        F.coalesce(F.sum("_cnt").over(w_below), F.lit(0)).alias("_below"),
        F.sum("_cnt").over(w_all).alias("_n"),
    ).withColumn(
        out_col,
        F.expr(f"(_below * 1000) div greatest(_n - 1, 1)").cast("long"),
    )
    return docs.join(
        ranked.select(source_col, quality_col, out_col),
        [source_col, quality_col],
    )
