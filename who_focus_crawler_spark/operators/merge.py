"""Generic MERGE INTO (upsert) as a DataFrame composition.

The crawl engine's frontier merge (operators/frontier.py) is a
special-cased upsert; users of a lakehouse engine expect the general
form — `MERGE INTO target USING source ON key WHEN MATCHED THEN UPDATE
WHEN NOT MATCHED THEN INSERT` — for dimension maintenance, metadata
tables, and incremental corpus state. On a real Iceberg catalog this
compiles to the engine's MERGE; over the snapshot shim (and for any
in-flight DataFrame) this composition produces the identical result
relationally:

    merged = (target ⟕ source on key: matched rows take source values)
             ∪ (source ⟖ target: unmatched source rows insert whole)

Shapes at scale: the merge itself is ONE shuffle of each side on the
key (a single full outer join — no anti+union double-shuffle); column
selection happens in the join projection, so nothing wider than the
output schema crosses the exchange. Matched-row updates are
column-wise COALESCE-style CASE — whole-stage codegen, no Python.

Semantics (frozen, oracle-checked by ``r_merge_upsert``):
- key collision within ``source`` is the caller's bug (like SQL MERGE,
  which raises on multiple matches); ``strict`` mode (default) counts
  source-key duplicates and raises. The check is an EAGER extra job
  that executes the source lineage once before the merge — when
  ``source`` is an expensive derived pipeline, persist it first or
  pass ``strict=False`` after validating upstream.
- ``update_cols`` limits which columns a matched row takes from the
  source; all other target columns are preserved. Inserted rows take
  every source column (schemas must match by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """MERGE source INTO target ON key_cols (update matched, insert new).

    Output columns = target columns (source must carry all of them).
    """
    tcols = target.columns
    missing = [c for c in tcols if c not in source.columns]
    if missing:
        raise ValueError(f"source lacks target columns: {missing}")
    if update_cols is None:
        update_cols = [c for c in tcols if c not in key_cols]
    bad = [c for c in update_cols if c in key_cols or c not in tcols]
    if bad:
        raise ValueError(f"invalid update_cols: {bad}")
    taken = {"_m_tgt", "_m_src"} & (set(tcols) | set(source.columns))
    if taken:
        raise ValueError(
            f"reserved membership-tag column names in input: {sorted(taken)}"
        )
    if strict:
        dups = (
            source.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dups:
            raise ValueError(
                "source has duplicate merge keys (SQL MERGE cardinality "
                "violation); dedupe upstream or pass strict=False"
            )
    # explicit membership tags: an outer join emits NULLs for the absent
    # side, and key/data columns may legitimately hold NULLs, so probing
    # them would misclassify rows
    t = target.withColumn("_m_tgt", F.lit(True)).alias("t")
    s = source.withColumn("_m_src", F.lit(True)).alias("s")
    cond = None
    for k in key_cols:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")
    in_src = F.col("_m_src").isNotNull()
    in_tgt = F.col("_m_tgt").isNotNull()
    out_cols = []
    for c in tcols:
        if c in key_cols:
            expr = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        elif c in update_cols:
            # matched or insert → source value; target-only → target
            expr = F.when(in_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            # preserved column: target value when the row exists there
            expr = F.when(in_tgt, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}"))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)
