"""Slowly-changing-dimension Type 2 (Kimball): turn a change-event
stream into versioned dimension rows with effective-time ranges, apply
incremental updates by closing superseded versions, and answer
point-in-time lookups.

Shapes at scale:

- `scd2_build` is two window passes partitioned BY KEY (never a global
  window): one lag() to detect attribute changes, one lead() to close
  each surviving version. Both share the same (key) partitioning and
  (ts, tie) order, so Catalyst plans ONE shuffle and reuses the sort.
- `scd2_apply` joins the CURRENT slice of the dimension against the
  update batch on key — updates are usually small, so the join
  broadcasts; history rows that are already closed are untouched
  (unioned back, no shuffle on the closed majority).
- `scd2_asof` is a pure filter — partition/file pruning applies if the
  dimension is laid out by effective_from.

Attribute comparison is null-safe (`IS DISTINCT FROM` semantics): a
NULL→value or value→NULL transition IS a change; NULL→NULL is not.
Ties in the event time are broken by explicit `tie_cols` — the caller
must supply a strict total order per key or versioning would be
nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _attrs(attr_cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in attr_cols])


def scd2_build(
    events: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a change-event stream into SCD2 version rows.

    Input: one row per observation (key, attrs, ts[, tie]). Output: one
    row per VERSION — consecutive observations with identical attrs
    merge — with columns key + attrs + (effective_from, effective_to,
    is_current); effective_to is the next version's start, NULL for the
    open version.
    """
    tie = tie_cols or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tie]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(_attrs(attr_cols)).over(w)
    changed = prev.isNull() | ~prev.eqNullSafe(_attrs(attr_cols))
    starts = events.withColumn("_chg", changed).filter(F.col("_chg"))
    # the surviving rows keep their original ts/tie order inside the key
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        starts.withColumn("effective_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply one update batch (one row per key, observed at `ts_col`) to
    an SCD2 dimension: close the current version of keys whose attrs
    changed, insert the new version, insert brand-new keys. Unchanged
    keys and already-closed history pass through untouched.

    Requires at most one update row per key (enforced) — feed batches
    through `scd2_build` first if a batch can contain several
    observations of one key.
    """
    dup = (
        updates.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    if not dup.isEmpty():
        raise ValueError("scd2_apply: updates carry duplicate keys")
    u = updates.select(
        *key_cols,
        _attrs(attr_cols).alias("_new_attrs"),
        F.col(ts_col).alias("_new_ts"),
    )
    closed = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))
    j = current.join(F.broadcast(u), key_cols, "left")
    same = F.col("_new_ts").isNull() | _attrs(attr_cols).eqNullSafe(
        F.col("_new_attrs")
    )
    untouched = j.filter(same).select(*dim.columns)
    superseded = j.filter(~same).select(
        *key_cols,
        *attr_cols,
        F.col("effective_from"),
        F.col("_new_ts").alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    # replacement versions for changed keys + first versions for new keys
    existing_changed = j.filter(~same).select(
        *key_cols, "_new_attrs", "_new_ts"
    )
    new_keys = u.join(dim.select(*key_cols).distinct(), key_cols, "left_anti")
    inserts = existing_changed.unionByName(new_keys).select(
        *key_cols,
        *[F.col("_new_attrs")[c].alias(c) for c in attr_cols],
        F.col("_new_ts").alias("effective_from"),
        F.lit(None).cast(dim.schema["effective_to"].dataType).alias(
            "effective_to"
        ),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.unionByName(untouched)
        .unionByName(superseded)
        .unionByName(inserts)
    )


def scd2_asof(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot: the version of each key effective at
    ``ts`` (half-open ranges: from <= ts < to)."""
    t = F.lit(ts)
    return dim.filter(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (t < F.col("effective_to")))
    )
