"""CDC-style table diff (snapshot time-travel delta).

An Iceberg-shaped catalog that supports time travel (``SnapshotCatalog.
read_table(snapshot_id=...)``) owes its users the derived capability:
*what changed between version A and version B* — the input to every
incremental downstream job (re-embed only updated docs, re-score only
new hosts, replicate only the delta). ``table_diff`` computes the
row-level change set relationally; ``snapshot_diff`` applies it to two
committed snapshot versions of one catalog table.

Output contract (frozen, oracle-checked by ``r_table_diff``):
one row per key whose state differs between the two versions —
``change ∈ {'insert','delete','update'}`` with the old/new values of
every compared column (``old_<c>`` / ``new_<c>``, NULL on the absent
side). Keys present in both versions with all compared columns equal
(null-safely) emit nothing.

Shape at scale: ONE full-outer join — each side shuffles once on the
key — followed by a codegen'd null-safe comparison filter; nothing
wider than key + compared columns crosses the exchange, and no
driver-side action runs. At 10^10-row tables this is the minimal
movement any exact diff needs; when both versions are bucketed by the
key (``compact_table`` sort order) the exchange is avoidable entirely
on a real catalog.

Semantics notes:
- Key collisions (duplicate keys WITHIN one version) make "the" old/new
  value ill-defined; like ``merge_upsert``, ``strict=True`` (default)
  raises on them. The check is one extra aggregate job per side —
  pass ``strict=False`` when the key is known unique (e.g. the crawl
  engine's ``url_seen``, keyed by canon_url by construction).
- NULL keys are legal and compare null-safely (a NULL-keyed row in both
  versions is matched, not double-counted) — membership tags, not key
  IS NULL probes, classify the sides (same trap as merge.py:77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_COL = "change"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Row-level change set new-vs-old keyed by ``key_cols``.

    Returns key_cols + ``change`` + interleaved ``old_<c>``/``new_<c>``
    for each compared column (default: all shared non-key columns).
    """
    shared = [c for c in old.columns if c in set(new.columns)]
    if compare_cols is None:
        compare_cols = [c for c in shared if c not in key_cols]
    missing = [
        c
        for c in key_cols + compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"columns absent from one side: {missing}")
    overlap = {f"old_{c}" for c in compare_cols} | {f"new_{c}" for c in compare_cols}
    taken = (overlap | {"_d_old", "_d_new", CHANGE_COL}) & set(key_cols)
    if taken:
        raise ValueError(f"key columns collide with output names: {sorted(taken)}")
    if strict:
        for side, df in (("old", old), ("new", new)):
            dups = (
                df.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dups:
                raise ValueError(
                    f"duplicate keys in {side} version make the diff "
                    "ill-defined; dedupe or pass strict=False"
                )
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_d_old", F.lit(True))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_d_new", F.lit(True))
    oo, nn = o.alias("o"), n.alias("n")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    joined = oo.join(nn, cond, "full_outer")
    in_old = F.col("_d_old").isNotNull()
    in_new = F.col("_d_new").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(in_new & ~in_old, F.lit("insert"))
        .when(changed, F.lit("update"))
    )  # both sides, all-equal → NULL → filtered out
    out = [F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols]
    out.append(change.alias(CHANGE_COL))
    for c in compare_cols:
        out += [F.col(f"old_{c}").alias(f"old_{c}"), F.col(f"new_{c}").alias(f"new_{c}")]
    return joined.select(*out).filter(F.col(CHANGE_COL).isNotNull())


def snapshot_diff(
    spark: SparkSession,
    catalog,
    table: str,
    schema: T.StructType,
    key_cols: list[str],
    old_id: int,
    new_id: int,
    compare_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Change set of one catalog ``table`` between two snapshot ids.

    A version at which the table has no files reads as empty (every row
    of the other side becomes insert/delete). ``strict`` defaults False:
    engine tables are keyed unique by construction (e.g. url_seen by
    canon_url) and the cardinality probe is two extra jobs.
    """
    empty = spark.createDataFrame([], schema)

    def read(sid: int) -> DataFrame | None:
        try:
            return catalog.read_table(spark, table, schema, snapshot_id=sid)
        except FileNotFoundError:
            return None  # pre-history / expired version ⇒ empty side

    old, new = read(old_id), read(new_id)
    return table_diff(
        old if old is not None else empty,
        new if new is not None else empty,
        key_cols,
        compare_cols,
        strict=strict,
    )
