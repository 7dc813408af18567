"""R14 — as-of join as a reusable operator.

Spark has no native as-of join; the classic distributed formulation is
the tagged union + windowed last-non-null (SURVEY.md §2.2 R14): tag
both sides, union, sort per key by (ts, is_left, tie), and carry the
last right-side payload forward — each left row then holds the right
row with the greatest ts ≤ its own. One shuffle on the join key, no
range self-join, no per-key driver work: the window partitions by key,
so skew is bounded by the hottest key (same property as any keyed agg).

Tie semantics (frozen): a right row at exactly ts == left.ts matches
(inclusive as-of); among equal-ts right rows the one with the greatest
tie-break column wins — deterministic when the tie column is unique per
(key, ts), which callers should guarantee (event ids are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` ≤ left.``on`` within the same ``by`` group.

    ``value_cols``: right-side columns to carry (default: all except
    ``on``/``by``). ``tie_col``: right column ordering equal-ts rows
    (default: first value column). Left rows with no match are dropped
    (inner as-of; filter-free callers can left-join the result back).
    Output: all left columns + the carried right columns.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    if tie_col is None:
        tie_col = value_cols[0]
    left_cols = left.columns
    clash = set(left_cols) & set(value_cols)
    if clash:
        raise ValueError(
            f"carried right columns {sorted(clash)} collide with left "
            "columns; alias one side before the as-of join"
        )

    from pyspark.sql import types as T

    # the right row's value columns ride as ONE struct, so the carried
    # match is row-atomic: independent per-column last(ignorenulls) could
    # stitch fields from DIFFERENT right rows whenever a value column
    # contains NULLs (the struct itself is non-null for every right row,
    # null only on left rows)
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        *left_cols,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(payload_t).alias("_r_pay"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r_pay"),
    )
    for c in left_cols:
        if c not in (by, on):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tag = r_tag.select(*left_cols, "_is_left", "_r_pay")

    # right rows sort BEFORE the left row at equal ts (_is_left asc) so
    # ts == left.ts is an inclusive match; equal-ts right rows resolve
    # by tie_col ascending ⇒ last() picks the greatest
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_is_left", F.col("_r_pay")[tie_col])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "_last_pay", F.last("_r_pay", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .filter(F.col("_last_pay").isNotNull())
        .select(
            *left_cols,
            *[F.col("_last_pay")[c].alias(c) for c in value_cols],
        )
    )
