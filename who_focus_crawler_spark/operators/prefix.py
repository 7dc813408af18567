"""Two-phase distributed grouped prefix sum.

``grouped_running_sum`` computes, for each row,

    sum(value) OVER (PARTITION BY group ORDER BY order
                     ROWS UNBOUNDED PRECEDING .. CURRENT ROW)

without ever funnelling a whole group through one task. The naive
window does exactly that: at training-corpus scale a "group" is a
source/domain with billions of rows, so PARTITION BY source is a
single-reducer hot spot. Same two-round shape as the C9 sequencer
(operators/sequencer.py):

  phase 1  range-repartition on (group, order) and pin the layout
           (lazy localCheckpoint — two consumers must see identical
           range boundaries); each task computes the LOCAL running sum
           of its contiguous (group, order) slice — fully parallel;
  phase 2  per-(partition, group) totals → per-group cumulative
           offsets over partition id → broadcast-join back:
           running = partition_offset + local_running.

Because range partition *i* holds (group, order) keys strictly before
partition *i+1*'s, a group's rows occupy a contiguous partition span
and offset+local reproduces the exact grouped prefix sum. The offsets
frame is tiny by construction: range partitioning gives each partition
a contiguous key span, so the number of (partition, group) cells is at
most |partitions| + |groups| — the phase-2 window runs over that, not
over the data.

Determinism matches the window it replaces: exact whenever (group,
order) is a strict total order (callers order by a unique key last).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _LOC, _TOT, _OFF = "_ps_pid", "_ps_loc", "_ps_tot", "_ps_off"


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order: list,
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out_col`` = per-group running sum of ``value_col``.

    ``order`` is a list of Column sort expressions evaluated within each
    group (include a unique tiebreaker for exact determinism). Output
    type long (callers sum integer token counts; keep arithmetic exact).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    gcols = [F.asc(c) for c in group_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *gcols, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy(_PID, *group_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.withColumn(
        _LOC, F.sum(F.col(value_col).cast("long")).over(w_local)
    )
    totals = ranged.groupBy(_PID, *group_cols).agg(
        F.sum(F.col(value_col).cast("long")).alias(_TOT)
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Re-attach with null-safe equality on the group columns: the
    # window this operator replaces keeps NULL-keyed rows as one group,
    # and a plain equi-join (NULL != NULL) would silently drop them.
    off = totals.select(
        F.col(_PID).alias(f"{_PID}_o"),
        *[F.col(c).alias(f"_ps_g_{c}") for c in group_cols],
        F.coalesce(F.sum(_TOT).over(w_off), F.lit(0)).alias(_OFF),
    )
    cond = local[_PID] == off[f"{_PID}_o"]
    for c in group_cols:
        cond = cond & local[c].eqNullSafe(off[f"_ps_g_{c}"])
    return (
        local.join(F.broadcast(off), cond)
        .withColumn(out_col, (F.col(_LOC) + F.col(_OFF)).cast("long"))
        .drop(
            _PID, _LOC, _OFF, f"{_PID}_o", *[f"_ps_g_{c}" for c in group_cols]
        )
    )
