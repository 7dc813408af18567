"""C9 — two-phase deterministic global sequencing.

``global_row_number`` assigns the exact same total order as
``F.row_number().over(Window.orderBy(*order))`` WITHOUT funnelling the
whole frame through one task (the classic distributed rank):

  phase 1  range-repartition on the order key, pin the partition id
           (one materialization via lazy ``localCheckpoint`` so both
           consumers below see the same layout), rank locally inside
           each range partition — fully parallel;
  phase 2  per-partition row counts (|partitions| rows, trivially
           small) → cumulative offsets → broadcast-joined back:
           ``seq = partition_offset + local_rank``.

Because range partition *i* holds keys strictly before partition
*i+1*'s (RangePartitioning), offset+local_rank reproduces the global
rank exactly. The result is independent of parallelism and partition
boundaries whenever the order key is a strict total order (the engine
always sequences on keys ending in the unique ``canon_url``); with
duplicate keys it is exactly as nondeterministic as ``row_number``
itself. The only single-partition window left operates on the
|partitions|-row offsets frame — O(shuffle.partitions), not O(rows).

At cluster scale this is the textbook two-round rank (e.g. TeraSort's
sampling partitioner): no stage sees more than |rows|/|partitions|
rows, so the sequencer survives a 10^10-row frontier where the naive
global window is a one-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID, _LRN, _CNT, _OFF = "_seq_pid", "_seq_lrn", "_seq_cnt", "_seq_off"


def global_row_number(
    df: DataFrame,
    order: list,
    out_col: str = "seq",
    base: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out_col`` = base + global row_number over ``order``.

    ``order`` is a list of Column sort expressions (e.g.
    ``[F.desc("priority"), F.asc("canon_url")]``). Output type long.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Pin the range layout: both the local-rank branch and the counts
    # branch must observe the SAME partitioning (range boundaries come
    # from sampling; two independent executions could disagree).
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy(_PID).orderBy(*order)
    local = ranged.withColumn(_LRN, F.row_number().over(w_local))
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col, (F.col(_LRN) + F.col(_OFF) + F.lit(base)).cast("long")
        )
        .drop(_PID, _LRN, _CNT, _OFF)
    )
