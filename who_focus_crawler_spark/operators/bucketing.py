"""Bucketed tables — co-located joins with no per-query shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Bucketing pays that shuffle ONCE at write time:
``df.write.bucketBy(n, key).sortBy(key)`` hash-partitions rows into a
fixed number of bucket files per key, and Spark's scan reports the
resulting ``HashPartitioning`` to the planner, so a sort-merge join of
two tables bucketed by the same key and bucket count runs with ZERO
Exchange operators — each task merge-joins bucket i of both tables
in place. ``sortBy`` additionally removes the per-task sort.

This is the standard Spark datasource-bucketing design (SPARK-11512,
public docs "Bucketing, Sorting and Partitioning"); it works with the
in-memory session catalog — no Hive metastore needed — because bucket
metadata lives in the catalog entry the ``saveAsTable`` call creates.

Scale notes:
- bucket count is a layout contract: both join sides must agree (or be
  a multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``).
- One file per bucket per writing task: always ``repartition`` on the
  bucket key before writing so each bucket is one file, not
  tasks × buckets small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key_cols: list[str],
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    The ``repartition`` on the bucket key is the one shuffle this layout
    ever pays: it aligns writer tasks with buckets so the output is one
    file per bucket, and every later equi-join on ``key_cols`` against a
    same-bucketed table is exchange-free.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(n_buckets, *key_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key_cols[0], *key_cols[1:])
    )
    if sort:
        w = w.sortBy(key_cols[0], *key_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,  # column name(s) or join Column expression
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    The "merge" hint pins sort-merge join (a broadcast would hide the
    point of the layout); with both scans reporting the same
    HashPartitioning the planner inserts no Exchange — asserted in
    tests/unit/test_plans.py.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
