"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship frontier schedule+dedup pipeline on
sf0.001; `queries()` / `oracle_sql()` expose the full operator surface
(SURVEY.md §2 Layer C/R + the training-data corpus ops) for the driver's
DuckDB value-hash comparison at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path from another cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from who_focus_crawler_spark import harness  # noqa: E402
from who_focus_crawler_spark.harness.flagship import flagship_schedule


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return harness.oracle_sql()
