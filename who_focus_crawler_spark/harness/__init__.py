"""Driver-harness query registry (SURVEY.md §3.3).

Each entry: name → (builder, oracle_sql | None). Builders take
(spark, sf_dir) and return a DataFrame; oracle_sql is ANSI SQL DuckDB
runs over the same parquet tables. Column names/types are aligned on
both sides because the driver's compare hashes values under sorted
column names (task brief).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

from who_focus_crawler_spark.harness import (  # noqa: E402
    corpus_queries,
    crawl_queries,
    flagship,
    pipeline_queries,
    relational,
)

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}
REGISTRY["flagship_schedule"] = (flagship.flagship_schedule, flagship.FLAGSHIP_SQL)
REGISTRY.update(relational.QUERIES)
REGISTRY.update(crawl_queries.QUERIES)
REGISTRY.update(corpus_queries.QUERIES)
REGISTRY.update(pipeline_queries.QUERIES)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
