"""Scalar column-level building blocks (SURVEY.md §2.2 R28-R35)."""

from who_focus_crawler_spark.functions.urls import (  # noqa: F401
    canonicalize,
    host_bucket,
    url_hash,
    with_url_columns,
)
