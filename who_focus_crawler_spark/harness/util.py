"""Shared helpers for harness query builders."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (explicit path, schema from parquet)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
