"""R3/R4/R5-adjacent source/sink breadth: CSV, JSON, ORC roundtrips with
explicit schemas must reproduce the parquet-read values exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(500)
    )


def _values(df):
    return [
        (r.o_orderkey, r.o_custkey, float(r.o_totalprice), r.o_orderpriority)
        for r in df.orderBy("o_orderkey").collect()
    ]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = sample.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    reader = spark.read.format(fmt).schema(sample.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.load(path)
    assert back.schema == sample.schema
    assert _values(back) == _values(sample)


def test_csv_pushdown_prunes_columns(spark, sample, tmp_path):
    """Even text formats get column pruning at the scan (ReadSchema)."""
    path = str(tmp_path / "csvp")
    sample.write.mode("overwrite").option("header", "true").csv(path)
    df = (
        spark.read.schema(sample.schema)
        .option("header", "true")
        .csv(path)
        .select("o_orderkey")
        .filter(F.col("o_orderkey") > 0)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" not in read_schema
