"""Python Data Source API WARC reader (sources/warc_datasource.py):
row-for-row equality with the mapInPandas reader, one partition per
file, equality-filter pushdown inside the parser, unsupported filters
handed back, and error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from who_focus_crawler_spark.sources import warc_datasource
from who_focus_crawler_spark.sources.warc import (
    WARC_RECORD,
    read_warc,
    write_warc,
)
from who_focus_crawler_spark.sources.warc_datasource import (
    WarcDataSourceReader,
)


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warc_ds"))
    docs = spark.range(20).select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % 3).cast("string"),
            F.lit(".test/p/"),
            F.col("id").cast("string"),
        ).alias("target_uri"),
        F.concat(F.lit("payload-"), F.col("id").cast("string"))
        .cast("binary")
        .alias("payload"),
    ).repartition(3)
    write_warc(docs, d).collect()
    warc_datasource.register(spark)
    return d


def test_matches_mapinpandas_reader(spark, warc_dir):
    a = sorted(map(tuple, read_warc(spark, warc_dir).collect()))
    b = sorted(
        map(tuple, spark.read.format("warc").load(warc_dir).collect())
    )
    assert a == b and len(a) == 23  # 20 responses + 3 warcinfo


def test_one_partition_per_file(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir)
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_results(spark, warc_dir):
    resp = (
        spark.read.format("warc")
        .load(warc_dir)
        .filter(F.col("warc_type") == "response")
    )
    assert resp.count() == 20
    one = (
        spark.read.format("warc")
        .load(warc_dir)
        .filter(F.col("target_uri") == "http://h1.test/p/1")
    )
    assert one.count() == 1


def test_pushdown_prunes_inside_reader(warc_dir):
    import os

    r = WarcDataSourceReader(WARC_RECORD, {"path": warc_dir})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("warc_type",), "warcinfo"),
                GreaterThan(("content_length",), 0),  # not pushable
            ]
        )
    )
    assert [type(f) for f in leftover] == [GreaterThan]
    parts = r.partitions()
    assert len(parts) == len(
        [f for f in os.listdir(warc_dir) if f.endswith(".warc")]
    )
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 3  # only the per-file warcinfo records survive


def test_missing_path_errors(spark, tmp_path):
    with pytest.raises(Exception, match="no \\*.warc files"):
        spark.read.format("warc").load(str(tmp_path)).collect()
    with pytest.raises(Exception, match="requires a path"):
        WarcDataSourceReader(WARC_RECORD, {})
