"""fetch_and_extract's Arrow RecordBatch form ≡ the pandas twin.

Round 5 moved the primary fetch path to mapInArrow (span sequences are
list<struct>; the pandas crossing built every span as a Python dict in
an object column — measured ~4.6× slower warmed at 200k pages). The
span sequence is the engine's frozen extraction contract
(BASELINE.json input_hint), so the two forms must be ROW-IDENTICAL,
not just statistically alike — this pins it on a fixture slice that
exercises text/media/link spans, redirects, meta directives and
mirrors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import url_hash, url_host
from who_focus_crawler_spark.operators.fetch import (
    fetch_and_extract,
    fetch_and_extract_arrow,
    fetch_and_extract_pandas,
)
from who_focus_crawler_spark.sources.fixture_web import WebConfig, page_url


def _admitted(spark, web, n=400):
    urls = [
        page_url(i % web.n_hosts, i // web.n_hosts % 10) for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i + 1, 1, u, 1, 0) for i, u in enumerate(urls)],
        "seq long, batch int, canon_url string, depth int, seed_id int",
    )
    return df.withColumn("url_hash", url_hash(F.col("canon_url"))).withColumn(
        "host", url_host(F.col("canon_url"))
    )


def test_arrow_fetch_equals_pandas_fetch(spark):
    web = WebConfig(
        n_hosts=40,
        n_pages=2000,
        select_k=2000,
        politeness_k=2000,
        redirect_every=17,
        meta_robots_every=23,
        mirror_every=19,
    )
    adm = _admitted(spark, web)
    a = fetch_and_extract_arrow(adm, web).orderBy("seq").collect()
    p = fetch_and_extract_pandas(adm, web).orderBy("seq").collect()
    assert len(a) == len(p) == 400
    for ra, rp in zip(a, p):
        assert ra == rp


def test_primary_fetch_is_the_arrow_form(spark):
    web = WebConfig(n_hosts=5, n_pages=50)
    adm = _admitted(spark, web, n=10)
    got = fetch_and_extract(adm, web).orderBy("seq").collect()
    want = fetch_and_extract_arrow(adm, web).orderBy("seq").collect()
    assert got == want
    # spans carry all four struct fields in the frozen order
    s = got[0].spans[0]
    assert list(s.asDict().keys()) == ["kind", "text", "media_ref", "offset"]
