"""C1/C2/C3 unit tests — table-driven RFC 3986 §6 vectors + Spark/Python
cross-equality (SURVEY.md §5.2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import (
    canonicalize,
    canonicalize_py,
    host_bucket,
    url_hash,
    url_host,
    url_host_py,
)

CASES = [
    # (input, expected canonical)
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTP://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a/b/..", "http://example.com/a/"),
    ("http://example.com/../../x", "http://example.com/x"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?utm_source=x&z=1", "http://example.com/a?z=1"),
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/%7Euser/%2a", "http://example.com/~user/%2A"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/a?", "http://example.com/a"),
    ("ftp://example.com/a", None),
    ("not a url", None),
    ("http:///pathonly", None),
    # separator-less junk (ADVICE r1: used to canonicalize to "http://tp/")
    ("http", None),
    ("https", None),
    ("HTTP#x", None),
    ("  http  ", None),
    ("http:/example.com/a", None),
]


def test_canonicalize_py_vectors():
    for raw, want in CASES:
        assert canonicalize_py(raw) == want, raw


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.withColumn("canon", canonicalize(F.col("url"))).collect()
    }
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_canonicalize_idempotent(spark):
    canon = [c for _, c in CASES if c is not None]
    df = spark.createDataFrame([(u,) for u in canon], ["url"])
    rows = df.withColumn("c2", canonicalize(F.col("url"))).collect()
    for r in rows:
        assert r["c2"] == r["url"]


def test_host_and_bucket(spark):
    df = spark.createDataFrame(
        [("http://h1.example.test:8080/a",), ("https://h2.example.test/b",)],
        ["canon_url"],
    )
    rows = (
        df.withColumn("host", url_host(F.col("canon_url")))
        .withColumn("bucket", host_bucket(F.col("host"), 8))
        .withColumn("h", url_hash(F.col("canon_url")))
        .collect()
    )
    assert rows[0]["host"] == "h1.example.test:8080"
    assert rows[1]["host"] == "h2.example.test"
    for r in rows:
        assert 0 <= r["bucket"] < 8
        assert isinstance(r["h"], int)
        assert url_host_py(r["canon_url"]) == r["host"]
