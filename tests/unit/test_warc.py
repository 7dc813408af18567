"""sources/warc.py — WARC archival sink + source."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.sources.warc import (
    _render,
    read_warc,
    write_warc,
)


def _docs(spark, rows, parts=2):
    df = spark.createDataFrame(rows, "target_uri string, txt string")
    return df.repartition(parts, "target_uri").select(
        "target_uri", F.encode("txt", "UTF-8").alias("payload")
    )


def test_write_read_round_trip(spark, tmp_path):
    rows = [
        (f"http://h{i % 3}.example.test/p/{i}", f"body {i} £ünïcode")
        for i in range(20)
    ]
    path = str(tmp_path / "warc")
    manifest = write_warc(_docs(spark, rows), path).collect()
    assert sum(m["n_records"] for m in manifest) == 20
    assert all(os.path.getsize(m["warc_file"]) == m["n_bytes"] for m in manifest)

    rec = read_warc(spark, path)
    resp = rec.filter(F.col("warc_type") == "response")
    got = {
        (r["target_uri"], bytes(r["payload"]).decode())
        for r in resp.collect()
    }
    assert got == {(u, t) for u, t in rows}
    # every record's declared length matches its payload
    assert (
        resp.filter(F.length("payload") != F.col("content_length")).count() == 0
    )
    # one warcinfo record per written file
    infos = rec.filter(F.col("warc_type") == "warcinfo")
    assert infos.count() == len(manifest)


def test_one_file_per_nonempty_partition(spark, tmp_path):
    rows = [(f"http://h.example.test/p/{i}", f"b{i}") for i in range(4)]
    path = str(tmp_path / "w2")
    # 8 partitions, 4 rows → at most 4 non-empty → no empty files on disk
    df = _docs(spark, rows, parts=8)
    manifest = write_warc(df, path).collect()
    files = glob.glob(os.path.join(path, "*.warc"))
    assert sorted(files) == sorted(m["warc_file"] for m in manifest)
    assert 0 < len(files) <= 4


def test_record_bytes_layout():
    block = _render("response", "http://x/y", "2000-01-01T00:00:00Z", b"abc")
    assert block.startswith(b"WARC/1.0\r\n")
    head, _, rest = block.partition(b"\r\n\r\n")
    assert b"Content-Length: 3" in head
    assert b"WARC-Target-URI: http://x/y" in head
    assert rest == b"abc\r\n\r\n"
    # deterministic: same inputs, same bytes
    assert block == _render(
        "response", "http://x/y", "2000-01-01T00:00:00Z", b"abc"
    )


def test_malformed_file_raises(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-00000.warc").write_bytes(b"NOT-WARC\r\n\r\nxyz")
    with pytest.raises(Exception, match="bad record version"):
        read_warc(spark, str(path)).collect()


def test_truncated_payload_raises(spark, tmp_path):
    path = tmp_path / "trunc"
    path.mkdir()
    good = _render("response", "http://x/y", "2000-01-01T00:00:00Z", b"abcdef")
    (path / "part-00000.warc").write_bytes(good[:-6])  # cut payload tail
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, str(path)).collect()


def test_revisit_records_reference_first_capture(spark):
    from who_focus_crawler_spark.sources.warc import revisit_records

    rows = [
        ("http://a/1", 1, "dA"),
        ("http://a/2", 2, "dB"),
        ("http://b/1", 3, "dA"),  # same payload as seq 1 → revisit
        ("http://a/1", 4, "dA"),  # recrawl of a/1 → revisit of seq 1
        ("http://c/9", 5, "dC"),
    ]
    out = {
        r.seq: (r.warc_type, r.refers_to_uri, r.refers_to_seq)
        for r in revisit_records(
            spark.createDataFrame(rows, ["uri", "seq", "digest"])
        ).collect()
    }
    assert out[1] == ("response", None, None)
    assert out[2] == ("response", None, None)
    assert out[3] == ("revisit", "http://a/1", 1)
    assert out[4] == ("revisit", "http://a/1", 1)
    assert out[5] == ("response", None, None)


def test_surt_key_vectors(spark):
    """sources/warc.py::surt_key — the Heritrix SURT rules: lowercase,
    scheme/port dropped, leading www stripped, host labels reversed."""
    from pyspark.sql import functions as F

    from who_focus_crawler_spark.sources.warc import surt_key

    cases = [
        ("http://www.Example.org:8080/p/1?q=2", "org,example)/p/1?q=2"),
        ("HTTPS://Sub.Host.Example.COM/A/B", "com,example,host,sub)/a/b"),
        ("http://example.org", "org,example)/"),
        ("http://www2.example.org/x", "org,example)/x"),
        ("http://wwwish.example.org/x", "org,wwwish.example)/x".replace(
            "wwwish.example", "example,wwwish"
        )),  # 'wwwish' is NOT a www label
        ("http://h0.example.test/private/p/7", "test,example,h0)/private/p/7"),
        # embedded absolute URL in the query must NOT hijack the key
        (
            "http://www.example.org/r?u=http://other.com/x",
            "org,example)/r?u=http://other.com/x",
        ),
        (
            "https://a.test/out?next=https://b.test/y&z=1",
            "test,a)/out?next=https://b.test/y&z=1",
        ),
    ]
    df = spark.createDataFrame(cases, "uri string, want string")
    for r in df.select("want", surt_key(F.col("uri")).alias("got")).collect():
        assert r.got == r.want, (r.got, r.want)
