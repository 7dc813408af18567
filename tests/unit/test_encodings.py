"""Charset sniffing (functions/encodings.py) — WHATWG-abridged precedence:
BOM > meta declaration > utf-8 default, with the UTF-16/32 LE prefix
ambiguity resolved longest-first."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.encodings import sniff_charset

CASES = [
    # (label, payload bytes, expected)
    ("bom-utf8", b"\xef\xbb\xbf<html>hello", "utf-8"),
    ("bom-utf16le", b"\xff\xfe<\x00h\x00", "utf-16le"),
    ("bom-utf16be", b"\xfe\xff\x00<\x00h", "utf-16be"),
    ("bom-utf32le", b"\xff\xfe\x00\x00<\x00\x00\x00", "utf-32le"),
    ("bom-utf32be", b"\x00\x00\xfe\xff\x00\x00\x00<", "utf-32be"),
    ("meta-quoted", b'<head><meta charset="Windows-1252"></head>', "windows-1252"),
    ("meta-unquoted", b"<head><meta charset=utf-8></head>", "utf-8"),
    ("meta-httpequiv",
     b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">',
     "iso-8859-1"),
    ("meta-uppercase", b"<META CHARSET='KOI8-R'>", "koi8-r"),
    # BOM wins over a conflicting meta declaration
    ("bom-beats-meta", b'\xef\xbb\xbf<meta charset="utf-16le">', "utf-8"),
    ("none", b"<html><body>plain ascii, no declaration</body></html>", "utf-8"),
    # high-bit bytes with no BOM/meta must not break the latin-1 decode
    ("binary-junk", b"\x89PNG\r\n\x1a\n\x00\x00", "utf-8"),
]


def test_sniff_known_vectors(spark):
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b, _ in CASES], "name string, raw binary"
    )
    got = {
        r.name: r.charset
        for r in df.select("name", sniff_charset(F.col("raw")).alias("charset")).collect()
    }
    assert got == {n: want for n, _, want in CASES}


def test_meta_beyond_head_bound_is_ignored(spark):
    payload = b"<html>" + b" " * 2000 + b'<meta charset="shift_jis">'
    df = spark.createDataFrame([(bytearray(payload),)], "raw binary")
    assert (
        df.select(sniff_charset(F.col("raw"), head_bytes=1024).alias("c"))
        .collect()[0].c == "utf-8"
    )
    assert (
        df.select(sniff_charset(F.col("raw"), head_bytes=4096).alias("c"))
        .collect()[0].c == "shift_jis"
    )


MIME_CASES = [
    ("png", b"\x89PNG\r\n\x1a\nrest", "image/png"),
    ("jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    ("gif", b"GIF89a\x01\x00", "image/gif"),
    ("bmp", b"BM\x36\x00\x00\x00", "image/bmp"),
    ("pdf", b"%PDF-1.7\n", "application/pdf"),
    ("gzip", b"\x1f\x8b\x08\x00", "application/gzip"),
    ("zip", b"PK\x03\x04\x14\x00", "application/zip"),
    ("ogg", b"OggS\x00\x02", "application/ogg"),
    ("id3", b"ID3\x04\x00", "audio/mpeg"),
    ("mpeg-ps", b"\x00\x00\x01\xba\x44", "video/mpeg"),
    ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    # RIFF that is NOT webp (WAV) is outside claimed coverage -> fallback
    ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt ", "application/octet-stream"),
    ("mp4", b"\x00\x00\x00\x18ftypisom\x00", "video/mp4"),
    # MP4 whose leading box size collides with an MPEG-PS start code:
    # the offset ftyp signature must win over the prefix rule
    ("mp4-mpeg-collision", b"\x00\x00\x01\xbaftypisom", "video/mp4"),
    ("html-doctype", b"  <!DOCTYPE html><html>", "text/html"),
    ("html-tag", b"<HTML lang=en>", "text/html"),
    ("html-fragment", b"<div>not a document</div>", "application/octet-stream"),
    ("empty", b"", "application/octet-stream"),
    ("junk", b"\x00\x01\x02\x03", "application/octet-stream"),
]


def test_sniff_mime_vectors(spark):
    from who_focus_crawler_spark.functions.encodings import sniff_mime

    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b, _ in MIME_CASES], "name string, raw binary"
    )
    got = {
        r.name: r.mime
        for r in df.select("name", sniff_mime(F.col("raw")).alias("mime")).collect()
    }
    assert got == {n: want for n, _, want in MIME_CASES}


def test_sniff_charset_with_header_precedence(spark):
    """BOM > HTTP header > meta > utf-8 (WHATWG order)."""
    from who_focus_crawler_spark.functions.encodings import (
        sniff_charset_with_header,
    )

    cases = [
        # (payload, content_type, want)
        (b'\xef\xbb\xbf<meta charset="koi8-r">', "text/html; charset=latin-2",
         "utf-8"),                                   # BOM beats a lying header
        (b'<meta charset="koi8-r">', "text/html; charset=ISO-8859-1",
         "iso-8859-1"),                              # header beats meta
        (b'<meta charset="koi8-r">', "text/html", "koi8-r"),  # meta fallback
        (b'<meta charset="koi8-r">', None, "koi8-r"),         # null header
        (b"plain", 'application/json;charset="UTF-16le"', "utf-16le"),
        (b"plain", "text/plain", "utf-8"),
    ]
    df = spark.createDataFrame(
        [(bytearray(b), ct, w) for b, ct, w in cases],
        "raw binary, ct string, want string",
    )
    rows = df.select(
        "want", sniff_charset_with_header(F.col("raw"), F.col("ct")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)
