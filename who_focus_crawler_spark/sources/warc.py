"""WARC (ISO 28500) archival source & sink.

WARC is the interchange format of the crawl world (Common Crawl, the
Internet Archive, Heritrix all speak it): a flat concatenation of
records, each a CRLF-terminated header block plus a Content-Length-
delimited payload. A crawler that cannot emit/ingest WARC cannot trade
corpora with anything else, so the engine ships both directions:

- ``write_warc``   — DataFrame → one ``part-<partition>.warc`` file per
  non-empty partition (task-side writes, the same shape as a
  ``foreachPartition`` sink; production swaps the ``open()`` for an
  HDFS/S3 stream under the output committer). Each file opens with one
  ``warcinfo`` record followed by a ``response`` record per row.
- ``read_warc``    — ``binaryFile`` scan → ``mapInPandas`` parser →
  one row per record. Files split per task exactly as the scan lists
  them (WARC is not block-splittable without an index; at 100 TB the
  unit of parallelism is the file, which is how Common Crawl shards —
  thousands of ~1 GB warcs — are actually processed).

Determinism: record ids derive from blake2b(uri|date) — no UUIDs, no
wall clock — so write→read round-trips are byte-stable and the driver
oracle can value-check them (``r_warc_roundtrip``).

The per-record loop inside the UDFs is inherent to a sequential record
format (same status as the fetch extractor): Python cost is per
*record batch* via Arrow, never per-row JVM crossings.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_VERSION = b"WARC/1.0"

WARC_RECORD = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("warc_file", T.StringType()),
    ]
)

WRITE_MANIFEST = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _record_id(uri: str, date: str) -> str:
    h = hashlib.blake2b(f"{uri}|{date}".encode(), digest_size=16).hexdigest()
    return f"<urn:wfc:{h}>"


def _render(warc_type: str, uri: str | None, date: str, payload: bytes) -> bytes:
    headers = [
        _VERSION,
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + _record_id(uri or warc_type, date).encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if uri is not None:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(headers) + _CRLF * 2 + payload + _CRLF * 2


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    date: str = "2000-01-01T00:00:00Z",
) -> DataFrame:
    """Sink ``df`` as WARC files under ``path``; returns the lazy write
    manifest (one row per written file) — collect it to run the write.

    ``payload_col`` must be binary (``F.encode(text, 'UTF-8')`` for
    text corpora); ``date`` is the fixed WARC-Date stamp (crawl batch
    time is data, not wall clock — determinism contract of the repo).
    """
    os.makedirs(path, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.warc")
        n, total = 0, 0
        f = None
        for pdf in batches:
            if f is None and len(pdf):
                f = open(fname, "wb")
                info = _render(
                    "warcinfo", None, date, b"software: who-focus-crawler-spark"
                )
                f.write(info)
                total += len(info)
            for uri, payload in zip(pdf[uri_col], pdf[payload_col]):
                block = _render("response", uri, date, bytes(payload))
                f.write(block)
                n += 1
                total += len(block)
        if f is not None:
            f.close()
            yield pd.DataFrame(
                [{"warc_file": fname, "n_records": n, "n_bytes": total}]
            )

    return df.select(uri_col, payload_col).mapInPandas(run, WRITE_MANIFEST)


def _parse_file(name: str, blob: bytes) -> list[dict]:
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF * 2, pos)
        if head_end == -1:
            raise ValueError(f"{name}: truncated WARC header at byte {pos}")
        head = blob[pos:head_end].decode("utf-8", errors="strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"{name}: bad record version {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body_start = head_end + 4
        payload = blob[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError(f"{name}: truncated payload at byte {body_start}")
        out.append(
            {
                "warc_type": fields.get("warc-type"),
                "record_id": fields.get("warc-record-id"),
                "warc_date": fields.get("warc-date"),
                "target_uri": fields.get("warc-target-uri"),
                "content_length": clen,
                "payload": payload,
                "warc_file": name,
            }
        )
        pos = body_start + clen + 4  # payload + trailing CRLF CRLF
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (dir or glob) for ``*.warc`` files and parse every
    record. One task per file (binaryFile source); header fields come
    back as columns, the payload as raw bytes."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_file(name, bytes(blob)))
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(run, WARC_RECORD)


def revisit_records(
    captures: DataFrame,
    uri_col: str = "uri",
    seq_col: str = "seq",
    digest_col: str = "digest",
) -> DataFrame:
    """Archival payload dedup (WARC/1.1 §6.7 revisit records, the
    Heritrix identical-payload-digest policy): the FIRST capture of each
    payload digest — ordered by (seq, uri) — stays a full ``response``
    record; every later capture with the same digest is written as a
    ``revisit`` record carrying only a reference to the original
    (refers_to_uri, refers_to_seq), not the payload bytes.

    At archive scale this is the storage win for recrawls (unchanged
    pages re-fetched every cycle store ~40 bytes instead of the body).
    One shuffle keyed on the digest: a partial+final min-struct picks
    each digest's canonical first capture, broadcast-joined back when
    the digest dimension is small or shuffle-joined otherwise — never a
    window over the full capture log.
    """
    first = captures.groupBy(digest_col).agg(
        F.min(F.struct(F.col(seq_col), F.col(uri_col))).alias("_f")
    )
    joined = captures.join(first, digest_col)
    is_first = (F.col(seq_col) == F.col("_f." + seq_col)) & (
        F.col(uri_col) == F.col("_f." + uri_col)
    )
    return joined.select(
        uri_col,
        seq_col,
        digest_col,
        F.when(is_first, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("warc_type"),
        F.when(is_first, F.lit(None).cast("string"))
        .otherwise(F.col("_f." + uri_col))
        .alias("refers_to_uri"),
        F.when(is_first, F.lit(None).cast("long"))
        .otherwise(F.col("_f." + seq_col).cast("long"))
        .alias("refers_to_seq"),
    )


def surt_key(uri: Column) -> Column:
    """SURT — Sort-friendly URI Reordering Transform (Heritrix/OpenWayback,
    the key order of every public CDX index): lowercase, drop the scheme
    and any port, strip a leading 'www' label, reverse the host labels
    comma-joined, then ')' + path[?query].

    'http://www.Example.org:8080/p/1?q=2' -> 'org,example)/p/1?q=2'

    Reversed-host keys cluster a registrable domain's captures
    contiguously, so a sorted CDX supports prefix range-scans per site —
    the property that matters when the index itself is billions of rows.
    All native string/array expressions.
    """
    low = F.lower(uri)
    # Strip only a LEADING scheme. substring_index(low, '://', -1) takes
    # everything after the LAST '://', so a URI with an embedded absolute
    # URL in its query (redirect/outlink params, ubiquitous in CDX
    # workloads) would key under the embedded host.
    rest = F.regexp_replace(low, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.substring_index(rest, "/", 1)
    host = F.regexp_replace(
        F.substring_index(hostport, ":", 1), r"^www\d*\.", ""
    )
    slash = F.instr(rest, "/")
    path = F.when(slash > 0, rest.substr(slash, F.lit(100_000))).otherwise(
        F.lit("/")
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), path)


def cdx_index(
    records: DataFrame,
    uri_col: str = "target_uri",
    date_col: str = "warc_date",
    file_col: str = "warc_file",
) -> DataFrame:
    """CDX(J)-style capture index over a WARC record table: one row per
    record with (surt, ts14, uri, digest, length, warc_file,
    seq_in_file), globally ordered by (surt, ts14) the way public CDX
    files are sorted.

    Frozen v1 addressing: ``seq_in_file`` is the record ORDINAL within
    its WARC file (row_number by (warc_date, record_id) — the write
    order), not a byte offset: the shim's reader (read_warc) addresses
    records by ordinal, and byte offsets are a property of the writer's
    rendering, not of the logical archive. The window partitions by
    warc_file — bounded by records-per-file, never global; the final
    sort is the usual range-partitioned order-by.
    """
    w = Window.partitionBy(file_col).orderBy(date_col, "record_id")
    ts14 = F.regexp_replace(F.col(date_col), "[^0-9]", "").substr(1, 14)
    return (
        records.withColumn("seq_in_file", F.row_number().over(w).cast("long"))
        .select(
            surt_key(F.col(uri_col)).alias("surt"),
            ts14.alias("ts14"),
            F.col(uri_col).alias("uri"),
            F.md5(F.col("payload")).alias("digest"),
            F.col("content_length").alias("length"),
            F.col(file_col).alias("warc_file"),
            "seq_in_file",
        )
        .orderBy("surt", "ts14", "uri")
    )
