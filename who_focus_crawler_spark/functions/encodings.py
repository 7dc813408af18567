"""Charset sniffing for fetched byte payloads (WHATWG encoding sniffing,
abridged): BOM first, then an HTML meta declaration, else UTF-8.

A real crawler must decide an encoding before extraction; HTTP bodies
arrive as bytes and the Content-Type header is frequently absent or
wrong, so browsers and crawlers sniff (WHATWG Encoding Standard §
"determine the encoding"; the same precedence html5lib/requests use):

  1. byte-order mark — UTF-32 LE/BE checked before UTF-16 LE/BE
     because FF FE is a prefix of FF FE 00 00;
  2. a <meta charset=...> / http-equiv Content-Type declaration in the
     document head, matched case-insensitively;
  3. fallback utf-8.

All native expressions over the binary column: the BOM test is a hex
prefix match, the meta scan decodes the head as ISO-8859-1 (every byte
sequence is valid latin-1, so the decode can't throw) and applies one
regexp. No Python UDF — the sniff stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex prefix of the BOM, canonical label) — longest-prefix first
BOMS = [
    ("0000FEFF", "utf-32be"),
    ("FFFE0000", "utf-32le"),
    ("EFBBBF", "utf-8"),
    ("FEFF", "utf-16be"),
    ("FFFE", "utf-16le"),
]

_META_RE = r"""(?i)charset\s*=\s*["']?([A-Za-z0-9_\-]+)"""

# (hex prefix at byte 1, MIME label) — the widely-published magic
# numbers (IANA media types; file(1) magic database entries for the
# formats a crawler actually meets). Longest-prefix-first within a
# shared stem is preserved by list order.
MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("424D", "image/bmp"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("504B0506", "application/zip"),
    ("504B0708", "application/zip"),
    ("4F676753", "application/ogg"),
    ("494433", "audio/mpeg"),
    ("000001BA", "video/mpeg"),
    ("000001B3", "video/mpeg"),
]
_HTML_RE = r"(?is)^\s*(?:<!doctype\s+html|<html)"


def sniff_charset(raw: Column, head_bytes: int = 1024) -> Column:
    """Charset label for a binary payload column (lowercased string).

    Only the first ``head_bytes`` bytes are scanned for the meta
    declaration — the WHATWG prescan is bounded the same way, and the
    bound keeps the regexp cost independent of document size.
    """
    hexhead = F.hex(F.substring(raw, 1, 4))
    meta = F.lower(
        F.regexp_extract(
            F.decode(F.substring(raw, 1, head_bytes), "ISO-8859-1"), _META_RE, 1
        )
    )
    out = F.when(meta != "", meta).otherwise(F.lit("utf-8"))
    for prefix, label in reversed(BOMS):
        out = F.when(hexhead.startswith(prefix), F.lit(label)).otherwise(out)
    return out


def sniff_mime(raw: Column) -> Column:
    """MIME label for a binary payload column from magic bytes.

    The fetch layer meets payloads whose Content-Type header is absent
    or lies; magic-byte sniffing is how file(1)/browsers type them.
    Covers the formats a crawler actually stores into the multimodal
    corpus (images, pdf, archives, av containers) plus two
    offset-carrying signatures (WEBP's RIFF....WEBP and MP4's ftyp at
    byte 5), an HTML prescan, and application/octet-stream as the
    honest fallback. Native hex-prefix comparisons only — stays in
    whole-stage codegen, no Python.
    """
    head = F.hex(F.substring(raw, 1, 12))
    out = F.lit("application/octet-stream")
    html = F.decode(F.substring(raw, 1, 256), "ISO-8859-1")
    out = F.when(html.rlike(_HTML_RE), F.lit("text/html")).otherwise(out)
    for prefix, label in reversed(MAGIC):
        out = F.when(head.startswith(prefix), F.lit(label)).otherwise(out)
    # offset signatures wrap LAST so they are the OUTERMOST whens — i.e.
    # evaluated first — and a MAGIC prefix can't shadow them (an MP4
    # whose leading box size bytes collide with an MPEG start code must
    # still type as video/mp4).
    out = F.when(
        head.startswith("52494646")
        & (F.hex(F.substring(raw, 9, 4)) == "57454250"),
        F.lit("image/webp"),
    ).otherwise(out)
    out = F.when(
        F.hex(F.substring(raw, 5, 4)) == "66747970", F.lit("video/mp4")
    ).otherwise(out)
    return out


def charset_from_content_type(header: Column) -> Column:
    """charset parameter of an HTTP Content-Type header value
    (lowercased; empty string when absent/NULL) — e.g.
    'text/html; charset=ISO-8859-1' → 'iso-8859-1'."""
    return F.lower(
        F.regexp_extract(F.coalesce(header, F.lit("")), _META_RE, 1)
    )


def sniff_charset_with_header(
    raw: Column, content_type: Column, head_bytes: int = 1024
) -> Column:
    """Full WHATWG precedence: a BOM is certain (it wins over
    everything, even a lying header); otherwise the transport-layer
    Content-Type charset; otherwise the in-document meta declaration;
    otherwise utf-8. The header path reuses the same charset= grammar
    as the meta scan."""
    hexhead = F.hex(F.substring(raw, 1, 4))
    hdr = charset_from_content_type(content_type)
    meta = F.lower(
        F.regexp_extract(
            F.decode(F.substring(raw, 1, head_bytes), "ISO-8859-1"), _META_RE, 1
        )
    )
    out = (
        F.when(hdr != "", hdr)
        .when(meta != "", meta)
        .otherwise(F.lit("utf-8"))
    )
    for prefix, label in reversed(BOMS):
        out = F.when(hexhead.startswith(prefix), F.lit(label)).otherwise(out)
    return out
