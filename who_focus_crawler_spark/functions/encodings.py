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
