"""HTML entity unescaping — the C4/CCNet text-cleaning step applied to
extracted text before quality gating.

Decodes the XML core named set (+ nbsp as a plain space, the standard
crawl-pipeline normalization) and numeric character references
(decimal ``&#65;`` and hex ``&#x41;``) in the printable-ASCII range
32..126. Out-of-range numerics and unknown named entities are left
verbatim — ``chr`` agrees across engines only where it is plain ASCII,
and leaving an unknown entity visible beats guessing.

Engine-portable, no regex lookahead (RE2-safe for the DuckDB twin),
no Python UDF: mark every '&' with a \\u0001 sentinel, split on it,
decode each piece's leading entity with native expressions, re-join.
Stays inside whole-stage codegen; one projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HTML_ENTITIES = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
]
_DEC_RE = "^&#([0-9]{1,7});"
_HEX_RE = "^&#[xX]([0-9A-Fa-f]{1,6});"
_MARK = "\u0001"


def unescape_html(text: Column) -> Column:
    """Decode HTML entities (see module docstring for the exact scope)."""
    pieces = F.split(F.regexp_replace(text, "&", _MARK + "&"), _MARK)

    def _decode(p: Column) -> Column:
        dec = F.regexp_extract(p, _DEC_RE, 1)
        hexs = F.regexp_extract(p, _HEX_RE, 1)
        code = F.coalesce(
            F.when(dec != "", dec.cast("long")),
            F.when(hexs != "", F.conv(hexs, 16, 10).cast("long")),
        )
        ent_len = (
            F.when(dec != "", F.length(dec) + 3)   # &#  ... ;
            .when(hexs != "", F.length(hexs) + 4)  # &#x ... ;
            .otherwise(F.lit(0))
        )
        out = F.when(
            code.isNotNull() & (code >= 32) & (code <= 126),
            F.concat(F.char(code), F.substring(p, (ent_len + 1).cast("int"), 1_000_000)),
        )
        for name, ch in HTML_ENTITIES:
            out = F.when(
                p.startswith(name),
                F.concat(F.lit(ch), F.substring(p, len(name) + 1, 1_000_000)),
            ).otherwise(out)
        return F.coalesce(out, p)

    return F.array_join(F.transform(pieces, _decode), "")
