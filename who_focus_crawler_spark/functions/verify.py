"""Span-sequence equality checker (SURVEY.md §5.4; BASELINE.json
input_hint per-row invariant).

Equality is over (kind, text, media_ref) in sequence order; `offset`
participates in ordering upstream, not in equality ("(kind, text,
media_ref, order)"). Pure column expressions — usable in joins/filters
at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def span_triple(span: Column) -> Column:
    return F.struct(
        span["kind"].alias("kind"),
        span["text"].alias("text"),
        span["media_ref"].alias("media_ref"),
    )


def spans_equal(a: Column, b: Column) -> Column:
    """True iff the two span arrays have equal length and pairwise-equal
    (kind, text, media_ref) in order. Null-safe on the struct fields."""
    pair_ok = F.zip_with(
        a,
        b,
        lambda x, y: span_triple(x).eqNullSafe(span_triple(y)),
    )
    return (F.size(a) == F.size(b)) & F.forall(pair_ok, lambda v: v)


def diff_documents(
    got: DataFrame, want: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Rows whose span sequences differ between two document tables
    (plus ids present on only one side). Empty ⇒ exact corpus match."""
    g = got.select(F.col(id_col), F.col(spans_col).alias("_spans_got"))
    w = want.select(F.col(id_col), F.col(spans_col).alias("_spans_want"))
    joined = g.join(w, id_col, "full_outer")
    return joined.filter(
        F.col("_spans_got").isNull()
        | F.col("_spans_want").isNull()
        | ~spans_equal(F.col("_spans_got"), F.col("_spans_want"))
    ).select(id_col)
