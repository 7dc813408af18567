"""Python UDTFs (table functions) — the R-layer's lateral-join surface.

Spark 4's ``@udtf`` lets one input row yield many output rows through
`LATERAL`, the API for expansion shapes that scalar UDFs can't express.
Registered here: query-string expansion (one row per URL parameter),
which feeds parameter-fanout analysis — the same signal the trap
scorer (functions/traps.py) thresholds, but in relational form.

Scale note, stated plainly: a Python UDTF is row-at-a-time Python —
the SLOW path. The engine's hot paths use the native equivalent
(``explode(split(...))``, see ``url_params_native``), and
tests/unit/test_udtf.py pins the two row-for-row equal. The UDTF form
exists because it is part of the engine's API surface (users port
LATERAL table functions to it), not because the hot path needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, pkey: string, pval: string")
class ParseParams:
    """One output row per query parameter of a canonical URL:
    (position, key, value); key-less fragments are skipped, URLs
    without a query yield nothing."""

    def eval(self, url: str):  # noqa: D102 — contract in class docstring
        if url is None or "?" not in url:
            return
        q = url.split("?", 1)[1]
        for i, part in enumerate(q.split("&")):
            k, _, v = part.partition("=")
            if k:
                yield i, k, v


def register_udtfs(spark) -> None:
    """Register the table functions for SQL `LATERAL` use."""
    spark.udtf.register("parse_params", ParseParams)


def url_params_native(url: Column) -> Column:
    """Native twin of ParseParams: array<struct<pos,pkey,pval>> built
    with split/transform/filter — whole-stage codegen, the hot-path
    form (explode it for the lateral shape)."""
    from who_focus_crawler_spark.functions.urls import url_query

    q = F.nullif(url_query(url), F.lit(""))
    parts = F.split(q, "&")
    entries = F.transform(
        parts,
        lambda p, i: F.struct(
            i.cast("int").alias("pos"),
            F.substring_index(p, "=", 1).alias("pkey"),
            F.when(
                F.instr(p, F.lit("=")) > 0,
                F.substring(p, F.instr(p, F.lit("=")) + 1, F.lit(1 << 20)),
            )
            .otherwise(F.lit(""))
            .alias("pval"),
        ),
    )
    kept = F.filter(entries, lambda e: e["pkey"] != F.lit(""))
    return F.coalesce(kept, F.array().cast(
        "array<struct<pos:int,pkey:string,pval:string>>"
    ))


def explode_url_params(df: DataFrame, url_col: str = "canon_url") -> DataFrame:
    """Hot-path lateral expansion: one row per URL parameter."""
    return df.select(
        "*", F.explode(url_params_native(F.col(url_col))).alias("_p")
    ).select(*df.columns, "_p.pos", "_p.pkey", "_p.pval")
