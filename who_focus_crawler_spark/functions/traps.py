"""Crawl-trap URL heuristics (C-layer frontier hygiene).

Crawlers drown in infinite URL spaces — calendars, session-id mazes,
faceted-search cross products, path cycles (`/a/b/a/b/a/b/...`). The
standard defense (cf. Heydon & Najork, "Mercator: A scalable,
extensible Web crawler", WWW 1999, §4; also RFC 9309's motivation) is
a cheap per-URL structural score consulted at frontier-admission time.

Everything here is native column expressions over the canonical URL —
whole-stage codegen, no Python, no shuffle — and the score is integer
points so the DuckDB oracle (c_trap_score) checks exact values.

Frozen feature set (per canonical URL):
  depth       number of path segments
  repeats     path segments minus distinct path segments (cycle signal)
  n_params    query parameters (0 when no query)
  calendar    1 if the path contains /YYYY/MM/ or /YYYY-MM-DD
  longnum     1 if any path segment has a run of >= 8 digits (ids,
              session keys)
score = 3*repeats + 2*max(n_params-3, 0) + 2*longnum + calendar
        + max(depth-6, 0); trap when score >= threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRAP_THRESHOLD = 4


def _path(url: Column) -> Column:
    """Path component of a canonical http(s) URL (leading '/').

    Splits on the FIRST '://' — an embedded URL in a query parameter
    (redirect/next/u= links survive canonicalization) must not hijack
    the path extraction."""
    after_scheme = F.substring(
        url, F.instr(url, F.lit("://")) + 3, F.lit(1 << 20)
    )
    hostless = F.substring(
        after_scheme, F.instr(after_scheme, F.lit("/")), F.lit(1 << 20)
    )
    return F.substring_index(hostless, "?", 1)


def _query(url: Column) -> Column:
    from who_focus_crawler_spark.functions.urls import url_query

    return url_query(url)


def trap_features(url: Column) -> dict[str, Column]:
    """Integer structural features of a canonical URL (see module doc)."""
    path = _path(url)
    # segments: drop the empty token before the leading '/'
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    depth = F.size(segs)
    repeats = depth - F.size(F.array_distinct(segs))
    q = _query(url)
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))
    )
    calendar = F.when(
        path.rlike(r"/\d{4}/\d{2}(/|$)") | path.rlike(r"/\d{4}-\d{2}-\d{2}(/|$)"),
        F.lit(1),
    ).otherwise(F.lit(0))
    longnum = F.when(path.rlike(r"\d{8}"), F.lit(1)).otherwise(F.lit(0))
    return {
        "depth": depth.cast("int"),
        "repeats": repeats.cast("int"),
        "n_params": n_params.cast("int"),
        "calendar": calendar,
        "longnum": longnum,
    }


def trap_score(url: Column) -> Column:
    """Integer trap score (higher = more trap-like)."""
    f = trap_features(url)
    return (
        F.lit(3) * f["repeats"]
        + F.lit(2) * F.greatest(f["n_params"] - F.lit(3), F.lit(0))
        + F.lit(2) * f["longnum"]
        + f["calendar"]
        + F.greatest(f["depth"] - F.lit(6), F.lit(0))
    ).cast("int")


def flag_traps(
    df: DataFrame, url_col: str = "canon_url", threshold: int = TRAP_THRESHOLD
) -> DataFrame:
    """Attach trap_score + is_trap to a frontier frame (scan-level map —
    admission gating composes with C6/C7 without any extra shuffle)."""
    return df.withColumn("trap_score", trap_score(F.col(url_col))).withColumn(
        "is_trap", (F.col("trap_score") >= F.lit(threshold)).cast("boolean")
    )


def url_path_template(url: Column) -> Column:
    """Structural URL template: host + path with every decimal digit
    run collapsed to '{N}' and every query VALUE to '{V}' (parameter
    names kept, order preserved) — URLs minted by the same site code
    collapse to one template. The frontier-side complement of
    trap_score: grouping by template measures how much of the URL space
    is generated (pagination/ids/calendars) vs authored, and a template
    whose instance count explodes is the crawl trap to cap.

    Native expressions only (regexp_replace chain, no Python, no
    shuffle) — safe to evaluate on every discovered URL at scan time.
    """
    from who_focus_crawler_spark.functions.urls import url_host

    path_t = F.regexp_replace(_path(url), "[0-9]+", "{N}")
    q = _query(url)
    q_t = F.when(
        q == "", F.lit("")
    ).otherwise(
        F.concat(F.lit("?"), F.regexp_replace(q, "=[^&]*", "={V}"))
    )
    return F.concat(url_host(url), path_t, q_t)
