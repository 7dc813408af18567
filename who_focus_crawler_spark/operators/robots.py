"""C8 — robots.txt gate with a TTL'd per-host cache table.

Flow (SURVEY.md §2.1 C8): distinct new hosts → vectorized fetch+parse of
robots.txt (mapInPandas; fixture-served in this sandbox — no network) →
union into the broadcast-joined robots_cache → RFC 9309
most-specific-match rule evaluation as one Arrow-batched pandas UDF.

Rules are cached as a JSON string column (list of [allow, pattern]
pairs; patterns are plain path prefixes or §2.2.3 wildcard rules with
``*``/trailing ``$``, most-specific — longest pattern — wins at
evaluation time), so the cache row is flat and broadcast-friendly: one
row per distinct host, tiny versus the frontier.
"""

from __future__ import annotations

import json
import re as _re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from who_focus_crawler_spark.sources.fixture_web import WebConfig


def _json_quote(v):
    """JSON string literal of a column value. Escapes backslash + quote
    and DROPS C0 control chars: a rule pattern that smuggles one in
    (a stray tab, or a \\r from malformed input) must not render the
    whole rules_json cache entry unparseable — control chars are never
    meaningful in URL path patterns anyway."""
    esc = F.regexp_replace(F.regexp_replace(v, r"\\", r"\\\\"), '"', '\\\\"')
    esc = F.regexp_replace(esc, r"[\x00-\x1f]", "")
    return F.concat(F.lit('"'), esc, F.lit('"'))


def fetch_robots_for_hosts(
    hosts: DataFrame, cfg: WebConfig, batch: int
) -> DataFrame:
    """Robots fetch for previously-unseen hosts: raw robots.txt TEXT in
    (one mapInPandas — the gate's single I/O touchpoint, served by the
    deterministic fixture web here), then the RFC 9309 text parser
    (operators/robots_txt.py) as native dataflow, re-packed into the
    cache's rules_json format ([[allow, pattern], ...] in file order).
    The parser is load-bearing in every crawl: the golden replay pins
    that text → rules → gate reproduces the frozen schedule exactly.
    Sitemap directives surface in the parse but are not cached here
    (the sitemap channel fetches per-host maps itself).
    """
    from who_focus_crawler_spark.operators.robots_txt import parse_robots_txt
    from who_focus_crawler_spark.sources.fixture_web import robots_txt_text

    def fetch_text(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "robots_txt": [robots_txt_text(h, cfg) for h in pdf["host"]],
                }
            )

    distinct = hosts.select("host").distinct()
    texts = distinct.mapInPandas(fetch_text, "host string, robots_txt string")
    parsed = parse_robots_txt(
        texts.filter(F.col("robots_txt").isNotNull()), agent=cfg.agent
    )
    rule_entry = lambda s: F.concat(  # noqa: E731 — tight lambda for transform
        F.lit("["),
        F.when(s["allow"], F.lit("true")).otherwise(F.lit("false")),
        F.lit(", "),
        _json_quote(s["value"]),
        F.lit("]"),
    )
    rules = (
        parsed.filter(F.col("directive") == "rule")
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("line_no", "allow", "value"))
                        ),
                        rule_entry,
                    ),
                    ", ",
                ),
                F.lit("]"),
            ).alias("rules_json")
        )
    )
    delays = (
        parsed.filter(F.col("directive") == "crawl_delay")
        .groupBy("host")
        .agg(F.min(F.col("value").cast("int")).alias("crawl_delay"))
    )
    return (
        distinct.join(rules, "host", "left")
        .join(delays, "host", "left")
        .select(
            "host",
            "rules_json",
            F.col("crawl_delay").cast("int"),
            F.lit(batch).cast("int").alias("fetched_in_batch"),
        )
    )


def refresh_robots_cache(
    candidates: DataFrame, robots_cache: DataFrame, cfg: WebConfig, batch: int
) -> DataFrame:
    """TTL'd cache refresh: a cached rule set older than
    ``cfg.robots_ttl_batches`` batches is treated as absent, so hosts
    this batch touches get re-fetched (rule changes take effect) and
    expired rows for untouched hosts are evicted. ``None`` TTL = cache
    forever (the fixture web's rules are immutable, so goldens are
    unaffected)."""
    ttl = getattr(cfg, "robots_ttl_batches", None)
    fresh = (
        robots_cache
        if ttl is None
        # keep rows aged <= ttl batches (expired means STRICTLY older)
        else robots_cache.filter(F.col("fetched_in_batch") >= batch - ttl)
    )
    new_hosts = (
        candidates.select("host")
        .distinct()
        .join(F.broadcast(fresh.select("host")), "host", "left_anti")
    )
    fetched = fetch_robots_for_hosts(new_hosts, cfg, batch)
    return fresh.unionByName(fetched)


def _rule_matcher(pattern: str):
    """Compile one robots rule path pattern to a vectorized matcher.

    RFC 9309 §2.2.3: ``*`` matches any octet sequence, a trailing ``$``
    anchors at end-of-path. Plain prefixes (the overwhelmingly common
    case, and all the fixture web emits) keep the ``str.startswith``
    fast path; only wildcard rules pay the regex engine."""
    if "*" not in pattern and not pattern.endswith("$"):
        return lambda p: p.str.startswith(pattern)
    body, anchored = (
        (pattern[:-1], True) if pattern.endswith("$") else (pattern, False)
    )
    rx = ".*".join(_re.escape(part) for part in body.split("*"))
    rx = rx + r"\Z" if anchored else rx
    return lambda p: p.str.match(rx, na=False)


@pandas_udf(T.BooleanType())
def _robots_match(rules_json: pd.Series, path: pd.Series) -> pd.Series:
    """RFC 9309 most-specific-match; missing/empty robots → allowed.

    Vectorized per distinct rule set (≤ one per host in the batch): each
    compiled rule is applied to the whole path Series (startswith or,
    for ``*``/``$`` wildcard rules, one anchored regex) — no per-row
    Python (VERDICT r1). Specificity = octet length of the rule pattern
    (§2.3.2); at equal length the first rule in file order wins
    (unchanged from the prefix-only matcher, so goldens are stable)."""
    out = pd.Series(True, index=path.index)
    known = rules_json.notna()
    for rj in rules_json[known].unique():
        sel = (rules_json == rj).to_numpy(dtype=bool)
        p = path[sel]
        best_len = pd.Series(-1, index=p.index)
        best_allow = pd.Series(True, index=p.index)
        for allow, pattern in json.loads(rj):
            m = _rule_matcher(pattern)(p) & (len(pattern) > best_len)
            best_allow = best_allow.mask(m, bool(allow))
            best_len = best_len.mask(m, len(pattern))
        out[sel] = best_allow.to_numpy(dtype=bool)
    return out


def apply_robots(
    candidates: DataFrame, robots_cache: DataFrame, miss_col: str | None = None
) -> DataFrame:
    """Attach ``robots_ok`` to candidates via broadcast join + pandas UDF.

    ``miss_col``: additionally attach a boolean marking rows whose host
    has NO row in the cache at all (a cached host with an absent/empty
    robots.txt has a row with NULL rules, which is not a miss). The
    streaming loop's fast path gates on this: an epoch whose hosts are
    all cache-fresh skips the robots fetch stage entirely and this
    optimistic gate IS the final answer — for cached hosts the rules
    are identical either way."""
    # RFC 9309 matches on path-and-query; canonical URLs always carry "/"
    path = F.regexp_extract("canon_url", r"^[a-z][a-z0-9+.\-]*://[^/?]*(/.*)?$", 1)
    cache_cols = ["host", "rules_json"]
    if "crawl_delay" in robots_cache.columns:  # pre-delay caches still gate
        cache_cols.append("crawl_delay")
    cache = robots_cache.select(*cache_cols)
    if miss_col is not None:
        cache = cache.withColumn("_rb_cached", F.lit(True))
    out = candidates.join(F.broadcast(cache), "host", "left")
    if miss_col is not None:
        out = out.withColumn(
            miss_col, F.col("_rb_cached").isNull()
        ).drop("_rb_cached")
    return out.withColumn(
        "robots_ok",
        _robots_match(F.col("rules_json"), F.coalesce(path, F.lit("/"))),
    ).drop("rules_json")
