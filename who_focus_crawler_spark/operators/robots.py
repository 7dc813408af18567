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

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.sources.fixture_web import (
    WebConfig,
    robots_crawl_delay,
    robots_rules,
)


def fetch_robots_for_hosts(
    hosts: DataFrame, cfg: WebConfig, batch: int
) -> DataFrame:
    """Vectorized robots fetch+parse for previously-unseen hosts.

    In production this is the single network touchpoint of the gate; here
    it is served by the deterministic fixture web (SURVEY.md §0.1 — no
    network), but the dataflow (mapInPandas over distinct hosts) is the
    real one.
    """

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rules = [
                json.dumps(robots_rules(h, cfg)) if robots_rules(h, cfg) else None
                for h in pdf["host"]
            ]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "rules_json": rules,
                    "crawl_delay": pd.array(
                        [robots_crawl_delay(h, cfg) for h in pdf["host"]],
                        dtype="Int32",
                    ),
                    "fetched_in_batch": batch,
                }
            )

    return hosts.select("host").distinct().mapInPandas(fetch, schemas.ROBOTS_CACHE)


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


def apply_robots(candidates: DataFrame, robots_cache: DataFrame) -> DataFrame:
    """Attach ``robots_ok`` to candidates via broadcast join + pandas UDF."""
    # RFC 9309 matches on path-and-query; canonical URLs always carry "/"
    path = F.regexp_extract("canon_url", r"^[a-z][a-z0-9+.\-]*://[^/?]*(/.*)?$", 1)
    cache_cols = ["host", "rules_json"]
    if "crawl_delay" in robots_cache.columns:  # pre-delay caches still gate
        cache_cols.append("crawl_delay")
    return (
        candidates.join(
            F.broadcast(robots_cache.select(*cache_cols)),
            "host",
            "left",
        )
        .withColumn(
            "robots_ok",
            _robots_match(F.col("rules_json"), F.coalesce(path, F.lit("/"))),
        )
        .drop("rules_json")
    )
