"""C8 — robots.txt gate with a TTL'd per-host cache table.

Flow (SURVEY.md §2.1 C8): distinct new hosts → vectorized fetch+parse of
robots.txt (mapInPandas; fixture-served in this sandbox — no network) →
union into the broadcast-joined robots_cache → RFC 9309 longest-match rule
evaluation as one Arrow-batched pandas UDF.

Rules are cached as a JSON string column (list of [allow, prefix] pairs,
longest-match applied at evaluation time), so the cache row is flat and
broadcast-friendly: one row per distinct host, tiny versus the frontier.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.sources.fixture_web import (
    WebConfig,
    robots_allowed,
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
                    "fetched_in_batch": batch,
                }
            )

    return hosts.select("host").distinct().mapInPandas(fetch, schemas.ROBOTS_CACHE)


def refresh_robots_cache(
    candidates: DataFrame, robots_cache: DataFrame, cfg: WebConfig, batch: int
) -> DataFrame:
    """Cache union: hosts in this batch not yet cached get fetched."""
    new_hosts = (
        candidates.select("host")
        .distinct()
        .join(F.broadcast(robots_cache.select("host")), "host", "left_anti")
    )
    fetched = fetch_robots_for_hosts(new_hosts, cfg, batch)
    return robots_cache.unionByName(fetched)


@pandas_udf(T.BooleanType())
def _robots_match(rules_json: pd.Series, path: pd.Series) -> pd.Series:
    """RFC 9309 longest-match; missing/empty robots → allowed."""
    out = []
    cache: dict[str, list[tuple[bool, str]]] = {}
    for rj, p in zip(rules_json, path):
        if rj is None or (isinstance(rj, float) and pd.isna(rj)):
            out.append(True)
            continue
        rules = cache.get(rj)
        if rules is None:
            rules = [(bool(a), pre) for a, pre in json.loads(rj)]
            cache[rj] = rules
        out.append(robots_allowed(rules, p))
    return pd.Series(out)


def apply_robots(candidates: DataFrame, robots_cache: DataFrame) -> DataFrame:
    """Attach ``robots_ok`` to candidates via broadcast join + pandas UDF."""
    # RFC 9309 matches on path-and-query; canonical URLs always carry "/"
    path = F.regexp_extract("canon_url", r"^[a-z][a-z0-9+.\-]*://[^/?]*(/.*)?$", 1)
    return (
        candidates.join(
            F.broadcast(robots_cache.select("host", "rules_json")), "host", "left"
        )
        .withColumn(
            "robots_ok",
            _robots_match(F.col("rules_json"), F.coalesce(path, F.lit("/"))),
        )
        .drop("rules_json")
    )
