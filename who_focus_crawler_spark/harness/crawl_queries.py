"""Crawl-domain operators (SURVEY.md §2.1) exercised over the driver's
testdata tables, with DuckDB oracle SQL.

The crawl engine's own corpus is the fixture web (tests/e2e replays the
golden crawl); these queries re-run each operator's *semantics* over a
frontier synthesized deterministically from `orders`/`events`/`lineitem`
so the driver's DuckDB oracle can value-check them at sf0.01. The URL
oracle is analytic: the SQL constructs the expected canonical form from
the generation rule, so it independently pins down C1's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import canonicalize_df, url_host
from who_focus_crawler_spark.harness.util import t

# --------------------------------------------------------------------------
# Synthetic frontier rows from orders: one messy URL per order


def _messy_urls(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
    )
    key = F.col("o_orderkey").cast("string")
    path = F.concat(F.lit("/p/"), key)
    v = F.col("o_orderkey") % 5
    url = (
        F.when(v == 0, F.concat(F.lit("HTTP://"), F.upper(host), path))
        .when(v == 1, F.concat(F.lit("http://"), host, F.lit(":80"), path))
        .when(v == 2, F.concat(F.lit("http://"), host, F.lit("/x/../p/"), key))
        .when(v == 3, F.concat(F.lit("http://"), host, path, F.lit("#s1")))
        .otherwise(
            F.concat(F.lit("http://"), host, path, F.lit("?utm_source=x&b=2&a=1"))
        )
    )
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice", url.alias("url")
    )


def c_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """C1-C3: canonicalize the messy frontier, extract the host."""
    df = canonicalize_df(_messy_urls(spark, sf), "url", "canon_url")
    return df.select(
        "o_orderkey", "canon_url", url_host(F.col("canon_url")).alias("host")
    )


C_CANONICALIZE_SQL = """
SELECT o_orderkey,
       concat('http://h', CAST(o_custkey % 12 AS VARCHAR), '.example.org/p/',
              CAST(o_orderkey AS VARCHAR),
              CASE WHEN o_orderkey % 5 = 4 THEN '?a=1&b=2' ELSE '' END)
         AS canon_url,
       concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host
FROM orders
"""

# --------------------------------------------------------------------------
# C4 — exact URL-seen dedup (anti-join tier) over overlapping key spaces


def c_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    e = t(spark, sf, "events")
    cand = o.select(
        F.concat(
            F.lit("http://h"),
            ((F.col("o_orderkey") % 700) % 12).cast("string"),
            F.lit(".example.org/p/"),
            (F.col("o_orderkey") % 700).cast("string"),
        ).alias("canon_url")
    ).distinct()
    seen = e.select(
        F.concat(
            F.lit("http://h"),
            ((F.col("event_id") % 500) % 12).cast("string"),
            F.lit(".example.org/p/"),
            (F.col("event_id") % 500).cast("string"),
        ).alias("canon_url")
    ).distinct()
    new = cand.join(seen, "canon_url", "left_anti")
    return new.groupBy(url_host(F.col("canon_url")).alias("host")).agg(
        F.count("*").alias("n_new")
    )


C_URL_DEDUP_SQL = """
WITH cand AS (
  SELECT DISTINCT concat('http://h', CAST((o_orderkey % 700) % 12 AS VARCHAR),
                         '.example.org/p/', CAST(o_orderkey % 700 AS VARCHAR))
         AS canon_url FROM orders
), seen AS (
  SELECT DISTINCT concat('http://h', CAST((event_id % 500) % 12 AS VARCHAR),
                         '.example.org/p/', CAST(event_id % 500 AS VARCHAR))
         AS canon_url FROM events
)
SELECT concat('h', CAST((key % 700) % 12 AS VARCHAR), '.example.org') AS host,
       count(*) AS n_new
FROM (
  SELECT CAST(regexp_extract(canon_url, '/p/([0-9]+)$', 1) AS BIGINT) AS key
  FROM cand WHERE canon_url NOT IN (SELECT canon_url FROM seen)
) GROUP BY 1
"""

# --------------------------------------------------------------------------
# C6 — host-bucketed top-k selection


def c_topk_per_host(spark: SparkSession, sf: str) -> DataFrame:
    df = _messy_urls(spark, sf).select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.col("o_orderkey").alias("url_id"),
        F.col("o_totalprice").alias("priority"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), "url_id")
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("host", "url_id", "priority", "rk")
    )


C_TOPK_PER_HOST_SQL = """
SELECT host, url_id, priority, rk FROM (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         o_orderkey AS url_id, o_totalprice AS priority,
         row_number() OVER (
           PARTITION BY concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org')
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) WHERE rk <= 3
"""

# --------------------------------------------------------------------------
# C7 — politeness admission (≤ 2 per host), scheduled/admitted/deferred


def c_politeness(spark: SparkSession, sf: str) -> DataFrame:
    df = _messy_urls(spark, sf).select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.col("o_orderkey").alias("url_id"),
        F.col("o_totalprice").alias("priority"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), "url_id")
    ranked = df.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("host").agg(
        F.count("*").alias("scheduled"),
        F.sum(F.when(F.col("rk") <= 2, 1).otherwise(0)).cast("long").alias("admitted"),
        F.sum(F.when(F.col("rk") > 2, 1).otherwise(0)).cast("long").alias("deferred"),
    )


C_POLITENESS_SQL = """
SELECT host, count(*) AS scheduled,
       CAST(sum(CASE WHEN rk <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS admitted,
       CAST(sum(CASE WHEN rk > 2 THEN 1 ELSE 0 END) AS BIGINT) AS deferred
FROM (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         row_number() OVER (
           PARTITION BY concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org')
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) GROUP BY host
"""

# --------------------------------------------------------------------------
# C9 — deterministic global sequence over the admitted set


def c_seq_assign(spark: SparkSession, sf: str) -> DataFrame:
    df = _messy_urls(spark, sf).select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.col("o_orderkey").alias("url_id"),
        F.col("o_totalprice").alias("priority"),
    )
    wh = Window.partitionBy("host").orderBy(F.desc("priority"), "url_id")
    admitted = df.withColumn("rk", F.row_number().over(wh)).filter(F.col("rk") <= 2)
    # C9: two-phase distributed rank — identical sequence, no one-task window
    from who_focus_crawler_spark.operators.sequencer import global_row_number

    seqd = global_row_number(
        admitted, [F.desc("priority"), F.asc("host"), F.asc("url_id")], "seq", 0
    )
    return seqd.select("seq", "url_id", "host")


C_SEQ_ASSIGN_SQL = """
WITH admitted AS (
  SELECT * FROM (
    SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
           o_orderkey AS url_id, o_totalprice AS priority,
           row_number() OVER (
             PARTITION BY concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org')
             ORDER BY o_totalprice DESC, o_orderkey
           ) AS rk
    FROM orders
  ) WHERE rk <= 2
)
SELECT CAST(row_number() OVER (ORDER BY priority DESC, host, url_id) AS BIGINT)
         AS seq,
       url_id, host
FROM admitted
"""

# --------------------------------------------------------------------------
# C16/R18 — metrics rollup (batch × host → host → grand total)


def c_metrics_rollup(spark: SparkSession, sf: str) -> DataFrame:
    df = _messy_urls(spark, sf).select(
        (F.col("o_orderkey") % 4).cast("int").alias("batch"),
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )
    return df.rollup("batch", "host").agg(F.count("*").alias("n_scheduled"))


C_METRICS_ROLLUP_SQL = """
SELECT CAST(o_orderkey % 4 AS INTEGER) AS batch,
       concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
       count(*) AS n_scheduled
FROM orders GROUP BY ROLLUP (1, 2)
"""

# --------------------------------------------------------------------------
# C17 — hot-host detection + salt sizing


def c_hot_hosts(spark: SparkSession, sf: str) -> DataFrame:
    """C17 detection: hosts above 1.2× the mean frontier share, with the
    salt fan-out each would get. The synthetic frontier is SKEWED (two
    hot hosts holding ~33% and ~19% of the URLs) so detection and salt
    sizing produce value-checked rows — the r1 seeding was uniform and
    passed vacuously with 0 rows (VERDICT r1). The threshold is a
    broadcast scalar subquery, not a driver-side count()."""
    li = t(spark, sf, "lineitem")
    hosts = li.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit("hot-a.example.org"))
        .when(F.col("l_orderkey") % 7 < 2, F.lit("hot-b.example.org"))
        .otherwise(
            F.concat(
                F.lit("h"),
                (F.col("l_partkey") % 40).cast("string"),
                F.lit(".example.org"),
            )
        )
        .alias("host")
    )
    total = hosts.agg(F.count("*").alias("_total"))
    return (
        hosts.groupBy("host")
        .agg(F.count("*").alias("n_urls"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_urls") > 1.2 * F.col("_total") / 42.0)
        .withColumn("n_salts", F.ceil(F.col("n_urls") / 100.0).cast("long"))
        .drop("_total")
    )


C_HOT_HOSTS_SQL = """
WITH h AS (
  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot-a.example.org'
              WHEN l_orderkey % 7 < 2 THEN 'hot-b.example.org'
              ELSE concat('h', CAST(l_partkey % 40 AS VARCHAR), '.example.org')
         END AS host
  FROM lineitem
)
SELECT host, count(*) AS n_urls,
       CAST(ceil(count(*) / 100.0) AS BIGINT) AS n_salts
FROM h GROUP BY host
HAVING count(*) > 1.2 * (SELECT count(*) FROM h) / 42.0
"""

# --------------------------------------------------------------------------
# C11/C12 + R33 — span build + posexplode over documents


def c_spans_flatten(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import tokens

    d = t(spark, sf, "documents")
    toks = F.slice(tokens(F.col("text")), 1, 6)
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos0", "token"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.when((F.col("pos0") + 1) % 3 == 0, F.lit("link"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            "token",
        )
    )


C_SPANS_FLATTEN_SQL = """
SELECT doc_id, CAST(u.pos AS INTEGER) AS pos,
       CASE WHEN u.pos % 3 = 0 THEN 'link' ELSE 'text' END AS kind,
       u.token AS token
FROM (
  SELECT doc_id,
         unnest(list_transform(
           list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 6),
           (x, i) -> struct_pack(pos := i, token := x))) AS u
  FROM documents
)
"""

# --------------------------------------------------------------------------
# s-series: streaming-operator semantics, batch-checked (R36/R37/R39).
# The live Structured Streaming path is in streaming/ and tested in
# tests/streaming; these pin the same semantics against DuckDB.


def s_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# time_bucket's epoch origin for sub-week intervals aligns with Spark's
# window origin (both 1970-01-01-aligned for 6h buckets).
S_WINDOW_AGG_SQL = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def s_session_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


S_SESSION_WINDOW_SQL = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM gaps
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


def s_dedup_first(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming dropDuplicates semantics: first event per (user, type)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


S_DEDUP_FIRST_SQL = """
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events
) WHERE rn = 1
"""

QUERIES = {
    "c_canonicalize": (c_canonicalize, C_CANONICALIZE_SQL),
    "c_url_dedup": (c_url_dedup, C_URL_DEDUP_SQL),
    "c_topk_per_host": (c_topk_per_host, C_TOPK_PER_HOST_SQL),
    "c_politeness": (c_politeness, C_POLITENESS_SQL),
    "c_seq_assign": (c_seq_assign, C_SEQ_ASSIGN_SQL),
    "c_metrics_rollup": (c_metrics_rollup, C_METRICS_ROLLUP_SQL),
    "c_hot_hosts": (c_hot_hosts, C_HOT_HOSTS_SQL),
    "c_spans_flatten": (c_spans_flatten, C_SPANS_FLATTEN_SQL),
    "s_window_agg": (s_window_agg, S_WINDOW_AGG_SQL),
    "s_session_window": (s_session_window, S_SESSION_WINDOW_SQL),
    "s_dedup_first": (s_dedup_first, S_DEDUP_FIRST_SQL),
}


# --------------------------------------------------------------------------
# C13 — focus/relevance scoring (discoveries from documents, scored by
# parent relevance + URL features, integer arithmetic — value-exact)


def c_focus_score(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.scoring import (
        focus_priority,
        relevance_score,
    )

    d = t(spark, sf, "documents")
    # each doc "discovers" one URL: depth = doc_id % 4, target named by
    # the doc's 3rd token (so some URLs contain topic keywords)
    from who_focus_crawler_spark.corpus.text import tokens

    tok3 = F.element_at(tokens(F.col("text")), 3)
    target = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 9).cast("string"),
        F.lit(".example.org/"), F.coalesce(tok3, F.lit("p")),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    depth = (F.col("doc_id") % 4).cast("int")
    return d.select(
        "doc_id",
        relevance_score(F.col("text")).alias("parent_rel"),
        depth.alias("depth"),
        focus_priority(relevance_score(F.col("text")), depth, target).alias(
            "priority_pts"
        ),
    )


C_FOCUS_SCORE_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              x -> x IN ('query','data','stream','table'))) AS BIGINT)
           AS parent_rel,
         CAST(doc_id % 4 AS INTEGER) AS depth,
         concat('http://h', CAST(doc_id % 9 AS VARCHAR), '.example.org/',
                coalesce(regexp_extract_all(lower(text), '[a-z0-9]+')[3], 'p'),
                '/', CAST(doc_id AS VARCHAR)) AS target
  FROM documents
)
SELECT doc_id, parent_rel, depth,
       CAST((parent_rel * 100) // (1 + depth)
            + (CASE WHEN contains(lower(target), 'query') THEN 10 ELSE 0 END)
            + (CASE WHEN contains(lower(target), 'data') THEN 10 ELSE 0 END)
            + (CASE WHEN contains(lower(target), 'stream') THEN 10 ELSE 0 END)
            + (CASE WHEN contains(lower(target), 'table') THEN 10 ELSE 0 END)
            AS BIGINT) AS priority_pts
FROM base
"""

# --------------------------------------------------------------------------
# R36 (sliding variant) — 6-hour windows sliding every 3 hours


def s_window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


# each event belongs to 2 sliding windows: starts at bucket(t,3h) and
# bucket(t,3h) - 3h (both epoch-aligned, matching Spark's origin)
S_WINDOW_SLIDING_SQL = """
WITH exploded AS (
  SELECT time_bucket(INTERVAL '3 hours', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '3 hours', ts) - INTERVAL '3 hours', value
  FROM events
)
SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM exploded GROUP BY window_start
"""

QUERIES["c_focus_score"] = (c_focus_score, C_FOCUS_SCORE_SQL)
QUERIES["s_window_sliding"] = (s_window_sliding, S_WINDOW_SLIDING_SQL)


# --------------------------------------------------------------------------
# C8 — robots.txt gate: RFC 9309 longest-match over a fixed rule set,
# evaluated by the real operator (pandas UDF) on the Spark side and
# reproduced analytically by the oracle (the rules are known constants)


def c_robots_gate(spark: SparkSession, sf: str) -> DataFrame:
    import json as _json

    from who_focus_crawler_spark.operators.robots import apply_robots

    o = t(spark, sf, "orders")
    host = F.concat(F.lit("h"), (F.col("o_custkey") % 4).cast("string"), F.lit(".t"))
    path = F.when(
        F.col("o_orderkey") % 11 == 7,
        F.concat(F.lit("/private/p/"), (F.col("o_orderkey") % 3).cast("string")),
    ).otherwise(F.concat(F.lit("/p/"), F.col("o_orderkey").cast("string")))
    cand = o.select(
        "o_orderkey",
        host.alias("host"),
        F.concat(F.lit("http://"), host, path).alias("canon_url"),
    )
    # fixed rule set: h0 disallows /private/ but allows /private/p/0 back
    # (longest-match exercise); h1 disallows everything; h2 has no file
    rules = spark.createDataFrame(
        [
            ("h0.t", _json.dumps([[False, "/private/"], [True, "/private/p/0"]]), 1),
            ("h1.t", _json.dumps([[False, "/"]]), 1),
            ("h3.t", _json.dumps([[True, "/"]]), 1),
        ],
        ["host", "rules_json", "fetched_in_batch"],
    )
    return apply_robots(cand, rules).select("o_orderkey", "host", "robots_ok")


C_ROBOTS_GATE_SQL = """
SELECT o_orderkey,
       concat('h', CAST(o_custkey % 4 AS VARCHAR), '.t') AS host,
       CASE
         WHEN o_custkey % 4 = 1 THEN FALSE            -- h1: disallow /
         WHEN o_custkey % 4 = 0 AND o_orderkey % 11 = 7
              AND o_orderkey % 3 <> 0 THEN FALSE      -- h0: /private/ blocked
         ELSE TRUE                                    -- h0 /private/p/0 wins
       END AS robots_ok                               -- h2: no robots file
FROM orders
"""

# --------------------------------------------------------------------------
# C5 — frontier merge: (frontier ∖ consumed) ∪ discoveries, per-host counts


def c_frontier_merge(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    e = t(spark, sf, "events")
    frontier = o.select(
        F.concat(F.lit("http://h"), (F.col("o_orderkey") % 10).cast("string"),
                 F.lit(".t/p/"), F.col("o_orderkey").cast("string")).alias("canon_url"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 10).cast("string"), F.lit(".t")).alias("host"),
    )
    consumed = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.concat(F.lit("http://h"), (F.col("o_orderkey") % 10).cast("string"),
                 F.lit(".t/p/"), F.col("o_orderkey").cast("string")).alias("canon_url")
    )
    new_rows = e.select(
        F.concat(F.lit("http://h"), (F.col("event_id") % 10).cast("string"),
                 F.lit(".t/n/"), F.col("event_id").cast("string")).alias("canon_url"),
        F.concat(F.lit("h"), (F.col("event_id") % 10).cast("string"), F.lit(".t")).alias("host"),
    )
    merged = frontier.join(
        F.broadcast(consumed), "canon_url", "left_anti"
    ).unionByName(new_rows)
    return merged.groupBy("host").agg(F.count("*").alias("n_frontier"))


C_FRONTIER_MERGE_SQL = """
WITH frontier AS (
  SELECT concat('http://h', CAST(o_orderkey % 10 AS VARCHAR), '.t/p/',
                CAST(o_orderkey AS VARCHAR)) AS canon_url,
         concat('h', CAST(o_orderkey % 10 AS VARCHAR), '.t') AS host
  FROM orders
), kept AS (
  SELECT * FROM frontier
  WHERE canon_url NOT IN (
    SELECT concat('http://h', CAST(o_orderkey % 10 AS VARCHAR), '.t/p/',
                  CAST(o_orderkey AS VARCHAR))
    FROM orders WHERE o_orderkey % 7 = 0
  )
), merged AS (
  SELECT host FROM kept
  UNION ALL
  SELECT concat('h', CAST(event_id % 10 AS VARCHAR), '.t') AS host FROM events
)
SELECT host, count(*) AS n_frontier FROM merged GROUP BY host
"""

QUERIES["c_robots_gate"] = (c_robots_gate, C_ROBOTS_GATE_SQL)
QUERIES["c_frontier_merge"] = (c_frontier_merge, C_FRONTIER_MERGE_SQL)


# --------------------------------------------------------------------------
# C12 — relative→absolute href resolution (RFC 3986 §5) + canonicalization,
# value-checked: the oracle reconstructs the expected canonical target
# analytically from the generation rule for every reference shape


def c_resolve_refs(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.urls import resolve_ref

    o = t(spark, sf, "orders")
    key = F.col("o_orderkey").cast("string")
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
    )
    base = F.concat(F.lit("http://"), host, F.lit("/a/b/p"), key)
    v = F.col("o_orderkey") % 6
    href = (
        F.when(v == 0, F.concat(F.lit("http://"), host, F.lit("/p/"), key))
        .when(v == 1, F.concat(F.lit("/x/"), key))
        .when(v == 2, F.concat(F.lit("../q/"), key))
        .when(v == 3, F.concat(F.lit("./s"), key))
        .when(v == 4, F.concat(F.lit("//h0.example.org/z/"), key))
        .otherwise(F.lit("?b=2&a=1&utm_campaign=x"))
    )
    resolved = o.select(
        "o_orderkey", resolve_ref(base, href).alias("abs_url")
    )
    return canonicalize_df(resolved, "abs_url", "target_url").select(
        "o_orderkey", "target_url"
    )


C_RESOLVE_REFS_SQL = """
SELECT o_orderkey,
       CASE o_orderkey % 6
         WHEN 0 THEN concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                            '.example.org/p/', CAST(o_orderkey AS VARCHAR))
         WHEN 1 THEN concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                            '.example.org/x/', CAST(o_orderkey AS VARCHAR))
         WHEN 2 THEN concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                            '.example.org/a/q/', CAST(o_orderkey AS VARCHAR))
         WHEN 3 THEN concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                            '.example.org/a/b/s', CAST(o_orderkey AS VARCHAR))
         WHEN 4 THEN concat('http://h0.example.org/z/',
                            CAST(o_orderkey AS VARCHAR))
         ELSE concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                     '.example.org/a/b/p', CAST(o_orderkey AS VARCHAR),
                     '?a=1&b=2')
       END AS target_url
FROM orders
"""

QUERIES["c_resolve_refs"] = (c_resolve_refs, C_RESOLVE_REFS_SQL)


# --------------------------------------------------------------------------
# Host-authority PageRank (integer micro-units — bit-exact across engines)
# over a host graph synthesized from orders; fixed rounds so the oracle is
# a finite CTE chain reproducing the identical integer recurrence.

_HR_ITERS, _HR_SCALE = 5, 10**9


def c_host_rank(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.hostrank import host_rank

    o = t(spark, sf, "orders")
    edges = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 12).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 7).cast("string")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return host_rank(edges, n_iters=_HR_ITERS, scale=_HR_SCALE)


def _host_rank_sql() -> str:
    step_tmpl = """, r{i} AS (
  SELECT v.host,
         (15 * ({scale} // nn.n)) // 100
         + (85 * coalesce(s.in_sum, 0)) // 100 AS rank_units
  FROM nodes v CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS host, sum(r.rank_units // d.out_deg) AS in_sum
    FROM edges e
    JOIN r{prev} r ON e.src = r.host
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON v.host = s.host
)"""
    sql = f"""
WITH edges AS (
  SELECT DISTINCT concat('h', CAST(o_custkey % 12 AS VARCHAR)) AS src,
         concat('h', CAST(o_orderkey % 7 AS VARCHAR)) AS dst
  FROM orders
  WHERE concat('h', CAST(o_custkey % 12 AS VARCHAR))
        <> concat('h', CAST(o_orderkey % 7 AS VARCHAR))
), nodes AS (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), deg AS (
  SELECT src, count(*) AS out_deg FROM edges GROUP BY src
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT host, CAST({_HR_SCALE} // nn.n AS BIGINT) AS rank_units
  FROM nodes CROSS JOIN nn
)"""
    for i in range(1, _HR_ITERS + 1):
        sql += step_tmpl.format(i=i, prev=i - 1, scale=_HR_SCALE)
    sql += f"""
SELECT host, CAST(rank_units AS BIGINT) AS rank_units FROM r{_HR_ITERS}
"""
    return sql


QUERIES["c_host_rank"] = (c_host_rank, _host_rank_sql())


# --------------------------------------------------------------------------
# R19 (deterministic variant) — threshold/KMV-family distinct sketch over
# per-host URLs: value-exact (unlike HLL, which is rows-only by nature)

_SK_BITS = 54  # sample rate 2^-(60-54) = 1/64


def r_sketch_distinct(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.sketch import distinct_estimate

    o = t(spark, sf, "orders")
    urls = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 8).cast("string")).alias("host"),
        F.concat(
            F.lit("http://h"), (F.col("o_custkey") % 8).cast("string"),
            F.lit(".t/p/"), F.col("o_orderkey").cast("string"),
        ).alias("canon_url"),
    )
    return distinct_estimate(
        urls, "canon_url", ["host"], threshold_bits=_SK_BITS
    )


R_SKETCH_DISTINCT_SQL = f"""
WITH u AS (
  SELECT concat('h', CAST(o_custkey % 8 AS VARCHAR)) AS host,
         concat('http://h', CAST(o_custkey % 8 AS VARCHAR), '.t/p/',
                CAST(o_orderkey AS VARCHAR)) AS canon_url
  FROM orders
)
SELECT host, count(DISTINCT canon_url) AS n_sampled,
       CAST(count(DISTINCT canon_url) * {1 << (60 - _SK_BITS)} AS BIGINT)
         AS est_distinct
FROM u
WHERE CAST(concat('0x', substring(md5(canon_url), 1, 15)) AS BIGINT)
      < {1 << _SK_BITS}
GROUP BY host
"""

QUERIES["r_sketch_distinct"] = (r_sketch_distinct, R_SKETCH_DISTINCT_SQL)

# --------------------------------------------------------------------------
# Crawl-trap scoring (functions/traps.py) — six structural URL shapes
# synthesized per order; the real operator computes features/score from
# the URL string, the oracle derives them analytically from the
# generation rule (independent derivation, same convention as
# C_CANONICALIZE_SQL).


def c_trap_score(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.traps import flag_traps

    o = t(spark, sf, "orders")
    k = F.col("o_orderkey").cast("string")
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 9).cast("string"), F.lit(".example.org")
    )
    v = F.col("o_orderkey") % 6
    url = F.concat(
        F.lit("http://"),
        host,
        # bare numeric keys are 'k'-prefixed so a large-sf o_orderkey
        # (8+ digits) can never trip the longnum feature and desync the
        # analytic oracle scores below; v==3 is the intended digit run
        F.when(v == 0, F.concat(F.lit("/p/k"), k))
        .when(v == 1, F.lit("/a/b/a/b/a/b"))
        .when(v == 2, F.concat(F.lit("/2023/07/x"), k))
        .when(v == 3, F.concat(F.lit("/id/123456789"), k))
        .when(v == 4, F.concat(F.lit("/p/k"), k, F.lit("?a=1&b=2&c=3&d=4&e=5")))
        .otherwise(F.concat(F.lit("/a/b/c/d/e/f/g/h/k"), k)),
    )
    frontier = o.select(F.col("o_orderkey"), url.alias("canon_url"))
    return flag_traps(frontier).select(
        "o_orderkey", "trap_score", "is_trap"
    )


C_TRAP_SCORE_SQL = """
SELECT o_orderkey,
       CAST(CASE o_orderkey % 6
         WHEN 0 THEN 0        -- /p/<k>: shallow, clean
         WHEN 1 THEN 12       -- /a/b/a/b/a/b: 4 repeated segments * 3
         WHEN 2 THEN 1        -- /2023/07/x<k>: calendar pattern
         WHEN 3 THEN 2        -- /id/123456789<k>: >= 8-digit run
         WHEN 4 THEN 4        -- 5 query params: 2 * (5 - 3)
         ELSE 3               -- depth 9: (9 - 6)
       END AS INT) AS trap_score,
       o_orderkey % 6 IN (1, 4) AS is_trap
FROM orders
"""

QUERIES["c_trap_score"] = (c_trap_score, C_TRAP_SCORE_SQL)


# --------------------------------------------------------------------------
# Registrable-domain rollup (functions/domains.py) — per-site page and
# host counts over hosts spanning simple and two-level public suffixes.


def c_domain_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.domains import registrable_domain

    o = t(spark, sf, "orders")
    suffix = F.element_at(
        F.array(
            F.lit("com"), F.lit("co.uk"), F.lit("org"),
            F.lit("com.au"), F.lit("co.jp"),
        ),
        (F.col("o_custkey") % 5 + 1).cast("int"),
    )
    host = F.concat(
        F.lit("w"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit(".site"), (F.col("o_custkey") % 13).cast("string"),
        F.lit("."), suffix,
    )
    pages = o.select(host.alias("host"))
    return (
        pages.withColumn("domain", registrable_domain(F.col("host")))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


C_DOMAIN_ROLLUP_SQL = """
WITH h AS (
  SELECT concat('site', CAST(o_custkey % 13 AS VARCHAR), '.',
                CASE o_custkey % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
                     WHEN 2 THEN 'org' WHEN 3 THEN 'com.au'
                     ELSE 'co.jp' END) AS domain,
         concat('w', CAST(o_orderkey % 7 AS VARCHAR), '.',
                'site', CAST(o_custkey % 13 AS VARCHAR), '.',
                CASE o_custkey % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
                     WHEN 2 THEN 'org' WHEN 3 THEN 'com.au'
                     ELSE 'co.jp' END) AS host
  FROM orders
)
SELECT domain, count(*) AS n_pages, count(DISTINCT host) AS n_hosts
FROM h GROUP BY domain
"""

QUERIES["c_domain_rollup"] = (c_domain_rollup, C_DOMAIN_ROLLUP_SQL)


# --------------------------------------------------------------------------
# Domain-level budget stacked on host politeness
# (operators/domain_budget.py): many hosts of one registrable domain
# share a second admission budget. Oracle reproduces both ranking
# tiers with window functions.


def c_domain_budget(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.domain_budget import (
        apply_domain_budget,
    )
    from who_focus_crawler_spark.operators.politeness import apply_politeness

    o = t(spark, sf, "orders")
    # 3 domains × up to 8 hosts each, some under a two-level suffix
    host = F.concat(
        F.lit("h"), (F.col("o_orderkey") % 8).cast("string"),
        F.lit(".site"), (F.col("o_custkey") % 3).cast("string"),
        F.element_at(
            F.array(F.lit(".example.com"), F.lit(".example.co.uk"),
                    F.lit(".example.org")),
            (F.col("o_custkey") % 3 + 1).cast("int"),
        ),
    )
    cand = o.select(
        host.alias("host"),
        F.col("o_totalprice").alias("priority"),
        (F.col("o_orderkey") % 4).cast("int").alias("depth"),
        F.concat(
            F.lit("http://"), host, F.lit("/p/"),
            F.col("o_orderkey").cast("string"),
        ).alias("canon_url"),
        F.lit(True).alias("robots_ok"),
    )
    out = apply_domain_budget(apply_politeness(cand, 4), 10)
    return out.filter(F.col("admitted")).select("canon_url", "host", "domain")


C_DOMAIN_BUDGET_SQL = """
WITH cand AS (
  SELECT concat('h', CAST(o_orderkey % 8 AS VARCHAR),
                '.site', CAST(o_custkey % 3 AS VARCHAR),
                CASE o_custkey % 3 WHEN 0 THEN '.example.com'
                     WHEN 1 THEN '.example.co.uk'
                     ELSE '.example.org' END) AS host,
         CASE o_custkey % 3 WHEN 0 THEN 'example.com'
              WHEN 1 THEN 'example.co.uk'
              ELSE 'example.org' END AS domain,
         o_totalprice AS priority,
         CAST(o_orderkey % 4 AS INT) AS depth,
         concat('http://h', CAST(o_orderkey % 8 AS VARCHAR),
                '.site', CAST(o_custkey % 3 AS VARCHAR),
                CASE o_custkey % 3 WHEN 0 THEN '.example.com'
                     WHEN 1 THEN '.example.co.uk'
                     ELSE '.example.org' END,
                '/p/', CAST(o_orderkey AS VARCHAR)) AS canon_url
  FROM orders
),
pol AS (
  SELECT *, row_number() OVER (PARTITION BY host
             ORDER BY priority DESC, depth, canon_url) AS rn_pol
  FROM cand
),
dom AS (
  SELECT *, row_number() OVER (PARTITION BY domain
             ORDER BY priority DESC, depth, canon_url) AS rn_dom
  FROM pol WHERE rn_pol <= 4
)
SELECT canon_url, host, domain FROM dom WHERE rn_dom <= 10
"""

QUERIES["c_domain_budget"] = (c_domain_budget, C_DOMAIN_BUDGET_SQL)


# --------------------------------------------------------------------------
# Sitemap parse (operators/sitemap.py): per-host XML is assembled from
# orders rows in Spark, pushed through the REAL native parser, and the
# oracle derives the expected (host, loc, priority) rows directly from
# the generation rule — including the protocol's 0.5 default for
# entries emitted without a <priority> tag.


def c_sitemap_parse(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.sitemap import parse_sitemaps

    o = t(spark, sf, "orders")
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 8).cast("string"),
        F.lit(".example.org"),
    )
    loc = F.concat(
        F.lit("http://"), host, F.lit("/s/"), F.col("o_orderkey").cast("string")
    )
    prio_tag = F.when(
        F.col("o_orderkey") % 4 != 0,
        F.concat(
            F.lit("<priority>"),
            F.format_string(
                "%.1f", ((F.col("o_orderkey") % 9) + 1).cast("double") / 10.0
            ),
            F.lit("</priority>"),
        ),
    ).otherwise(F.lit(""))
    entry = F.concat(
        F.lit("<url><loc>"), loc, F.lit("</loc>"), prio_tag, F.lit("</url>")
    )
    sitemaps = (
        o.select(host.alias("host"), entry.alias("e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.array_join(F.array_sort(F.collect_list("e")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
    return parse_sitemaps(sitemaps)


C_SITEMAP_PARSE_SQL = """
SELECT concat('h', CAST(o_custkey % 8 AS VARCHAR), '.example.org') AS host,
       concat('http://h', CAST(o_custkey % 8 AS VARCHAR), '.example.org/s/',
              CAST(o_orderkey AS VARCHAR)) AS loc,
       CASE WHEN o_orderkey % 4 = 0 THEN 0.5
            ELSE CAST((o_orderkey % 9) + 1 AS DOUBLE) / 10 END AS priority
FROM orders
"""

QUERIES["c_sitemap_parse"] = (c_sitemap_parse, C_SITEMAP_PARSE_SQL)


# --------------------------------------------------------------------------
# Python UDTF lateral expansion (functions/udtfs.py): per-parameter
# rollup of synthesized query strings through the registered table
# function — the R-layer LATERAL surface. The oracle derives the rows
# analytically from the generation rule.


def c_url_params_udtf(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    o = t(spark, sf, "orders")
    url = F.concat(
        F.lit("http://h"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".example.org/p/"), F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("?a=1&b=2&c=3"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("?a=9"))
        .otherwise(F.lit("")),
    )
    o.select(url.alias("u")).createOrReplaceTempView("_udtf_urls")
    expanded = spark.sql(
        "SELECT u, p.pos, p.pkey, p.pval "
        "FROM _udtf_urls, LATERAL parse_params(u) p"
    )
    return expanded.groupBy("pkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("pval").alias("n_vals"),
        F.sum("pos").cast("long").alias("sum_pos"),
    )


C_URL_PARAMS_UDTF_SQL = """
WITH e AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 3
              WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n
  FROM orders
)
SELECT pkey,
       count(*) AS n_rows,
       count(DISTINCT pval) AS n_vals,
       CAST(sum(pos) AS BIGINT) AS sum_pos
FROM (
  SELECT 'a' AS pkey, CASE WHEN n = 3 THEN '1' ELSE '9' END AS pval,
         0 AS pos FROM e WHERE n >= 1
  UNION ALL
  SELECT 'b', '2', 1 FROM e WHERE n = 3
  UNION ALL
  SELECT 'c', '3', 2 FROM e WHERE n = 3
) GROUP BY pkey
"""

QUERIES["c_url_params_udtf"] = (c_url_params_udtf, C_URL_PARAMS_UDTF_SQL)


# --------------------------------------------------------------------------
# Freshness / recrawl scheduling — operators/recrawl.py


def c_recrawl_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Change-rate estimation over a fetch history synthesized from
    lineitem: each order is one URL, its line numbers are fetch epochs,
    and the content hash buckets quantity so some revisits change and
    some don't. Single-line orders exercise the no-evidence prior."""
    from who_focus_crawler_spark.operators.recrawl import recrawl_priority

    li = t(spark, sf, "lineitem")
    hist = li.select(
        F.concat(
            F.lit("http://h"),
            (F.col("l_orderkey") % 40).cast("string"),
            F.lit(".example.org/p/k"),
            F.col("l_orderkey").cast("string"),
        ).alias("canon_url"),
        F.concat(
            F.lit("h"), (F.col("l_orderkey") % 40).cast("string"),
            F.lit(".example.org"),
        ).alias("host"),
        F.col("l_linenumber").cast("long").alias("batch"),
        F.expr("CAST(CAST(l_quantity AS INT) div 13 AS STRING)").alias(
            "content_hash"
        ),
    )
    return recrawl_priority(hist, current_batch=10, prior_permille=500)


C_RECRAWL_PRIORITY_SQL = """
WITH hist AS (
  SELECT concat('http://h', CAST(l_orderkey % 40 AS VARCHAR),
                '.example.org/p/k', CAST(l_orderkey AS VARCHAR)) AS canon_url,
         concat('h', CAST(l_orderkey % 40 AS VARCHAR), '.example.org') AS host,
         CAST(l_linenumber AS BIGINT) AS batch,
         CAST(CAST(l_quantity AS INT) // 13 AS VARCHAR) AS content_hash
  FROM lineitem
),
marked AS (
  SELECT canon_url, host, batch, content_hash,
         row_number() OVER w AS fetch_no,
         lag(content_hash) OVER w AS prev_hash
  FROM hist
  WINDOW w AS (PARTITION BY canon_url ORDER BY batch, content_hash)
),
per_url AS (
  SELECT canon_url, min(host) AS host,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN fetch_no > 1
                        AND content_hash IS DISTINCT FROM prev_hash
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         max(batch) AS last_batch
  FROM marked GROUP BY canon_url
)
SELECT canon_url, host, n_fetches, n_changes,
       CASE WHEN n_fetches >= 2 THEN (1000 * n_changes) // (n_fetches - 1)
            ELSE CAST(500 AS BIGINT) END AS change_permille,
       10 - last_batch AS staleness,
       (10 - last_batch) *
         (CASE WHEN n_fetches >= 2 THEN (1000 * n_changes) // (n_fetches - 1)
               ELSE CAST(500 AS BIGINT) END + 1) AS recrawl_score
FROM per_url
"""

QUERIES["c_recrawl_priority"] = (c_recrawl_priority, C_RECRAWL_PRIORITY_SQL)


# --------------------------------------------------------------------------
# Anchor-text aggregation — operators/anchors.py


def c_anchor_text(spark: SparkSession, sf: str) -> DataFrame:
    """Per-target link evidence from a link table synthesized from
    lineitem: suppliers are referring hosts, parts are targets, and the
    anchor text cycles through cased/punctuated/empty variants so the
    tokenizer and NULL handling are value-checked."""
    from who_focus_crawler_spark.operators.anchors import anchor_signal

    li = t(spark, sf, "lineitem")
    v = F.col("l_quantity").cast("int") % 4
    links = li.select(
        F.concat(
            F.lit("h"), (F.col("l_suppkey") % 30).cast("string"),
            F.lit(".example.org"),
        ).alias("src_host"),
        F.concat(
            F.lit("http://t"),
            (F.col("l_partkey") % 200).cast("string"),
            F.lit(".example.org/p/k"),
            (F.col("l_partkey") % 997).cast("string"),
        ).alias("target_url"),
        F.when(v == 0, F.lit("Fast Spark Engine"))
        .when(v == 1, F.lit("spark, crawl!"))
        .when(v == 2, F.lit("a data-engine"))
        .otherwise(F.lit(None).cast("string"))
        .alias("anchor_text"),
    )
    return anchor_signal(links, top_k_terms=3, min_term_len=2)


C_ANCHOR_TEXT_SQL = """
WITH links AS (
  SELECT concat('h', CAST(l_suppkey % 30 AS VARCHAR), '.example.org')
           AS src_host,
         concat('http://t', CAST(l_partkey % 200 AS VARCHAR),
                '.example.org/p/k', CAST(l_partkey % 997 AS VARCHAR))
           AS target_url,
         CASE CAST(l_quantity AS INT) % 4
           WHEN 0 THEN 'Fast Spark Engine'
           WHEN 1 THEN 'spark, crawl!'
           WHEN 2 THEN 'a data-engine'
           ELSE NULL END AS anchor_text
  FROM lineitem
),
counts AS (
  SELECT target_url, CAST(count(*) AS BIGINT) AS n_inlinks,
         CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
  FROM links GROUP BY target_url
),
terms AS (
  SELECT target_url, term, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT target_url,
           unnest(string_split_regex(lower(coalesce(anchor_text, '')),
                                     '[^a-z0-9]+')) AS term
    FROM links
  ) WHERE len(term) >= 2
  GROUP BY target_url, term
),
ranked AS (
  SELECT target_url, term,
         row_number() OVER (PARTITION BY target_url
                            ORDER BY cnt DESC, term) AS rk
  FROM terms
),
top AS (
  SELECT target_url, string_agg(term, '|' ORDER BY rk) AS top_terms
  FROM ranked WHERE rk <= 3 GROUP BY target_url
)
SELECT c.target_url, c.n_inlinks, c.n_src_hosts,
       coalesce(t.top_terms, '') AS top_terms
FROM counts c LEFT JOIN top t ON c.target_url = t.target_url
"""

QUERIES["c_anchor_text"] = (c_anchor_text, C_ANCHOR_TEXT_SQL)


# --------------------------------------------------------------------------
# C7+ — robots.txt Crawl-delay budget (batch models batch_window_s seconds;
# a host declaring Crawl-delay d admits at most max(1, window // d) fetches,
# still capped by politeness_k). Runs the REAL apply_politeness operator
# with its crawl_delay column against an analytic SQL twin.

_CD_WINDOW_S = 6
_CD_K = 2


def c_crawl_delay(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.politeness import apply_politeness

    cand = t(spark, sf, "orders").select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.concat(
            F.lit("http://h"),
            (F.col("o_custkey") % 12).cast("string"),
            F.lit(".example.org/p/k"),
            F.col("o_orderkey").cast("string"),
        ).alias("canon_url"),
        F.col("o_totalprice").alias("priority"),
        F.lit(1).alias("depth"),
        F.lit(True).alias("robots_ok"),
        # hosts 1/5/9 declare Crawl-delay = their index (1, 5, 9 s):
        #   1 -> 6//1=6 capped at k=2;  5 -> 6//5=1;  9 -> 6//9=0 -> floor 1
        F.when(
            (F.col("o_custkey") % 12).isin(1, 5, 9),
            (F.col("o_custkey") % 12).cast("int"),
        ).alias("crawl_delay"),
    )
    out = apply_politeness(cand, _CD_K, batch_window_s=_CD_WINDOW_S)
    return out.groupBy("host").agg(
        F.count("*").alias("scheduled"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0))
        .cast("long")
        .alias("admitted"),
        F.sum(F.when(~F.col("admitted"), 1).otherwise(0))
        .cast("long")
        .alias("deferred"),
    )


C_CRAWL_DELAY_SQL = f"""
WITH cand AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         concat('http://h', CAST(o_custkey % 12 AS VARCHAR),
                '.example.org/p/k', CAST(o_orderkey AS VARCHAR)) AS canon_url,
         o_totalprice AS priority,
         CASE WHEN o_custkey % 12 IN (1, 5, 9)
              THEN CAST(o_custkey % 12 AS INTEGER) END AS crawl_delay
  FROM orders
),
ranked AS (
  SELECT host, crawl_delay,
         row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, canon_url
         ) AS rk,
         CASE WHEN crawl_delay IS NOT NULL
              THEN least({_CD_K}, greatest({_CD_WINDOW_S} // crawl_delay, 1))
              ELSE {_CD_K} END AS budget
  FROM cand
)
SELECT host, count(*) AS scheduled,
       CAST(sum(CASE WHEN rk <= budget THEN 1 ELSE 0 END) AS BIGINT) AS admitted,
       CAST(sum(CASE WHEN rk > budget THEN 1 ELSE 0 END) AS BIGINT) AS deferred
FROM ranked GROUP BY host
"""

QUERIES["c_crawl_delay"] = (c_crawl_delay, C_CRAWL_DELAY_SQL)


# --------------------------------------------------------------------------
# Redirect-chain resolution — operators/redirects.py (pointer doubling).
# Edges synthesized from orders: each customer's orders form one chain
# (each order 301s to the next); customers ≡ 0 (mod 10) close the chain
# into a loop (the last order redirects back to the first), so both the
# resolved and the loop-unresolved paths carry checked values. The
# oracle replays the identical doubling rounds as a CTE chain.

_RC_MAX_HOPS = 32
_RC_ROUNDS = 7  # 2^7 = 128 ≥ any sf chain; loops self-cap by round 6


def _redirect_url(cust, key):
    return F.concat(
        F.lit("http://r"),
        (cust % 100).cast("string"),
        F.lit(".example.org/u/"),
        key.cast("string"),
    )


def c_redirect_chains(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.redirects import (
        resolve_redirect_chains,
    )

    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    e = o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("nxt"),
        F.min("o_orderkey").over(Window.partitionBy("o_custkey")).alias("first_k"),
    )
    cust = F.col("o_custkey")
    edges = e.select(
        _redirect_url(cust, F.col("o_orderkey")).alias("src_url"),
        F.when(F.col("nxt").isNotNull(), _redirect_url(cust, F.col("nxt")))
        .when(cust % 10 == 0, _redirect_url(cust, F.col("first_k")))
        .alias("dst_url"),
    ).filter(F.col("dst_url").isNotNull())
    return resolve_redirect_chains(
        edges, max_hops=_RC_MAX_HOPS, n_rounds=_RC_ROUNDS
    )


def _redirect_chains_sql() -> str:
    url = (
        "concat('http://r', CAST(o_custkey % 100 AS VARCHAR), "
        "'.example.org/u/', CAST({k} AS VARCHAR))"
    )
    rounds = []
    prev = "r0"
    for i in range(1, _RC_ROUNDS + 1):
        # MATERIALIZED pins each round: the self-join references the
        # previous round twice, and DuckDB's default CTE inlining would
        # double the plan per round (2^k copies by round k) — the exact
        # blowup the Spark side's per-round localCheckpoint prevents.
        # The join is a PURE equi-join (p.ptr = q.node; node is unique,
        # so no row multiplication) with the active-state guard moved
        # into the CASEs — a state conjunct inside the LEFT JOIN ON
        # forces DuckDB into a nested-loop join (measured 205 s at
        # sf0.1 vs ~1 s equi).
        rounds.append(
            f"""r{i} AS MATERIALIZED (
  SELECT p.node,
         CASE WHEN p.state = 'active' THEN q.ptr ELSE p.ptr END AS ptr,
         CASE WHEN p.state = 'active' THEN p.hops + q.hops
              ELSE p.hops END AS hops,
         CASE WHEN p.state <> 'active' THEN p.state
              WHEN q.state = 'resolved' THEN 'resolved'
              WHEN q.state = 'unresolved' THEN 'unresolved'
              WHEN p.hops + q.hops > {_RC_MAX_HOPS} THEN 'unresolved'
              ELSE 'active' END AS state
  FROM {prev} p LEFT JOIN {prev} q ON p.ptr = q.node
)"""
        )
        prev = f"r{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH e0 AS (
  SELECT o_custkey, o_orderkey,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS nxt,
         min(o_orderkey) OVER (PARTITION BY o_custkey) AS first_k
  FROM orders
),
edges AS (
  SELECT DISTINCT
         {url.format(k="o_orderkey")} AS src_url,
         CASE WHEN nxt IS NOT NULL THEN {url.format(k="nxt")}
              WHEN o_custkey % 10 = 0 THEN {url.format(k="first_k")}
         END AS dst_url
  FROM e0
  WHERE nxt IS NOT NULL OR o_custkey % 10 = 0
),
srcs AS (SELECT DISTINCT src_url FROM edges),
r0 AS (
  SELECT e.src_url AS node, e.dst_url AS ptr, CAST(1 AS BIGINT) AS hops,
         CASE WHEN s.src_url IS NULL THEN 'resolved'
              ELSE 'active' END AS state
  FROM edges e LEFT JOIN srcs s ON e.dst_url = s.src_url
),
{rounds_sql}
SELECT node AS src_url,
       CASE WHEN state = 'resolved' AND hops <= {_RC_MAX_HOPS}
            THEN ptr END AS terminal_url,
       CASE WHEN state = 'resolved' AND hops <= {_RC_MAX_HOPS}
            THEN hops END AS hops,
       state = 'resolved' AND hops <= {_RC_MAX_HOPS} AS resolved
FROM {prev}
"""


QUERIES["c_redirect_chains"] = (c_redirect_chains, _redirect_chains_sql())


# --------------------------------------------------------------------------
# Mirror-host detection — operators/mirrors.py. Fetch log synthesized
# from lineitem: hosts pair up into planted mirror groups (hosts 2g and
# 2g+1 draw page hashes from the same per-group pool) with ~20% of rows
# host-unique content, so containment lands mid-scale and both the
# shared count and the integer containment are value-checked. Cross-
# group pairs share nothing and must not appear.


def c_mirror_hosts(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.mirrors import mirror_pairs

    li = t(spark, sf, "lineitem")
    hi = F.col("l_suppkey") % 40
    pk = (F.col("l_partkey") % 300).cast("string")
    pages = li.select(
        F.concat(F.lit("m"), hi.cast("string"), F.lit(".example.test")).alias(
            "host"
        ),
        F.when(
            F.col("l_orderkey") % 5 == 0,
            F.concat(F.lit("u"), hi.cast("string"), F.lit("/"), pk),
        )
        .otherwise(
            F.concat(
                F.lit("c"), F.floor(hi / 2).cast("string"), F.lit("/"), pk
            )
        )
        .alias("content_hash"),
    )
    return mirror_pairs(
        pages,
        min_shared=50,
        min_containment_permille=300,
        max_hosts_per_hash=64,
    )


C_MIRROR_HOSTS_SQL = """
WITH pg AS (
  SELECT DISTINCT
         concat('m', CAST(l_suppkey % 40 AS VARCHAR), '.example.test')
           AS host,
         CASE WHEN l_orderkey % 5 = 0
              THEN concat('u', CAST(l_suppkey % 40 AS VARCHAR), '/',
                          CAST(l_partkey % 300 AS VARCHAR))
              ELSE concat('c', CAST((l_suppkey % 40) // 2 AS VARCHAR), '/',
                          CAST(l_partkey % 300 AS VARCHAR))
         END AS content_hash
  FROM lineitem
),
sizes AS (SELECT host, count(*) AS pages FROM pg GROUP BY host),
rare AS (
  SELECT content_hash FROM pg GROUP BY content_hash HAVING count(*) <= 64
),
j AS (SELECT pg.host, pg.content_hash FROM pg JOIN rare USING (content_hash)),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM j a JOIN j b ON a.content_hash = b.content_hash AND a.host < b.host
  GROUP BY a.host, b.host
  HAVING count(*) >= 50
)
SELECT p.host_a, p.host_b, p.shared,
       CAST(sa.pages AS BIGINT) AS pages_a,
       CAST(sb.pages AS BIGINT) AS pages_b,
       (1000 * p.shared) // least(sa.pages, sb.pages) AS containment_permille
FROM pairs p
JOIN sizes sa ON p.host_a = sa.host
JOIN sizes sb ON p.host_b = sb.host
WHERE (1000 * p.shared) // least(sa.pages, sb.pages) >= 300
"""

QUERIES["c_mirror_hosts"] = (c_mirror_hosts, C_MIRROR_HOSTS_SQL)


# --------------------------------------------------------------------------
# Z-order (Morton) clustering key — operators/zorder.py. The key both
# quantizes (guarded integer division) and bit-interleaves; the oracle
# rebuilds the identical arithmetic with DuckDB's native bit operators
# and exact integer division, so any divergence in either step flips
# the value hash. Ranges are intentionally wider than some sf domains
# so the clamp path is exercised too.

_Z_BITS = 10
_Z_OK_RANGE = (0, 60000)
_Z_PK_RANGE = (0, 8000)


def c_zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.zorder import quantize, zorder_key

    li = t(spark, sf, "lineitem")
    qo = quantize(F.col("l_orderkey"), *_Z_OK_RANGE, _Z_BITS)
    qp = quantize(F.col("l_partkey"), *_Z_PK_RANGE, _Z_BITS)
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        zorder_key([qo, qp], _Z_BITS).alias("z_key"),
    )


def _zorder_sql() -> str:
    top = (1 << _Z_BITS) - 1
    qo = (
        f"(least(greatest(l_orderkey, {_Z_OK_RANGE[0]}), {_Z_OK_RANGE[1]})"
        f" * {top}) // {_Z_OK_RANGE[1] - _Z_OK_RANGE[0]}"
    )
    qp = (
        f"(least(greatest(l_partkey, {_Z_PK_RANGE[0]}), {_Z_PK_RANGE[1]})"
        f" * {top}) // {_Z_PK_RANGE[1] - _Z_PK_RANGE[0]}"
    )
    terms = " + ".join(
        f"(((qo >> {i}) & 1) << {2 * i}) + (((qp >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )
    return f"""
WITH q AS (
  SELECT l_orderkey, l_partkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
         CAST({qo} AS BIGINT) AS qo, CAST({qp} AS BIGINT) AS qp
  FROM lineitem
)
SELECT l_orderkey, l_partkey, l_linenumber,
       CAST({terms} AS BIGINT) AS z_key
FROM q
"""


QUERIES["c_zorder_key"] = (c_zorder_key, _zorder_sql())


# --------------------------------------------------------------------------
# Shuffle-skew diagnostics (operators/diagnostics.py) — the skewed
# C17 frontier synth, measured: hot keys with integer share + the
# one-row distribution summary whose suggested_salt feeds salting.


def c_skew_stats(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.diagnostics import (
        hot_keys,
        skew_summary,
    )

    li = t(spark, sf, "lineitem")
    host = (
        F.when(F.col("l_orderkey") % 3 == 0, F.lit("hot-a.example.org"))
        .when(F.col("l_orderkey") % 7 < 2, F.lit("hot-b.example.org"))
        .otherwise(
            F.concat(
                F.lit("h"),
                (F.col("l_partkey") % 40).cast("string"),
                F.lit(".example.org"),
            )
        )
    )
    return hot_keys(li, host, threshold_permille=50, top_k=10).crossJoin(
        F.broadcast(
            skew_summary(li, host).select(
                "max_share_permille", "suggested_salt", "p50_n", "p99_n"
            )
        )
    )


C_SKEW_STATS_SQL = """
WITH h AS (
  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot-a.example.org'
              WHEN l_orderkey % 7 < 2 THEN 'hot-b.example.org'
              ELSE concat('h', CAST(l_partkey % 40 AS VARCHAR), '.example.org')
         END AS key
  FROM lineitem
),
counts AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY key),
tot AS (
  SELECT sum(n) AS t, count(*) AS k, max(n) AS m,
         quantile_cont(n, 0.5) AS p50, quantile_cont(n, 0.99) AS p99
  FROM counts
)
SELECT c.key, c.n,
       CAST((1000 * c.n) // t AS BIGINT) AS share_permille,
       CAST((1000 * m) // t AS BIGINT) AS max_share_permille,
       CAST((m * k + t - 1) // t AS BIGINT) AS suggested_salt,
       p50 AS p50_n, p99 AS p99_n
FROM counts c CROSS JOIN tot
WHERE c.n * 1000 >= t * 50
ORDER BY c.n DESC, c.key LIMIT 10
"""

QUERIES["c_skew_stats"] = (c_skew_stats, C_SKEW_STATS_SQL)


# --------------------------------------------------------------------------
# Stream-stream interval join semantics (streaming/pipeline.py::
# stream_interval_join), batch-checked: view → purchase attribution
# within a 2 h horizon, per user. Same join shape (equi-key + two-sided
# event-time range) the streaming operator runs with bounded state; the
# live two-stream path incl. left-outer is pinned in tests/streaming.


def s_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("d_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("f_ts"),
    )
    cond = (
        (v["user_id"] == p["p_user"])
        & (p["f_ts"] >= v["d_ts"])
        & (p["f_ts"] <= v["d_ts"] + F.expr("INTERVAL 2 hours"))
    )
    return v.join(p, cond).select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_timestamp("f_ts") - F.unix_timestamp("d_ts"))
        .cast("long")
        .alias("latency_sec"),
    )


S_STREAM_JOIN_SQL = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS latency_sec
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '2 hours'
"""

QUERIES["s_stream_join"] = (s_stream_join, S_STREAM_JOIN_SQL)


# --------------------------------------------------------------------------
# URL path templates (functions/traps.py::url_path_template): URLs
# minted by the same site code collapse to one template; instance
# counts per template are the crawl-space compression report. The Spark
# side runs the real operator on full URLs; the oracle rebuilds each
# branch's template analytically — an independent derivation, so a
# parsing bug in _path/url_host cannot self-confirm.


def c_url_templates(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.traps import url_path_template

    o = t(spark, sf, "orders")
    k = F.col("o_orderkey").cast("string")
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 9).cast("string"), F.lit(".example.org")
    )
    v = F.col("o_orderkey") % 6
    url = F.concat(
        F.lit("http://"),
        host,
        F.when(v == 0, F.concat(F.lit("/p/k"), k))
        .when(v == 1, F.lit("/a/b/a/b/a/b"))
        .when(v == 2, F.concat(F.lit("/2023/07/x"), k))
        .when(v == 3, F.concat(F.lit("/id/123456789"), k))
        .when(v == 4, F.concat(F.lit("/p/k"), k, F.lit("?a=1&b=2&c=")))
        .otherwise(F.concat(F.lit("/a/b/c/d/e/f/g/h/k"), k)),
    )
    return (
        o.select(url_path_template(url).alias("template"))
        .groupBy("template")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
        .orderBy(F.desc("n_urls"), "template")
    )


C_URL_TEMPLATES_SQL = """
SELECT template, CAST(count(*) AS BIGINT) AS n_urls
FROM (
  SELECT concat('h', CAST(o_custkey % 9 AS VARCHAR), '.example.org',
           CASE o_orderkey % 6
             WHEN 0 THEN '/p/k{N}'
             WHEN 1 THEN '/a/b/a/b/a/b'
             WHEN 2 THEN '/{N}/{N}/x{N}'
             WHEN 3 THEN '/id/{N}'
             WHEN 4 THEN '/p/k{N}?a={V}&b={V}&c={V}'
             ELSE '/a/b/c/d/e/f/g/h/k{N}'
           END) AS template
  FROM orders
)
GROUP BY template
ORDER BY n_urls DESC, template
"""

QUERIES["c_url_templates"] = (c_url_templates, C_URL_TEMPLATES_SQL)


# --------------------------------------------------------------------------
# Adaptive politeness from observed fetch latency (operators/latency.py):
# per-host nearest-rank p95 over a synthetic latency history, clamped
# integer crawl_delay (2x the p95), min-observation gate. All integer
# arithmetic; the oracle reproduces the identical rank selection.


def c_adaptive_delay(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.latency import adaptive_crawl_delay

    li = t(spark, sf, "lineitem")
    hist = li.select(
        F.concat(F.lit("h"), (F.col("l_suppkey") % 25).cast("string")).alias(
            "host"
        ),
        (
            1 + (F.col("l_orderkey") * 31 + F.col("l_linenumber") * 7) % 4000
        ).alias("latency_ms"),
        F.col("l_orderkey").alias("tb1"),
        F.col("l_linenumber").alias("tb2"),
    )
    return adaptive_crawl_delay(
        hist,
        delay_factor_permille=2000,
        min_delay_s=1,
        max_delay_s=6,
        min_obs=3,
        pct_permille=950,
        tie_cols=["tb1", "tb2"],
    )


C_ADAPTIVE_DELAY_SQL = """
WITH hist AS (
  SELECT concat('h', CAST(l_suppkey % 25 AS VARCHAR)) AS host,
         1 + (l_orderkey * 31 + l_linenumber * 7) % 4000 AS latency_ms,
         l_orderkey AS tb1, l_linenumber AS tb2
  FROM lineitem
), ranked AS (
  SELECT host, latency_ms,
         row_number() OVER (
           PARTITION BY host ORDER BY latency_ms, tb1, tb2) AS rn,
         count(*) OVER (PARTITION BY host) AS n
  FROM hist
), pick AS (
  SELECT host, n AS n_obs, latency_ms AS p_latency_ms
  FROM ranked
  WHERE rn = (n * 950 + 999) // 1000 AND n >= 3
)
SELECT host, n_obs, p_latency_ms,
       least(6, greatest(1,
         (p_latency_ms * 2000 + 999999) // 1000000)) AS crawl_delay
FROM pick
"""

QUERIES["c_adaptive_delay"] = (c_adaptive_delay, C_ADAPTIVE_DELAY_SQL)


# --------------------------------------------------------------------------
# TrustRank + spam mass (operators/hostrank.py::trust_rank/spam_mass —
# Gyöngyi et al. VLDB 2004/2006). Synthetic graph = the c_host_rank legit
# web (h0..h11 -> h0..h6) plus a planted link farm: an s0..s4 ring that
# also links into the legit web, with only a trickle of legit->farm
# edges. Seeds = h0..h3. Fixed rounds; both rank chains are integer
# micro-units, so the oracle reproduces rank, trust, AND the permille
# spam mass exactly.

_TR_ITERS, _TR_SCALE = 6, 10**9


def _tr_edges(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    legit = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 12).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 7).cast("string")).alias("dst"),
    )
    ring = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.concat(F.lit("s"), (F.col("o_orderkey") % 5).cast("string")).alias("src"),
        F.concat(F.lit("s"), ((F.col("o_orderkey") + 1) % 5).cast("string")).alias("dst"),
    )
    infiltrate = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.concat(F.lit("s"), (F.col("o_orderkey") % 5).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 7).cast("string")).alias("dst"),
    )
    hijack = o.filter(F.col("o_orderkey") % 101 == 0).select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 12).cast("string")).alias("src"),
        F.concat(F.lit("s"), (F.col("o_orderkey") % 5).cast("string")).alias("dst"),
    )
    return (
        legit.unionByName(ring).unionByName(infiltrate).unionByName(hijack)
        .filter(F.col("src") != F.col("dst"))
    )


def c_trust_spam(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.hostrank import spam_mass

    seeds = spark.createDataFrame(
        [("h0",), ("h1",), ("h2",), ("h3",)], "host string"
    )
    return spam_mass(
        _tr_edges(spark, sf), seeds, n_iters=_TR_ITERS, scale=_TR_SCALE
    )


def _trust_spam_sql() -> str:
    rank_step = """, r{i} AS (
  SELECT v.host,
         (15 * ({scale} // nn.n)) // 100
         + (85 * coalesce(s.in_sum, 0)) // 100 AS rank_units
  FROM nodes v CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS host, sum(r.rank_units // d.out_deg) AS in_sum
    FROM edges e
    JOIN r{prev} r ON e.src = r.host
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON v.host = s.host
)"""
    trust_step = """, t{i} AS (
  SELECT b.host,
         (15 * b.seed_units) // 100
         + (85 * coalesce(s.in_sum, 0)) // 100 AS trust_units
  FROM seedbase b
  LEFT JOIN (
    SELECT e.dst AS host, sum(r.trust_units // d.out_deg) AS in_sum
    FROM edges e
    JOIN t{prev} r ON e.src = r.host
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON b.host = s.host
)"""
    sql = f"""
WITH raw AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)) AS src,
         concat('h', CAST(o_orderkey % 7 AS VARCHAR)) AS dst
  FROM orders
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('s', CAST((o_orderkey + 1) % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('h', CAST(o_orderkey % 7 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)),
         concat('s', CAST(o_orderkey % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 101 = 0
), edges AS (
  SELECT DISTINCT src, dst FROM raw WHERE src <> dst
), nodes AS (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), deg AS (
  SELECT src, count(*) AS out_deg FROM edges GROUP BY src
), nn AS (
  SELECT count(*) AS n FROM nodes
), seeds AS (
  SELECT unnest(['h0', 'h1', 'h2', 'h3']) AS host
), ns AS (
  SELECT count(*) AS n FROM seeds
), seedbase AS (
  SELECT v.host,
         CASE WHEN s.host IS NOT NULL
              THEN CAST({_TR_SCALE} // ns.n AS BIGINT) ELSE 0 END AS seed_units
  FROM nodes v CROSS JOIN ns LEFT JOIN seeds s ON v.host = s.host
), r0 AS (
  SELECT host, CAST({_TR_SCALE} // nn.n AS BIGINT) AS rank_units
  FROM nodes CROSS JOIN nn
), t0 AS (
  SELECT host, seed_units AS trust_units FROM seedbase
)"""
    for i in range(1, _TR_ITERS + 1):
        sql += rank_step.format(i=i, prev=i - 1, scale=_TR_SCALE)
        sql += trust_step.format(i=i, prev=i - 1)
    sql += f"""
SELECT r.host, CAST(r.rank_units AS BIGINT) AS rank_units,
       CAST(t.trust_units AS BIGINT) AS trust_units,
       CAST(greatest(0, (r.rank_units - t.trust_units) * 1000
                        // greatest(r.rank_units, 1)) AS BIGINT)
         AS spam_mass_permille
FROM r{_TR_ITERS} r JOIN t{_TR_ITERS} t ON r.host = t.host
"""
    return sql


QUERIES["c_trust_spam"] = (c_trust_spam, _trust_spam_sql())


# --------------------------------------------------------------------------
# Largest-remainder crawl-budget apportionment (operators/apportion.py):
# integer Hamilton shares of a 10,000-fetch cycle across hosts weighted
# by backlog mass. Sums to the budget exactly; remainder ranking runs on
# the two-phase distributed sequencer. Value-exact (pure integers).

_AP_BUDGET = 10000


def c_budget_apportion(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.apportion import apportion_budget

    w = (
        t(spark, sf, "lineitem")
        .groupBy(
            F.concat(
                F.lit("h"), (F.col("l_partkey") % 40).cast("string")
            ).alias("host")
        )
        .agg(F.sum("l_quantity").cast("long").alias("weight"))
    )
    return apportion_budget(w, _AP_BUDGET)


C_BUDGET_APPORTION_SQL = f"""
WITH w AS (
  SELECT concat('h', CAST(l_partkey % 40 AS VARCHAR)) AS host,
         CAST(sum(l_quantity) AS BIGINT) AS weight
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(weight) AS tw FROM w
), b AS (
  SELECT host, weight,
         (weight * {_AP_BUDGET}) // tw AS base,
         (weight * {_AP_BUDGET}) % tw AS rem
  FROM w, tot
), r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk FROM b
), lo AS (
  SELECT {_AP_BUDGET} - sum(base) AS leftover FROM b
)
SELECT host, weight,
       CAST(base + CASE WHEN rk <= leftover AND rem > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS budget
FROM r, lo
"""

QUERIES["c_budget_apportion"] = (c_budget_apportion, C_BUDGET_APPORTION_SQL)


# --------------------------------------------------------------------------
# HITS hubs & authorities (operators/hostrank.py::hits — Kleinberg 1999)
# over the same legit+farm synthetic web as c_trust_spam: per round two
# edge joins, exact L-infinity integer renormalization (decimal floor
# division — DuckDB runs the identical quotient on HUGEINT).

_HI_ITERS, _HI_SCALE = 6, 10**9


def c_hits(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.hostrank import hits

    return hits(_tr_edges(spark, sf), n_iters=_HI_ITERS, scale=_HI_SCALE)


def _hits_sql() -> str:
    norm = (
        "CASE WHEN mx.m > 0 THEN"
        " (CAST(coalesce(r.raw, 0) AS HUGEINT) * {scale}) // mx.m"
        " ELSE 0 END"
    )
    a_step = """, ar{i} AS MATERIALIZED (
  SELECT e.dst AS host, sum(h.hub_units) AS raw
  FROM edges e JOIN h{prev} h ON e.src = h.host GROUP BY e.dst
), a{i} AS MATERIALIZED (
  SELECT v.host, CAST(""" + norm + """ AS BIGINT) AS auth_units
  FROM nodes v
  LEFT JOIN ar{i} r ON v.host = r.host
  CROSS JOIN (SELECT coalesce(max(raw), 0) AS m FROM ar{i}) mx
)"""
    h_step = """, hr{i} AS MATERIALIZED (
  SELECT e.src AS host, sum(a.auth_units) AS raw
  FROM edges e JOIN a{i} a ON e.dst = a.host GROUP BY e.src
), h{i} AS MATERIALIZED (
  SELECT v.host, CAST(""" + norm + """ AS BIGINT) AS hub_units
  FROM nodes v
  LEFT JOIN hr{i} r ON v.host = r.host
  CROSS JOIN (SELECT coalesce(max(raw), 0) AS m FROM hr{i}) mx
)"""
    sql = f"""
WITH raw AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)) AS src,
         concat('h', CAST(o_orderkey % 7 AS VARCHAR)) AS dst
  FROM orders
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('s', CAST((o_orderkey + 1) % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('h', CAST(o_orderkey % 7 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)),
         concat('s', CAST(o_orderkey % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 101 = 0
), edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM raw WHERE src <> dst
), nodes AS MATERIALIZED (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), h0 AS (
  SELECT host, CAST({_HI_SCALE} AS BIGINT) AS hub_units FROM nodes
)"""
    for i in range(1, _HI_ITERS + 1):
        sql += a_step.format(i=i, prev=i - 1, scale=_HI_SCALE)
        sql += h_step.format(i=i, scale=_HI_SCALE)
    sql += f"""
SELECT h.host, h.hub_units, a.auth_units
FROM h{_HI_ITERS} h JOIN a{_HI_ITERS} a ON h.host = a.host
"""
    return sql


QUERIES["c_hits"] = (c_hits, _hits_sql())


# --------------------------------------------------------------------------
# OPIC online importance — operators/hostrank.py::opic on the TrustRank
# graph PLUS a planted sink host "z9" (h→z9 edges, no outlinks) so the
# dangling-cash / virtual-page redistribution path is non-vacuous. The
# oracle unrolls the same integer cash propagation as a CTE chain;
# value equality pins per-edge floor division, the banked history sums,
# AND the virtual-page pool arithmetic.

_OP_ITERS, _OP_SCALE = 6, 10**9


def _opic_edges(spark: SparkSession, sf: str) -> DataFrame:
    sink = t(spark, sf, "orders").filter(F.col("o_orderkey") % 13 == 0).select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 12).cast("string")).alias("src"),
        F.lit("z9").alias("dst"),
    )
    return _tr_edges(spark, sf).unionByName(sink)


def c_opic(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.hostrank import opic

    return opic(_opic_edges(spark, sf), n_iters=_OP_ITERS, scale=_OP_SCALE)


def _opic_sql() -> str:
    step = """, in{i} AS MATERIALIZED (
  SELECT e.dst AS host, sum(s.cash // d.d) AS in_sum
  FROM edges e JOIN s{prev} s ON e.src = s.host JOIN deg d ON d.src = e.src
  GROUP BY e.dst
), vp{i} AS (
  SELECT coalesce(sum(s.cash), 0) AS vp
  FROM s{prev} s LEFT JOIN deg d ON s.host = d.src WHERE d.src IS NULL
), s{i} AS MATERIALIZED (
  SELECT s.host,
         CAST(coalesce(f.in_sum, 0) + (vp.vp // nn.n) AS BIGINT) AS cash,
         CAST(s.hist + s.cash AS BIGINT) AS hist
  FROM s{prev} s
  LEFT JOIN in{i} f ON s.host = f.host
  CROSS JOIN vp{i} vp CROSS JOIN nn
)"""
    sql = f"""
WITH raw AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)) AS src,
         concat('h', CAST(o_orderkey % 7 AS VARCHAR)) AS dst
  FROM orders
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('s', CAST((o_orderkey + 1) % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('h', CAST(o_orderkey % 7 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)),
         concat('s', CAST(o_orderkey % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 101 = 0
  UNION ALL
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)), 'z9'
  FROM orders WHERE o_orderkey % 13 = 0
), edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM raw WHERE src <> dst
), nodes AS MATERIALIZED (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), deg AS MATERIALIZED (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), nn AS (SELECT count(*) AS n FROM nodes),
s0 AS MATERIALIZED (
  SELECT host, CAST({_OP_SCALE} // nn.n AS BIGINT) AS cash,
         CAST(0 AS BIGINT) AS hist
  FROM nodes CROSS JOIN nn
)"""
    for i in range(1, _OP_ITERS + 1):
        sql += step.format(i=i, prev=i - 1)
    sql += f"""
SELECT host, cash AS cash_units, hist AS history_units FROM s{_OP_ITERS}
"""
    return sql


QUERIES["c_opic"] = (c_opic, _opic_sql())


# --------------------------------------------------------------------------
# Crawl-tier assignment — operators/tiers.py::assign_crawl_tiers. Equal-
# population revisit bands over an integer authority × change-rate score;
# the exact global rank inside runs on the two-phase distributed
# sequencer, and the oracle ranks with a plain window — value equality
# pins the distributed rank, the band arithmetic, and the geometric
# revisit intervals.


def c_crawl_tiers(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.tiers import assign_crawl_tiers

    o = t(spark, sf, "orders")
    hs = o.groupBy(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string")).alias(
            "host"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("rank_units"),
        (F.min("o_orderkey") % 997).cast("long").alias("change_permille"),
    )
    return assign_crawl_tiers(hs, n_tiers=4, base_interval=1)


C_CRAWL_TIERS_SQL = """
WITH hs AS (
  SELECT concat('h', CAST(o_custkey % 50 AS VARCHAR)) AS host,
         CAST(count(*) AS BIGINT) AS rank_units,
         CAST(min(o_orderkey) % 997 AS BIGINT) AS change_permille
  FROM orders GROUP BY 1
), rk AS (
  SELECT host,
         CAST(rank_units * (change_permille + 1) AS BIGINT) AS tier_score,
         row_number() OVER (
           ORDER BY rank_units * (change_permille + 1) DESC, host) AS rk,
         count(*) OVER () AS n
  FROM hs
)
SELECT host, tier_score,
       CAST(((rk - 1) * 4) // n AS INTEGER) AS tier,
       CAST(1 << CAST(((rk - 1) * 4) // n AS INTEGER) AS BIGINT)
         AS revisit_batches
FROM rk
"""

QUERIES["c_crawl_tiers"] = (c_crawl_tiers, C_CRAWL_TIERS_SQL)


# --------------------------------------------------------------------------
# Focused-crawl harvest rate — operators/diagnostics.py::harvest_rate.
# The canonical focused-crawl evaluation curve (Chakrabarti et al. 1999):
# per-batch and cumulative share of fetched pages that are on-topic.
# Relevance reuses the frozen integer keyword score (scoring.py), batch =
# doc_id % 20 — both engines see identical labels, so the whole curve is
# value-pinned.


def c_harvest_rate(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.diagnostics import harvest_rate
    from who_focus_crawler_spark.operators.scoring import relevance_score

    d = t(spark, sf, "documents")
    fetched = d.select(
        (F.col("doc_id") % 20).cast("int").alias("batch"),
        (relevance_score(F.col("text")) >= 3).cast("int").alias("relevant"),
    )
    return harvest_rate(fetched)


C_HARVEST_RATE_SQL = """
WITH f AS (
  SELECT CAST(doc_id % 20 AS INTEGER) AS batch,
         CASE WHEN len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              x -> x IN ('query','data','stream','table'))) >= 3
              THEN 1 ELSE 0 END AS relevant
  FROM documents
), per AS (
  SELECT batch, CAST(count(*) AS BIGINT) AS n_fetched,
         CAST(sum(relevant) AS BIGINT) AS n_relevant
  FROM f GROUP BY batch
), cum AS (
  SELECT batch, n_fetched, n_relevant,
         CAST(sum(n_fetched) OVER w AS BIGINT) AS cum_fetched,
         CAST(sum(n_relevant) OVER w AS BIGINT) AS cum_relevant
  FROM per
  WINDOW w AS (ORDER BY batch ROWS UNBOUNDED PRECEDING)
)
SELECT batch, n_fetched, n_relevant, cum_fetched, cum_relevant,
       CAST((n_relevant * 1000) // n_fetched AS BIGINT) AS harvest_permille,
       CAST((cum_relevant * 1000) // cum_fetched AS BIGINT)
         AS cum_harvest_permille
FROM cum
"""

QUERIES["c_harvest_rate"] = (c_harvest_rate, C_HARVEST_RATE_SQL)


# --------------------------------------------------------------------------
# Link reciprocity — operators/hostrank.py::link_reciprocity on the
# TrustRank graph: the spam ring s0→s1→…→s4→s0 is one-directional
# (reciprocity 0), while the legit h-host mesh has genuinely mutual
# pairs — both tails non-vacuous.


def c_link_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.hostrank import link_reciprocity

    return link_reciprocity(_tr_edges(spark, sf))


C_LINK_RECIPROCITY_SQL = """
WITH raw AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)) AS src,
         concat('h', CAST(o_orderkey % 7 AS VARCHAR)) AS dst
  FROM orders
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('s', CAST((o_orderkey + 1) % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('s', CAST(o_orderkey % 5 AS VARCHAR)),
         concat('h', CAST(o_orderkey % 7 AS VARCHAR))
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR)),
         concat('s', CAST(o_orderkey % 5 AS VARCHAR))
  FROM orders WHERE o_orderkey % 101 = 0
), e AS (
  SELECT DISTINCT src, dst FROM raw WHERE src <> dst
), recip AS (
  SELECT a.src, count(*) AS n_reciprocal
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src
), deg AS (
  SELECT src, count(*) AS n_out FROM e GROUP BY src
)
SELECT d.src AS host,
       CAST(d.n_out AS BIGINT) AS n_out,
       CAST(coalesce(r.n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
       CAST((coalesce(r.n_reciprocal, 0) * 1000) // d.n_out AS BIGINT)
         AS reciprocity_permille
FROM deg d LEFT JOIN recip r ON d.src = r.src
"""

QUERIES["c_link_reciprocity"] = (c_link_reciprocity, C_LINK_RECIPROCITY_SQL)


# --------------------------------------------------------------------------
# Tier-driven revisit due-set — operators/tiers.py::due_for_revisit
# composed over assign_crawl_tiers: hosts whose geometric revisit
# interval has elapsed by a synthetic "current batch". Some hosts have
# no fetch history (custkey % 50 >= 44 never appears in the last-fetch
# log) ⇒ the never-crawled backlog path is non-vacuous.

_RD_NOW = 120


def c_refresh_due(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.tiers import (
        assign_crawl_tiers,
        due_for_revisit,
    )

    o = t(spark, sf, "orders")
    hs = o.groupBy(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string")).alias(
            "host"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("rank_units"),
        (F.min("o_orderkey") % 997).cast("long").alias("change_permille"),
    )
    tiers = assign_crawl_tiers(hs, n_tiers=4, base_interval=8)
    lf = (
        o.filter(F.col("o_custkey") % 50 < 44)
        .groupBy(
            F.concat(
                F.lit("h"), (F.col("o_custkey") % 50).cast("string")
            ).alias("host")
        )
        .agg((F.max("o_orderkey") % 100).cast("long").alias("last_batch"))
    )
    return due_for_revisit(tiers, lf, current_batch=_RD_NOW)


C_REFRESH_DUE_SQL = f"""
WITH hs AS (
  SELECT concat('h', CAST(o_custkey % 50 AS VARCHAR)) AS host,
         CAST(count(*) AS BIGINT) AS rank_units,
         CAST(min(o_orderkey) % 997 AS BIGINT) AS change_permille
  FROM orders GROUP BY 1
), rk AS (
  SELECT host,
         CAST(rank_units * (change_permille + 1) AS BIGINT) AS tier_score,
         row_number() OVER (
           ORDER BY rank_units * (change_permille + 1) DESC, host) AS rk,
         count(*) OVER () AS n
  FROM hs
), tiers AS (
  SELECT host, tier_score,
         CAST(((rk - 1) * 4) // n AS INTEGER) AS tier,
         CAST(8 << CAST(((rk - 1) * 4) // n AS INTEGER) AS BIGINT)
           AS revisit_batches
  FROM rk
), lf AS (
  SELECT concat('h', CAST(o_custkey % 50 AS VARCHAR)) AS host,
         CAST(max(o_orderkey) % 100 AS BIGINT) AS last_batch
  FROM orders WHERE o_custkey % 50 < 44 GROUP BY 1
)
SELECT t.host, t.tier, t.revisit_batches, lf.last_batch,
       CAST({_RD_NOW} - coalesce(lf.last_batch, -2147483648)
            - t.revisit_batches AS BIGINT) AS overdue,
       ({_RD_NOW} - coalesce(lf.last_batch, -2147483648))
         >= t.revisit_batches AS due
FROM tiers t LEFT JOIN lf ON t.host = lf.host
"""

QUERIES["c_refresh_due"] = (c_refresh_due, C_REFRESH_DUE_SQL)


# --------------------------------------------------------------------------
# Scheduler fairness — operators/diagnostics.py::fairness_gini. Gini of
# the per-host fetch-count distribution on the same deliberately skewed
# synthetic frontier as c_hot_hosts (two hot hosts ⇒ a clearly nonzero
# coefficient). The global rank inside runs on the two-phase distributed
# sequencer; the oracle ranks with a plain window — value equality pins
# the distributed rank AND the integer Gini arithmetic.


def c_fairness_gini(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.diagnostics import fairness_gini

    li = t(spark, sf, "lineitem")
    host = (
        F.when(F.col("l_orderkey") % 3 == 0, F.lit("hot-a.example.org"))
        .when(F.col("l_orderkey") % 7 < 2, F.lit("hot-b.example.org"))
        .otherwise(
            F.concat(
                F.lit("h"),
                (F.col("l_partkey") % 40).cast("string"),
                F.lit(".example.org"),
            )
        )
    )
    return fairness_gini(li, host)


C_FAIRNESS_GINI_SQL = """
WITH h AS (
  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot-a.example.org'
              WHEN l_orderkey % 7 < 2 THEN 'hot-b.example.org'
              ELSE concat('h', CAST(l_partkey % 40 AS VARCHAR), '.example.org')
         END AS host
  FROM lineitem
), counts AS (
  SELECT host AS key, count(*) AS n FROM h GROUP BY host
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n ASC, key ASC) AS r FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(sum(r * n) AS BIGINT) AS s_rank_weighted,
       round((2.0 * sum(r * n) - (count(*) + 1.0) * sum(n))
             / (count(*)::DOUBLE * sum(n)), 6) AS gini
FROM ranked
"""

QUERIES["c_fairness_gini"] = (c_fairness_gini, C_FAIRNESS_GINI_SQL)


# --------------------------------------------------------------------------
# Retry / backoff scheduling — operators/retry.py::schedule_retries.
# Attempt log synthesized from lineitem (one attempt per line item, so
# URLs get 1–7 attempts); the modulus choices make all three states
# (done / retry / gave_up) non-vacuous at sf0.01.


def c_retry_backoff(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.retry import schedule_retries

    li = t(spark, sf, "lineitem")
    attempts = li.select(
        F.concat(
            F.lit("https://h"),
            (F.col("l_orderkey") % 40).cast("string"),
            F.lit(".example.org/o/"),
            F.col("l_orderkey").cast("string"),
        ).alias("canon_url"),
        F.concat(
            F.lit("h"), (F.col("l_orderkey") % 40).cast("string"),
            F.lit(".example.org"),
        ).alias("host"),
        (F.col("l_linenumber")).cast("long").alias("batch"),
        (F.col("l_partkey") % 7 == 3).alias("ok"),
    )
    return schedule_retries(attempts, base_delay=1, max_attempts=4, max_delay=64)


C_RETRY_BACKOFF_SQL = """
WITH attempts AS (
  SELECT concat('https://h', CAST(l_orderkey % 40 AS VARCHAR),
                '.example.org/o/', CAST(l_orderkey AS VARCHAR)) AS canon_url,
         concat('h', CAST(l_orderkey % 40 AS VARCHAR), '.example.org') AS host,
         CAST(l_linenumber AS BIGINT) AS batch,
         (l_partkey % 7 = 3) AS ok
  FROM lineitem
), per_url AS (
  SELECT canon_url, host, CAST(count(*) AS BIGINT) AS n_attempts,
         CAST(max(batch) AS BIGINT) AS last_batch,
         max(CASE WHEN ok THEN 1 ELSE 0 END) AS any_ok
  FROM attempts GROUP BY canon_url, host
)
SELECT canon_url, host, n_attempts, last_batch,
       CASE WHEN any_ok = 1 THEN 'done'
            WHEN n_attempts >= 4 THEN 'gave_up'
            ELSE 'retry' END AS state,
       CASE WHEN any_ok = 0 AND n_attempts < 4
            THEN last_batch + least(1 << (n_attempts - 1), 64)
       END AS next_due_batch
FROM per_url
"""

QUERIES["c_retry_backoff"] = (c_retry_backoff, C_RETRY_BACKOFF_SQL)


# --------------------------------------------------------------------------
# Rendezvous host→shard assignment — operators/sharding.py. The oracle
# recomputes the md5-derived weights and picks the arg-max with a
# window; the engine's arg-max is a pure projection (array_max over
# structs, no shuffle). Value equality pins weights AND tie order.


def c_host_shard(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.sharding import assign_shards

    o = t(spark, sf, "orders")
    hosts = o.select(
        F.concat(
            F.lit("w"), (F.col("o_orderkey") % 7).cast("string"),
            F.lit(".site"), (F.col("o_custkey") % 13).cast("string"),
            F.lit(".example.org"),
        ).alias("host")
    ).distinct()
    return assign_shards(hosts, n_shards=5)


C_HOST_SHARD_SQL = """
WITH hosts AS (
  SELECT DISTINCT concat('w', CAST(o_orderkey % 7 AS VARCHAR),
                         '.site', CAST(o_custkey % 13 AS VARCHAR),
                         '.example.org') AS host
  FROM orders
), weighted AS (
  SELECT host, s.s AS shard,
         CAST(concat('0x', substring(md5(concat(host, '#', CAST(s.s AS VARCHAR))), 1, 15)) AS BIGINT) AS w
  FROM hosts, (SELECT unnest(generate_series(0, 4)) AS s) s
), ranked AS (
  SELECT host, shard,
         row_number() OVER (PARTITION BY host ORDER BY w DESC, shard DESC) AS r
  FROM weighted
)
SELECT host, CAST(shard AS INTEGER) AS shard FROM ranked WHERE r = 1
"""

QUERIES["c_host_shard"] = (c_host_shard, C_HOST_SHARD_SQL)


# --------------------------------------------------------------------------
# Soft-404 detection — corpus/text.py::soft404_score. The synthetic
# corpus has no error pages, so ~1/17 docs get an error banner grafted
# on (and ~1/13 a weak 'error' mention) before scoring — both engines
# transform identically, so detection is non-vacuous AND value-exact.


def c_soft404(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.corpus.text import soft404_score

    d = t(spark, sf, "documents")
    page = (
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.lit("Error 404 page not found. "), F.col("text")),
        )
        .when(F.col("doc_id") % 13 == 0, F.concat(F.lit("error: "), F.col("text")))
        .otherwise(F.col("text"))
    )
    s = soft404_score(page)
    return d.select(
        "doc_id",
        s.alias("soft404_points"),
        (s >= 500).alias("is_soft404"),
    )


C_SOFT404_SQL = """
WITH pages AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'Error 404 page not found. ' || text
              WHEN doc_id % 13 = 0 THEN 'error: ' || text
              ELSE text END AS page
  FROM documents
), lowered AS (
  SELECT doc_id, lower(page) AS t, page FROM pages
)
SELECT doc_id,
       CAST(
         (CASE WHEN t LIKE '%page not found%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%404 not found%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%no longer available%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%404%' THEN 100 ELSE 0 END)
       + (CASE WHEN t LIKE '%not found%' THEN 100 ELSE 0 END)
       + (CASE WHEN t LIKE '%error%' THEN 100 ELSE 0 END)
       + (CASE WHEN len(regexp_extract_all(lower(page), '[a-z0-9]+')) < 20
               THEN 200 ELSE 0 END)
       AS BIGINT) AS soft404_points,
       ((CASE WHEN t LIKE '%page not found%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%404 not found%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%no longer available%' THEN 500 ELSE 0 END)
       + (CASE WHEN t LIKE '%404%' THEN 100 ELSE 0 END)
       + (CASE WHEN t LIKE '%not found%' THEN 100 ELSE 0 END)
       + (CASE WHEN t LIKE '%error%' THEN 100 ELSE 0 END)
       + (CASE WHEN len(regexp_extract_all(lower(page), '[a-z0-9]+')) < 20
               THEN 200 ELSE 0 END)) >= 500 AS is_soft404
FROM lowered
"""

QUERIES["c_soft404"] = (c_soft404, C_SOFT404_SQL)


# --------------------------------------------------------------------------
# Per-IP politeness budget (operators/ipbudget.py): hosts sharing one
# resolved IP (virtual hosting) share a third admission budget stacked
# over host politeness. The oracle reproduces the md5-bucketed synthetic
# resolver and both ranking tiers with window functions.


def c_ip_politeness(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.ipbudget import (
        apply_ip_budget,
        synthetic_ips,
    )
    from who_focus_crawler_spark.operators.politeness import apply_politeness

    o = t(spark, sf, "orders")
    host = F.concat(
        F.lit("h"), (F.col("o_orderkey") % 24).cast("string"),
        F.lit(".example.org"),
    )
    cand = o.select(
        host.alias("host"),
        F.col("o_totalprice").alias("priority"),
        (F.col("o_orderkey") % 4).cast("int").alias("depth"),
        F.concat(
            F.lit("http://"), host, F.lit("/p/"),
            F.col("o_orderkey").cast("string"),
        ).alias("canon_url"),
        F.lit(True).alias("robots_ok"),
    )
    dns = synthetic_ips(cand.select("host").distinct(), pool=5)
    out = apply_ip_budget(apply_politeness(cand, 4), dns, ip_k=6)
    return out.filter(F.col("admitted")).select("canon_url", "host", "ip")


C_IP_POLITENESS_SQL = """
WITH cand AS (
  SELECT concat('h', CAST(o_orderkey % 24 AS VARCHAR), '.example.org') AS host,
         o_totalprice AS priority,
         CAST(o_orderkey % 4 AS INT) AS depth,
         concat('http://h', CAST(o_orderkey % 24 AS VARCHAR),
                '.example.org/p/', CAST(o_orderkey AS VARCHAR)) AS canon_url
  FROM orders
),
resolved AS (
  SELECT *,
         concat('10.0.0.', CAST(
           CAST(concat('0x', substring(md5(host), 1, 8)) AS BIGINT) % 5
           AS VARCHAR)) AS ip
  FROM cand
),
pol AS (
  SELECT *, row_number() OVER (PARTITION BY host
             ORDER BY priority DESC, depth, canon_url) AS rn_pol
  FROM resolved
),
ipb AS (
  SELECT *, row_number() OVER (PARTITION BY ip
             ORDER BY priority DESC, depth, canon_url) AS rn_ip
  FROM pol WHERE rn_pol <= 4
)
SELECT canon_url, host, ip FROM ipb WHERE rn_ip <= 6
"""

QUERIES["c_ip_politeness"] = (c_ip_politeness, C_IP_POLITENESS_SQL)


# --------------------------------------------------------------------------
# HTTP revalidation planning (operators/recrawl.py::conditional_fetch_plan):
# per-URL validator choice + expected-304 + saved bytes from the fetch
# history. History synthesized from lineitem: url_id % 3 == 0 pages
# change every fetch, validators present per url_id branch (etag on
# even ids, Last-Modified on %4 < 3, neither on %4 == 3).


def c_conditional_fetch(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.recrawl import conditional_fetch_plan

    li = t(spark, sf, "lineitem")
    url_id = F.col("l_orderkey") % 500
    batch = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    chash = F.md5(
        F.concat(
            url_id.cast("string"),
            F.lit(":"),
            F.when((url_id % 3) == 0, batch).otherwise(F.lit(0)).cast("string"),
        )
    )
    hist = li.select(
        F.concat(
            F.lit("http://h"), (url_id % 7).cast("string"),
            F.lit(".example.org/doc/"), url_id.cast("string"),
        ).alias("canon_url"),
        F.concat(
            F.lit("h"), (url_id % 7).cast("string"), F.lit(".example.org")
        ).alias("host"),
        batch.alias("batch"),
        chash.alias("content_hash"),
        F.when((url_id % 2) == 0, F.concat(F.lit("W/"), chash)).alias("etag"),
        F.when((url_id % 4) < 3, F.lit(1700000000) + batch)
        .cast("long")
        .alias("last_modified"),
        ((F.col("l_orderkey") % 1000) + 10 * F.col("l_linenumber"))
        .cast("long")
        .alias("content_length"),
    )
    return conditional_fetch_plan(hist)


C_CONDITIONAL_FETCH_SQL = """
WITH hist AS (
  SELECT concat('http://h', CAST((l_orderkey % 500) % 7 AS VARCHAR),
                '.example.org/doc/', CAST(l_orderkey % 500 AS VARCHAR))
           AS canon_url,
         concat('h', CAST((l_orderkey % 500) % 7 AS VARCHAR),
                '.example.org') AS host,
         l_orderkey * 8 + l_linenumber AS batch,
         md5(concat(CAST(l_orderkey % 500 AS VARCHAR), ':',
             CAST(CASE WHEN (l_orderkey % 500) % 3 = 0
                       THEN l_orderkey * 8 + l_linenumber ELSE 0 END
                  AS VARCHAR))) AS content_hash,
         CASE WHEN (l_orderkey % 500) % 2 = 0
              THEN concat('W/', md5(concat(CAST(l_orderkey % 500 AS VARCHAR),
                   ':', CAST(CASE WHEN (l_orderkey % 500) % 3 = 0
                             THEN l_orderkey * 8 + l_linenumber ELSE 0 END
                        AS VARCHAR))))
         END AS etag,
         CASE WHEN (l_orderkey % 500) % 4 < 3
              THEN 1700000000 + l_orderkey * 8 + l_linenumber END
           AS last_modified,
         (l_orderkey % 1000) + 10 * l_linenumber AS content_length
  FROM lineitem
),
ordered AS (
  SELECT *,
         lag(content_hash) OVER (PARTITION BY canon_url
             ORDER BY batch, content_hash) AS prev_hash,
         row_number() OVER (PARTITION BY canon_url
             ORDER BY batch, content_hash) AS fetch_no,
         count(*) OVER (PARTITION BY canon_url) AS n
  FROM hist
)
SELECT canon_url, host,
       CASE WHEN etag IS NOT NULL THEN 'etag'
            WHEN last_modified IS NOT NULL THEN 'last_modified'
            ELSE 'none' END AS validator,
       (etag IS NOT NULL OR last_modified IS NOT NULL) AS revalidate,
       ((etag IS NOT NULL OR last_modified IS NOT NULL)
        AND fetch_no >= 2
        AND content_hash IS NOT DISTINCT FROM prev_hash) AS expect_304,
       CAST(CASE WHEN ((etag IS NOT NULL OR last_modified IS NOT NULL)
                       AND fetch_no >= 2
                       AND content_hash IS NOT DISTINCT FROM prev_hash)
                 THEN content_length ELSE 0 END AS BIGINT) AS saved_bytes
FROM ordered WHERE fetch_no = n
"""

QUERIES["c_conditional_fetch"] = (c_conditional_fetch, C_CONDITIONAL_FETCH_SQL)


# --------------------------------------------------------------------------
# Canonical URL election (operators/canonical.py): five URL aliases per
# content hash, exercising every tier of the frozen preference order
# (scheme, param count, path depth, length, lexicographic).


def c_canonical_election(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.canonical import elect_canonical

    o = t(spark, sf, "orders")
    cid = (F.col("o_orderkey") % 300).cast("string")
    v = (F.col("o_orderkey") / 300).cast("long") % 5
    url = (
        F.when(v == 0, F.concat(F.lit("https://example.org/p/"), cid))
        .when(v == 1, F.concat(F.lit("http://example.org/p/"), cid))
        .when(v == 2, F.concat(
            F.lit("https://example.org/p/"), cid, F.lit("?ref=home&utm=x")))
        .when(v == 3, F.concat(F.lit("https://example.org/arc/p/"), cid))
        .otherwise(F.concat(F.lit("https://mirror-example.org/p/"), cid))
    )
    pages = o.select(
        url.alias("canon_url"),
        F.md5(F.concat(F.lit("content:"), cid)).alias("content_hash"),
    ).distinct()
    return elect_canonical(pages)


C_CANONICAL_ELECTION_SQL = """
WITH pages AS (
  SELECT DISTINCT
    CASE (o_orderkey // 300) % 5
      WHEN 0 THEN concat('https://example.org/p/',
                         CAST(o_orderkey % 300 AS VARCHAR))
      WHEN 1 THEN concat('http://example.org/p/',
                         CAST(o_orderkey % 300 AS VARCHAR))
      WHEN 2 THEN concat('https://example.org/p/',
                         CAST(o_orderkey % 300 AS VARCHAR), '?ref=home&utm=x')
      WHEN 3 THEN concat('https://example.org/arc/p/',
                         CAST(o_orderkey % 300 AS VARCHAR))
      ELSE concat('https://mirror-example.org/p/',
                  CAST(o_orderkey % 300 AS VARCHAR))
    END AS canon_url,
    md5(concat('content:', CAST(o_orderkey % 300 AS VARCHAR))) AS content_hash
  FROM orders
),
keyed AS (
  SELECT canon_url, content_hash,
         CASE WHEN canon_url LIKE 'https://%' THEN 0 ELSE 1 END AS https_rank,
         CASE WHEN instr(canon_url, '?') > 0
              THEN len(string_split(split_part(canon_url, '?', 2), '&'))
              ELSE 0 END AS n_params,
         len(canon_url) - len(replace(canon_url, '/', '')) AS n_slashes
  FROM pages
),
ranked AS (
  SELECT canon_url, content_hash,
         row_number() OVER w AS rn,
         first_value(canon_url) OVER w AS canonical_url
  FROM keyed
  WINDOW w AS (PARTITION BY content_hash
               ORDER BY https_rank, n_params, n_slashes,
                        len(canon_url), canon_url)
)
SELECT canon_url, content_hash, canonical_url, rn = 1 AS is_canonical
FROM ranked
"""

QUERIES["c_canonical_election"] = (c_canonical_election, C_CANONICAL_ELECTION_SQL)

# --------------------------------------------------------------------------
# C6+aging — starvation-free selection view (operators/frontier.py::
# age_boosted_view): priority aged by batches waited, then the standard
# host-bucketed top-k. Frontier synthesized from orders: depth from the
# order key, discovered_in_batch from custkey, so deep long-waiting rows
# genuinely overtake fresh shallow ones in the aged ranking (non-vacuous
# both ways: some hosts' top-3 differ from the unaged order, some don't).
# All arithmetic stays exact in binary doubles (waited*250/1000 = k/4).


def c_frontier_aging(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.frontier import (
        age_boosted_view,
        select_candidates,
    )

    frontier = _messy_urls(spark, sf).select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 12).cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.concat(
            F.lit("https://h"),
            (F.col("o_custkey") % 12).cast("string"),
            F.lit(".example.org/p/"),
            F.col("o_orderkey").cast("string"),
        ).alias("canon_url"),
        (-(F.col("o_orderkey") % 5)).cast("double").alias("priority"),
        (F.col("o_orderkey") % 5).cast("int").alias("depth"),
        (F.col("o_custkey") % 7).cast("int").alias("discovered_in_batch"),
    )
    aged = age_boosted_view(frontier, current_batch=8, boost_milli=250)
    return select_candidates(aged, 3).select(
        "host", "canon_url", F.col("priority").alias("aged_priority"), "depth"
    )


C_FRONTIER_AGING_SQL = """
WITH frontier AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         concat('https://h', CAST(o_custkey % 12 AS VARCHAR),
                '.example.org/p/', CAST(o_orderkey AS VARCHAR)) AS canon_url,
         CAST(-(o_orderkey % 5) AS DOUBLE) AS priority,
         CAST(o_orderkey % 5 AS INTEGER) AS depth,
         CAST(o_custkey % 7 AS INTEGER) AS discovered_in_batch
  FROM orders
),
aged AS (
  SELECT host, canon_url,
         priority + greatest(7 - discovered_in_batch, 0) * 250 / 1000.0
           AS aged_priority,
         depth
  FROM frontier
),
ranked AS (
  SELECT host, canon_url, aged_priority, depth,
         row_number() OVER (
           PARTITION BY host
           ORDER BY aged_priority DESC, depth ASC, canon_url ASC
         ) AS rn
  FROM aged
)
SELECT host, canon_url, aged_priority, depth FROM ranked WHERE rn <= 3
"""

QUERIES["c_frontier_aging"] = (c_frontier_aging, C_FRONTIER_AGING_SQL)

# --------------------------------------------------------------------------
# Bandit host scheduling (operators/bandit.py): integer UCB1 scores over
# per-host (pulls, reward) stats synthesized from orders, plus one
# never-pulled host so the optimism sentinel path is non-vacuous. All
# arithmetic integer (div / decimal-digit log / floored IEEE sqrt) so
# the score table is value-exact across engines.


def c_bandit_ucb(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.bandit import ucb_host_scores

    stats = (
        _messy_urls(spark, sf)
        .groupBy(
            F.concat(
                F.lit("h"),
                (F.col("o_custkey") % 12).cast("string"),
                F.lit(".example.org"),
            ).alias("host")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("pulls"),
            F.sum(F.col("o_orderkey") % 1000).cast("long").alias("reward_milli_sum"),
        )
        .unionByName(
            spark.createDataFrame(
                [("h-new.example.org", 0, 0)],
                "host string, pulls long, reward_milli_sum long",
            )
        )
    )
    return ucb_host_scores(stats)


C_BANDIT_UCB_SQL = """
WITH stats AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         CAST(count(*) AS BIGINT) AS pulls,
         CAST(sum(o_orderkey % 1000) AS BIGINT) AS reward_milli_sum
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'h-new.example.org', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
),
tot AS (SELECT CAST(sum(pulls) AS BIGINT) AS t FROM stats),
scored AS (
  SELECT host, pulls,
         CAST(CASE WHEN pulls > 0 THEN reward_milli_sum // pulls
                   ELSE 0 END AS BIGINT) AS mean_milli,
         CAST(CASE WHEN pulls > 0 THEN
                (1414 * CAST(floor(sqrt(CAST(
                   (1000000 * (len(CAST(t AS VARCHAR)) - 1)) // pulls
                 AS DOUBLE))) AS BIGINT)) // 1000
              ELSE 10000000 END AS BIGINT) AS bonus_milli
  FROM stats, tot
)
SELECT host, pulls, mean_milli, bonus_milli,
       CAST(mean_milli + bonus_milli AS BIGINT) AS score_milli
FROM scored
"""

QUERIES["c_bandit_ucb"] = (c_bandit_ucb, C_BANDIT_UCB_SQL)

# --------------------------------------------------------------------------
# Charset sniffing (functions/encodings.py): synthesize byte payloads
# from documents — five BOM classes, two meta-declaration styles, one
# undeclared — and sniff. The DuckDB twin states the INTENDED semantics
# independently (BOM class by construction, meta by the same regexp on
# the pre-encoding string), so the byte-level detector is checked
# against ground truth, not against a re-implementation of itself.


def c_charset_sniff(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.encodings import sniff_charset

    d = t(spark, sf, "documents").select("doc_id", "text")
    k = (F.col("doc_id") % 8).cast("int")
    meta = (
        F.when(k == 5, F.lit('<META CHARSET="Windows-1252">'))
        .when(
            k == 6,
            F.lit(
                '<meta http-equiv="Content-Type" '
                'content="text/html; charset=iso-8859-1">'
            ),
        )
        .otherwise(F.lit(""))
    )
    head_html = F.concat(
        F.lit("<html><head>"), meta, F.lit("</head><body>"),
        F.substring("text", 1, 64),
    )
    bom = (
        F.when(k == 0, F.unhex(F.lit("EFBBBF")))
        .when(k == 1, F.unhex(F.lit("FFFE")))
        .when(k == 2, F.unhex(F.lit("FEFF")))
        .when(k == 3, F.unhex(F.lit("FFFE0000")))
        .when(k == 4, F.unhex(F.lit("0000FEFF")))
        .otherwise(F.unhex(F.lit("")))
    )
    payload = F.concat(bom, F.encode(head_html, "UTF-8"))
    return d.select(
        "doc_id", sniff_charset(payload).alias("charset")
    )


C_CHARSET_SNIFF_SQL = """
SELECT doc_id,
       CASE doc_id % 8
         WHEN 0 THEN 'utf-8'
         WHEN 1 THEN 'utf-16le'
         WHEN 2 THEN 'utf-16be'
         WHEN 3 THEN 'utf-32le'
         WHEN 4 THEN 'utf-32be'
         WHEN 5 THEN lower(regexp_extract(
           '<html><head><META CHARSET="Windows-1252"></head><body>'
             || substr(text, 1, 64),
           '(?i)charset\\s*=\\s*["'']?([A-Za-z0-9_-]+)', 1))
         WHEN 6 THEN lower(regexp_extract(
           '<html><head><meta http-equiv="Content-Type" '
             || 'content="text/html; charset=iso-8859-1"></head><body>'
             || substr(text, 1, 64),
           '(?i)charset\\s*=\\s*["'']?([A-Za-z0-9_-]+)', 1))
         ELSE 'utf-8'
       END AS charset
FROM documents
"""

QUERIES["c_charset_sniff"] = (c_charset_sniff, C_CHARSET_SNIFF_SQL)

# --------------------------------------------------------------------------
# MIME magic-byte sniffing (functions/encodings.py::sniff_mime):
# payloads synthesized from documents across 12 format classes; the
# DuckDB twin states the intended label BY CONSTRUCTION, so the
# byte-level detector is checked against ground truth.


def c_mime_sniff(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.encodings import sniff_mime

    d = t(spark, sf, "documents").select("doc_id", "text")
    k = (F.col("doc_id") % 12).cast("int")
    prefix = (
        F.when(k == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(k == 1, F.unhex(F.lit("FFD8FFE000104A46")))
        .when(k == 2, F.unhex(F.lit("474946383961")))
        .when(k == 3, F.unhex(F.lit("255044462D312E37")))
        .when(k == 4, F.unhex(F.lit("1F8B08")))
        .when(k == 5, F.unhex(F.lit("504B0304")))
        .when(k == 6, F.unhex(F.lit("524946461000000057454250")))
        .when(k == 7, F.unhex(F.lit("0000001866747970")))
        .when(k == 8, F.unhex(F.lit("494433")))
        .when(k == 9, F.encode(F.lit("<!DOCTYPE html><html>"), "UTF-8"))
        .when(k == 11, F.unhex(F.lit("000001BA")))
        .otherwise(F.unhex(F.lit("")))
    )
    payload = F.concat(prefix, F.encode(F.substring("text", 1, 64), "UTF-8"))
    return d.select("doc_id", sniff_mime(payload).alias("mime"))


C_MIME_SNIFF_SQL = """
SELECT doc_id,
       CASE doc_id % 12
         WHEN 0 THEN 'image/png'
         WHEN 1 THEN 'image/jpeg'
         WHEN 2 THEN 'image/gif'
         WHEN 3 THEN 'application/pdf'
         WHEN 4 THEN 'application/gzip'
         WHEN 5 THEN 'application/zip'
         WHEN 6 THEN 'image/webp'
         WHEN 7 THEN 'video/mp4'
         WHEN 8 THEN 'audio/mpeg'
         WHEN 9 THEN 'text/html'
         WHEN 11 THEN 'video/mpeg'
         ELSE 'application/octet-stream'
       END AS mime
FROM documents
"""

QUERIES["c_mime_sniff"] = (c_mime_sniff, C_MIME_SNIFF_SQL)

# --------------------------------------------------------------------------
# Bandit-driven budget allocation: UCB1 scores (operators/bandit.py)
# feed the largest-remainder apportionment (operators/apportion.py) —
# the composition a production scheduler runs each batch to split the
# global politeness budget across hosts by explore/exploit value. The
# untried host's optimism sentinel visibly dominates the allocation
# (the probe-first behavior), while explored hosts split the rest by
# exact integer shares.

_BB_BUDGET = 200


def c_bandit_budget(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.apportion import apportion_budget
    from who_focus_crawler_spark.operators.bandit import ucb_host_scores

    stats = (
        _messy_urls(spark, sf)
        .groupBy(
            F.concat(
                F.lit("h"),
                (F.col("o_custkey") % 12).cast("string"),
                F.lit(".example.org"),
            ).alias("host")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("pulls"),
            F.sum(F.col("o_orderkey") % 1000).cast("long").alias("reward_milli_sum"),
        )
        .unionByName(
            spark.createDataFrame(
                [("h-new.example.org", 0, 0)],
                "host string, pulls long, reward_milli_sum long",
            )
        )
    )
    weights = ucb_host_scores(stats).select(
        "host", F.col("score_milli").alias("weight")
    )
    return apportion_budget(weights, _BB_BUDGET)


C_BANDIT_BUDGET_SQL = f"""
WITH stats AS (
  SELECT concat('h', CAST(o_custkey % 12 AS VARCHAR), '.example.org') AS host,
         CAST(count(*) AS BIGINT) AS pulls,
         CAST(sum(o_orderkey % 1000) AS BIGINT) AS reward_milli_sum
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'h-new.example.org', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
),
tot AS (SELECT CAST(sum(pulls) AS BIGINT) AS t FROM stats),
w AS (
  SELECT host,
         CAST(CASE WHEN pulls > 0 THEN reward_milli_sum // pulls
                   ELSE 0 END AS BIGINT)
         + CAST(CASE WHEN pulls > 0 THEN
                  (1414 * CAST(floor(sqrt(CAST(
                     (1000000 * (len(CAST(t AS VARCHAR)) - 1)) // pulls
                   AS DOUBLE))) AS BIGINT)) // 1000
                ELSE 10000000 END AS BIGINT) AS weight
  FROM stats, tot
),
wt AS (SELECT sum(weight) AS tw FROM w),
b AS (
  SELECT host, weight,
         (weight * {_BB_BUDGET}) // tw AS base,
         (weight * {_BB_BUDGET}) % tw AS rem
  FROM w, wt
),
r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk FROM b
),
lo AS (SELECT {_BB_BUDGET} - sum(base) AS leftover FROM b)
SELECT host, weight,
       CAST(base + CASE WHEN rk <= leftover AND rem > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS budget
FROM r, lo
"""

QUERIES["c_bandit_budget"] = (c_bandit_budget, C_BANDIT_BUDGET_SQL)

# --------------------------------------------------------------------------
# CDX capture index (sources/warc.py::cdx_index): SURT keys (reversed
# host labels, scheme/port/www stripped) + 14-digit timestamps +
# payload digests over a synthesized WARC record table — messy URI
# forms (mixed case, www labels, ports, queries) exercise every SURT
# rule; value-exact vs the identical transform in DuckDB.


def c_warc_cdx(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.sources.warc import cdx_index

    o = t(spark, sf, "orders")
    k = F.col("o_orderkey")
    records = o.select(
        F.concat(
            F.when(k % 3 == 0, F.lit("HTTP://WWW.")).otherwise(F.lit("http://")),
            F.lit("H"), (F.col("o_custkey") % 9).cast("string"),
            F.lit(".Example.org"),
            F.when(k % 4 == 0, F.lit(":8080")).otherwise(F.lit("")),
            F.lit("/p/"), k.cast("string"),
            F.when(k % 5 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        ).alias("target_uri"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
        F.concat(F.lit("<urn:rec:"), k.cast("string"), F.lit(">")).alias("record_id"),
        F.col("o_totalprice").cast("long").alias("content_length"),
        F.encode(F.concat(F.lit("body of "), k.cast("string")), "UTF-8").alias(
            "payload"
        ),
        F.concat(F.lit("part-"), (k % 7).cast("string")).alias("warc_file"),
    )
    return cdx_index(records)


C_WARC_CDX_SQL = """
WITH records AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'HTTP://WWW.' ELSE 'http://' END
           || 'H' || CAST(o_custkey % 9 AS VARCHAR) || '.Example.org'
           || CASE WHEN o_orderkey % 4 = 0 THEN ':8080' ELSE '' END
           || '/p/' || CAST(o_orderkey AS VARCHAR)
           || CASE WHEN o_orderkey % 5 = 0 THEN '?b=2&a=1' ELSE '' END
           AS target_uri,
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
         '<urn:rec:' || CAST(o_orderkey AS VARCHAR) || '>' AS record_id,
         CAST(floor(o_totalprice) AS BIGINT) AS content_length,
         'body of ' || CAST(o_orderkey AS VARCHAR) AS payload_s,
         'part-' || CAST(o_orderkey % 7 AS VARCHAR) AS warc_file
  FROM orders
), parts AS (
  SELECT *,
         split_part(lower(target_uri), '://', 2) AS rest
  FROM records
), keyed AS (
  SELECT *,
         regexp_replace(split_part(split_part(rest, '/', 1), ':', 1),
                        '^www[0-9]*\\.', '') AS host,
         CASE WHEN strpos(rest, '/') > 0
              THEN substr(rest, strpos(rest, '/')) ELSE '/' END AS path
  FROM parts
)
SELECT array_to_string(list_reverse(string_split(host, '.')), ',') || ')' || path
         AS surt,
       substr(regexp_replace(warc_date, '[^0-9]', '', 'g'), 1, 14) AS ts14,
       target_uri AS uri,
       md5(payload_s) AS digest,
       content_length AS length,
       warc_file,
       CAST(row_number() OVER (PARTITION BY warc_file
                               ORDER BY warc_date, record_id) AS BIGINT)
         AS seq_in_file
FROM keyed
"""

QUERIES["c_warc_cdx"] = (c_warc_cdx, C_WARC_CDX_SQL)

# --------------------------------------------------------------------------
# RFC 9309 robots.txt TEXT parsing (operators/robots_txt.py): five
# per-host document classes (basic group + global sitemap, specific-
# beats-star selection, multi-UA group, no-matching-group, junk
# tolerance) synthesized deterministically; the DuckDB twin replays the
# identical line algebra (comment strip, field split, group running
# sum, longest-match group election).


def c_robots_parse(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.robots_txt import parse_robots_txt

    hosts = (
        t(spark, sf, "orders")
        .select((F.col("o_custkey") % 20).cast("long").alias("hid"))
        .distinct()
    )
    host = F.concat(F.lit("h"), F.col("hid").cast("string"), F.lit(".example.test"))
    nl = "\n"
    k = F.col("hid") % 5
    txt = (
        F.when(
            k == 0,
            F.concat(
                F.lit(
                    "# robots" + nl + "User-Agent: *" + nl
                    + "Disallow: /private/" + nl + "Allow: /private/p/0" + nl
                    + "Crawl-delay: 3" + nl + "Sitemap: http://"
                ),
                host,
                F.lit("/sitemap.xml"),
            ),
        )
        .when(
            k == 1,
            F.lit(
                "User-agent: googlebot" + nl + "Disallow: /" + nl
                + "User-agent: wfc" + nl + "Disallow: /only-wfc/" + nl
                + "Crawl-delay: 7" + nl + "User-agent: *" + nl
                + "Disallow: /everyone/"
            ),
        )
        .when(
            k == 2,
            F.lit(
                "User-agent: alpha" + nl + "User-agent: wfc-bot" + nl
                + "Disallow: /shared/"
            ),
        )
        .when(
            k == 3,
            F.concat(
                F.lit(
                    "User-agent: googlebot" + nl + "Disallow: /" + nl
                    + "Sitemap: http://"
                ),
                host,
                F.lit("/map.xml"),
            ),
        )
        .otherwise(
            F.lit(
                "Disallow: /ignored/" + nl + "User-agent: *   # c" + nl
                + "Disallow:" + nl + "Disallow: /real/ # c2" + nl
                + "X-Unknown: y" + nl + "Crawl-delay: fast"
            )
        )
    )
    robots = hosts.select(host.alias("host"), txt.alias("robots_txt"))
    return parse_robots_txt(robots, agent="wfc-bot").select(
        "host", "directive", "allow", "value", F.col("line_no").cast("long").alias("line_no")
    )


C_ROBOTS_PARSE_SQL = """
WITH hosts AS (SELECT DISTINCT CAST(o_custkey % 20 AS BIGINT) AS hid FROM orders),
robots AS (
  SELECT 'h' || CAST(hid AS VARCHAR) || '.example.test' AS host,
    CASE hid % 5
      WHEN 0 THEN '# robots' || chr(10) || 'User-Agent: *' || chr(10)
        || 'Disallow: /private/' || chr(10) || 'Allow: /private/p/0' || chr(10)
        || 'Crawl-delay: 3' || chr(10)
        || 'Sitemap: http://h' || CAST(hid AS VARCHAR) || '.example.test/sitemap.xml'
      WHEN 1 THEN 'User-agent: googlebot' || chr(10) || 'Disallow: /' || chr(10)
        || 'User-agent: wfc' || chr(10) || 'Disallow: /only-wfc/' || chr(10)
        || 'Crawl-delay: 7' || chr(10) || 'User-agent: *' || chr(10)
        || 'Disallow: /everyone/'
      WHEN 2 THEN 'User-agent: alpha' || chr(10) || 'User-agent: wfc-bot'
        || chr(10) || 'Disallow: /shared/'
      WHEN 3 THEN 'User-agent: googlebot' || chr(10) || 'Disallow: /' || chr(10)
        || 'Sitemap: http://h' || CAST(hid AS VARCHAR) || '.example.test/map.xml'
      ELSE 'Disallow: /ignored/' || chr(10) || 'User-agent: *   # c' || chr(10)
        || 'Disallow:' || chr(10) || 'Disallow: /real/ # c2' || chr(10)
        || 'X-Unknown: y' || chr(10) || 'Crawl-delay: fast'
    END AS robots_txt
  FROM hosts
),
lines AS (
  SELECT host, u.line_no AS line_no, u.raw AS raw FROM (
    SELECT host,
           unnest(list_transform(
             generate_series(1, len(string_split(robots_txt, chr(10)))), i ->
               struct_pack(line_no := CAST(i - 1 AS BIGINT),
                           raw := string_split(robots_txt, chr(10))[i]))) AS u
    FROM robots)
),
clean AS (
  SELECT host, line_no, trim(split_part(raw, '#', 1)) AS ln
  FROM lines WHERE trim(split_part(raw, '#', 1)) <> ''
),
parsed AS (
  SELECT host, line_no,
         lower(trim(split_part(ln, ':', 1))) AS field,
         CASE WHEN strpos(ln, ':') > 0
              THEN trim(substr(ln, strpos(ln, ':') + 1)) END AS value
  FROM clean
  WHERE lower(trim(split_part(ln, ':', 1)))
          IN ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')
    AND (CASE WHEN strpos(ln, ':') > 0
              THEN trim(substr(ln, strpos(ln, ':') + 1)) END) IS NOT NULL
),
flags AS (
  SELECT *, CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS ua FROM parsed
),
grp0 AS (
  SELECT *, CASE WHEN ua = 1 AND coalesce(
              lag(ua) OVER (PARTITION BY host ORDER BY line_no), 0) = 0
            THEN 1 ELSE 0 END AS ng
  FROM flags
),
grouped AS (
  SELECT *, sum(ng) OVER (PARTITION BY host ORDER BY line_no
                          ROWS UNBOUNDED PRECEDING) AS grp
  FROM grp0
),
gsel AS (SELECT * FROM grouped WHERE grp > 0),
uas AS (SELECT host, grp, lower(value) AS ua_v FROM gsel WHERE field = 'user-agent'),
matching AS (
  SELECT host, grp,
         CASE WHEN ua_v = '*' THEN 0 ELSE len(ua_v) END AS match_len
  FROM uas WHERE ua_v = '*' OR starts_with('wfc-bot', ua_v)
),
best AS (
  SELECT host, grp FROM (
    SELECT host, grp,
           row_number() OVER (PARTITION BY host
                              ORDER BY match_len DESC, grp ASC) AS rn
    FROM matching) WHERE rn = 1
),
chosen AS (
  SELECT g.* FROM gsel g JOIN best b ON g.host = b.host AND g.grp = b.grp
  WHERE g.field <> 'user-agent'
)
SELECT host, 'rule' AS directive, field = 'allow' AS allow, value, line_no
FROM chosen WHERE field IN ('allow', 'disallow') AND value <> ''
UNION ALL
SELECT host, 'crawl_delay', CAST(NULL AS BOOLEAN), value, line_no
FROM chosen WHERE field = 'crawl-delay' AND regexp_matches(value, '^[0-9]+$')
UNION ALL
SELECT host, 'sitemap', CAST(NULL AS BOOLEAN), value, line_no
FROM parsed WHERE field = 'sitemap'
"""

QUERIES["c_robots_parse"] = (c_robots_parse, C_ROBOTS_PARSE_SQL)

# --------------------------------------------------------------------------
# IDN host normalization (functions/urls.py::idn_to_ascii): planted
# internationalized hostnames across six scripts plus ASCII fast-path
# classes; the oracle states the IDNA ToASCII ground truth by
# construction (computed with the frozen codec spec at authoring time).

_IDN_CASES = [
    ("münchen.example", "xn--mnchen-3ya.example"),
    ("BÜCHER.De", "xn--bcher-kva.de"),
    ("中文.example", "xn--fiq228c.example"),
    ("пример.испытание", "xn--e1afmkfd.xn--80akhbyknj4f"),
    ("café.fr", "xn--caf-dma.fr"),
    ("ёлка.рф", "xn--80atc1g.xn--p1ai"),
    ("Plain.Example.org", "plain.example.org"),
    ("h9.example.test", "h9.example.test"),
]


def c_idn_hosts(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.urls import idn_to_ascii

    d = t(spark, sf, "documents").select("doc_id")
    k = (F.col("doc_id") % len(_IDN_CASES)).cast("int")
    host = F.lit(_IDN_CASES[0][0])
    for i in range(1, len(_IDN_CASES)):
        host = F.when(k == i, F.lit(_IDN_CASES[i][0])).otherwise(host)
    return d.select("doc_id", idn_to_ascii(host).alias("ascii_host"))


_IDN_WHENS = "\n".join(
    f"         WHEN {i} THEN '{a}'" for i, (_, a) in enumerate(_IDN_CASES)
)
C_IDN_HOSTS_SQL = f"""
SELECT doc_id,
       CASE doc_id % {len(_IDN_CASES)}
{_IDN_WHENS}
       END AS ascii_host
FROM documents
"""

QUERIES["c_idn_hosts"] = (c_idn_hosts, C_IDN_HOSTS_SQL)

# --------------------------------------------------------------------------
# Sitemap INDEX resolution (operators/sitemap.py::parse_sitemaps_with_
# index): even hosts publish a 2-child <sitemapindex> (plus one dangling
# child that fetches nothing), odd hosts a plain <urlset>; either way
# the resolved entry set is identical, so the oracle states it directly
# from orders — the indirection must be value-invisible.


def c_sitemap_index(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.sitemap import (
        parse_sitemaps_with_index,
    )

    o = t(spark, sf, "orders")
    hid = (F.col("o_custkey") % 8).cast("int")
    host = F.concat(F.lit("h"), hid.cast("string"), F.lit(".example.org"))
    loc = F.concat(
        F.lit("http://"), host, F.lit("/s/"), F.col("o_orderkey").cast("string")
    )
    prio_tag = F.when(
        F.col("o_orderkey") % 4 != 0,
        F.concat(
            F.lit("<priority>"),
            F.format_string(
                "%.1f", ((F.col("o_orderkey") % 9) + 1).cast("double") / 10.0
            ),
            F.lit("</priority>"),
        ),
    ).otherwise(F.lit(""))
    entry = F.concat(
        F.lit("<url><loc>"), loc, F.lit("</loc>"), prio_tag, F.lit("</url>")
    )
    rows = o.select(
        host.alias("host"),
        hid.alias("hid"),
        (F.col("o_orderkey") % 2).cast("int").alias("part"),
        entry.alias("e"),
    )
    urlset = lambda col: F.concat(  # noqa: E731
        F.lit("<urlset>"), F.array_join(F.array_sort(F.collect_list(col)), ""),
        F.lit("</urlset>"),
    )
    plain_tops = (
        rows.filter(F.col("hid") % 2 == 1)
        .groupBy("host")
        .agg(urlset("e").alias("sitemap_xml"))
    )
    index_tops = (
        rows.filter(F.col("hid") % 2 == 0)
        .select("host")
        .distinct()
        .select(
            "host",
            F.concat(
                F.lit("<sitemapindex>"),
                F.lit("<sitemap><loc>http://"), F.col("host"),
                F.lit("/maps/part-0.xml</loc></sitemap>"),
                F.lit("<sitemap><loc>http://"), F.col("host"),
                F.lit("/maps/part-1.xml</loc></sitemap>"),
                F.lit("<sitemap><loc>http://"), F.col("host"),
                F.lit("/maps/missing.xml</loc></sitemap>"),
                F.lit("</sitemapindex>"),
            ).alias("sitemap_xml"),
        )
    )
    children = (
        rows.filter(F.col("hid") % 2 == 0)
        .groupBy("host", "part")
        .agg(urlset("e").alias("xml"))
        .select(
            F.concat(
                F.lit("http://"), F.col("host"), F.lit("/maps/part-"),
                F.col("part").cast("string"), F.lit(".xml"),
            ).alias("loc"),
            "xml",
        )
    )
    return parse_sitemaps_with_index(
        plain_tops.unionByName(index_tops), children
    )


C_SITEMAP_INDEX_SQL = C_SITEMAP_PARSE_SQL

QUERIES["c_sitemap_index"] = (c_sitemap_index, C_SITEMAP_INDEX_SQL)

# --------------------------------------------------------------------------
# Charset precedence with the transport header (functions/encodings.py::
# sniff_charset_with_header): WHATWG order BOM > header > meta > utf-8,
# planted per doc class incl. a BOM-beats-lying-header case; oracle by
# construction.


def c_charset_header(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.functions.encodings import (
        sniff_charset_with_header,
    )

    d = t(spark, sf, "documents").select("doc_id")
    k = (F.col("doc_id") % 5).cast("int")
    payload = (
        F.when(k == 0, F.concat(F.unhex(F.lit("EFBBBF")),
                                F.encode(F.lit('<meta charset="koi8-r">'), "UTF-8")))
        .when(k == 1, F.encode(F.lit('<meta charset="koi8-r">'), "UTF-8"))
        .when(k == 2, F.encode(F.lit('<meta charset="koi8-r">'), "UTF-8"))
        .otherwise(F.encode(F.lit("plain body"), "UTF-8"))
    )
    header = (
        F.when(k == 0, F.lit("text/html; charset=latin-2"))
        .when(k == 1, F.lit("text/html; charset=ISO-8859-1"))
        .when(k == 3, F.lit('application/json;charset="UTF-16le"'))
        .otherwise(F.lit(None).cast("string"))
    )
    return d.select(
        "doc_id", sniff_charset_with_header(payload, header).alias("charset")
    )


C_CHARSET_HEADER_SQL = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'utf-8'        -- BOM beats the lying header
         WHEN 1 THEN 'iso-8859-1'   -- header beats meta
         WHEN 2 THEN 'koi8-r'       -- meta fallback (no header)
         WHEN 3 THEN 'utf-16le'     -- quoted header param
         ELSE 'utf-8'               -- nothing declared
       END AS charset
FROM documents
"""

QUERIES["c_charset_header"] = (c_charset_header, C_CHARSET_HEADER_SQL)
