"""Layer-R relational queries (SURVEY.md §2.2) with DuckDB oracle SQL.

Every query is declarative DataFrame API — Catalyst handles pushdown,
pruning, join strategy; the bench asserts the plans stay JVM-side
(WholeStageCodegen, PushedFilters). Aggregated doubles are rounded
identically on both sides so the driver's value-hash comparison is
stable across engines (SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.harness.util import t

# --------------------------------------------------------------------------
# R1/R6/R7 — scan + projection + filter (pushdown-able)


def r_scan_project(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
        )
    )


R_SCAN_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue
FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
"""


def r_filter_in_like(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_totalprice").between(1000, 200000)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


R_FILTER_IN_LIKE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O','F') AND o_orderpriority LIKE '%URGENT%'
  AND o_totalprice BETWEEN 1000 AND 200000
"""

# --------------------------------------------------------------------------
# R8 — broadcast join


def r_join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    nation, region = t(spark, sf, "nation"), t(spark, sf, "region")
    cust = t(spark, sf, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


R_JOIN_BROADCAST_SQL = """
SELECT r_name, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# --------------------------------------------------------------------------
# R9 — shuffle (sort-merge) join on the two big tables


def r_join_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    orders, li = t(spark, sf, "orders"), t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


R_JOIN_SHUFFLE_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

# --------------------------------------------------------------------------
# R10 — left outer join


def r_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    cust, orders = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


R_JOIN_OUTER_SQL = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""

# --------------------------------------------------------------------------
# R11 / R12 — semi & anti joins


def r_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    part, li = t(spark, sf, "part"), t(spark, sf, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_brand", "p_retailprice")
    )


R_JOIN_SEMI_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


def r_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    # anti-join against big orders only — at small SF every customer has
    # SOME order, so the unfiltered anti-join was a vacuous 0-row pass
    # (VERDICT r1); customers without a >300k order are plentiful
    cust, orders = t(spark, sf, "customer"), t(spark, sf, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


R_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
"""

# --------------------------------------------------------------------------
# R13 — range (theta) join: events of the same user within a 1-hour band


def r_join_range(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs_1h"))
    )


R_JOIN_RANGE_SQL = """
SELECT a.user_id AS user_id, count(*) AS n_pairs_1h
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.user_id
"""

# --------------------------------------------------------------------------
# R14 — as-of join: latest event at or before each order date (user=custkey)
# Spark has no native as-of join: windowed union trick (SURVEY.md §2.2 R14);
# DuckDB oracles it with a native ASOF JOIN.


def r_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    # Probe timestamps are synthesized INSIDE the events range (Jan 2024,
    # one distinct second per order) and user_id folded onto the events'
    # 150-user domain, so the as-of semantics are exercised on thousands
    # of real matches (the r1 seeding compared 1995-2001 order dates to
    # 2024 events — 0 rows, vacuous; VERDICT r1).
    orders = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 150).alias("user_id"),
        F.col("o_orderkey"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 2592000)"
        ).alias("ts"),
    )
    ev = t(spark, sf, "events").select(
        "user_id", F.col("ts"), F.col("event_id"), F.col("value")
    )
    from who_focus_crawler_spark.operators.asof import asof_join

    return asof_join(
        orders, ev, on="ts", by="user_id",
        value_cols=["event_id", "value"], tie_col="event_id",
    ).select(
        "o_orderkey",
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
    )


# DuckDB ASOF JOIN picks the row with the greatest ts <= order ts, but its
# tie-break among equal-ts events is unspecified — emulate the Spark
# choice (max event_id among max-ts events) explicitly with a window.
R_JOIN_ASOF_SQL = """
WITH probes AS (
  SELECT o_orderkey, o_custkey % 150 AS user_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + (o_orderkey % 2592000) * INTERVAL 1 SECOND AS ts
  FROM orders
), ranked AS (
  SELECT o.o_orderkey, o.user_id, e.event_id, e.value,
         row_number() OVER (
           PARTITION BY o.o_orderkey ORDER BY e.ts DESC, e.event_id DESC
         ) AS rn
  FROM probes o JOIN events e
    ON e.user_id = o.user_id AND e.ts <= o.ts
)
SELECT o_orderkey, user_id, event_id, round(value, 2) AS value
FROM ranked WHERE rn = 1
"""

# --------------------------------------------------------------------------
# R16 — TPC-H Q1-style aggregate


def r_agg_q1(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


R_AGG_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# R17 — distinct / count-distinct


def r_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


R_AGG_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def r_agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL, default rsd 5%) — approximate by
    design, made VALUE-EXACT by checking the estimate against its error
    bound: the query returns the exact count plus a boolean
    |approx − exact| / exact ≤ ε (ε = 0.15 = 3× the default rsd); the
    DuckDB twin computes the same exact count and asserts TRUE, so an
    out-of-bound sketch surfaces as a value mismatch instead of an
    unchecked rows-only row."""
    eps = 0.15
    agg = t(spark, sf, "events").agg(
        F.approx_count_distinct("user_id").alias("_approx"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(eps) * F.col("exact_users")
        ).alias("within_eps"),
    )


R_AGG_APPROX_DISTINCT_SQL = """
SELECT count(DISTINCT user_id) AS exact_users, TRUE AS within_eps
FROM events
"""


# --------------------------------------------------------------------------
# R18 — rollup


def r_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


R_AGG_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

# --------------------------------------------------------------------------
# R16 ext — statistical aggregates


def r_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


R_AGG_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""

# --------------------------------------------------------------------------
# R21 — ranking window: top-3 orders per customer


def r_win_topk(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


R_WIN_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) WHERE rk <= 3
"""

# --------------------------------------------------------------------------
# R22 — lag: inter-event gap per user


def r_win_lag(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
            .cast("long")
            .alias("gap_s"),
        )
    )


R_WIN_LAG_SQL = """
SELECT user_id, event_id,
       CAST(floor(epoch(ts)) - floor(epoch(prev_ts)) AS BIGINT) AS gap_s
FROM (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
) WHERE prev_ts IS NOT NULL
"""

# --------------------------------------------------------------------------
# R23 — frame-spec running sum


def r_win_running(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


R_WIN_RUNNING_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_value
FROM events
"""

# --------------------------------------------------------------------------
# R24/R26 — global sort + limit (TakeOrderedAndProject)


def r_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)
    )


R_SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
"""

# --------------------------------------------------------------------------
# R27 — set ops: BUILDING-segment customers minus those with an open order


def r_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_open = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return building.exceptAll(with_open).distinct()


R_SET_OPS_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""

# --------------------------------------------------------------------------
# R28 — string function family


def r_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "part").select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.size(F.split(F.col("p_type"), " ")).cast("long").alias("type_words"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).cast("long").alias(
            "brand_lev"
        ),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
    )


R_STRING_FUNCS_SQL = """
SELECT p_partkey, lower(p_name) AS name_lower,
       substring(p_type, 1, 5) AS type_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(len(string_split(p_type, ' ')) AS BIGINT) AS type_words,
       CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS brand_lev,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""

# --------------------------------------------------------------------------
# R30 — date/time family (date_trunc normalized to DATE on both engines)


def r_datetime(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


R_DATETIME_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# R35 — JSON extraction from events.props


def r_json(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )


R_JSON_SQL = """
SELECT event_type,
       round(avg(k), 4) AS avg_k, max(k) AS max_k, count(k) AS n_with_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) GROUP BY event_type
"""

# --------------------------------------------------------------------------
# R31/R32 — math + hash families (md5 is the engine-portable hash)


def r_hash_math(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))).alias(
            "row_md5"
        ),
        F.pmod(F.col("l_orderkey"), F.lit(97)).cast("long").alias("key_mod"),
        F.floor(F.col("l_extendedprice") / 100).cast("long").alias("price_bucket"),
        F.round(F.log2(F.col("l_quantity") + 1), 4).alias("log_qty"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
    )


R_HASH_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       md5(concat_ws('|', l_orderkey, l_linenumber)) AS row_md5,
       CAST(mod(l_orderkey, 97) AS BIGINT) AS key_mod,
       CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_bucket,
       round(log2(l_quantity + 1), 4) AS log_qty,
       round(pow(l_discount, 2), 6) AS disc_sq
FROM lineitem
"""

QUERIES = {
    "r_scan_project": (r_scan_project, R_SCAN_PROJECT_SQL),
    "r_filter_in_like": (r_filter_in_like, R_FILTER_IN_LIKE_SQL),
    "r_join_broadcast": (r_join_broadcast, R_JOIN_BROADCAST_SQL),
    "r_join_shuffle": (r_join_shuffle, R_JOIN_SHUFFLE_SQL),
    "r_join_outer": (r_join_outer, R_JOIN_OUTER_SQL),
    "r_join_semi": (r_join_semi, R_JOIN_SEMI_SQL),
    "r_join_anti": (r_join_anti, R_JOIN_ANTI_SQL),
    "r_join_range": (r_join_range, R_JOIN_RANGE_SQL),
    "r_join_asof": (r_join_asof, R_JOIN_ASOF_SQL),
    "r_agg_q1": (r_agg_q1, R_AGG_Q1_SQL),
    "r_agg_distinct": (r_agg_distinct, R_AGG_DISTINCT_SQL),
    "r_agg_approx_distinct": (r_agg_approx_distinct, R_AGG_APPROX_DISTINCT_SQL),
    "r_agg_rollup": (r_agg_rollup, R_AGG_ROLLUP_SQL),
    "r_agg_stats": (r_agg_stats, R_AGG_STATS_SQL),
    "r_win_topk": (r_win_topk, R_WIN_TOPK_SQL),
    "r_win_lag": (r_win_lag, R_WIN_LAG_SQL),
    "r_win_running": (r_win_running, R_WIN_RUNNING_SQL),
    "r_sort_limit": (r_sort_limit, R_SORT_LIMIT_SQL),
    "r_set_ops": (r_set_ops, R_SET_OPS_SQL),
    "r_string_funcs": (r_string_funcs, R_STRING_FUNCS_SQL),
    "r_datetime": (r_datetime, R_DATETIME_SQL),
    "r_json": (r_json, R_JSON_SQL),
    "r_hash_math": (r_hash_math, R_HASH_MATH_SQL),
}

# --------------------------------------------------------------------------
# R15 — cross join (small dims only)


def r_join_cross(spark: SparkSession, sf: str) -> DataFrame:
    region, nation = t(spark, sf, "region"), t(spark, sf, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("same_region"))
    )


R_JOIN_CROSS_SQL = """
SELECT r_name, n_name, r_regionkey = n_regionkey AS same_region
FROM region CROSS JOIN nation
"""

# --------------------------------------------------------------------------
# R18 — cube (rollup's sibling: all grouping-set combinations)


def r_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


R_AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# --------------------------------------------------------------------------
# R19 — sketch aggregates (HLL / count-min are approximate by design;
# value-checked via an error-bound boolean, same trick as R17's
# approx_count_distinct: Spark computes |approx − exact|/exact ≤ ε,
# the twin asserts TRUE)


def r_agg_sketch(spark: SparkSession, sf: str) -> DataFrame:
    eps = 0.05  # default lgConfigK=12 ⇒ rsd ≈ 1.6%; ε = 3× that
    ev = t(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return per_type.select(
        "event_type",
        "exact_users",
        (
            F.abs(
                F.hll_sketch_estimate("sketch") - F.col("exact_users")
            )
            <= F.lit(eps) * F.col("exact_users")
        ).alias("within_eps"),
    )


R_AGG_SKETCH_SQL = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS within_eps
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# R20 — grouped-aggregate pandas UDAF (Arrow-batched; rows-only oracle —
# float sum order differs engine-to-engine)


def r_udaf_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """R20 grouped-agg pandas UDAF — numerics-aware so the oracle is
    VALUE-EXACT (the r1 float-order formulation was rows-only): the UDAF
    accumulates quantity-weighted revenue in integer cents (np.rint of
    2-dp prices — exact int64, order-independent sum, ≤ 3·10^13 « 2^53),
    and only the final /100 returns to double, which both engines round
    identically."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` turns the
    # signature into strings, so the Series->float inference can't run
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def revenue_cents(qty, price):
        cents = np.rint(price.to_numpy() * 100.0).astype("int64")
        q = qty.to_numpy().astype("int64")
        return float((cents * q).sum())

    # a GROUPED_AGG UDF cannot mix with JVM aggregates in one agg() —
    # the companion sum is a second pandas UDAF
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def qty_sum(qty):
        return int(qty.to_numpy().astype("int64").sum())

    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                revenue_cents(F.col("l_quantity"), F.col("l_extendedprice"))
                / 100.0,
                2,
            ).alias("weighted_revenue"),
            qty_sum(F.col("l_quantity")).alias("total_qty"),
        )
    )


R_UDAF_GROUPED_SQL = """
SELECT l_returnflag,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) / 100.0, 2)
         AS weighted_revenue,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R25 — partition-local sort (sortWithinPartitions); the driver compare is
# order-insensitive, so the oracle is the plain projection — the query's
# point is that the physical plan sorts within partitions without a
# global exchange (asserted in tests/unit/test_plans.py)


def r_sort_within(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


R_SORT_WITHIN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
"""

# --------------------------------------------------------------------------
# R27 — intersect


def r_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    cust, orders = t(spark, sf, "customer"), t(spark, sf, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = orders.filter(F.col("o_orderpriority").like("%URGENT%")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(urgent)


R_SET_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '%URGENT%'
"""

# --------------------------------------------------------------------------
# R34 — map/struct ops (map built from JSON props; values re-extracted)


def r_map_struct(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    s = F.struct(F.col("event_id").alias("id"), F.col("value").alias("v"))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.map_keys(m)[0].alias("first_key"),
        s.getField("v").alias("s_value"),
    )


R_MAP_STRUCT_SQL = """
SELECT event_id, event_type AS m_type, CAST(user_id AS VARCHAR) AS m_uid,
       'type' AS first_key, value AS s_value
FROM events
"""

QUERIES.update(
    {
        "r_join_cross": (r_join_cross, R_JOIN_CROSS_SQL),
        "r_agg_cube": (r_agg_cube, R_AGG_CUBE_SQL),
        "r_agg_sketch": (r_agg_sketch, R_AGG_SKETCH_SQL),
        "r_udaf_grouped": (r_udaf_grouped, R_UDAF_GROUPED_SQL),
        "r_sort_within": (r_sort_within, R_SORT_WITHIN_SQL),
        "r_set_intersect": (r_set_intersect, R_SET_INTERSECT_SQL),
        "r_map_struct": (r_map_struct, R_MAP_STRUCT_SQL),
    }
)

# --------------------------------------------------------------------------
# Exact quantiles (order statistics as a first-class aggregate — Spark
# `percentile` is the exact sort-based aggregate, matched against
# DuckDB's quantile_cont; both use the standard (n-1)p interpolation)


def r_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("qty_p50"),
            F.percentile("l_quantity", 0.9).alias("qty_p90"),
            F.percentile("l_extendedprice", 0.25).alias("price_p25"),
            F.percentile("l_extendedprice", 0.99).alias("price_p99"),
        )
    )


R_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5)       AS qty_p50,
       quantile_cont(l_quantity, 0.9)       AS qty_p90,
       quantile_cont(l_extendedprice, 0.25) AS price_p25,
       quantile_cont(l_extendedprice, 0.99) AS price_p99
FROM lineitem GROUP BY l_returnflag
"""

# --------------------------------------------------------------------------
# Histogram — fixed-width bucketing as a groupBy over a floor-division
# bucket id (the engine-portable form of width_bucket; DuckDB has no
# width_bucket). Bounds are plan-side literals; one partial+final agg.

_H_LO, _H_HI, _H_N = 900.0, 105000.0, 16


def r_histogram(spark: SparkSession, sf: str) -> DataFrame:
    x = F.col("l_extendedprice")
    width = (_H_HI - _H_LO) / _H_N
    bucket = F.least(
        F.greatest(F.floor((x - F.lit(_H_LO)) / F.lit(width)), F.lit(0)),
        F.lit(_H_N - 1),
    ).cast("int")
    return (
        t(spark, sf, "lineitem")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


R_HISTOGRAM_SQL = f"""
SELECT CAST(least(greatest(floor((l_extendedprice - {_H_LO}) /
                 {(_H_HI - _H_LO) / _H_N}), 0), {_H_N - 1}) AS INT) AS bucket,
       count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY 1
"""

# --------------------------------------------------------------------------
# Pivot — long-to-wide aggregation with an explicit value list (the
# explicit list keeps the plan a single partial+final agg, no extra
# distinct-values job); oracle is the canonical CASE-sum form.


def r_pivot(spark: SparkSession, sf: str) -> DataFrame:
    out = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.coalesce("F", F.lit(0.0)).alias("qty_f"),
        F.coalesce("O", F.lit(0.0)).alias("qty_o"),
    )


R_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0)
         AS DOUBLE) AS qty_f,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0)
         AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""

QUERIES.update(
    {
        "r_quantiles": (r_quantiles, R_QUANTILES_SQL),
        "r_histogram": (r_histogram, R_HISTOGRAM_SQL),
        "r_pivot": (r_pivot, R_PIVOT_SQL),
    }
)

# --------------------------------------------------------------------------
# MERGE INTO / upsert (operators/merge.py): update matched rows'
# c_acctbal only (name/segment preserved), insert unmatched source rows
# whole. Oracle derives the same relation as matched ∪ target-only ∪
# source-only — an independent three-way decomposition of the single
# full-outer-join plan the operator builds.


def r_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.merge import merge_upsert

    c = t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    updates = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("upd_"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPD").alias("c_mktsegment"),
    )
    # strictly-negative keys (custkeys start at 0) can never collide
    # with real custkeys at ANY scale factor (a fixed +offset would
    # collide once max(custkey) crosses it)
    inserts = c.filter(F.col("c_custkey") % 7 == 0).select(
        (-(F.col("c_custkey") + 1)).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    source = updates.unionByName(inserts)
    return merge_upsert(c, source, ["c_custkey"], update_cols=["c_acctbal"])


R_MERGE_UPSERT_SQL = """
WITH tgt AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
),
src AS (
  SELECT c_custkey, concat('upd_', c_name) AS c_name,
         c_acctbal + 100.0 AS c_acctbal, 'UPD' AS c_mktsegment
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT -(c_custkey + 1), concat('new_', c_name), 0.0, 'NEW'
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT t.c_custkey, t.c_name, s.c_acctbal, t.c_mktsegment
FROM tgt t JOIN src s ON t.c_custkey = s.c_custkey
UNION ALL
SELECT * FROM tgt WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
UNION ALL
SELECT * FROM src WHERE c_custkey NOT IN (SELECT c_custkey FROM tgt)
"""

QUERIES["r_merge_upsert"] = (r_merge_upsert, R_MERGE_UPSERT_SQL)


# --------------------------------------------------------------------------
# CDC table diff (snapshot time-travel delta) — operators/tablediff.py


def r_table_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Change set between two synthesized versions of ``orders``.

    old = orders except keys ≡0 (mod 7); new = orders except keys ≡0
    (mod 5), with totalprice bumped on keys ≡0 (mod 3) — so the diff
    holds inserts (in new only), deletes (in old only), and updates
    (price changed), plus silent rows that must NOT appear.
    """
    from who_focus_crawler_spark.operators.tablediff import table_diff

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(
        old, new, ["o_orderkey"], compare_cols=["o_totalprice"], strict=False
    )


R_TABLE_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.o_orderkey IS NULL THEN 'insert'
            ELSE 'update' END AS change,
       o.o_totalprice AS old_o_totalprice,
       n.o_totalprice AS new_o_totalprice
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
"""

QUERIES["r_table_diff"] = (r_table_diff, R_TABLE_DIFF_SQL)


# --------------------------------------------------------------------------
# Bucketed co-located join (operators/bucketing.py) — the write pays the
# shuffle once; the join itself runs with zero Exchange (plan-asserted in
# tests/unit/test_plans.py). The oracle is the plain equi-join: bucketing
# is a physical layout, the logical result is identical.


def r_join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    import os as _os
    import tempfile

    from who_focus_crawler_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    base = tempfile.mkdtemp(prefix="wfc_bucketed_")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    write_bucketed(
        li, "wfc_li_bkt", 8, ["l_orderkey"], path=_os.path.join(base, "li")
    )
    write_bucketed(
        orders, "wfc_ord_bkt", 8, ["o_orderkey"], path=_os.path.join(base, "ord")
    )
    joined = bucketed_join(
        spark,
        "wfc_li_bkt",
        "wfc_ord_bkt",
        on=[F.col("l_orderkey") == F.col("o_orderkey")],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


R_JOIN_BUCKETED_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Unpivot / melt — long-form metric rows from wide columns. Spark's
# native `unpivot` stays a single projection+generate (no shuffle until
# the agg); the oracle is the canonical UNION ALL long form.


def r_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    long = t(spark, sf, "lineitem").unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


R_UNPIVOT_SQL = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
    FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
)
SELECT l_returnflag, metric, count(*) AS n,
       round(sum(value), 2) AS total,
       round(min(value), 2) AS lo, round(max(value), 2) AS hi
FROM long GROUP BY l_returnflag, metric
"""

# --------------------------------------------------------------------------
# Distribution windows — ntile / percent_rank / cume_dist. The ordering
# key ends in the unique o_orderkey, so rank == row_number and all three
# are deterministic closed-form values on both engines.


def r_win_ntile(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
            # no round(): (rank-1)/(n-1) and rank/n divide identical
            # integers on both engines -> bitwise-equal doubles, and
            # rounding would only add decimal-midpoint risk
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


R_WIN_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders WHERE o_orderstatus = 'F'
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
"""

QUERIES.update(
    {
        "r_join_bucketed": (r_join_bucketed, R_JOIN_BUCKETED_SQL),
        "r_unpivot": (r_unpivot, R_UNPIVOT_SQL),
        "r_win_ntile": (r_win_ntile, R_WIN_NTILE_SQL),
    }
)


# --------------------------------------------------------------------------
# R18 ext — explicit GROUPING SETS (rollup/cube generalization) with
# grouping() flags to disambiguate NULL group keys from NULL data


def r_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


R_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# R7 ext — correlated EXISTS / NOT EXISTS subqueries (Catalyst rewrites
# them to semi/anti joins — asserted in tests/unit/test_plans.py)


def r_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    for name in ("customer", "orders"):
        t(spark, sf, name).createOrReplaceTempView(f"_ex_{name}")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_with_urgent
        FROM (
          SELECT c.c_custkey, c.c_mktsegment,
                 EXISTS (SELECT 1 FROM _ex_orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT') AS has_urgent
          FROM _ex_customer c
          WHERE NOT EXISTS (SELECT 1 FROM _ex_orders o2
                            WHERE o2.o_custkey = c.c_custkey
                              AND o2.o_orderstatus = 'F'
                              AND o2.o_totalprice > 300000)
        )
        GROUP BY c_mktsegment
        """
    )


R_EXISTS_SUBQUERY_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_urgent
FROM (
  SELECT c.c_custkey, c.c_mktsegment,
         EXISTS (SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o2
                    WHERE o2.o_custkey = c.c_custkey
                      AND o2.o_orderstatus = 'F'
                      AND o2.o_totalprice > 300000)
)
GROUP BY c_mktsegment
"""

QUERIES.update(
    {
        "r_grouping_sets": (r_grouping_sets, R_GROUPING_SETS_SQL),
        "r_exists_subquery": (r_exists_subquery, R_EXISTS_SUBQUERY_SQL),
    }
)


# --------------------------------------------------------------------------
# R3 ext — WARC archival sink + source round trip (sources/warc.py).
# The documents table is written out as WARC response records and read
# back through the binaryFile parser; the oracle derives the expected
# record surface (uri, byte length, payload digest) straight from
# `documents`, so the query only matches if the sink and the source
# both preserve every payload byte.


def r_warc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.sources.warc import read_warc, write_warc

    base = tempfile.mkdtemp(prefix="wfc_warc_")
    docs = t(spark, sf, "documents").select(
        F.concat(
            F.lit("http://d"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    write_warc(docs, base).collect()  # materialize the sink
    rec = read_warc(spark, base).filter(F.col("warc_type") == "response")
    return rec.select(
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


R_WARC_ROUNDTRIP_SQL = """
SELECT concat('http://d', CAST(doc_id % 50 AS VARCHAR),
              '.example.org/doc/', CAST(doc_id AS VARCHAR)) AS target_uri,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       md5(text) AS payload_md5
FROM documents
"""

QUERIES["r_warc_roundtrip"] = (r_warc_roundtrip, R_WARC_ROUNDTRIP_SQL)


# --------------------------------------------------------------------------
# WARC revisit records (WARC/1.1 §6.7, Heritrix identical-payload-digest
# dedup): first capture of each digest stays a response; later identical
# payloads become revisit records referencing the original. Digest
# collisions are planted (l_partkey % 500) so both record types and the
# refers_to resolution are non-vacuous.


def r_warc_revisit(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.sources.warc import revisit_records

    li = t(spark, sf, "lineitem")
    cap = li.select(
        F.concat(
            F.lit("http://h"),
            (F.col("l_suppkey") % 40).cast("string"),
            F.lit(".example.org/p/"),
            F.col("l_partkey").cast("string"),
        ).alias("uri"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("seq"),
        F.md5((F.col("l_partkey") % 500).cast("string")).alias("digest"),
    )
    return revisit_records(cap)


R_WARC_REVISIT_SQL = """
WITH cap AS (
  SELECT concat('http://h', CAST(l_suppkey % 40 AS VARCHAR),
                '.example.org/p/', CAST(l_partkey AS VARCHAR)) AS uri,
         CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS seq,
         md5(CAST(l_partkey % 500 AS VARCHAR)) AS digest
  FROM lineitem
), f AS (
  SELECT digest, seq AS fseq, uri AS furi FROM (
    SELECT digest, seq, uri,
           row_number() OVER (PARTITION BY digest ORDER BY seq, uri) AS rn
    FROM cap
  ) WHERE rn = 1
)
SELECT c.uri, c.seq, c.digest,
       CASE WHEN c.seq = f.fseq AND c.uri = f.furi
            THEN 'response' ELSE 'revisit' END AS warc_type,
       CASE WHEN c.seq = f.fseq AND c.uri = f.furi
            THEN NULL ELSE f.furi END AS refers_to_uri,
       CAST(CASE WHEN c.seq = f.fseq AND c.uri = f.furi
            THEN NULL ELSE f.fseq END AS BIGINT) AS refers_to_seq
FROM cap c JOIN f USING (digest)
"""

QUERIES["r_warc_revisit"] = (r_warc_revisit, R_WARC_REVISIT_SQL)


# --------------------------------------------------------------------------
# WARC via the Python Data Source API (sources/warc_datasource.py):
# spark.read.format("warc") with the warc_type equality filter pushed
# INTO the record parser. Same analytic oracle discipline as
# r_warc_roundtrip — the query matches only if the registered source
# preserves every payload byte and the pushdown drops exactly the
# per-file warcinfo records.


def r_warc_datasource(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.sources import warc_datasource
    from who_focus_crawler_spark.sources.warc import write_warc

    base = tempfile.mkdtemp(prefix="wfc_warcds_")
    docs = t(spark, sf, "documents").select(
        F.concat(
            F.lit("http://d"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    write_warc(docs, base).collect()
    warc_datasource.register(spark)
    rec = (
        spark.read.format("warc")
        .load(base)
        .filter(F.col("warc_type") == "response")
    )
    return rec.select(
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


QUERIES["r_warc_datasource"] = (r_warc_datasource, R_WARC_ROUNDTRIP_SQL)


# --------------------------------------------------------------------------
# Row-level DELETE, merge-on-read (Iceberg v2 equality deletes on the
# snapshot-catalog shim). The scenario exercises the sequence-number rule
# end-to-end: two appended file-sets, an equality delete over the whole
# id space, then a THIRD append that re-introduces ids the delete names —
# those must survive (the delete only applies to file-sets committed
# before it). The oracle states the surviving set analytically.


def r_delete_mor(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base = tempfile.mkdtemp(prefix="wfc_del_")
    cat = SnapshotCatalog(base)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    cat.commit(0, {"documents": docs.filter(F.col("doc_id") % 3 == 0)}, state={})
    cat.commit(1, {"documents": docs.filter(F.col("doc_id") % 3 == 1)}, state={})
    cat.delete_where(
        spark,
        "documents",
        docs.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
    )
    cat.commit(3, {"documents": docs.filter(F.col("doc_id") % 3 == 2)}, state={})
    return cat.read_table(spark, "documents", docs.schema)


R_DELETE_MOR_SQL = """
SELECT doc_id, md5(text) AS text_md5
FROM documents
WHERE doc_id % 3 = 2 OR doc_id % 5 <> 0
"""

QUERIES["r_delete_mor"] = (r_delete_mor, R_DELETE_MOR_SQL)


# --------------------------------------------------------------------------
# SCD Type 2 (operators/scd.py): orders as a change-event stream for a
# per-customer status dimension — consecutive same-status orders collapse
# into one version, lead() closes each version, ties broken on orderkey.
# Oracle rebuilds the identical versioning with window functions.


def r_scd2(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.scd import scd2_build

    ev = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    return scd2_build(
        ev, ["custkey"], ["status"], "ts", tie_cols=["tb"]
    )


R_SCD2_SQL = """
WITH ev AS (
  SELECT o_custkey AS custkey, o_orderstatus AS status,
         o_orderdate AS ts, o_orderkey AS tb
  FROM orders
), ord AS (
  SELECT custkey, status, ts, tb,
         lag(status) OVER (PARTITION BY custkey ORDER BY ts, tb) AS prev
  FROM ev
), chg AS (
  SELECT custkey, status, ts, tb FROM ord
  WHERE prev IS NULL OR prev IS DISTINCT FROM status
)
SELECT custkey, status, ts AS effective_from,
       lead(ts) OVER (PARTITION BY custkey ORDER BY ts, tb) AS effective_to,
       lead(ts) OVER (PARTITION BY custkey ORDER BY ts, tb) IS NULL
         AS is_current
FROM chg
"""

QUERIES["r_scd2"] = (r_scd2, R_SCD2_SQL)


# --------------------------------------------------------------------------
# Null-aware NOT IN anti join. Standard SQL: one NULL in the subquery
# list makes `x NOT IN (...)` UNKNOWN for every non-member ⇒ 0 rows —
# Spark plans this as a null-aware anti join (plain left_anti would
# wrongly return rows). The query returns both counts so the row is
# non-vacuous: the null-poisoned branch MUST be 0 while the null-free
# branch is large, which is exactly the semantics difference.


def r_not_in_null(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "customer").createOrReplaceTempView("_niv_customer")
    t(spark, sf, "orders").createOrReplaceTempView("_niv_orders")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM _niv_customer
           WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                         ELSE o_custkey END
             FROM _niv_orders WHERE o_totalprice > 400000)) AS with_nulls,
          (SELECT count(*) FROM _niv_customer
           WHERE c_custkey NOT IN (
             SELECT o_custkey FROM _niv_orders
             WHERE o_totalprice > 400000 AND o_custkey IS NOT NULL))
            AS without_nulls
        """
    )


R_NOT_IN_NULL_SQL = """
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (
     SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                 ELSE o_custkey END
     FROM orders WHERE o_totalprice > 400000)) AS with_nulls,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (
     SELECT o_custkey FROM orders
     WHERE o_totalprice > 400000 AND o_custkey IS NOT NULL)) AS without_nulls
"""

QUERIES["r_not_in_null"] = (r_not_in_null, R_NOT_IN_NULL_SQL)


# --------------------------------------------------------------------------
# Binned interval join (operators/rangejoin.py): interval-overlap with NO
# equi-key, executed as a hash join on quantized bins with first-shared-
# bin dedup — the scale path where the naive plan is a nested loop. The
# oracle runs the plain theta join; the row sets must be identical.


def r_join_interval_binned(spark: SparkSession, sf: str) -> DataFrame:
    from who_focus_crawler_spark.operators.rangejoin import (
        binned_interval_join,
    )

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0)
    intervals = o.select(
        F.col("o_orderkey").alias("interval_key"),
        ((F.col("o_orderkey") * 37) % 1000000).alias("start"),
        (
            (F.col("o_orderkey") * 37) % 1000000
            + 1
            + (F.col("o_orderkey") % 500)
        ).alias("end"),
    )
    points = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("point_key"),
            ((F.col("l_orderkey") * 101 + F.col("l_suppkey")) % 1000000).alias(
                "p_start"
            ),
        )
        .withColumn("p_end", F.col("p_start") + 1)
    )
    return binned_interval_join(
        intervals,
        points,
        bin_width=256,
        right_start="p_start",
        right_end="p_end",
    ).select("interval_key", "point_key", "p_start")


R_JOIN_INTERVAL_BINNED_SQL = """
WITH intervals AS (
  SELECT o_orderkey AS interval_key,
         (o_orderkey * 37) % 1000000 AS s,
         (o_orderkey * 37) % 1000000 + 1 + (o_orderkey % 500) AS e
  FROM orders WHERE o_orderkey % 10 = 0
), points AS (
  SELECT l_orderkey AS point_key,
         (l_orderkey * 101 + l_suppkey) % 1000000 AS p
  FROM lineitem WHERE l_linenumber = 1
)
SELECT interval_key, point_key, p AS p_start
FROM intervals JOIN points ON p >= s AND p < e
"""

QUERIES["r_join_interval_binned"] = (
    r_join_interval_binned,
    R_JOIN_INTERVAL_BINNED_SQL,
)


# --------------------------------------------------------------------------
# Manifest-stats file skipping (checkpoint/snapshot.py::scan_table):
# three committed deltas with recorded doc_id min/max, a ranged scan that
# must skip two of them, and value equality against the plain filter.
# The skip count is asserted inside the query (a wrong skip would change
# the returned rows; a missing skip is caught by the embedded assert).


def r_scan_pruned_catalog(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base = tempfile.mkdtemp(prefix="wfc_stats_")
    cat = SnapshotCatalog(base)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    for i in range(3):
        cat.commit(
            i,
            {"documents": docs.filter(F.col("doc_id") % 3 == i)},
            state={},
            stats_cols={"documents": ["doc_id"]},
        )
    # the deltas interleave ids, so prune on a FOURTH delta with a
    # disjoint id range: re-commit a shifted copy and scan only it
    cat.commit(
        3,
        {
            "documents": docs.select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text_md5"
            )
        },
        state={},
        stats_cols={"documents": ["doc_id"]},
    )
    out: dict = {}
    df = cat.scan_table(
        spark,
        "documents",
        docs.schema,
        "doc_id",
        lo=1000000,
        stats_out=out,
    )
    assert out["skipped"] == 3, out  # all original deltas pruned
    return df


R_SCAN_PRUNED_SQL = """
SELECT doc_id + 1000000 AS doc_id, md5(text) AS text_md5 FROM documents
"""

QUERIES["r_scan_pruned_catalog"] = (r_scan_pruned_catalog, R_SCAN_PRUNED_SQL)


# --------------------------------------------------------------------------
# Branch write-audit-publish (checkpoint/snapshot.py): half the corpus
# lands on main, the other half is STAGED on a branch (in-query asserts
# pin main's isolation), then fast-forward publishes atomically and the
# final read must equal the whole corpus.


def r_branch_wap(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base = tempfile.mkdtemp(prefix="wfc_wap_")
    cat = SnapshotCatalog(base)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    cat.commit(0, {"documents": docs.filter(F.col("doc_id") % 2 == 0)}, state={})
    cat.create_branch("audit")
    cat.commit_to_branch(
        "audit", {"documents": docs.filter(F.col("doc_id") % 2 == 1)}, state={}
    )
    # audit gate: main must still be the even half while the branch stages
    assert cat.head() == 0, cat.head()
    n_main = cat.read_table(spark, "documents", docs.schema).count()
    n_branch = cat.read_table(
        spark, "documents", docs.schema, snapshot_id="audit"
    ).count()
    assert n_main < n_branch, (n_main, n_branch)
    cat.fast_forward_main("audit", drop_branch=True)
    return cat.read_table(spark, "documents", docs.schema)


R_BRANCH_WAP_SQL = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""

QUERIES["r_branch_wap"] = (r_branch_wap, R_BRANCH_WAP_SQL)


# --------------------------------------------------------------------------
# Changelog scan (checkpoint/snapshot.py::changelog_scan — Iceberg CDC /
# create_changelog_view): three deterministic append commits + one
# equality delete, then every row-level change after snapshot 0 with its
# change type and causing commit. The oracle reconstructs the same
# insert/delete records relationally: inserts = the two post-window
# thirds stamped with their commit id (= doc_id % 3 by construction);
# deletes = the rows the snapshot-3 delete killed (all doc_id % 7 == 0,
# since every data file predates the delete).


def r_changelog(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base = tempfile.mkdtemp(prefix="wfc_cdc_")
    cat = SnapshotCatalog(base)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    for i in range(3):
        cat.commit(
            i, {"documents": docs.filter(F.col("doc_id") % 3 == i)}, state={}
        )
    cat.delete_where(
        spark,
        "documents",
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
    )
    return cat.changelog_scan(
        spark, "documents", docs.schema, from_snapshot=0
    )


R_CHANGELOG_SQL = """
SELECT doc_id, md5(text) AS text_md5,
       'insert' AS _change_type,
       CAST(doc_id % 3 AS BIGINT) AS _change_snapshot_id
FROM documents WHERE doc_id % 3 IN (1, 2)
UNION ALL
SELECT doc_id, md5(text) AS text_md5,
       'delete' AS _change_type,
       CAST(3 AS BIGINT) AS _change_snapshot_id
FROM documents WHERE doc_id % 7 = 0
"""

QUERIES["r_changelog"] = (r_changelog, R_CHANGELOG_SQL)


# --------------------------------------------------------------------------
# Optimistic-concurrency commit merging (checkpoint/snapshot.py::
# commit_optimistic — Iceberg's commit model): two writers append
# disjoint halves of the corpus from the SAME base snapshot; the second
# publish must land on a stale head, pass serializable validation
# (append-append always merges), and retry its metadata CAS — the final
# table is the union of both deltas plus the base. In-query asserts pin
# that the race actually happened (B's parent is A's snapshot, not the
# shared base) and that history is a linear chain.


def r_occ_merge(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base_dir = tempfile.mkdtemp(prefix="wfc_occ_")
    cat = SnapshotCatalog(base_dir)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    cat.commit(0, {"documents": docs.filter(F.col("doc_id") % 3 == 0)}, state={})
    base = cat.head()
    sid_a = cat.commit_optimistic(
        {"documents": docs.filter(F.col("doc_id") % 3 == 1)},
        state={"writer": "a"},
        base_snapshot=base,
    )
    # writer B computed from the SAME (now stale) base — must merge
    sid_b = cat.commit_optimistic(
        {"documents": docs.filter(F.col("doc_id") % 3 == 2)},
        state={"writer": "b"},
        base_snapshot=base,
    )
    assert cat.manifest(sid_b)["parent"] == sid_a, "CAS retry did not happen"
    assert cat.manifest(sid_a)["parent"] == base
    return cat.read_table(spark, "documents", docs.schema)


R_OCC_MERGE_SQL = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""

QUERIES["r_occ_merge"] = (r_occ_merge, R_OCC_MERGE_SQL)


# --------------------------------------------------------------------------
# R23+ — event-time RANGE window frame: a true sliding-by-value frame
# (all events of the PRECEDING hour, not the preceding N rows). Spark's
# rangeBetween needs a numeric ordering key, so the frame is expressed
# over epoch seconds — the portable form of RANGE BETWEEN INTERVAL.
# Values accumulate as integer cents (floor) so the rolling sum is
# order-independent and hash-exact across engines.


def r_win_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("es").rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "es",
        F.sum("cents").over(w).alias("hour_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_events"),
    )


R_WIN_RANGE_INTERVAL_SQL = """
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
       sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS hour_cents,
       CAST(count(*) OVER w AS BIGINT) AS hour_events
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
"""

QUERIES["r_win_range_interval"] = (r_win_range_interval, R_WIN_RANGE_INTERVAL_SQL)


# --------------------------------------------------------------------------
# Exact distinct counting via bitmap aggregates (Spark's bitmap_* family):
# the two-level bucket/or pattern that replaces a full distinct shuffle
# with fixed-size bitmap blobs — per (group, bucket) construct, then sum
# of exact bit counts. Oracle = plain COUNT(DISTINCT).


def r_agg_bitmap(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    per_bucket = (
        li.groupBy(
            "l_returnflag",
            F.bitmap_bucket_number(F.col("l_partkey")).alias("_bkt"),
        )
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(
                    F.bitmap_bit_position(F.col("l_partkey"))
                )
            ).alias("_cnt")
        )
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum("_cnt").alias("n_distinct_parts")
    )


R_AGG_BITMAP_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct_parts
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["r_agg_bitmap"] = (r_agg_bitmap, R_AGG_BITMAP_SQL)


# --------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse_json into a variant,
# typed variant_get extraction, NULL-safe try_variant_get on a missing
# path. Oracle = DuckDB JSON extraction of the same fields.


def r_variant(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").withColumn(
        "_v", F.parse_json(F.col("props"))
    )
    return (
        ev.select(
            "event_type",
            F.variant_get(F.col("_v"), "$.k", "long").alias("k"),
            F.try_variant_get(F.col("_v"), "$.missing", "long").alias(
                "absent"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("absent").alias("n_absent"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


R_VARIANT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       0 AS n_absent,
       count(*) AS n_rows
FROM events GROUP BY event_type
"""

QUERIES["r_variant"] = (r_variant, R_VARIANT_SQL)


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): bounded BFS reachability over a
# deterministic synthetic link graph (out-degree 2 per node, derived from
# customer keys). Both engines run the structurally identical recursive
# query — this pins Spark's native recursive-CTE execution (UnionLoop)
# against DuckDB's, including path multiplicities (n_paths counts every
# distinct derivation under UNION ALL, not just reachability).
#
# Scale shape: each recursion step is one hash join frontier×edges — the
# same per-round cost as the iterative operators (hostrank, redirects);
# the depth bound caps rounds, and UNION ALL avoids a per-round global
# dedup shuffle (min-depth/dedup happens once, in the final aggregate).

_RECURSIVE_SQL = """
WITH RECURSIVE
nodes AS (SELECT c_custkey AS node FROM {customer}),
edges AS (
  SELECT node AS src, (node * 7 + 3) % (SELECT count(*) FROM nodes) AS dst
  FROM nodes
  UNION ALL
  SELECT node, (node * 11 + 5) % (SELECT count(*) FROM nodes) FROM nodes
),
reach(node, depth) AS (
  SELECT node, 0 FROM nodes WHERE node % 100 = 0
  UNION ALL
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < 5
)
SELECT node, CAST(min(depth) AS BIGINT) AS min_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM reach GROUP BY node
"""


def r_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "customer").createOrReplaceTempView("_rec_customer")
    return spark.sql(_RECURSIVE_SQL.format(customer="_rec_customer"))


QUERIES["r_recursive_cte"] = (
    r_recursive_cte,
    _RECURSIVE_SQL.format(customer="customer"),
)


# --------------------------------------------------------------------------
# Correlated LATERAL join (Spark 4 `JOIN LATERAL` — DecorrelateInnerQuery
# plans it as a ranked join, not a per-row rescan): top-2 orders per
# customer written as a correlated subquery with ORDER BY + LIMIT.
# DuckDB executes the same SQL with its own lateral-join operator, so
# value equality pins Spark's decorrelation against a second engine.

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {customer} c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey % 10 = 3
"""


def r_join_lateral(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "customer").createOrReplaceTempView("_lat_customer")
    t(spark, sf, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        _LATERAL_SQL.format(customer="_lat_customer", orders="_lat_orders")
    )


QUERIES["r_join_lateral"] = (
    r_join_lateral,
    _LATERAL_SQL.format(customer="customer", orders="orders"),
)


# --------------------------------------------------------------------------
# Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
# NULL keys — the join form MERGE/SCD pipelines need for nullable
# business keys. Keys are derived with NULLIF so both engines see real
# NULLs in the join column.


def r_join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    n = t(spark, sf, "nation").select(
        "n_name", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("nk")
    )
    r = t(spark, sf, "region").select(
        "r_name", F.nullif(F.col("r_regionkey"), F.lit(2)).alias("rk")
    )
    return n.join(r, F.col("nk").eqNullSafe(F.col("rk"))).select(
        "n_name", "r_name"
    )


R_JOIN_NULL_SAFE_SQL = """
SELECT n_name, r_name
FROM (SELECT n_name, nullif(n_regionkey, 2) AS nk FROM nation) n
JOIN (SELECT r_name, nullif(r_regionkey, 2) AS rk FROM region) r
  ON n.nk IS NOT DISTINCT FROM r.rk
"""

QUERIES["r_join_null_safe"] = (r_join_null_safe, R_JOIN_NULL_SAFE_SQL)


# --------------------------------------------------------------------------
# Iceberg v2 POSITIONAL deletes (snapshot shim): rows are retracted by
# (physical file path, row ordinal) — the _metadata.file_path/row_index
# address space — not by key. The scenario plants a duplicated slice of
# documents, then (a) predicate-deletes doc_id%7==0 through the
# positional path and (b) surgically kills the SECOND copy of every
# duplicated row (positions of the dup file-set only) — the retraction
# no equality delete can express. A final append re-introduces ids the
# predicate delete named; they must survive (new file, new path: the
# sequence rule holds by construction). Oracle states the survivors
# analytically: one copy of every doc with doc_id%7!=0, plus the
# re-appended %7==0 slice at a shifted hash.


def r_delete_positional(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base_dir = tempfile.mkdtemp(prefix="wfc_posdel_")
    cat = SnapshotCatalog(base_dir)
    docs = t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    cat.commit(0, {"documents": docs}, state={})
    cat.commit(1, {"documents": docs.filter(F.col("doc_id") % 2 == 0)},
               state={})  # duplicate every even doc
    # (a) positional predicate delete — kills %7==0 rows in BOTH copies
    cat.delete_matching_positions(
        spark, "documents", docs.schema, F.col("doc_id") % 7 == 0
    )
    # (b) kill ONLY the duplicate copies: the positions of the snap-000001
    # file-set (still alive after (a): evens with %7!=0)
    dup_pos = (
        cat.read_table(spark, "documents", docs.schema, keep_pos=True)
        .filter(F.col("_file_path").contains("snap-000001"))
        .select(
            F.col("_file_path").alias("file_path"),
            F.col("_row_pos").alias("pos"),
        )
    )
    cat.delete_positions(spark, "documents", dup_pos)
    # re-append the %7==0 ids with a marker hash — must be visible
    cat.commit(
        4,
        {
            "documents": t(spark, sf, "documents")
            .filter(F.col("doc_id") % 7 == 0)
            .select(
                "doc_id",
                F.md5(F.concat(F.lit("re:"), "text")).alias("text_md5"),
            )
        },
        state={},
    )
    return cat.read_table(spark, "documents", docs.schema)


R_DELETE_POSITIONAL_SQL = """
SELECT doc_id, md5(text) AS text_md5 FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT doc_id, md5('re:' || text) AS text_md5 FROM documents
WHERE doc_id % 7 = 0
"""

QUERIES["r_delete_positional"] = (r_delete_positional, R_DELETE_POSITIONAL_SQL)


# --------------------------------------------------------------------------
# Partition-spec evolution (Iceberg update_spec on the snapshot shim):
# orders lands unpartitioned, the spec evolves to bucket[8](o_custkey),
# more orders land bucketed, the spec evolves again to month(o_orderdate)
# — three co-existing layouts, each file-set planned under the spec it
# was written with (one scan per layout, directory pruning from the
# manifest). The result is a partition-pruned point read on one customer
# UNION a month-pruned slice — in-query asserts pin that pruning
# actually skipped directories. Oracle states both slices analytically.


def r_partition_evolve(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    base_dir = tempfile.mkdtemp(prefix="wfc_pspec_")
    cat = SnapshotCatalog(base_dir)
    orders = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    third = F.col("o_orderkey") % 3
    cat.commit(0, {"documents": orders.filter(third == 0)}, state={})
    cat.set_partition_spec(
        "documents",
        [{"source": "o_custkey", "transform": "bucket[8]",
          "name": "cust_bucket"}],
    )
    cat.commit(2, {"documents": orders.filter(third == 1)}, state={})
    cat.set_partition_spec(
        "documents",
        [{"source": "o_orderdate", "transform": "month", "name": "o_month"}],
    )
    cat.commit(4, {"documents": orders.filter(third == 2)}, state={})

    stats = {}
    by_cust = cat.scan_table_partitions(
        spark, "documents", orders.schema, "o_custkey", 7, stats_out=stats
    )
    # the bucketed file-set must have been narrowed to ONE of its 8
    # value directories (the month layout can't prune a custkey and is
    # read whole; the unpartitioned set likewise)
    assert stats["dirs_read"] == 1 and stats["dirs_candidates"] >= 8, stats
    mstats = {}
    by_month = cat.scan_table_partitions(
        spark, "documents", orders.schema, "o_orderdate",
        "1995-06-15", stats_out=mstats,
    )
    # the month layout narrowed to one yyyy-MM directory
    assert mstats["dirs_read"] == 1, mstats
    return by_cust.withColumn("slice", F.lit("cust")).unionByName(
        (by_month if by_month is not None else by_cust.limit(0))
        .withColumn("slice", F.lit("month"))
    )


R_PARTITION_EVOLVE_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, 'cust' AS slice
FROM orders WHERE o_custkey = 7
UNION ALL
SELECT o_orderkey, o_custkey, o_orderdate, 'month' AS slice
FROM orders WHERE o_orderdate = DATE '1995-06-15'
"""

QUERIES["r_partition_evolve"] = (r_partition_evolve, R_PARTITION_EVOLVE_SQL)
