"""Adaptive crawl delay (operators/latency.py): nearest-rank percentile
matches a Python reference, min-obs gating, clamping, and the bridge
into apply_politeness's crawl_delay budget."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.latency import (
    adaptive_crawl_delay,
    host_latency_percentile,
)
from who_focus_crawler_spark.operators.politeness import apply_politeness


def hist_df(spark, rows):
    return spark.createDataFrame(
        rows, "host string, latency_ms long, tb1 long"
    )


def test_nearest_rank_matches_python(spark):
    rows = []
    lat = {}
    for h, n in (("a", 20), ("b", 7), ("c", 1)):
        vals = [((i * 37 + 11) % 500) + 1 for i in range(n)]
        lat[h] = sorted(vals)
        rows += [(h, v, i) for i, v in enumerate(vals)]
    got = {
        r.host: (r.n_obs, r.p_latency_ms)
        for r in host_latency_percentile(
            hist_df(spark, rows), pct_permille=950, tie_cols=["tb1"]
        ).collect()
    }
    for h, vals in lat.items():
        k = math.ceil(0.95 * len(vals))
        assert got[h] == (len(vals), vals[k - 1])


def test_min_obs_gate_and_clamp(spark):
    rows = (
        [("slow", 9000, i) for i in range(5)]
        + [("fast", 10, i) for i in range(5)]
        + [("rare", 9000, 0)]  # below min_obs: no row
    )
    got = {
        r.host: r.crawl_delay
        for r in adaptive_crawl_delay(
            hist_df(spark, rows),
            delay_factor_permille=2000,
            min_delay_s=1,
            max_delay_s=10,
            min_obs=3,
            tie_cols=["tb1"],
        ).collect()
    }
    assert got == {"slow": 10, "fast": 1}  # 18 s clamps to 10; 0.02 s floors to 1


def test_bridges_into_politeness_budget(spark):
    rows = [("s.org", 2500, i) for i in range(4)] + [
        ("f.org", 100, i) for i in range(4)
    ]
    delays = adaptive_crawl_delay(
        hist_df(spark, rows), delay_factor_permille=2000, tie_cols=["tb1"]
    ).select("host", "crawl_delay")
    cand = spark.createDataFrame(
        [(h, f"http://{h}/p/{i}", True, 100 - i, 1)
         for h in ("s.org", "f.org") for i in range(6)],
        "host string, canon_url string, robots_ok boolean, priority long,"
        " depth int",
    ).join(F.broadcast(delays), "host", "left")
    out = apply_politeness(cand, politeness_k=5, batch_window_s=10)
    admitted = (
        out.filter("admitted").groupBy("host").count().collect()
    )
    by_host = {r.host: r["count"] for r in admitted}
    # s.org: delay 5 s => 10//5 = 2 fetches; f.org: delay 1 s => cap k=5
    assert by_host == {"s.org": 2, "f.org": 5}
