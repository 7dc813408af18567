"""Bench harness (driver contract): one JSON line with headline metric.

Headline = the north metric (BASELINE.json): frontier URLs
scheduled+deduped per second. A synthetic frontier is expanded
deterministically from `orders` (multiplier EXPAND per order), pushed
through the real pipeline — C1 canonicalize → C2 xxhash64 → C3 host →
C4 exact dedup (anti-join) → C6 top-k/host → C7 politeness → C9 global
seq — and timed end-to-end. Representative operator queries from the
harness registry are timed individually.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), WFC_BENCH_EXPAND (default 100 —
     15M URLs at sf0.1, the SAME input as SCALING.json/BASELINE.md so
     per-round numbers are directly comparable), WFC_BENCH_REPEAT
     (default 3, best-of — the sandbox VM shows ~3% bursty CPU steal),
     WFC_BENCH_BEST_OF (default 2, round 5 — per-QUERY warmed draws;
     `queries` reports the best, `query_draws` every draw, and an
     `idleness` block records load/steal before the timed region, so a
     ±10% drift is diagnosable from the artifact alone instead of
     reading as a phantom regression).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import canonicalize_df, url_hash, url_host
from who_focus_crawler_spark.harness import REGISTRY
from who_focus_crawler_spark.operators.sequencer import global_row_number
from who_focus_crawler_spark.session import get_spark

BENCH_QUERIES = [
    "flagship_schedule",
    "r_agg_q1",
    "r_join_shuffle",
    "r_win_topk",
    "c_canonicalize",
    "c_url_dedup",
    "d_dedup_minhash",
    "d_dedup_simhash",
    "d_sim_cosine_topk",
    "d_text_quality",
    # late round-2 ops (absent from BENCH_r01's queries map; headline
    # metric unaffected)
    "d_dup_ngrams",
    "d_mixture_budget",
    # session-3 ops
    "d_semdedup",
    "d_dsir_weights",
    "d_contrastive",
    "r_join_interval_binned",
    # session-4 ops
    "d_jaccard_join",
    "d_media_phash",
    "d_epoch_shuffle",
    "d_text_gopher",
    # session-6 ops
    "d_dup_remove",
    "c_opic",
    "d_index_proximity",
    # session-7 ops
    "c_frontier_aging",
    "c_bandit_budget",
    "d_t5_spans",
    "d_dedup_lines_global",
    "d_text_unescape",
    "c_mime_sniff",
    # round-4 ops: real-codec media decode + Iceberg v2 positional deletes
    "d_media_decode_png",
    "d_media_mixed_decode",
    "r_delete_positional",
    # round-4 codec completion: palette/Adam7 PNG + extensible 24-bit WAV
    # + real baseline JPEG (bounded-error oracle)
    "d_media_decode_palette",
    "d_media_decode_wav24",
    "d_media_decode_jpeg",
    "d_media_decode_gif",
    "d_media_mixed_decode3",
    # round-5 ops: 4:2:0+DRI JPEG (real-web layout) + refusal telemetry
    # + full progressive (SOF2) decode
    "d_media_decode_jpeg420",
    "d_media_refusals",
    "d_media_decode_jpeg_prog",
    "d_media_mp4_meta",
]


def synth_frontier(
    spark: SparkSession, sf_dir: str, expand: int, uid_offset: int = 0
) -> DataFrame:
    """Deterministic messy-URL frontier: `expand` URLs per order row.
    ``uid_offset`` shifts the id space so a disk-streamed generator
    (tools/stress_bench.py) can emit a 10^9-row frontier in bounded
    disjoint slices without ever holding it in memory."""
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    rep = F.explode(F.sequence(F.lit(0), F.lit(expand - 1))).alias("rep")
    base = o.select("o_orderkey", "o_custkey", "o_totalprice", rep)
    uid = (
        F.col("o_orderkey") * expand + F.col("rep") + F.lit(uid_offset)
    ).cast("long")
    host = F.concat(
        F.lit("h"), (uid % 997).cast("string"), F.lit(".example.org")
    )
    path = F.concat(F.lit("/p/"), uid.cast("string"))
    v = uid % 5
    url = (
        F.when(v == 0, F.concat(F.lit("HTTP://"), F.upper(host), path))
        .when(v == 1, F.concat(F.lit("http://"), host, F.lit(":80"), path))
        .when(v == 2, F.concat(F.lit("http://"), host, F.lit("/x/../p/"), uid.cast("string")))
        .when(v == 3, F.concat(F.lit("http://"), host, path, F.lit("#s1")))
        .otherwise(F.concat(F.lit("http://"), host, path, F.lit("?utm_source=x&b=2&a=1")))
    )
    # The source parquet at small SF is a single file ⇒ one input partition;
    # spread the frontier across the executors before the heavy stages
    # (at cluster scale this is the C3 host-hash repartition). Fixed count
    # (not cores×k) so N-core and 4N-core scaling runs execute the
    # identical physical job on the identical input.
    nparts = int(os.environ.get("WFC_BENCH_PARTITIONS", "128"))
    return base.select(
        uid.alias("uid"), F.col("o_totalprice").alias("priority"), url.alias("url")
    ).repartition(nparts, "uid")


def run_frontier_pipeline(spark: SparkSession, frontier: DataFrame) -> int:
    """The headline schedule+dedup pipeline; returns admitted count.

    No caching: in the real engine url_seen is its own at-rest table, so
    the seen side is derived as an independent branch here (recomputing
    canonicalization for the 1/3 seen subset) and everything streams
    through whole-stage codegen. Caching the 6M-row candidate frame
    instead was measured 4-14x slower (columnar cache build + storage-
    pool eviction thrash) and anti-scaled with cores."""
    cand = (
        canonicalize_df(frontier, "url", "canon_url")
        .withColumn("url_hash", url_hash(F.col("canon_url")))
        .withColumn("host", url_host(F.col("canon_url")))
    )
    seen = (
        canonicalize_df(frontier.filter(F.col("uid") % 3 == 0), "url", "canon_url")
        .withColumn("url_hash", url_hash(F.col("canon_url")))
        .select("url_hash", "canon_url")
    )
    new = cand.join(seen, ["url_hash", "canon_url"], "left_anti")
    wh = Window.partitionBy("host").orderBy(F.desc("priority"), "canon_url")
    admitted = new.withColumn("rk", F.row_number().over(wh)).filter(F.col("rk") <= 8)
    # C9: two-phase distributed rank (operators/sequencer.py) — no
    # single-task global window in the north-metric pipeline
    out = global_row_number(
        admitted, [F.desc("priority"), F.asc("host"), F.asc("canon_url")], "seq", 0
    ).select("seq", "canon_url", "host")
    return out.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    expand = int(os.environ.get("WFC_BENCH_EXPAND", "100"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # shuffle partitions fixed (≠ f(cores)) so scaling runs compare the
    # same physical job; 128 ≈ 4×max-cores on this box (SURVEY.md §4)
    spark = get_spark(
        app_name="wfc-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("WFC_BENCH_PARTITIONS", "128")),
    )

    # headline: frontier schedule+dedup throughput. The synthetic frontier
    # is materialized (persisted) before timing — it stands in for the
    # at-rest frontier table, not for pipeline work; otherwise its
    # single-file parquet source serializes the timed region.
    frontier = synth_frontier(spark, sf_dir, expand).persist()
    n_urls = frontier.count()
    run_frontier_pipeline(spark, frontier.limit(2000))  # warm Python workers
    # idleness guard (VERDICT r4 "what's wrong" #3): record the box
    # state immediately before the timed region — a light gate (short
    # settle, few tries) so a driver run is never blocked for minutes,
    # but a contaminated draw is MARKED in the artifact
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from idleness import wait_until_idle

        idleness = wait_until_idle(
            max_load1=8.0, max_steal_pct=5.0, tries=2, settle_sec=10.0
        )
    except Exception:
        idleness = None

    # best-of-k: the sandbox is a shared VM (~3% avg CPU steal, bursty) —
    # min wall is the faithful estimate of the job's own cost
    repeat = int(os.environ.get("WFC_BENCH_REPEAT", "3"))
    frontier_draws: list[float] = []
    for _ in range(max(repeat, 1)):
        t0 = time.time()
        n_admitted = run_frontier_pipeline(spark, frontier)
        frontier_draws.append(round(time.time() - t0, 3))
    frontier_wall = min(frontier_draws)
    urls_per_sec = n_urls / frontier_wall if frontier_wall > 0 else 0.0

    # per-query warmed draws: the first draw pays any Python-worker /
    # code-path cold start; `queries` carries the best so cross-round
    # diffs compare the jobs, and `query_draws` carries every draw so
    # a slow outlier is visibly an outlier
    best_of = max(int(os.environ.get("WFC_BENCH_BEST_OF", "2")), 1)
    timings: dict[str, float] = {}
    draws: dict[str, list[float]] = {}
    total = 0.0
    names = BENCH_QUERIES if os.environ.get("WFC_BENCH_QUERIES", "1") == "1" else []
    for name in names:
        fn, _ = REGISTRY[name]
        ds = []
        for _ in range(best_of):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            ds.append(round(time.time() - t0, 3))
            _ = n
        draws[name] = ds
        timings[name] = min(ds)
        total += min(ds)

    # the north rule's two-cluster-size criterion is measured by
    # tools/scaling_bench.py / tools/stress_bench.py (idleness-guarded
    # N vs 4N legs; committed to SCALING.json / STRESS.json); surface
    # the committed evidence here so every BENCH_r*.json records
    # throughput at both sizes plus the efficiency alongside the
    # single-size headline
    scaling = None
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "STRESS.json")) as f:
            stress = json.load(f)
        runs = [
            r for r in stress.get("runs", [])
            if r.get("pass") and not r.get("idleness_N", {}).get("contaminated")
        ]
        if runs:
            big = max(runs, key=lambda r: r["input"]["frontier_urls"])
            scaling = {
                "source": "STRESS.json (idleness-guarded, at-rest parquet)",
                "frontier_urls": big["input"]["frontier_urls"],
                "N_cores": big["N_cores"],
                "throughput_N": big["throughput_N"],
                "throughput_4N": big["throughput_4N"],
                "efficiency_N_to_4N": big["scaling_efficiency_N_to_4N"],
                "criterion": big.get("criterion", ">= 0.8"),
            }
    except Exception:
        scaling = None
    print(
        json.dumps(
            {
                "metric": "frontier URLs scheduled+deduped per second "
                "(synthetic frontier, full C1-C9 pipeline)",
                "value": round(urls_per_sec, 1),
                "unit": "urls/sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "frontier_urls": n_urls,
                "frontier_admitted": n_admitted,
                "frontier_wall_sec": round(frontier_wall, 3),
                "frontier_wall_draws": frontier_draws,
                "query_total_sec": round(total, 3),
                "query_draws": draws,
                "best_of": best_of,
                "idleness": idleness,
                "cpus": int(cpus),
                "scaling": scaling,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
