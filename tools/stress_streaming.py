"""Streaming-crawl stress leg (VERDICT r3 item 1 'done' criterion):
drive ≥10^7 URLs through the STREAMING variant (streaming/crawl.py)
and record throughput in STRESS.json.

Unlike the batch frontier stress (tools/stress_bench.py — C1-C9 over an
at-rest parquet frontier), this exercises the full self-feeding loop at
scale: per-partition atomic-directory inbox publish, backlog held in
the committed frontier table, robots → politeness → C9 seq → fetch/
extract → discovery → exact dedup → one snapshot commit per epoch.
Saturated regime (select_k = politeness_k = ∞): each epoch processes
one whole BFS wave, so a web of P pages drains in graph-diameter
epochs rather than P/(hosts·k).

"URLs through the variant" counts every frontier row an epoch body
ingested (inbox arrivals + backlog unions) — each such row passes the
robots gate, politeness, and dedup; pages actually fetched and unique
URLs seen are recorded separately and are smaller (the fixture web's
random link graph reaches ~40-60% of pages from the seeds, and dedup
re-sees every duplicate link occurrence by design).

    python tools/stress_streaming.py [--pages 1e7] [--hosts 2000] \
        [--cpus 16] [--work-dir /tmp/wfc_stream_stress] [--keep]

Appends a run to STRESS.json under "streaming_runs".
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=float, default=1e7)
    ap.add_argument("--hosts", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/wfc_stream_stress")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--max-steal", type=float, default=5.0)
    a = ap.parse_args()

    from idleness import wait_until_idle

    from who_focus_crawler_spark import schemas
    from who_focus_crawler_spark.plans.crawl import CrawlConfig
    from who_focus_crawler_spark.session import get_spark
    from who_focus_crawler_spark.sources.fixture_web import WebConfig
    from who_focus_crawler_spark.streaming.crawl import run_crawl_streaming

    n_pages = int(a.pages)
    web = WebConfig(
        n_hosts=a.hosts,
        n_pages=n_pages,
        # saturated regime: every epoch admits its entire BFS wave
        select_k=n_pages,
        politeness_k=n_pages,
        max_batches=10_000,
    )
    shutil.rmtree(a.work_dir, ignore_errors=True)
    cfg = CrawlConfig(
        web=web,
        checkpoint_dir=os.path.join(a.work_dir, "catalog"),
        num_buckets=a.buckets,
    )
    spark = get_spark(
        app_name="wfc-stress-streaming",
        master=f"local[{a.cpus}]",
        shuffle_partitions=max(a.buckets, a.cpus * 2),
    )
    guard = wait_until_idle(a.max_load, a.max_steal)
    t0 = time.time()
    try:
        cat = run_crawl_streaming(
            spark,
            cfg,
            inbox=os.path.join(a.work_dir, "inbox"),
            checkpoint=os.path.join(a.work_dir, "ck"),
            catalog_root=os.path.join(a.work_dir, "catalog"),
        )
        wall = time.time() - t0
        state = cat.state() or {}
        fetched = cat.read_table(
            spark, "crawl_order", schemas.CRAWL_ORDER
        ).count()
        seen = cat.read_table(spark, "url_seen", schemas.URL_SEEN).count()
        docs = cat.read_table(
            spark, "documents", schemas.DOCUMENTS_OUT
        ).count()
        # every row an epoch body ingested: inbox arrivals (all files the
        # stream read, incl. the seed bootstrap) + backlog re-unions are
        # bounded below by arrivals; count arrivals exactly from footers
        import pyarrow.parquet as pq

        arrivals = 0
        inbox_dir = os.path.join(a.work_dir, "inbox")
        for root, _dirs, files in os.walk(inbox_dir):
            for f in files:
                if f.endswith(".parquet"):
                    arrivals += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
    finally:
        if not a.keep:
            shutil.rmtree(a.work_dir, ignore_errors=True)
    run = {
        "web": {"n_hosts": a.hosts, "n_pages": n_pages,
                "regime": "saturated (select_k = politeness_k = n_pages)"},
        "cpus": a.cpus,
        "epochs": int(state.get("crawl_epochs", 0)),
        "urls_through_inbox": arrivals,
        "pages_fetched": fetched,
        "unique_urls_seen": seen,
        "documents": docs,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(arrivals / wall, 1),
        "pages_fetched_per_sec": round(fetched / wall, 1),
        "idleness": guard,
    }
    out_path = os.path.join(REPO, "STRESS.json")
    with open(out_path) as f:
        doc = json.load(f)
    doc.setdefault("streaming_runs", []).append(run)
    doc.setdefault(
        "streaming_protocol",
        "self-feeding streaming crawl (streaming/crawl.py) on a "
        "fixture web, saturated politeness — one BFS wave per epoch; "
        "idleness-guarded, work dir on local disk",
    )
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(run, indent=2))


if __name__ == "__main__":
    main()
