"""Streaming crawl variant — the batch loop's C1→C14 pipeline recomposed
as a SELF-FEEDING Structured Streaming query (SURVEY.md §1.3 "variant
mode"; VERDICT r2 backlog item 3).

Topology: the frontier lives in a parquet-directory INBOX that is both
the stream source and the discovery sink —

    inbox ──readStream──▶ foreachBatch(epoch):
        robots gate (C8, TTL'd cache)  →  politeness (C7)  →
        C9 seq  →  C10+C11 fetch+extract  →  C12 discovery  →
        C4 dedup (exact anti-join vs committed url_seen)  →
        ├─ new uniques + politeness-deferred rows ──▶ inbox (next epoch)
        └─ url_seen/crawl_order/documents/host_state ──▶ ONE atomic
           snapshot commit (exactly-once, idempotent epoch guard)

Each availableNow cycle drains the files present at its start; links it
discovers land as NEW inbox files picked up by the next cycle. The
driver loops cycles until one applies zero epochs — the streaming
equivalent of "frontier drained". At cluster scale the inbox is a
Kafka topic or an Iceberg append stream; the per-epoch body is
unchanged (it only sees a DataFrame of frontier rows).

Equivalence contract (tests/streaming/test_crawl_streaming.py): on a
fully-drained fixture web the final ``url_seen`` set and the
``documents`` corpus (doc_id → span sequence) are EQUAL to the batch
loop's; ``crawl_order`` relaxes to the epoch-local deterministic order
(global seq numbering differs because microbatch boundaries replace
fetch batches — the schedule-key order within an epoch is the frozen
C9 order).

Exactly-once across restarts, two halves:
- catalog writes: the committed state records (checkpoint id, last
  applied epoch); a re-delivered epoch is skipped — the
  stream_frontier_to_catalog contract.
- inbox write-back: each epoch writes ONE deterministically-named
  parquet file (coalesce(1) → atomic rename) BEFORE the catalog
  commit and skips the write if the file exists. A crash between the
  two re-delivers the epoch, which recomputes bit-identically from
  the unchanged catalog state (fetch, ranks, canonicalization are all
  deterministic), finds the file present, and proceeds to commit.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
from who_focus_crawler_spark.operators.dedup import (
    dedup_against_seen,
    dedup_in_batch,
    part_id,
)
from who_focus_crawler_spark.operators.discover import (
    discover_links,
    has_meta_directive,
)
from who_focus_crawler_spark.operators.fetch import fetch_and_extract
from who_focus_crawler_spark.operators.frontier import bootstrap_frontier
from who_focus_crawler_spark.operators.politeness import (
    apply_politeness,
    assign_seq,
)
from who_focus_crawler_spark.operators.robots import (
    apply_robots,
    refresh_robots_cache,
)
from who_focus_crawler_spark.plans.crawl import CrawlConfig
from who_focus_crawler_spark.sources.fixture_web import seed_urls

# inbox rows = enqueued frontier rows (already canonical, already in
# url_seen — dedup happens at the DISCOVERY end of the epoch, exactly
# like the batch loop's C4-before-C5)
INBOX_SCHEMA = T.StructType(
    [
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed_id", T.IntegerType(), False),
        T.StructField("parent_hash", T.LongType(), True),
    ]
)

_FRONTIER_COLS = [f.name for f in INBOX_SCHEMA.fields]

# tables THIS loop owns per epoch; everything else in the snapshot is
# carried forward untouched (commit() keeps a table on None)
_OWNED = {"url_seen", "crawl_order", "documents", "robots_cache", "host_state"}


def _write_inbox_file(rows: DataFrame, inbox: str, name: str) -> None:
    """Atomically materialize one epoch's enqueue set as ONE parquet
    file with a deterministic name; idempotent (exists ⇒ no-op). The
    single-file form is what makes crash-replay safe with a file-stream
    source: a re-delivered epoch can never leave a MIX of old and new
    part files. (Kafka/Iceberg sinks make this moot in production.)"""
    final = os.path.join(inbox, name)
    if os.path.exists(final):
        return
    tmp = os.path.join(inbox, f"_tmp_{name}")
    shutil.rmtree(tmp, ignore_errors=True)
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))
    assert len(part) == 1, part
    os.replace(part[0], final)
    shutil.rmtree(tmp, ignore_errors=True)


def bootstrap_streaming(
    spark: SparkSession, cfg: CrawlConfig, inbox: str, catalog_root: str
) -> SnapshotCatalog:
    """Snapshot 0 + the seed inbox file: seeds enter url_seen (exactly
    as the batch bootstrap does) and the inbox as the first enqueued
    frontier rows."""
    os.makedirs(inbox, exist_ok=True)
    cat = SnapshotCatalog(catalog_root)
    frontier = bootstrap_frontier(spark, seed_urls(cfg.web), cfg.num_buckets)
    url_seen = frontier.select(
        "url_hash",
        "canon_url",
        part_id(F.col("url_hash"), cfg.num_buckets).alias("part_id"),
    )
    empty = lambda s: spark.createDataFrame([], s)  # noqa: E731
    cat.commit(
        0,
        {
            "url_seen": url_seen,
            "robots_cache": empty(schemas.ROBOTS_CACHE),
            "host_state": empty(schemas.HOST_STATE),
            "crawl_order": empty(schemas.CRAWL_ORDER),
            "documents": empty(schemas.DOCUMENTS_OUT),
        },
        state={
            "stream_next_seq": 1,
            "crawl_epochs": 0,
            "stream_fetched": 0,
        },
    )
    _write_inbox_file(frontier.select(*_FRONTIER_COLS), inbox, "seed.parquet")
    return cat


def _commit_epoch(
    df: DataFrame,
    epoch_id: int,
    cfg: CrawlConfig,
    cat: SnapshotCatalog,
    inbox: str,
    checkpoint: str,
) -> None:
    """One streaming epoch = one atomic snapshot (the run_batch body,
    minus frontier scan/top-k select — arrivals ARE the selection)."""
    spark = df.sparkSession
    head = cat.head()
    assert head is not None, "bootstrap_streaming must run first"
    prev_state = dict(cat.state(head))
    if prev_state.get("crawl_ck") == checkpoint and epoch_id <= prev_state.get(
        "crawl_last_epoch", -1
    ):
        return  # re-delivered epoch: already durable, skip
    carry = {
        name: None
        for name in cat.manifest(head)["tables"]
        if name not in _OWNED
    }
    ecount = int(prev_state.get("crawl_epochs", 0)) + 1  # robots-TTL clock
    base_seq = int(prev_state.get("stream_next_seq", 1))
    P = cfg.num_buckets

    url_seen = cat.read_table(spark, "url_seen", schemas.URL_SEEN)
    robots_cache = cat.read_table(spark, "robots_cache", schemas.ROBOTS_CACHE)
    host_state = cat.read_table(spark, "host_state", schemas.HOST_STATE)

    # C8 + C7 — arrivals are already unique (enqueue-side dedup), the
    # dropDuplicates is a defensive no-op on identical rows
    sel = df.dropDuplicates(["canon_url"]).localCheckpoint(eager=True)
    robots_cache2 = refresh_robots_cache(
        sel, robots_cache, cfg.web, ecount
    ).localCheckpoint(eager=True)
    cand = apply_politeness(
        apply_robots(sel, robots_cache2),
        cfg.web.politeness_k,
        batch_window_s=cfg.web.batch_window_s,
    ).persist()
    _c = cand.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0)).alias("a"),
    ).collect()[0]
    n_fetched = int(_c["a"] or 0)

    # C9 + C10/C11 — epoch-local deterministic order, seq continues
    admitted = assign_seq(
        cand.filter(F.col("admitted")).withColumn("batch", F.lit(ecount)),
        base_seq - 1,
        n_rows=n_fetched,
    )
    fetched = fetch_and_extract(admitted, cfg.web).persist()

    # C12 + C4 — exact anti-join dedup (the bloom/cuckoo fast path is a
    # batch-loop optimization; correctness is the anti-join either way)
    events = discover_links(fetched, P)
    winners = dedup_in_batch(events)
    new_unique = dedup_against_seen(winners, url_seen, None, P).persist()

    # write-back BEFORE the catalog commit (see module docstring)
    enqueue = new_unique.select(
        F.col("target_url").alias("canon_url"),
        "url_hash",
        "host",
        "host_bucket",
        (-F.col("depth").cast("double")).alias("priority"),
        "depth",
        "seed_id",
        "parent_hash",
    )
    deferred = cand.filter(
        F.col("robots_ok") & ~F.col("admitted")
    ).select(*_FRONTIER_COLS)
    out_rows = enqueue.unionByName(deferred).persist()
    n_out = out_rows.count()
    ck_id = prev_state.get("crawl_ck_id") or os.path.basename(
        checkpoint.rstrip("/")
    )
    if n_out > 0:
        _write_inbox_file(
            out_rows, inbox, f"epoch_{ck_id}_{int(epoch_id)}.parquet"
        )

    url_seen_delta = new_unique.select(
        "url_hash",
        F.col("target_url").alias("canon_url"),
        part_id(F.col("url_hash"), P).alias("part_id"),
    )
    crawl_delta = fetched.select(
        "seq", "batch", "canon_url", "url_hash", "host", "depth", "seed_id"
    )
    documents_delta = fetched.filter(
        ~has_meta_directive(F.col("spans"), "noindex")
    ).select(F.col("canon_url").alias("doc_id"), "spans", "batch")
    fetched_counts = admitted.groupBy("host").agg(F.count("*").alias("n"))
    host_state2 = (
        host_state.join(fetched_counts, "host", "full")
        .select(
            "host",
            (
                F.coalesce(F.col("fetched_total"), F.lit(0))
                + F.coalesce(F.col("n"), F.lit(0))
            )
            .cast("long")
            .alias("fetched_total"),
            F.when(F.col("n").isNotNull(), F.lit(ecount))
            .otherwise(F.col("last_batch"))
            .cast("int")
            .alias("last_batch"),
        )
    )

    cat.commit(
        cat.next_snapshot_id(),
        {
            **carry,
            "url_seen": url_seen_delta,  # append table: delta only
            "crawl_order": crawl_delta,  # append
            "documents": documents_delta,  # append
            "robots_cache": robots_cache2,
            "host_state": host_state2,
        },
        state={
            **prev_state,
            "crawl_ck": checkpoint,
            "crawl_ck_id": ck_id,
            "crawl_last_epoch": int(epoch_id),
            "crawl_epochs": ecount,
            "stream_next_seq": base_seq + n_fetched,
            "stream_fetched": int(prev_state.get("stream_fetched", 0))
            + n_fetched,
        },
    )
    cand.unpersist()
    fetched.unpersist()
    new_unique.unpersist()
    out_rows.unpersist()


def run_crawl_streaming(
    spark: SparkSession,
    cfg: CrawlConfig,
    inbox: str,
    checkpoint: str,
    catalog_root: str,
    max_cycles: int | None = None,
) -> SnapshotCatalog:
    """Drive the self-feeding loop: availableNow cycles until one
    applies zero epochs (inbox drained — every enqueued URL fetched or
    robots-dropped). ``max_cycles`` stops early for restart tests; a
    later call with the same (inbox, checkpoint, catalog_root) resumes
    exactly where the stream left off."""
    cat = SnapshotCatalog(catalog_root)
    if cat.head() is None:
        cat = bootstrap_streaming(spark, cfg, inbox, catalog_root)
    cycles = 0
    while True:
        before = int((cat.state() or {}).get("crawl_epochs", 0))
        q = (
            spark.readStream.schema(INBOX_SCHEMA)
            .parquet(inbox)
            .writeStream.foreachBatch(
                lambda bdf, eid: _commit_epoch(
                    bdf, eid, cfg, cat, inbox, checkpoint
                )
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        cycles += 1
        after = int((cat.state() or {}).get("crawl_epochs", 0))
        if after == before:
            break  # no epoch applied: nothing new to read → drained
        if max_cycles is not None and cycles >= max_cycles:
            break
    return cat
