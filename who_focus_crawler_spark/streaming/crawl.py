"""Streaming crawl variant — the batch loop's C1→C14 pipeline recomposed
as a SELF-FEEDING Structured Streaming query (SURVEY.md §1.3 "variant
mode"; VERDICT r2 backlog item 3, scale-hardened per VERDICT r3 item 1).

Topology: NEW discoveries flow through a parquet-directory INBOX that is
both the stream source and the discovery sink; the politeness BACKLOG
(deferred rows) lives in the committed ``frontier`` table, exactly like
the batch loop —

    inbox ──readStream(inbox/*)──▶ foreachBatch(epoch):
        arrivals ∪ frontier table (backlog)  →  robots gate (C8) →
        politeness (C7)  →  C9 seq  →  C10+C11 fetch+extract  →
        C12 discovery  →  C4 dedup (exact anti-join vs url_seen)  →
        ├─ NEW uniques ──▶ inbox (next epoch's arrivals)
        └─ url_seen/crawl_order/documents/robots_cache/host_state/
           frontier(=deferred backlog) ──▶ ONE atomic snapshot commit

Each availableNow cycle drains the files present at its start; links it
discovers land as NEW inbox files picked up by the next cycle. The
driver loops cycles until one applies zero epochs — the streaming
equivalent of "frontier drained". At cluster scale the inbox is a
Kafka topic or an Iceberg append stream; the per-epoch body is
unchanged (it only sees a DataFrame of frontier rows).

Scale shape of the write-back (VERDICT r3 "What's wrong" #1, both
halves):

- **No single-task exchange.** Each epoch publishes a DIRECTORY of
  per-partition part files written by every task in parallel, made
  atomic by ONE ``os.rename`` of the staged directory into the inbox
  (the previous design funneled the epoch through ``coalesce(1)`` to
  get a single renameable file). The stream source reads the glob
  ``inbox/*``, so a renamed directory's files appear all-or-nothing;
  the ``.staging`` scratch dir is dot-prefixed and therefore invisible
  to the glob and to Spark's hidden-file filter.
- **Deferred rows never recirculate through the inbox.** Politeness-
  deferred rows are committed to the snapshot's ``frontier`` table
  (replace-table, same as the batch loop) and unioned back in at the
  next epoch's start. Inbox traffic is now bounded by DISCOVERY volume
  per epoch, not by backlog size — a host with a deep backlog no
  longer rewrites its entire backlog to the inbox every cycle
  (previously O(backlog × epochs) write amplification). When an epoch
  discovers nothing new but still holds a backlog, it publishes a
  ZERO-ROW tick directory (an empty parquet write still emits one
  0-row part file) so the file source fires the next epoch.

Equivalence contract (tests/streaming/test_crawl_streaming.py): on a
fully-drained fixture web the final ``url_seen`` set and the
``documents`` corpus (doc_id → span sequence) are EQUAL to the batch
loop's. ``crawl_order``:

- **Saturated regime (politeness_k and select_k ≥ every host's
  in-wave fanout): EXACT global equality**, seq for seq. Both loops
  then process exactly one BFS wave per batch/epoch — the batch loop's
  top-k selection takes the whole frontier and politeness admits all of
  it, so batch b and epoch b fetch the same row set, rank it by the
  same frozen C9 key (priority = -depth in both stores), and continue
  seq from the same base. Tested exact in
  ``test_streaming_crawl_order_equality_saturated``.
- **General regime: epoch-local order only** — and this is structural,
  not an implementation gap. With select_k smaller than the frontier,
  batch b's C6 selection draws the top-k of the ENTIRE accumulated
  frontier, so it can schedule a wave-3 URL before a still-pending
  wave-2 URL on priority grounds. A self-feeding stream sees rows in
  discovery waves; reproducing cross-wave selection would require
  re-ranking arrivals against the full backlog AND the not-yet-arrived
  future discoveries of the same batch — i.e. knowing batch b's
  discovery closure before fetching it, which is exactly the barrier
  microbatching removes. Within an epoch the schedule-key order IS the
  frozen C9 order, and seq remains a contiguous global total order.

Exactly-once across restarts, two halves:
- catalog writes: the committed state records (checkpoint id, last
  applied epoch); a re-delivered epoch is skipped — the
  stream_frontier_to_catalog contract.
- inbox write-back: each epoch publishes ONE deterministically-named
  directory BEFORE the catalog commit and skips the publish if the
  directory exists. A crash between the two re-delivers the epoch,
  which recomputes bit-identically from the unchanged catalog state
  (fetch, ranks, canonicalization are all deterministic), finds the
  directory present, and proceeds to commit.
"""

from __future__ import annotations

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
# carried forward untouched (commit() keeps a table on None). frontier
# = the politeness-deferred backlog (replace-table, like the batch loop)
_OWNED = {
    "url_seen",
    "crawl_order",
    "documents",
    "robots_cache",
    "host_state",
    "frontier",
}


def inbox_glob(inbox: str) -> str:
    """The stream-source path: epoch DIRECTORIES one level under the
    inbox root. Dot-prefixed entries (``.staging``) never match."""
    return os.path.join(inbox, "*")


def publish_epoch_dir(rows: DataFrame, inbox: str, name: str) -> None:
    """Atomically publish one epoch's enqueue set as a DIRECTORY of
    per-partition parquet files with a deterministic name; idempotent
    (exists ⇒ no-op).

    Every write task emits its own part file in parallel — there is no
    single-task exchange anywhere in the write-back (the zero-row tick
    is the only single-file case, and only because it has zero rows).
    Atomicity comes from staging under the dot-prefixed ``.staging``
    scratch dir (invisible to the ``inbox/*`` source glob) and ONE
    ``os.rename`` of the completed directory into place: a re-delivered
    epoch can never expose a MIX of old and new part files. (A
    Kafka/Iceberg sink makes this moot in production.)"""
    final = os.path.join(inbox, name)
    if os.path.exists(final):
        return
    stg_root = os.path.join(inbox, ".staging")
    os.makedirs(stg_root, exist_ok=True)
    tmp = os.path.join(stg_root, name)
    shutil.rmtree(tmp, ignore_errors=True)
    rows.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final)


def bootstrap_streaming(
    spark: SparkSession, cfg: CrawlConfig, inbox: str, catalog_root: str
) -> SnapshotCatalog:
    """Snapshot 0 + the seed inbox directory: seeds enter url_seen
    (exactly as the batch bootstrap does) and the inbox as the first
    enqueued frontier rows; the deferred backlog starts empty."""
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
            "frontier": empty(INBOX_SCHEMA),
        },
        state={
            "stream_next_seq": 1,
            "crawl_epochs": 0,
            "stream_fetched": 0,
        },
    )
    publish_epoch_dir(frontier.select(*_FRONTIER_COLS), inbox, "seed")
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
    minus frontier scan/top-k select — arrivals + the committed backlog
    ARE the selection)."""
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
    backlog = cat.read_table(spark, "frontier", INBOX_SCHEMA)

    # C8 + C7 — candidates = this epoch's arrivals (new discoveries)
    # plus the committed politeness backlog. The two sets are disjoint
    # by construction (a URL enters the inbox exactly once, at
    # discovery; deferred rows only ever live in the frontier table),
    # so dropDuplicates is a defensive no-op on identical rows
    sel = (
        df.select(*_FRONTIER_COLS)
        .unionByName(backlog)
        .dropDuplicates(["canon_url"])
        .localCheckpoint(eager=True)
    )
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
        F.sum(
            F.when(F.col("robots_ok") & ~F.col("admitted"), 1).otherwise(0)
        ).alias("d"),
    ).collect()[0]
    n_fetched = int(_c["a"] or 0)
    n_deferred = int(_c["d"] or 0)

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

    # write-back BEFORE the catalog commit (see module docstring): the
    # inbox carries ONLY new discoveries; deferred rows go to the
    # frontier table in the snapshot commit below. A zero-row directory
    # still gets published while a backlog remains — the tick that
    # keeps the file source firing until the backlog drains.
    enqueue = new_unique.select(
        F.col("target_url").alias("canon_url"),
        "url_hash",
        "host",
        "host_bucket",
        (-F.col("depth").cast("double")).alias("priority"),
        "depth",
        "seed_id",
        "parent_hash",
    ).persist()
    n_new = enqueue.count()
    ck_id = prev_state.get("crawl_ck_id") or os.path.basename(
        checkpoint.rstrip("/")
    )
    if n_new > 0 or n_deferred > 0:
        publish_epoch_dir(enqueue, inbox, f"epoch_{ck_id}_{int(epoch_id)}")
    deferred_next = cand.filter(
        F.col("robots_ok") & ~F.col("admitted")
    ).select(*_FRONTIER_COLS)

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
            "frontier": deferred_next,  # replace: the remaining backlog
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
    enqueue.unpersist()


def run_crawl_streaming(
    spark: SparkSession,
    cfg: CrawlConfig,
    inbox: str,
    checkpoint: str,
    catalog_root: str,
    max_cycles: int | None = None,
) -> SnapshotCatalog:
    """Drive the self-feeding loop: availableNow cycles until one
    applies zero epochs (inbox drained AND backlog empty — every
    enqueued URL fetched or robots-dropped). ``max_cycles`` stops early
    for restart tests; a later call with the same (inbox, checkpoint,
    catalog_root) resumes exactly where the stream left off."""
    cat = SnapshotCatalog(catalog_root)
    if cat.head() is None:
        cat = bootstrap_streaming(spark, cfg, inbox, catalog_root)
    cycles = 0
    while True:
        before = int((cat.state() or {}).get("crawl_epochs", 0))
        q = (
            spark.readStream.schema(INBOX_SCHEMA)
            .parquet(inbox_glob(inbox))
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
