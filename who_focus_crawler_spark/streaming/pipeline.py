"""Streaming operators over a live discovery/fetch event stream.

Source contract: a parquet-directory stream of discovery events
(ts timestamp, host string, canon_url string, priority double) —
at cluster scale this is the Iceberg/Kafka ingest of C12's output.

- R36 windowed_fetch_metrics: tumbling-window per-host rates, with a
  watermark (R38) so state is bounded and late rows beyond the horizon
  are dropped.
- R37 session_stats: per-host crawl sessions (session_window).
- R39 streaming_dedup: watermark + dropDuplicates on canon_url — the
  streaming approximation of C4 (exactness over all time needs the
  batch anti-join; within the watermark horizon this is exact).
- R40 politeness_tokens: arbitrary stateful per-host token budget via
  applyInPandasWithState — admits at most `budget` URLs per host per
  politeness window, carrying the token count across triggers.
- stream_interval_join: stream-stream event-time interval join
  (discovery → fetch-completion latency attribution), state bounded on
  both sides by watermark + range condition; inner and left-outer.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """R5 streaming source: parquet directory stream with explicit schema
    (schema'd, file-listing based — works identically on cloud storage)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


RAW_URL_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)


def stream_raw_urls(spark: SparkSession, path: str) -> DataFrame:
    """R5 source for the ingest pipeline: raw (possibly messy) URL
    discoveries as a parquet-directory stream."""
    return spark.readStream.schema(RAW_URL_SCHEMA).parquet(path)


def ingest_frontier(raw: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming frontier ingestion: the BATCH C1 operator (staged
    canonicalizer, one Arrow crossing) runs unchanged inside the
    streaming query, then C3 host extraction and watermarked
    first-occurrence dedup on the canonical form — messy variants of one
    URL collapse to a single admitted frontier row, and a restart from
    the checkpoint never re-admits a canonical URL whose state is still
    within the watermark horizon (the batch anti-join owns exactness
    beyond it, as in C4)."""
    from who_focus_crawler_spark.functions.urls import canonicalize_df, url_host

    canon = canonicalize_df(raw, "url", "canon_url").withColumn(
        "host", url_host(F.col("canon_url"))
    )
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: plain dedup only
    # evicts state when the event-time column is part of the subset, so
    # keying on canon_url alone would grow the state store forever; the
    # WithinWatermark variant expires each key once it falls behind the
    # watermark — state stays O(horizon), as the contract above promises
    return (
        canon.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["canon_url"])
        .select("ts", "host", "canon_url", "priority")
    )


def windowed_fetch_metrics(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """R36+R38: per-(window, host) discovery counts and top priority."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("n_urls"),
            F.max("priority").alias("max_priority"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_urls",
            "max_priority",
        )
    )


def session_stats(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """R37: per-host activity sessions (gap-based merge)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("host"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "host",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """R39: first occurrence per canon_url within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["canon_url"])


_TOKEN_OUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("admitted_seq", T.IntegerType(), False),
    ]
)
_TOKEN_STATE = T.StructType([T.StructField("used", T.IntegerType(), False)])


def politeness_tokens(
    events: DataFrame, budget: int = 10
) -> DataFrame:
    """R40 (C7 streaming variant): per-host token budget carried across
    micro-batches. Each host admits URLs in (priority desc, canon_url)
    order within a trigger until its lifetime budget is spent; state is
    one int per host — O(hosts) memory, partitioned by the group key."""

    def admit(
        key: tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        used = state.get[0] if state.exists else 0
        # concat the Arrow chunks BEFORE sorting: a host whose micro-batch
        # spans several chunks must still admit in the single total
        # (priority desc, canon_url) order, independent of chunk
        # boundaries (ADVICE r1)
        frames = list(pdfs)
        batch = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if used < budget and not batch.empty:
            batch = batch.sort_values(
                ["priority", "canon_url"], ascending=[False, True]
            )
            take = batch.head(budget - used)
            n = len(take)
            yield pd.DataFrame(
                {
                    "host": take["host"].values,
                    "canon_url": take["canon_url"].values,
                    "admitted_seq": range(used + 1, used + n + 1),
                }
            )
            used += n
        state.update((used,))

    return events.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=_TOKEN_OUT,
        stateStructType=_TOKEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    discoveries: DataFrame,
    fetches: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: attribute each fetch
    completion to the discovery that scheduled it (same canon_url,
    fetch within ``horizon`` after discovery) and emit the fetch
    latency.

    Both sides are watermarked and the join carries a two-sided
    event-time constraint, so Spark bounds BOTH state stores: a
    buffered discovery can be evicted once the fetch-side watermark
    passes ``d_ts + horizon``, a buffered fetch once the discovery-side
    watermark passes ``f_ts`` (the range condition is what turns the
    default keep-forever stream join into O(horizon) state — required
    for outer modes, load-bearing at crawl scale for inner too).

    ``how='left_outer'`` additionally emits never-fetched discoveries
    (NULL fetch columns) once their join window has provably closed —
    the streaming form of the frontier loss report.

    Columns in must include ``ts, canon_url`` on both sides (fetches
    also ``status``); out: (canon_url, d_ts, f_ts, status,
    latency_sec)."""
    d = discoveries.withWatermark("ts", watermark).select(
        F.col("canon_url"), F.col("ts").alias("d_ts")
    )
    f = fetches.withWatermark("ts", watermark).select(
        F.col("canon_url").alias("f_url"),
        F.col("ts").alias("f_ts"),
        F.col("status"),
    )
    cond = (
        (d["canon_url"] == f["f_url"])
        & (f["f_ts"] >= d["d_ts"])
        & (f["f_ts"] <= d["d_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return d.join(f, cond, how).select(
        "canon_url",
        "d_ts",
        "f_ts",
        "status",
        (F.unix_timestamp("f_ts") - F.unix_timestamp("d_ts"))
        .cast("long")
        .alias("latency_sec"),
    )


def run_to_memory(
    df: DataFrame, name: str, checkpoint: str, output_mode: str = "append"
):
    """Drive a streaming frame to a memory sink with availableNow (test
    harness path; production uses writeStream.toTable/parquet + trigger)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_frontier_to_catalog(
    ingested: DataFrame,
    catalog_root: str,
    checkpoint: str,
    num_buckets: int = 32,
) -> None:
    """Streaming → snapshot-catalog bridge: commit each micro-batch of
    canonicalized, deduped frontier discoveries as an appended
    ``frontier_ingest`` delta (one atomic manifest+HEAD snapshot per
    epoch), so streaming ingestion lands in the same versioned,
    time-travelable storage the batch crawl uses.

    Exactly-once across restarts: Structured Streaming re-delivers the
    in-flight epoch after a failure, so the committed state records the
    last applied epoch and the ``foreachBatch`` body SKIPS any epoch it
    has already committed (idempotent sink — the standard contract for
    foreachBatch sinks without transactional targets). Runs with
    availableNow and blocks until the backlog drains.
    """
    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
    from who_focus_crawler_spark.functions.urls import host_bucket, url_hash

    cat = SnapshotCatalog(catalog_root)

    def commit_batch(df: DataFrame, epoch_id: int) -> None:
        head = cat.head()
        prev_state: dict = {}
        carry: dict = {}
        if head is not None:
            prev_state = dict(cat.state(head))
            # epoch ids are only meaningful per stream checkpoint: a new
            # checkpoint restarts at epoch 0, so the skip guard must be
            # scoped to the checkpoint identity or it would silently
            # drop every early epoch of a reprocessing run
            if (
                prev_state.get("ingest_ck") == checkpoint
                and epoch_id <= prev_state.get("last_epoch", -1)
            ):
                return  # re-delivered epoch: already durable, skip
            # carry EVERY other table of the snapshot forward (commit()
            # treats None as "keep the previous file list") — committing
            # only frontier_ingest would publish a HEAD that drops the
            # batch crawl's tables and resume state
            carry = {
                name: None
                for name in cat.manifest(head)["tables"]
                if name != "frontier_ingest"
            }
        rows = df.select(
            "canon_url",
            url_hash(F.col("canon_url")).alias("url_hash"),
            "host",
            host_bucket(F.col("host"), num_buckets).alias("host_bucket"),
            "priority",
            F.col("ts"),
        )
        sid = (head + 1) if head is not None else 0
        cat.commit(
            sid,
            {**carry, "frontier_ingest": rows},
            state={
                **prev_state,
                "last_epoch": int(epoch_id),
                "ingest_ck": checkpoint,
            },
        )

    q = (
        ingested.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_neardup_to_catalog(
    docs: DataFrame,
    catalog_root: str,
    checkpoint: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> None:
    """Streaming near-dup maintenance: each micro-batch of (doc_id, text)
    documents is probed against the PERSISTED MinHash signature index
    (new×old ∪ new×new — old×old never recomputed), the discovered pairs
    are appended to a ``neardup_pairs`` log, and the batch's signatures
    are appended to the ``minhash_index`` table — all in ONE atomic
    snapshot commit per epoch.

    This is the production "is this newly crawled page a dup of the
    corpus" loop: the index table is read manifest-listed (no listing
    scans), the batch side broadcasts its band keys so the index
    contributes only colliding rows (corpus/dedup.py::
    minhash_lsh_pairs_incremental), and the idempotent epoch guard makes
    re-delivered epochs no-ops (exactly-once across restarts, same
    contract as stream_frontier_to_catalog). Batch doc_ids already in
    the index are dropped (re-crawls re-probe under a new doc_id).
    """
    from who_focus_crawler_spark import schemas
    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
    from who_focus_crawler_spark.corpus.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    cat = SnapshotCatalog(catalog_root)

    def commit_batch(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        head = cat.head()
        prev_state: dict = {}
        carry: dict = {}
        old = None
        if head is not None:
            prev_state = dict(cat.state(head))
            if (
                prev_state.get("neardup_ck") == checkpoint
                and epoch_id <= prev_state.get("neardup_last_epoch", -1)
            ):
                return  # re-delivered epoch: already durable, skip
            carry = {
                name: None
                for name in cat.manifest(head)["tables"]
                if name not in ("minhash_index", "neardup_pairs")
            }
            old = cat.read_table(spark, "minhash_index", schemas.MINHASH_INDEX)
        if old is None:
            old = spark.createDataFrame([], schemas.MINHASH_INDEX)
        batch = df.select("doc_id", "text").dropDuplicates(["doc_id"]).join(
            old.select("doc_id"), "doc_id", "left_anti"
        )
        new_index = minhash_index(
            batch, num_hashes=num_hashes, shingle_k=shingle_k
        ).localCheckpoint()  # eager: consumed by probe AND commit
        pairs = minhash_lsh_pairs_incremental(
            new_index, old, bands=bands, jaccard_threshold=jaccard_threshold
        ).select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            F.col("jaccard").cast("double"),
        )
        sid = (head + 1) if head is not None else 0
        cat.commit(
            sid,
            {
                **carry,
                "minhash_index": new_index.select(
                    F.col("doc_id").cast("long"), "sh", "sig"
                ),
                "neardup_pairs": pairs,
            },
            state={
                **prev_state,
                "neardup_last_epoch": int(epoch_id),
                "neardup_ck": checkpoint,
            },
        )

    q = (
        docs.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
