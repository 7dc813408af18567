"""Streaming-layer tests (R36-R40): drive each streaming operator with
availableNow triggers over a parquet-directory source and check against
batch-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.streaming.pipeline import (
    politeness_tokens,
    run_to_memory,
    session_stats,
    stream_events,
    streaming_dedup,
    windowed_fetch_metrics,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    rows = []
    for i in range(300):
        # two activity bursts 2 h apart: the first burst's sessions and
        # windows close under the 30-min watermark, the second stays open
        base = T0 if i < 150 else T0 + dt.timedelta(hours=2)
        k = i % 110  # url id; repeats ⇒ stream-level duplicates
        rows.append(
            (
                base + dt.timedelta(minutes=i % 10),
                f"h{k % 7}.test",
                f"http://h{k % 7}.test/p/{k}",
                float(1000 - i),
            )
        )
    df = spark.createDataFrame(rows, ["ts", "host", "canon_url", "priority"])
    df.repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_windowed_metrics(spark, event_dir, tmp_path):
    batch = spark.read.parquet(event_dir)
    want = {
        (r.ws, r.host): r.n
        for r in batch.groupBy(
            F.window("ts", "10 minutes").alias("w"), "host"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "host", "n")
        .collect()
    }
    # complete mode: every window is emitted → exact match with batch
    out = windowed_fetch_metrics(stream_events(spark, event_dir))
    run_to_memory(out, "win_complete", str(tmp_path / "ck1c"), output_mode="complete")
    got_complete = {
        (r.window_start, r.host): r.n_urls
        for r in spark.sql("SELECT * FROM win_complete").collect()
    }
    assert got_complete == want
    # append mode: only windows closed by the watermark are emitted —
    # a strict, value-correct subset (R38 late-data semantics)
    run_to_memory(
        windowed_fetch_metrics(stream_events(spark, event_dir)),
        "win_append",
        str(tmp_path / "ck1a"),
        output_mode="append",
    )
    got_append = {
        (r.window_start, r.host): r.n_urls
        for r in spark.sql("SELECT * FROM win_append").collect()
    }
    assert set(got_append) < set(want)
    assert all(want[k] == v for k, v in got_append.items())
    assert len(got_append) > 0


def test_session_stats(spark, event_dir, tmp_path):
    out = session_stats(stream_events(spark, event_dir), gap="5 minutes")
    run_to_memory(out, "sess", str(tmp_path / "ck2"))
    rows = spark.sql("SELECT * FROM sess").collect()
    # burst A (events 0-149) merges into one closed session per host;
    # burst B's sessions are still open past the watermark → not emitted
    assert len(rows) == 7
    assert all(r.session_start < T0 + dt.timedelta(hours=1) for r in rows)
    assert sum(r.n_events for r in rows) == 150


def test_streaming_dedup(spark, event_dir, tmp_path):
    out = streaming_dedup(stream_events(spark, event_dir))
    run_to_memory(out, "dedup", str(tmp_path / "ck3"))
    rows = spark.sql("SELECT * FROM dedup").collect()
    urls = [r.canon_url for r in rows]
    assert len(urls) == len(set(urls)) == 110


def test_streaming_ingest_canonicalize_dedup(spark, tmp_path):
    """The batch C1 canonicalizer inside a streaming query: messy
    variants collapse to one frontier row; a checkpointed restart with
    re-discovered URLs admits only the genuinely new one."""
    from who_focus_crawler_spark.functions.urls import canonicalize_py
    from who_focus_crawler_spark.streaming.pipeline import (
        ingest_frontier,
        stream_raw_urls,
    )

    raw_dir = str(tmp_path / "raw")
    ck, out_dir = str(tmp_path / "ck_ing"), str(tmp_path / "ingest_out")
    batch1 = [
        (T0, "HTTP://H1.TEST/p/1", 9.0),            # messy variants of
        (T0, "http://h1.test:80/p/1", 8.0),          # ONE canonical URL
        (T0, "http://h1.test/x/../p/1#frag", 7.0),
        (T0, "http://h2.test/p/2?utm_source=x&b=1", 6.0),
        (T0, "not a url", 5.0),                      # dropped by C1
    ]
    spark.createDataFrame(batch1, ["ts", "url", "priority"]).coalesce(1).write.mode(
        "append"
    ).parquet(raw_dir)

    def run_once():
        q = (
            ingest_frontier(stream_raw_urls(spark, raw_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    rows = spark.read.parquet(out_dir).collect()
    got = {r.canon_url for r in rows}
    assert got == {"http://h1.test/p/1", "http://h2.test/p/2?b=1"}
    assert {r.host for r in rows} == {"h1.test", "h2.test"}
    for r in rows:
        assert canonicalize_py(r.canon_url) == r.canon_url  # idempotent form
    # restart: re-discoveries of seen URLs (inside the watermark horizon)
    # are suppressed by the restored state; the new URL is admitted
    batch2 = [
        (T0 + dt.timedelta(minutes=5), "http://h1.test/p/1", 4.0),
        (T0 + dt.timedelta(minutes=5), "HTTP://H2.TEST/p/2?b=1", 3.0),
        (T0 + dt.timedelta(minutes=5), "http://h3.test/p/3", 2.0),
    ]
    spark.createDataFrame(batch2, ["ts", "url", "priority"]).coalesce(1).write.mode(
        "append"
    ).parquet(raw_dir)
    run_once()
    got2 = {r.canon_url for r in spark.read.parquet(out_dir).collect()}
    assert got2 == got | {"http://h3.test/p/3"}


def test_politeness_tokens_stateful(spark, event_dir, tmp_path):
    out = politeness_tokens(stream_events(spark, event_dir), budget=5)
    run_to_memory(out, "tokens", str(tmp_path / "ck4"))
    rows = spark.sql("SELECT * FROM tokens").collect()
    by_host: dict[str, list[int]] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.admitted_seq)
    assert set(by_host) == {f"h{i}.test" for i in range(7)}
    for host, seqs in by_host.items():
        assert sorted(seqs) == list(range(1, 6)), host  # exactly budget=5, 1..5


def test_politeness_tokens_state_survives_restart(spark, event_dir, tmp_path):
    """Second availableNow run over the same checkpoint must admit nothing
    new (budget already spent, state restored from the state store).
    File sink: the memory sink does not support checkpoint recovery."""
    ck, out_dir = str(tmp_path / "ck5"), str(tmp_path / "tokens_out")

    def run_once():
        q = (
            politeness_tokens(stream_events(spark, event_dir), budget=5)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first == 35
    # append a new file with more events for the same hosts
    extra = spark.createDataFrame(
        [
            (T0 + dt.timedelta(hours=3), f"h{i % 7}.test",
             f"http://h{i % 7}.test/extra/{i}", 5000.0)
            for i in range(70)
        ],
        ["ts", "host", "canon_url", "priority"],
    )
    extra.coalesce(1).write.mode("append").parquet(event_dir)
    run_once()
    n_second = spark.read.parquet(out_dir).count()
    assert n_second == n_first  # budgets already exhausted: nothing admitted


def test_stream_frontier_to_catalog(spark, tmp_path):
    """foreachBatch → snapshot catalog: each drained epoch lands as an
    appended frontier_ingest delta behind an atomic manifest+HEAD
    commit; a restart appends only the new discoveries, and HEAD time
    travel shows the pre-restart state."""
    from who_focus_crawler_spark import schemas
    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
    from who_focus_crawler_spark.streaming.pipeline import (
        ingest_frontier,
        stream_frontier_to_catalog,
        stream_raw_urls,
    )

    raw_dir = str(tmp_path / "raw_cat")
    ck, cat_root = str(tmp_path / "ck_cat"), str(tmp_path / "catalog")
    batch1 = [
        (T0, "HTTP://H1.TEST/p/1", 9.0),
        (T0, "http://h1.test:80/p/1", 8.0),  # same canonical URL
        (T0, "http://h2.test/p/2", 6.0),
    ]
    spark.createDataFrame(batch1, ["ts", "url", "priority"]).coalesce(1).write.mode(
        "append"
    ).parquet(raw_dir)
    stream_frontier_to_catalog(
        ingest_frontier(stream_raw_urls(spark, raw_dir)), cat_root, ck
    )
    cat = SnapshotCatalog(cat_root)
    head1 = cat.head()
    got1 = {
        r.canon_url
        for r in cat.read_table(
            spark, "frontier_ingest", schemas.FRONTIER_INGEST
        ).collect()
    }
    assert got1 == {"http://h1.test/p/1", "http://h2.test/p/2"}
    # restart with one new discovery + one re-discovery
    batch2 = [
        (T0 + dt.timedelta(minutes=5), "http://h1.test/p/1", 4.0),
        (T0 + dt.timedelta(minutes=5), "http://h3.test/p/3", 2.0),
    ]
    spark.createDataFrame(batch2, ["ts", "url", "priority"]).coalesce(1).write.mode(
        "append"
    ).parquet(raw_dir)
    stream_frontier_to_catalog(
        ingest_frontier(stream_raw_urls(spark, raw_dir)), cat_root, ck
    )
    cat2 = SnapshotCatalog(cat_root)
    got2 = {
        r.canon_url
        for r in cat2.read_table(
            spark, "frontier_ingest", schemas.FRONTIER_INGEST
        ).collect()
    }
    assert got2 == got1 | {"http://h3.test/p/3"}
    assert cat2.head() > head1
    # time travel to the pre-restart snapshot still sees only batch 1
    old = {
        r.canon_url
        for r in cat2.read_table(
            spark, "frontier_ingest", schemas.FRONTIER_INGEST, snapshot_id=head1
        ).collect()
    }
    assert old == got1


def test_stream_catalog_composes_with_crawl_catalog(spark, tmp_path):
    """Streaming commits into a catalog the batch crawl owns must carry
    every crawl table and the resume state forward — and a NEW stream
    checkpoint against the same catalog must not skip epoch 0."""
    from who_focus_crawler_spark import schemas
    from who_focus_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from who_focus_crawler_spark.sources.fixture_web import UNIT_WEB
    from who_focus_crawler_spark.streaming.pipeline import (
        ingest_frontier,
        stream_frontier_to_catalog,
        stream_raw_urls,
    )

    cat_root = str(tmp_path / "shared_cat")
    cfg = CrawlConfig(web=UNIT_WEB, checkpoint_dir=cat_root, num_buckets=8)
    catalog = run_crawl(spark, cfg, until_batch=1)
    frontier_before = catalog.read_table(
        spark, "frontier", schemas.FRONTIER
    ).count()
    state_before = catalog.state()
    raw_dir = str(tmp_path / "raw_shared")
    spark.createDataFrame(
        [(T0, "http://h9.test/p/1", 1.0)], ["ts", "url", "priority"]
    ).coalesce(1).write.mode("append").parquet(raw_dir)
    stream_frontier_to_catalog(
        ingest_frontier(stream_raw_urls(spark, raw_dir)),
        cat_root,
        str(tmp_path / "ck_shared_1"),
    )
    # crawl tables and resume state survive the streaming commit
    assert (
        catalog.read_table(spark, "frontier", schemas.FRONTIER).count()
        == frontier_before
    )
    st = catalog.state()
    for k, v in state_before.items():
        assert st[k] == v, k
    assert st["last_epoch"] >= 0
    got = catalog.read_table(
        spark, "frontier_ingest", schemas.FRONTIER_INGEST
    )
    assert {r.canon_url for r in got.collect()} == {"http://h9.test/p/1"}
    # a FRESH checkpoint (epoch ids restart at 0) with new data must
    # still commit — the skip guard is scoped to the checkpoint identity
    raw2 = str(tmp_path / "raw_shared2")
    spark.createDataFrame(
        [(T0, "http://h10.test/p/2", 1.0)], ["ts", "url", "priority"]
    ).coalesce(1).write.mode("append").parquet(raw2)
    stream_frontier_to_catalog(
        ingest_frontier(stream_raw_urls(spark, raw2)),
        cat_root,
        str(tmp_path / "ck_shared_2"),
    )
    got2 = {
        r.canon_url
        for r in catalog.read_table(
            spark, "frontier_ingest", schemas.FRONTIER_INGEST
        ).collect()
    }
    assert got2 == {"http://h9.test/p/1", "http://h10.test/p/2"}


def test_stream_interval_join_inner_and_outer(spark, tmp_path):
    """Stream-stream event-time interval join (discovery → fetch
    attribution): the inner join over two availableNow file streams
    equals the batch interval join exactly; left-outer additionally
    emits never-fetched discoveries whose window provably closed under
    the watermark, with NULL fetch columns."""
    from who_focus_crawler_spark.streaming.pipeline import stream_interval_join

    d_dir, f_dir = str(tmp_path / "disc"), str(tmp_path / "fetch")
    disc, fetch = [], []
    for i in range(40):
        u = f"http://h{i % 5}.test/p/{i}"
        dts = T0 + dt.timedelta(minutes=i)
        disc.append((dts, u))
        if i % 4 != 0:  # 30 fetched (latency i%7 min ≤ horizon), 10 never
            fetch.append((dts + dt.timedelta(minutes=i % 7), u, 200 + i % 2))
    # a late straggler fetch OUTSIDE the 10-min horizon: joins with nothing
    fetch.append((T0 + dt.timedelta(minutes=90), "http://h1.test/p/1", 200))
    # watermark-advancing sentinels far past every join window, so outer
    # mode can prove each unmatched discovery will never match
    disc.append((T0 + dt.timedelta(hours=6), "http://sentinel.test/d"))
    fetch.append((T0 + dt.timedelta(hours=6), "http://sentinel.test/f", 200))
    d_schema, f_schema = ["ts", "canon_url"], ["ts", "canon_url", "status"]
    spark.createDataFrame(disc, d_schema).repartition(3).write.parquet(d_dir)
    spark.createDataFrame(fetch, f_schema).repartition(3).write.parquet(f_dir)

    d_stream = spark.readStream.schema(
        spark.read.parquet(d_dir).schema
    ).parquet(d_dir)
    f_stream = spark.readStream.schema(
        spark.read.parquet(f_dir).schema
    ).parquet(f_dir)
    out = stream_interval_join(
        d_stream, f_stream, horizon="10 minutes", watermark="5 minutes"
    )
    run_to_memory(out, "sj_inner", str(tmp_path / "ck_sj"))
    got = {
        (r.canon_url, r.d_ts, r.f_ts, r.status, r.latency_sec)
        for r in spark.sql("SELECT * FROM sj_inner").collect()
    }

    d_b = spark.read.parquet(d_dir).select("canon_url", F.col("ts").alias("d_ts"))
    f_b = spark.read.parquet(f_dir).select(
        F.col("canon_url").alias("f_url"), F.col("ts").alias("f_ts"), "status"
    )
    want = {
        (r.canon_url, r.d_ts, r.f_ts, r.status, r.latency_sec)
        for r in d_b.join(
            f_b,
            (d_b.canon_url == f_b.f_url)
            & (f_b.f_ts >= d_b.d_ts)
            & (f_b.f_ts <= d_b.d_ts + F.expr("INTERVAL 10 minutes")),
        )
        .select(
            "canon_url",
            "d_ts",
            "f_ts",
            "status",
            (F.unix_timestamp("f_ts") - F.unix_timestamp("d_ts"))
            .cast("long")
            .alias("latency_sec"),
        )
        .collect()
    }
    # 30 in-horizon fetches; the straggler is past the horizon and the
    # sentinels are distinct URLs, so neither joins
    assert len(want) == 30
    assert got == want

    out_l = stream_interval_join(
        d_stream, f_stream, horizon="10 minutes",
        watermark="5 minutes", how="left_outer",
    )
    run_to_memory(out_l, "sj_outer", str(tmp_path / "ck_sjo"))
    rows_l = spark.sql("SELECT * FROM sj_outer").collect()
    matched = {
        (r.canon_url, r.d_ts, r.f_ts, r.status, r.latency_sec)
        for r in rows_l
        if r.f_ts is not None
    }
    assert matched == want
    unmatched = {r.canon_url for r in rows_l if r.f_ts is None}
    # every unfetched discovery (i % 4 == 0) surfaces with NULL fetch side
    assert {f"http://h{i % 5}.test/p/{i}" for i in range(0, 40, 4)} <= unmatched
    for r in rows_l:
        if r.f_ts is None:
            assert r.status is None and r.latency_sec is None


def test_stream_neardup_to_catalog(spark, tmp_path):
    """Streaming near-dup maintenance: each epoch probes the persisted
    signature index (new x old + new x new, never old x old), appends
    pairs + signatures in one snapshot commit, and the cumulative pair
    log equals the full-batch LSH run over all documents."""
    from who_focus_crawler_spark import schemas
    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
    from who_focus_crawler_spark.corpus.dedup import minhash_lsh_pairs
    from who_focus_crawler_spark.streaming.pipeline import (
        stream_neardup_to_catalog,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi")
    docs1 = [
        (1, base),
        (2, "one two three four five six seven eight nine ten"),
        (3, base.replace("pi", "rho")),  # near-dup of 1
    ]
    docs2 = [
        (4, base.replace("alpha", "sigma")),  # near-dup of 1 and 3
        (5, "cold rain falls on quiet roofs tonight and nobody minds"),
    ]
    doc_dir = str(tmp_path / "docs_nd")
    ck, cat_root = str(tmp_path / "ck_nd"), str(tmp_path / "cat_nd")
    schema = "doc_id long, text string"

    def run():
        docs = spark.readStream.schema(schema).parquet(doc_dir)
        stream_neardup_to_catalog(docs, cat_root, ck)

    spark.createDataFrame(docs1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(doc_dir)
    run()
    cat = SnapshotCatalog(cat_root)
    pairs1 = {
        (r.doc_a, r.doc_b)
        for r in cat.read_table(
            spark, "neardup_pairs", schemas.NEARDUP_PAIRS
        ).collect()
    }
    assert pairs1 == {(1, 3)}
    head1 = cat.head()

    spark.createDataFrame(docs2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(doc_dir)
    run()
    cat = SnapshotCatalog(cat_root)
    pairs2 = {
        (r.doc_a, r.doc_b)
        for r in cat.read_table(
            spark, "neardup_pairs", schemas.NEARDUP_PAIRS
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(docs1 + docs2, schema)
        ).collect()
    }
    assert pairs2 == full and {(1, 4), (3, 4)} <= pairs2
    idx = {
        r.doc_id
        for r in cat.read_table(
            spark, "minhash_index", schemas.MINHASH_INDEX
        ).collect()
    }
    assert idx == {1, 2, 3, 4, 5}
    assert cat.head() > head1

    # drained re-run: no new files, catalog unchanged
    head2 = cat.head()
    run()
    assert SnapshotCatalog(cat_root).head() == head2
