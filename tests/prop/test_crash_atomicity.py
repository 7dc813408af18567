"""Commit-atomicity crash injection for the snapshot shim
(checkpoint/snapshot.py — VERDICT r2 item 4).

The commit protocol is: (1) write data files, (2) durably write the
manifest, (3) atomically swap HEAD. A kill at ANY point before (3)
must leave readers on the previous snapshot with nothing torn, and a
subsequent writer (the resumed crawl) must complete as if the crash
never happened. Each test simulates the kill by raising from the exact
protocol step, then re-drives the writer."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
from who_focus_crawler_spark.plans.crawl import (
    CrawlConfig,
    run_batch,
    run_crawl,
)
from who_focus_crawler_spark.sources.fixture_web import WebConfig

CRASH_WEB = WebConfig(n_hosts=6, n_pages=40, seed_hosts=(0, 1), max_batches=6)


class _Boom(RuntimeError):
    pass


def _mk(spark, tmp_path, name="cat"):
    cat = SnapshotCatalog(str(tmp_path / name))
    cat.commit(
        0,
        {"t": spark.createDataFrame([(1, "a")], "k long, v string")},
        state={"n": 0},
    )
    return cat


def _rows(spark, cat, snap=None):
    df = cat.read_table(spark, "t", "k long, v string", snapshot_id=snap) \
        if snap is not None else cat.read_table(spark, "t", "k long, v string")
    return sorted((r.k, r.v) for r in df.collect())


def test_kill_after_data_files_before_manifest(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    new = spark.createDataFrame([(2, "b")], "k long, v string")

    orig = cat._write_manifest
    cat._write_manifest = lambda m: (_ for _ in ()).throw(_Boom())
    with pytest.raises(_Boom):
        cat.commit(1, {"t": new}, state={"n": 1})
    cat._write_manifest = orig

    # reader: old snapshot intact, no manifest for 1, HEAD unmoved
    assert cat.head() == 0
    assert not cat._manifest_path(1).exists()
    assert _rows(spark, cat) == [(1, "a")]
    # recovery: the same commit re-driven lands cleanly
    cat.commit(1, {"t": new}, state={"n": 1})
    assert cat.head() == 1
    assert _rows(spark, cat) == [(2, "b")]
    assert _rows(spark, cat, snap=0) == [(1, "a")]  # time travel intact


def test_kill_after_manifest_before_head_swap(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    new = spark.createDataFrame([(2, "b")], "k long, v string")

    orig = cat._swap_head
    cat._swap_head = lambda sid: (_ for _ in ()).throw(_Boom())
    with pytest.raises(_Boom):
        cat.commit(1, {"t": new}, state={"n": 1})
    cat._swap_head = orig

    # the manifest exists as an ORPHAN, but no reader can reach it:
    # head() still 0, HEAD-relative reads untorn
    assert cat._manifest_path(1).exists()
    assert cat.head() == 0
    assert _rows(spark, cat) == [(1, "a")]
    assert dict(cat.state())["n"] == 0
    # the orphan id is NOT handed out again to an unrelated writer...
    assert cat.next_snapshot_id() == 2
    # ...but re-driving the SAME commit rewrites the orphan (the
    # documented recovery path) and publishes atomically
    cat.commit(1, {"t": new}, state={"n": 1})
    assert cat.head() == 1
    assert _rows(spark, cat) == [(2, "b")]


def test_kill_mid_head_write_leaves_head_intact(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    new = spark.createDataFrame([(2, "b")], "k long, v string")

    orig = cat._swap_head

    def torn_swap(sid):
        # write the tmp file, die before the atomic os.replace
        tmp = cat._head_path.with_suffix(".tmp")
        tmp.write_text(str(sid))
        raise _Boom()

    cat._swap_head = torn_swap
    with pytest.raises(_Boom):
        cat.commit(1, {"t": new}, state={"n": 1})
    cat._swap_head = orig

    assert cat.head() == 0  # HEAD file never half-written
    assert _rows(spark, cat) == [(1, "a")]
    cat.commit(1, {"t": new}, state={"n": 1})
    assert cat.head() == 1 and _rows(spark, cat) == [(2, "b")]


def test_crawl_resumes_identically_after_torn_batch_commit(spark, tmp_path):
    """End-to-end: a crawl whose batch-3 commit dies between manifest
    and HEAD swap resumes to EXACTLY the uninterrupted run's crawl_order
    and url_seen — the orphan manifest is skipped by the id allocator
    and invisible to every read."""
    full = run_crawl(
        spark,
        CrawlConfig(
            web=CRASH_WEB,
            checkpoint_dir=str(tmp_path / "full"),
            num_buckets=8,
        ),
    )
    cfg = CrawlConfig(
        web=CRASH_WEB,
        checkpoint_dir=str(tmp_path / "crash"),
        num_buckets=8,
    )
    run_crawl(spark, cfg, until_batch=2)
    cat = SnapshotCatalog(cfg.checkpoint_dir)
    orig = cat._swap_head
    cat._swap_head = lambda sid: (_ for _ in ()).throw(_Boom())
    with pytest.raises(_Boom):
        run_batch(spark, cfg, cat)
    cat._swap_head = orig
    assert cat.state()["next_batch"] == 3  # batch 3 not committed

    resumed = run_crawl(spark, cfg, resume=True)

    def order(c):
        return [
            (r.seq, r.batch, r.canon_url)
            for r in c.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
            .orderBy("seq")
            .collect()
        ]

    def seen(c):
        return {
            r.canon_url
            for r in c.read_table(
                spark, "url_seen", schemas.URL_SEEN
            ).collect()
        }

    assert order(resumed) == order(full)
    assert seen(resumed) == seen(full)
