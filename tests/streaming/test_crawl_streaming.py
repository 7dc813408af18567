"""Streaming crawl variant (streaming/crawl.py): the self-feeding
foreachBatch loop must crawl the SAME web to the SAME final url_seen
set and documents corpus as the batch loop (crawl_order relaxes to
epoch-local order), stay exactly-once across a mid-stream restart, and
be a no-op when re-driven after draining."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from who_focus_crawler_spark.sources.fixture_web import UNIT_WEB
from who_focus_crawler_spark.streaming.crawl import run_crawl_streaming


def _doc_map(spark, cat):
    rows = cat.read_table(spark, "documents", schemas.DOCUMENTS_OUT).collect()
    return {
        r.doc_id: tuple(
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        )
        for r in rows
    }


def _url_seen(spark, cat):
    return {
        r.canon_url
        for r in cat.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }


@pytest.fixture(scope="module")
def batch_run(spark, tmp_path_factory):
    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("batch_cat")),
        num_buckets=8,
    )
    cat = run_crawl(spark, cfg)
    assert cat.state()["finished"]  # the fixture web drains fully
    return cat


def test_streaming_equals_batch_final_sets(spark, tmp_path, batch_run):
    cfg = CrawlConfig(
        web=UNIT_WEB, checkpoint_dir=str(tmp_path / "unused"), num_buckets=8
    )
    scat = run_crawl_streaming(
        spark,
        cfg,
        inbox=str(tmp_path / "inbox"),
        checkpoint=str(tmp_path / "ck"),
        catalog_root=str(tmp_path / "scat"),
    )
    assert _url_seen(spark, scat) == _url_seen(spark, batch_run)
    sdocs, bdocs = _doc_map(spark, scat), _doc_map(spark, batch_run)
    assert sdocs == bdocs
    # crawl_order relaxed: same fetch SET, seq a contiguous 1..n total order
    so = scat.read_table(spark, "crawl_order", schemas.CRAWL_ORDER).collect()
    bo = batch_run.read_table(
        spark, "crawl_order", schemas.CRAWL_ORDER
    ).collect()
    assert {r.canon_url for r in so} == {r.canon_url for r in bo}
    assert sorted(r.seq for r in so) == list(range(1, len(so) + 1))
    # per-row lineage intact: depth/host/seed match the batch loop's
    bmeta = {r.canon_url: (r.host, r.seed_id) for r in bo}
    for r in so:
        assert (r.host, r.seed_id) == bmeta[r.canon_url], r.canon_url


def test_streaming_restart_mid_stream_exactly_once(
    spark, tmp_path, batch_run
):
    cfg = CrawlConfig(
        web=UNIT_WEB, checkpoint_dir=str(tmp_path / "unused"), num_buckets=8
    )
    args = dict(
        inbox=str(tmp_path / "inbox"),
        checkpoint=str(tmp_path / "ck"),
        catalog_root=str(tmp_path / "scat"),
    )
    # "crash" after the first cycle...
    scat = run_crawl_streaming(spark, cfg, max_cycles=1, **args)
    mid_epochs = scat.state()["crawl_epochs"]
    assert not _url_seen(spark, scat) >= _url_seen(spark, batch_run) or len(
        _doc_map(spark, scat)
    ) < len(_doc_map(spark, batch_run))  # genuinely mid-crawl
    # ...then restart from the same checkpoint: the run completes with
    # NO duplicated or lost work
    scat = run_crawl_streaming(spark, cfg, **args)
    assert scat.state()["crawl_epochs"] > mid_epochs
    assert _url_seen(spark, scat) == _url_seen(spark, batch_run)
    assert _doc_map(spark, scat) == _doc_map(spark, batch_run)
    so = scat.read_table(spark, "crawl_order", schemas.CRAWL_ORDER).collect()
    assert sorted(r.seq for r in so) == list(range(1, len(so) + 1))
    assert len({r.canon_url for r in so}) == len(so)  # no double fetch
    # driving a DRAINED crawl again applies zero epochs and changes nothing
    done_epochs = scat.state()["crawl_epochs"]
    scat = run_crawl_streaming(spark, cfg, **args)
    assert scat.state()["crawl_epochs"] == done_epochs
    assert _doc_map(spark, scat) == _doc_map(spark, batch_run)
