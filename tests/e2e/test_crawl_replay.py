"""Golden end-to-end crawl replay (SURVEY.md §5.2.2).

The Spark engine must reproduce the sequential golden crawler exactly:
crawl order (seq, batch, url, host, depth, seed), the final URL-seen set,
per-document span sequences, and per-(batch, host) metrics.
"""

from __future__ import annotations

import pytest

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from who_focus_crawler_spark.sources.fixture_web import UNIT_WEB
from who_focus_crawler_spark.sources.golden import run_golden


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_unit")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(UNIT_WEB)
    return spark, catalog, golden


def test_crawl_order_exact(crawled):
    spark, catalog, golden = crawled
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order


def test_url_seen_exact(crawled):
    spark, catalog, golden = crawled
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == golden.url_seen


def test_span_sequence_equality(crawled):
    spark, catalog, golden = crawled
    docs = catalog.read_table(spark, "documents", schemas.DOCUMENTS_OUT).collect()
    assert len(docs) == len(golden.documents)
    for r in docs:
        want = golden.documents[r.doc_id]
        got = [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
        assert got == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want
        ], r.doc_id


def test_metrics_match_golden(crawled):
    spark, catalog, golden = crawled
    rows = catalog.read_table(spark, "metrics", schemas.METRICS).collect()
    got = {
        (r.batch, r.host): dict(
            scheduled=r.scheduled,
            blocked_robots=r.blocked_robots,
            admitted=r.admitted,
            deferred=r.deferred,
            fetched=r.fetched,
            discovered=r.discovered,
            deduped=r.deduped,
            new_urls=r.new_urls,
        )
        for r in rows
    }
    assert got == golden.metrics


def test_politeness_invariant(crawled):
    spark, catalog, _ = crawled
    from pyspark.sql import functions as F

    co = catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
    over = (
        co.groupBy("batch", "host")
        .count()
        .filter(F.col("count") > UNIT_WEB.politeness_k)
        .count()
    )
    assert over == 0


def test_expire_snapshots_keeps_head_history(crawled):
    """Iceberg-style maintenance: after expiring to the last 3 snapshots,
    HEAD still reads the COMPLETE crawl history (retained manifests carry
    full append-table file lists), old manifests are gone, and storage
    shrank; crawl_order equality vs golden still holds."""
    spark, catalog, golden = crawled
    head = catalog.head()
    assert head is not None and head > 4  # enough history to expire
    before = len(list(catalog.root.glob("manifest-*.json")))
    res = catalog.expire_snapshots(keep_last=3)
    assert res["manifests_removed"] == before - 3
    assert res["files_removed"] > 0
    assert catalog.head() == head
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    # time travel inside the retained window still works
    prev = catalog.read_table(
        spark, "crawl_order", schemas.CRAWL_ORDER, snapshot_id=head - 1
    )
    assert prev.count() <= len(got)


def test_trap_gate_blocks_all_discovery_at_zero(spark, tmp_path_factory):
    """trap_threshold=0 filters every discovered link (all scores are
    >= 0), so the crawl sees exactly the seed set; the default (None)
    path is pinned by the golden tests above."""
    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_trapgate")),
        num_buckets=8,
        trap_threshold=0,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(UNIT_WEB)
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == {u for (_, b, u, h, d, s) in golden.crawl_order if d == 0}


def test_sitemap_seeding_enqueues_listed_urls(spark, tmp_path_factory):
    """use_sitemaps=True: frontier v0 = seeds + their hosts' sitemap
    entries (depth 1, sitemap priority, parented to the seed); the
    default path stays golden-exact (tests above)."""
    from who_focus_crawler_spark.plans.crawl import bootstrap
    from who_focus_crawler_spark.sources.fixture_web import (
        host_name,
        sitemap_entries,
    )

    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_sitemap")),
        num_buckets=8,
        use_sitemaps=True,
    )
    catalog = bootstrap(spark, cfg)
    frontier = catalog.read_table(spark, "frontier", schemas.FRONTIER).collect()
    by_depth = {}
    for r in frontier:
        by_depth.setdefault(r.depth, set()).add(r.canon_url)
    want = set()
    for i in UNIT_WEB.seed_hosts:
        for loc, _ in sitemap_entries(host_name(i), UNIT_WEB):
            want.add(loc)
    # seeds themselves (depth 0) are excluded from the sitemap tier
    want -= by_depth[0]
    assert by_depth.get(1, set()) == want
    # lineage: every sitemap row is parented to a seed's url_hash
    seed_hashes = {r.url_hash for r in frontier if r.depth == 0}
    assert all(
        r.parent_hash in seed_hashes for r in frontier if r.depth == 1
    )
    # url_seen covers both tiers
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == by_depth[0] | by_depth.get(1, set())


def test_trap_gate_also_covers_sitemap_channel(spark, tmp_path_factory):
    """trap_threshold applies to BOTH discovery channels: with the gate
    at 0 and sitemaps on, bootstrap still enqueues only the seeds."""
    from who_focus_crawler_spark.plans.crawl import bootstrap
    from who_focus_crawler_spark.sources.fixture_web import seed_urls

    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_sm_trap")),
        num_buckets=8,
        use_sitemaps=True,
        trap_threshold=0,
    )
    catalog = bootstrap(spark, cfg)
    frontier = catalog.read_table(spark, "frontier", schemas.FRONTIER).collect()
    assert {r.canon_url for r in frontier} == set(seed_urls(UNIT_WEB))


def test_compact_table_preserves_rows_and_time_travel(spark, tmp_path_factory):
    """Compaction rewrites an append table's many per-batch files into
    one, preserves exact contents, leaves older snapshots readable, and
    expiry then reclaims the superseded files."""
    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_compact")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(UNIT_WEB)
    head = catalog.head()
    n_files_before = len(catalog.manifest(head)["tables"]["crawl_order"])
    assert n_files_before > 1  # one file-set per batch accumulated
    res = catalog.compact_table(spark, "crawl_order", schemas.CRAWL_ORDER)
    assert res["compacted"] and res["files_before"] == n_files_before
    assert catalog.head() == head + 1
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order  # contents byte-identical
    # pre-compaction snapshot still reads the original files
    old = catalog.read_table(
        spark, "crawl_order", schemas.CRAWL_ORDER, snapshot_id=head
    )
    assert old.count() == len(got)
    # idempotent: already compact
    assert not catalog.compact_table(spark, "crawl_order", schemas.CRAWL_ORDER)[
        "compacted"
    ]
    # expiry reclaims the superseded per-batch files, HEAD still reads all
    catalog.expire_snapshots(keep_last=1)
    assert catalog.read_table(
        spark, "crawl_order", schemas.CRAWL_ORDER
    ).count() == len(got)


def test_sql_views_over_checkpoint(crawled):
    """spark.sql over registered checkpoint views reproduces the golden
    crawl order and joins crawl tables relationally; compaction with a
    sort order preserves contents."""
    spark, catalog, golden = crawled
    from who_focus_crawler_spark.plans.sql import register_catalog_views

    views = register_catalog_views(spark, catalog, prefix="v_")
    assert "v_crawl_order" in views and "v_metrics" in views
    rows = spark.sql(
        "SELECT seq, batch, canon_url, host, depth, seed_id "
        "FROM v_crawl_order ORDER BY seq"
    ).collect()
    assert [tuple(r) for r in rows] == golden.crawl_order
    # aggregate-then-join: metrics' fetched count must EQUAL the
    # crawl_order row count per host (fan-out-free, can actually fail)
    joined = spark.sql(
        "SELECT m.host, m.fetched, c.pages FROM "
        "(SELECT host, sum(fetched) AS fetched FROM v_metrics GROUP BY host) m "
        "JOIN (SELECT host, count(*) AS pages FROM v_crawl_order GROUP BY host) c "
        "ON m.host = c.host"
    ).collect()
    assert len(joined) > 0
    assert all(r.fetched == r.pages for r in joined), joined
    # sort-ordered compaction keeps contents identical
    res = catalog.compact_table(
        spark, "crawl_order", schemas.CRAWL_ORDER, sort_by=["seq"]
    )
    if res["compacted"]:  # may already be compacted by an earlier test
        after = (
            catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
            .orderBy("seq")
            .collect()
        )
        got = [
            (r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id)
            for r in after
        ]
        assert got == golden.crawl_order


def test_redirect_crawl_matches_golden(spark, tmp_path_factory):
    """HTTP 3xx semantics (opt-in web config): redirect pages consume a
    fetch slot and a seq like any round trip, their Location target
    enters discovery like a link, and the whole crawl stays byte-exact
    vs the sequential golden. Default goldens are untouched
    (redirect_every=None elsewhere)."""
    from dataclasses import replace

    from who_focus_crawler_spark.sources.fixture_web import redirect_target

    web = replace(UNIT_WEB, redirect_every=4, max_batches=12)
    cfg = CrawlConfig(
        web=web,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_redir")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(web)
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == golden.url_seen
    # the scenario is non-vacuous: redirect pages were actually fetched,
    # and each redirect's target ended up in the URL-seen set
    fetched_redirects = [
        u for _, _, u, _, _, _ in golden.crawl_order
        if redirect_target(u, web) is not None
    ]
    assert len(fetched_redirects) > 0
    for u in fetched_redirects:
        assert redirect_target(u, web) in golden.url_seen, u
    # span-sequence equality holds for redirect docs too (single span)
    docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in catalog.read_table(
            spark, "documents", schemas.DOCUMENTS_OUT
        ).collect()
    }
    for u in fetched_redirects:
        assert docs[u] == [
            ("redirect", None, redirect_target(u, web), 0)
        ]


def test_compact_table_with_zorder(spark, tmp_path_factory):
    """Z-order compaction (Iceberg rewrite-with-zorder): contents stay
    byte-identical, mutual exclusion with sort_by holds, and the write
    lands as a new snapshot with time travel intact. (The pruning
    payoff of the layout itself is measured in tests/unit/test_zorder.)"""
    import pytest as _pytest

    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_zorder")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg, until_batch=4)
    golden = run_golden(UNIT_WEB, max_batches=4)
    head = catalog.head()
    with _pytest.raises(ValueError, match="exclusive"):
        catalog.compact_table(
            spark,
            "crawl_order",
            schemas.CRAWL_ORDER,
            sort_by=["seq"],
            zorder_by=["seq"],
        )
    res = catalog.compact_table(
        spark,
        "crawl_order",
        schemas.CRAWL_ORDER,
        num_files=2,
        zorder_by=["url_hash", "depth"],
    )
    assert res["compacted"]
    assert catalog.head() == head + 1
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    old = catalog.read_table(
        spark, "crawl_order", schemas.CRAWL_ORDER, snapshot_id=head
    )
    assert old.count() == len(got)


def test_resume_after_compact_and_expire(spark, tmp_path_factory):
    """The maintenance sequence a production operator actually runs:
    stop mid-crawl → compact → expire to one snapshot → resume. The
    resumed crawl must build on the compacted file set (commit carries
    forward from HEAD) and finish byte-identical to the golden run."""
    cfg = CrawlConfig(
        web=UNIT_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_maint")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg, until_batch=3)
    res = catalog.compact_table(
        spark, "crawl_order", schemas.CRAWL_ORDER, sort_by=["seq"]
    )
    assert res["compacted"]
    catalog.expire_snapshots(keep_last=1)
    catalog = run_crawl(spark, cfg, resume=True)
    golden = run_golden(UNIT_WEB)
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order


def test_e2e_tier_crawl_matches_golden(spark, tmp_path_factory):
    """The larger fixture tier (40 hosts / 2,000 pages / 30 batches,
    hot-host skew, robots variety): crawl order and URL-seen must equal
    the sequential golden crawler exactly — the unit-tier equality
    holding at 40x the page count is the strongest determinism evidence
    this sandbox can produce (~2.5 min)."""
    from who_focus_crawler_spark.sources.fixture_web import E2E_WEB

    cfg = CrawlConfig(
        web=E2E_WEB,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_e2e_tier")),
        num_buckets=16,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(E2E_WEB)
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == golden.url_seen


def test_crawl_delay_budget_matches_golden(spark, tmp_path_factory):
    """batch_window_s set: hosts declaring Crawl-delay d admit at most
    min(politeness_k, max(1, window // d)) fetches per batch, and the
    engine still replays the golden crawler exactly (order + metrics)."""
    import dataclasses

    from who_focus_crawler_spark.sources.fixture_web import (
        host_name,
        robots_crawl_delay,
    )

    web = dataclasses.replace(UNIT_WEB, batch_window_s=3)
    # the fixture must actually constrain someone, or this test is vacuous
    assert any(
        robots_crawl_delay(host_name(i), web) for i in range(web.n_hosts)
    )
    cfg = CrawlConfig(
        web=web,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_delay")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(web)
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    # the constrained host's schedule differs from the unconstrained run
    base = run_golden(UNIT_WEB)
    assert golden.crawl_order != base.crawl_order
    mrows = catalog.read_table(spark, "metrics", schemas.METRICS).collect()
    gotm = {
        (r.batch, r.host): dict(
            scheduled=r.scheduled,
            blocked_robots=r.blocked_robots,
            admitted=r.admitted,
            deferred=r.deferred,
            fetched=r.fetched,
            discovered=r.discovered,
            deduped=r.deduped,
            new_urls=r.new_urls,
        )
        for r in mrows
    }
    assert gotm == golden.metrics


def test_meta_robots_crawl_matches_golden(spark, tmp_path_factory):
    """Robots META directives (opt-in web config): noindex pages are
    fetched (hold a seq) but excluded from the documents corpus;
    nofollow pages emit no discovery events. The whole crawl stays
    byte-exact vs the sequential golden. Default goldens untouched
    (meta_robots_every=None elsewhere)."""
    from dataclasses import replace

    from who_focus_crawler_spark.sources.fixture_web import meta_robots

    web = replace(UNIT_WEB, meta_robots_every=4, max_batches=12)
    cfg = CrawlConfig(
        web=web,
        checkpoint_dir=str(tmp_path_factory.mktemp("crawl_meta")),
        num_buckets=8,
    )
    catalog = run_crawl(spark, cfg)
    golden = run_golden(web)
    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == golden.url_seen
    # documents: byte-exact AND noindex exclusion on both sides
    docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in catalog.read_table(
            spark, "documents", schemas.DOCUMENTS_OUT
        ).collect()
    }
    gold_docs = {
        u: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
        for u, sp in golden.documents.items()
    }
    assert docs == gold_docs
    # non-vacuity: the crawl actually fetched noindex and nofollow pages
    fetched_urls = [u for _, _, u, _, _, _ in golden.crawl_order]
    noindexed = [u for u in fetched_urls if meta_robots(u, web)[0]]
    nofollowed = [u for u in fetched_urls if meta_robots(u, web)[1]]
    assert noindexed, "scenario vacuous: no noindex page fetched"
    assert nofollowed, "scenario vacuous: no nofollow page fetched"
    for u in noindexed:
        assert u not in docs
    # nofollow pages ARE indexed (unless also noindex) — only their
    # links are suppressed
    for u in nofollowed:
        if not meta_robots(u, web)[0]:
            assert u in docs


def test_opic_priority_crawl_deterministic_and_nonvacuous(spark, tmp_path_factory):
    """CrawlConfig.opic_priority: the OPIC bonus re-ranks hosts within a
    BFS depth level. The adaptive schedule must be (a) run-to-run
    deterministic, (b) actually different from the frozen BFS order,
    and (c) coverage-preserving — same final URL-seen set once the web
    is exhausted. Default goldens are untouched (flag off elsewhere)."""
    from dataclasses import replace

    # UNIT_WEB's 5-host graph is too symmetric at host level (non-hot
    # hosts see only self-links + links to the hot host, so their OPIC
    # masses tie exactly and the host-asc tie-break reproduces BFS);
    # 12 hosts × 240 pages gives the random cross-host links real
    # multiplicity structure, which is the signal the policy ranks on
    web = replace(
        UNIT_WEB, n_hosts=12, n_pages=240, seed_hosts=(0, 1, 2), max_batches=30
    )

    def run(opic, tag):
        cfg = CrawlConfig(
            web=web,
            checkpoint_dir=str(tmp_path_factory.mktemp(f"crawl_opic_{tag}")),
            num_buckets=8,
            opic_priority=opic,
        )
        cat = run_crawl(spark, cfg)
        rows = (
            cat.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
            .orderBy("seq")
            .collect()
        )
        seen = {
            r.canon_url
            for r in cat.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
        }
        return [(r.seq, r.canon_url) for r in rows], seen

    order_a, seen_a = run(True, "a")
    order_b, seen_b = run(True, "b")
    assert order_a == order_b  # deterministic under the adaptive policy
    order_d, seen_d = run(False, "d")
    assert [u for _, u in order_a] != [u for _, u in order_d]  # non-vacuous
    assert seen_a == seen_b == seen_d  # exhaustive crawl: same coverage


def test_aging_crawl_deterministic_and_nonvacuous(spark, tmp_path_factory):
    """CrawlConfig.aging_boost_milli: the starvation-free aging view lets
    long-waiting deep URLs overtake fresh shallow arrivals. Must be
    (a) run-to-run deterministic, (b) actually different from frozen
    BFS order (the boost crosses depth levels on politeness-capped
    hosts), and (c) coverage-preserving — the web is exhausted either
    way, so the final URL-seen set is identical. Default goldens are
    untouched (aging_boost_milli=None elsewhere)."""
    from dataclasses import replace

    # a politeness-capped hot host (many pages per batch admitted 2 at
    # a time) guarantees rows that wait multiple batches — the aging
    # signal is real, not synthetic
    web = replace(UNIT_WEB, n_hosts=6, n_pages=180, seed_hosts=(0,), max_batches=40)

    def run(boost, tag):
        cfg = CrawlConfig(
            web=web,
            checkpoint_dir=str(tmp_path_factory.mktemp(f"crawl_age_{tag}")),
            num_buckets=8,
            aging_boost_milli=boost,
        )
        cat = run_crawl(spark, cfg)
        rows = (
            cat.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
            .orderBy("seq")
            .collect()
        )
        seen = {
            r.canon_url
            for r in cat.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
        }
        return [(r.seq, r.canon_url) for r in rows], seen

    order_a, seen_a = run(1500, "a")
    order_b, seen_b = run(1500, "b")
    assert order_a == order_b  # deterministic under aging
    order_d, seen_d = run(None, "d")
    assert [u for _, u in order_a] != [u for _, u in order_d]  # non-vacuous
    assert seen_a == seen_b == seen_d  # exhaustive crawl: same coverage


def test_content_seen_dedup_matches_golden(spark, tmp_path_factory):
    """WebConfig.content_dedup + mirror pages: the Mercator content-seen
    test. Mirrors serve byte-identical bodies of their host's first
    pages; with the flag on, duplicates keep their crawl_order slot but
    are neither indexed nor link-expanded. The engine must match the
    golden crawler on ALL four surfaces, the scenario must be
    non-vacuous (mirrors actually fetched, documents < fetches), the
    flag off must index the duplicate bodies, and a mid-crawl resume
    must land on the identical final state (content_seen persists)."""
    from dataclasses import replace

    web = replace(
        UNIT_WEB,
        n_hosts=6,
        n_pages=150,
        seed_hosts=(0, 1),
        max_batches=40,
        mirror_every=3,
        content_dedup=True,
    )
    golden = run_golden(web)
    cfg = CrawlConfig(
        web=web, checkpoint_dir=str(tmp_path_factory.mktemp("cdedup")), num_buckets=8
    )
    catalog = run_crawl(spark, cfg)

    rows = (
        catalog.read_table(spark, "crawl_order", schemas.CRAWL_ORDER)
        .orderBy("seq")
        .collect()
    )
    got = [(r.seq, r.batch, r.canon_url, r.host, r.depth, r.seed_id) for r in rows]
    assert got == golden.crawl_order
    seen = {
        r.canon_url
        for r in catalog.read_table(spark, "url_seen", schemas.URL_SEEN).collect()
    }
    assert seen == golden.url_seen
    docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in catalog.read_table(
            spark, "documents", schemas.DOCUMENTS_OUT
        ).collect()
    }
    gold_docs = {
        u: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
        for u, sp in golden.documents.items()
    }
    assert docs == gold_docs
    # non-vacuity: some fetched pages were content-dupes (not indexed)
    fetched_urls = {u for _, _, u, _, _, _ in golden.crawl_order}
    from who_focus_crawler_spark.sources.fixture_web import mirror_source

    mirrored_fetched = {u for u in fetched_urls if mirror_source(u, web)}
    assert mirrored_fetched, "scenario vacuous: no mirror page fetched"
    assert len(docs) < len(fetched_urls)
    # the persisted content_seen table holds one row per distinct body
    cs = catalog.read_table(spark, "content_seen", schemas.CONTENT_SEEN)
    n_hashes = cs.select("content_hash").distinct().count()
    assert cs.count() == n_hashes  # one winner per hash, never re-added
    n_redirect_free_docs = len(docs)
    assert n_hashes <= n_redirect_free_docs  # noindex winners also hash

    # flag OFF on the same mirrored web: duplicates ARE indexed
    web_off = replace(web, content_dedup=False)
    golden_off = run_golden(web_off)
    assert len(golden_off.documents) > len(golden.documents)

    # resume-equivalence with content state: stop after batch 3, resume
    cfg_i = CrawlConfig(
        web=web,
        checkpoint_dir=str(tmp_path_factory.mktemp("cdedup_i")),
        num_buckets=8,
    )
    run_crawl(spark, cfg_i, until_batch=3)
    resumed = run_crawl(spark, cfg_i, resume=True)
    r_docs = {
        r.doc_id
        for r in resumed.read_table(spark, "documents", schemas.DOCUMENTS_OUT).collect()
    }
    assert r_docs == set(gold_docs)
