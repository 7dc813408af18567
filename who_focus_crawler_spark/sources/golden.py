"""Sequential golden crawler — the frozen reference semantics.

The reference (`jfqiao/who.focus_crawler`) is, per BASELINE.json, a set of
ad-hoc sequential Python site scripts whose observable behavior (crawl
order, URL-seen set, extracted span sequences) defines correctness. Its
source is absent from this machine (SURVEY.md §0.1), so this module IS the
project's normative reference implementation (SURVEY.md §5.3): a plain
single-process crawler with zero Spark, zero parallelism, zero cleverness.
The Spark engine (plans/crawl.py) must reproduce its outputs exactly.

Frozen v1 semantics (recorded here and in FIXTURES.md §1.4):
  priority        = -depth  (BFS)
  selection (C6)  = per host, top select_k by (priority desc, depth, canon_url)
  robots (C8)     = RFC 9309 longest-match on selected candidates; blocked
                    URLs leave the frontier and never consume a politeness slot
  politeness (C7) = first politeness_k allowed candidates per host per batch,
                    same order; the rest are deferred (stay enqueued)
  sequencing (C9) = global order within a batch by
                    (priority desc, depth, host, canon_url); seq is contiguous
                    across batches starting at 1
  discovery (C12) = links in document order; in-batch duplicate discoveries
                    resolved by min (parent_seq, span_offset); URL-seen =
                    every URL ever enqueued (seeds included)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from who_focus_crawler_spark.functions.urls import canonicalize_py, url_host_py
from who_focus_crawler_spark.sources.fixture_web import (
    WebConfig,
    content_key,
    extract_links,
    robots_allowed,
    robots_crawl_delay,
    robots_rules,
    seed_urls,
    span_meta_directives,
    synth_spans,
)


@dataclass
class FrontierEntry:
    canon_url: str
    host: str
    priority: float
    depth: int
    seed_id: int
    parent_url: str | None
    discovered_in_batch: int


@dataclass
class GoldenResult:
    # (seq, batch, canon_url, host, depth, seed_id)
    crawl_order: list[tuple[int, int, str, str, int, int]] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    documents: dict[str, list[dict]] = field(default_factory=dict)
    # (batch, host) -> dict of counters
    metrics: dict[tuple[int, str], dict[str, int]] = field(default_factory=dict)
    blocked: set[str] = field(default_factory=set)


def _path_of(canon_url: str) -> str:
    rest = canon_url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i != -1 else "/"


def run_golden(cfg: WebConfig, max_batches: int | None = None) -> GoldenResult:
    res = GoldenResult()
    frontier: dict[str, FrontierEntry] = {}
    for sid, raw in enumerate(seed_urls(cfg)):
        cu = canonicalize_py(raw)
        assert cu is not None
        frontier[cu] = FrontierEntry(cu, url_host_py(cu), 0.0, 0, sid, None, 0)
        res.url_seen.add(cu)

    robots: dict[str, list[tuple[bool, str]]] = {}
    content_seen: set[tuple] = set()  # Mercator content-seen (opt-in)
    seq = 0
    n_batches = max_batches if max_batches is not None else cfg.max_batches
    for batch in range(1, n_batches + 1):
        if not frontier:
            break
        # --- C6 selection: top select_k per host ---
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in frontier.values():
            by_host.setdefault(e.host, []).append(e)
        selected: list[FrontierEntry] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e.priority, e.depth, e.canon_url))
            selected.extend(entries[: cfg.select_k])

        def m(host: str) -> dict[str, int]:
            return res.metrics.setdefault(
                (batch, host),
                dict.fromkeys(
                    (
                        "scheduled",
                        "blocked_robots",
                        "admitted",
                        "deferred",
                        "fetched",
                        "discovered",
                        "deduped",
                        "new_urls",
                    ),
                    0,
                ),
            )

        # --- C8 robots gate ---
        allowed: dict[str, list[FrontierEntry]] = {}
        for e in selected:
            m(e.host)["scheduled"] += 1
            if e.host not in robots:
                robots[e.host] = robots_rules(e.host, cfg)
            if robots_allowed(robots[e.host], _path_of(e.canon_url)):
                allowed.setdefault(e.host, []).append(e)
            else:
                m(e.host)["blocked_robots"] += 1
                res.blocked.add(e.canon_url)
                del frontier[e.canon_url]

        # --- C7 politeness: first politeness_k per host ---
        admitted: list[FrontierEntry] = []
        for host, entries in allowed.items():
            entries.sort(key=lambda e: (-e.priority, e.depth, e.canon_url))
            budget = cfg.politeness_k
            if cfg.batch_window_s is not None:
                d = robots_crawl_delay(host, cfg)
                if d:  # Crawl-delay caps fetches per modeled window
                    budget = min(budget, max(1, cfg.batch_window_s // d))
            admitted.extend(entries[:budget])
            m(host)["admitted"] += min(len(entries), budget)
            m(host)["deferred"] += max(0, len(entries) - budget)

        # --- C9 deterministic global sequence ---
        admitted.sort(key=lambda e: (-e.priority, e.depth, e.host, e.canon_url))
        fetched: list[tuple[int, FrontierEntry]] = []
        for e in admitted:
            seq += 1
            res.crawl_order.append(
                (seq, batch, e.canon_url, e.host, e.depth, e.seed_id)
            )
            fetched.append((seq, e))
            m(e.host)["fetched"] += 1
            del frontier[e.canon_url]

        # --- C10/C11 fetch+extract, C12 discovery, C4 dedup, C5 merge ---
        # every discovery event either wins (first by (parent_seq, offset)
        # among events for a not-yet-seen target) or is a dedup; per-host
        # deduped = discovered - new_urls, which Spark reproduces with a
        # window over target ordered by (parent_seq, offset).
        events: list[tuple[int, int, str, FrontierEntry]] = []
        for pseq, e in fetched:
            spans = synth_spans(e.canon_url, cfg)
            # Mercator content-seen test (opt-in): a body already seen
            # at a lower seq keeps its crawl_order slot but is neither
            # indexed nor link-expanded. `fetched` is in seq order, so
            # iteration order IS the first-wins order. Redirect bodies
            # are exempt (a Location header is not content).
            if cfg.content_dedup and spans[0]["kind"] != "redirect":
                key = content_key(spans)
                if key in content_seen:
                    continue
                content_seen.add(key)
            # robots META directives (span-driven, like the engine):
            # noindex pages are fetched but stay out of the documents
            # corpus; nofollow pages emit no discovery events at all
            noindex, nofollow = span_meta_directives(spans)
            if not noindex:
                res.documents[e.canon_url] = spans
            if nofollow:
                continue
            for target, off in extract_links(spans, e.canon_url):
                m(e.host)["discovered"] += 1
                events.append((pseq, off, target, e))
        winners: dict[str, tuple[int, int, FrontierEntry]] = {}
        for pseq, off, target, e in events:
            if target in res.url_seen:
                continue
            cur = winners.get(target)
            if cur is None or (pseq, off) < (cur[0], cur[1]):
                winners[target] = (pseq, off, e)
        for target, (pseq, off, parent) in winners.items():
            res.url_seen.add(target)
            frontier[target] = FrontierEntry(
                target,
                url_host_py(target),
                -(parent.depth + 1),
                parent.depth + 1,
                parent.seed_id,
                parent.canon_url,
                batch,
            )
            m(parent.host)["new_urls"] += 1
        for (b, host), mm in res.metrics.items():
            if b == batch:
                mm["deduped"] = mm["discovered"] - mm["new_urls"]
    return res
