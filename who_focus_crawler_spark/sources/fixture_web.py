"""Deterministic synthetic fixture web (FIXTURES.md §1.3).

No external data and no network (SURVEY.md §0.1): page URLs are generated
arithmetically and page *content* (the ordered span sequence) is a pure
function of the canonical URL, so the corpus needs no storage at any scale —
the fetch UDF synthesizes content on the fly and the sequential golden
crawler (golden.py) synthesizes the very same bytes.

Everything is keyed off blake2b(url) — NOT Spark's xxhash64 — so the pure
Python golden generator and the Spark-side fetch UDF agree without
re-implementing Spark's hash. Spark's xxhash64 is still the url_hash /
partitioning signature (BASELINE.json north_star); it just plays no role in
content synthesis or tie-breaking (SURVEY.md §5.3 freeze: ties break on
canon_url, which any engine can reproduce).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
import re as _re
from dataclasses import dataclass

from who_focus_crawler_spark.functions.urls import canonicalize_py, resolve_py


def h64(s: str) -> int:
    """Stable 64-bit hash of a string (pure Python, version-independent)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


@dataclass(frozen=True)
class WebConfig:
    """Deterministic web-graph parameters. Defaults = unit tier
    (50 pages / 5 hosts, FIXTURES.md §1.3); e2e tier uses 2000/40."""

    n_hosts: int = 5
    n_pages: int = 50
    hot_host_frac: float = 0.4  # host 0 holds this share of all pages
    seed_hosts: tuple[int, ...] = (0, 1, 2)
    select_k: int = 4  # C6: top-k per host selected per batch
    politeness_k: int = 2  # C7: fetches admitted per host per batch
    max_batches: int = 50
    agent: str = "wfc-bot"
    # C8: re-fetch a host's robots.txt when its cache row is older than
    # this many batches; None = cache forever (fixture rules never change)
    robots_ttl_batches: int | None = None
    # C7: wall-clock seconds one batch represents. When set, a host
    # declaring Crawl-delay d gets per-batch budget
    # min(politeness_k, max(1, batch_window_s // d)); None = ignore
    # Crawl-delay (frozen v1 behavior, goldens unchanged)
    batch_window_s: int | None = None
    # HTTP 3xx: roughly 1/redirect_every pages serve a redirect instead
    # of content (one same-host 'redirect' span; consumes its fetch
    # slot + seq like any HTTP round trip; the target enters discovery
    # like a link). None = no redirects (frozen v1, goldens unchanged)
    redirect_every: int | None = None
    # Robots META tag (<meta name="robots">): roughly 1/meta_robots_every
    # content pages carry noindex and/or nofollow directives, emitted as
    # a leading 'meta' span. noindex = the page is crawled but excluded
    # from the documents corpus; nofollow = none of its links enter
    # discovery. None = no meta directives (frozen v1, goldens unchanged)
    meta_robots_every: int | None = None
    # Mirror pages: roughly 1/mirror_every pages (page index >= 3 only)
    # serve a byte-identical copy of one of their host's first three
    # pages — the duplicated-content hazard the Mercator content-seen
    # test exists for. None = no mirrors (frozen v1, goldens unchanged)
    mirror_every: int | None = None
    # Mercator content-seen test: when True the crawler (golden AND
    # engine) skips indexing + link expansion for any fetched body whose
    # (kind, text, media_ref) span sequence was already seen at a lower
    # seq; the duplicate still consumes its fetch slot and crawl_order
    # row. Redirect bodies are exempt (a Location header is not content)
    content_dedup: bool = False

    def pages_per_host(self) -> list[int]:
        # memoized on (n_pages, n_hosts, hot frac): synth_spans calls
        # this once PER PAGE and the list is O(n_hosts) to build — at
        # 2000 hosts the rebuild was 56% of the whole fixture-fetch
        # cost (profiled round 5). WebConfig is frozen, so the cached
        # list is immutable-by-convention; callers only index it.
        return _pages_per_host_cached(
            self.n_pages, self.n_hosts, self.hot_host_frac
        )


@lru_cache(maxsize=64)
def _pages_per_host_cached(
    n_pages: int, n_hosts: int, hot_host_frac: float
) -> list[int]:
    hot = max(1, int(n_pages * hot_host_frac))
    rest = n_pages - hot
    cold = n_hosts - 1
    base = [hot] + [rest // cold] * cold if cold else [n_pages]
    for i in range(rest - (rest // cold) * cold if cold else 0):
        base[1 + i] += 1
    return base


def host_name(i: int) -> str:
    return f"h{i}.example.test"


def page_path(j: int) -> str:
    # every 11th-ish page lives under /private/ → robots-gated on some hosts
    return f"/private/p/{j}" if j % 11 == 7 else f"/p/{j}"


def page_url(i: int, j: int) -> str:
    return f"http://{host_name(i)}{page_path(j)}"


def seed_urls(cfg: WebConfig) -> list[str]:
    return [page_url(i, 0) for i in cfg.seed_hosts]


# ---------------------------------------------------------------- robots ---


def _host_index(host: str) -> int | None:
    """Fixture host index of 'h<i>.example.test' hostnames, else None —
    the single parser shared by every per-host fixture channel
    (robots, sitemaps) so they can't disagree on which hosts exist."""
    if not host.startswith("h") or not host.endswith(".example.test"):
        return None
    try:
        return int(host.split(".")[0][1:])
    except ValueError:
        return None


def robots_rules(host: str, cfg: WebConfig) -> list[tuple[bool, str]]:
    """Parsed robots rules for a host: list of (allow, path_prefix).

    RFC 9309 longest-match semantics are applied by `robots_allowed`.
    Hosts i ≡ 0 (mod 7) disallow /private/ but allow /private/p/0 back
    (longest-match exercise); host 3 serves no robots file (allow all).
    """
    i = _host_index(host)
    if i is None:
        return []
    if i == 3:
        return []  # no robots file
    if i % 7 == 0:
        return [(False, "/private/"), (True, "/private/p/0")]
    return [(True, "/")]


def robots_txt_text(host: str, cfg: WebConfig) -> str | None:
    """Render the host's robots policy as an actual robots.txt document
    (None where the fixture serves no file). The engine-side parser
    (operators/robots_txt.py::parse_robots_txt) must recover exactly
    `robots_rules` + `robots_crawl_delay` from this text — the
    round-trip is pinned by tests/unit/test_robots_txt.py."""
    i = _host_index(host)
    if i is None or i == 3:
        return None
    lines = ["# fixture robots", "User-agent: *"]
    for allow, pattern in robots_rules(host, cfg):
        lines.append(("Allow: " if allow else "Disallow: ") + pattern)
    d = robots_crawl_delay(host, cfg)
    if d is not None:
        lines.append(f"Crawl-delay: {d}")
    if sitemap_xml(host, cfg) is not None:
        lines.append(f"Sitemap: http://{host}/sitemap.xml")
    return "\n".join(lines)


def robots_crawl_delay(host: str, cfg: WebConfig) -> int | None:
    """Crawl-delay directive (seconds) a host's robots.txt declares.

    Hosts i ≡ 1 (mod 4) declare a delay of 2 + (i//4 mod 3) seconds
    (values 2..4); host 3 serves no robots file; everyone else declares
    none. Only consulted when ``WebConfig.batch_window_s`` is set, so
    default goldens are unchanged."""
    i = _host_index(host)
    if i is None or i == 3:
        return None
    if i % 4 == 1:
        return 2 + (i // 4) % 3
    return None


def _rule_matches(pattern: str, path: str) -> bool:
    """One robots rule against one path — the sequential twin of
    operators/robots.py::_rule_matcher (RFC 9309 §2.2.3: '*' spans any
    octets, trailing '$' anchors; plain patterns are prefixes)."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    body, anchored = (
        (pattern[:-1], True) if pattern.endswith("$") else (pattern, False)
    )
    rx = ".*".join(_re.escape(part) for part in body.split("*"))
    if anchored:
        rx += r"\Z"
    return _re.match(rx, path) is not None


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309: the longest (most-specific) matching rule wins, first
    rule in file order on ties; no match → allowed."""
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if _rule_matches(pattern, path) and len(pattern) > best_len:
            best_len, best_allow = len(pattern), allow
    return best_allow


# ------------------------------------------------------------- sitemaps ---


def sitemap_entries(host: str, cfg: WebConfig) -> list[tuple[str, float]]:
    """Deterministic (loc, priority) entries of a host's sitemap.xml.

    Host i lists every 3rd of its pages; hosts i ≡ 4 (mod 5) publish no
    sitemap. Priorities cycle a fixed 0.1–1.0 grid. Pure function of
    (host, cfg) — shared by the fixture fetch and the tests, same
    pattern as robots_rules."""
    i = _host_index(host)
    if i is None:
        return []
    if i % 5 == 4:
        return []
    pph = cfg.pages_per_host()
    if i >= len(pph):
        return []
    return [
        (page_url(i, j), ((j * 7) % 10 + 1) / 10.0)
        for j in range(pph[i])
        if j % 3 == 0
    ]


def sitemap_xml(host: str, cfg: WebConfig) -> str | None:
    """Rendered sitemap.xml for a host, or None when it publishes none."""
    entries = sitemap_entries(host, cfg)
    if not entries:
        return None
    body = "".join(
        f"<url><loc>{u}</loc><priority>{p:.1f}</priority></url>"
        for u, p in entries
    )
    return f'<?xml version="1.0"?><urlset>{body}</urlset>'


# -------------------------------------------------------------- content ---


def _rel_path(base_dir: str, tpath: str) -> str:
    """Relative path from a base directory to a target path (both
    absolute, base_dir ends with '/'). Inverse exercise for RFC 3986 §5
    merge + §5.2.4 dot collapse."""
    bsegs = base_dir.split("/")[1:-1]
    tsegs = tpath.split("/")[1:]
    i = 0
    while i < len(bsegs) and i < len(tsegs) - 1 and bsegs[i] == tsegs[i]:
        i += 1
    return "../" * (len(bsegs) - i) + "/".join(tsegs[i:])


def _mk_relative(base_url: str, target: str, r: int) -> str:
    """Relative form of a link target (exercises C12 resolution).

    Same-host targets: path-absolute, dotted-relative, or './'-prefixed
    relative; any target: scheme-relative ('//host/path')."""
    t_host, t_rest = target.split("://", 1)[1].split("/", 1)
    t_path = "/" + t_rest
    p_host, p_rest = base_url.split("://", 1)[1].split("/", 1)
    v = r % 4
    if v == 3 or t_host != p_host:
        return f"//{t_host}{t_path}"
    base_dir = ("/" + p_rest)[: ("/" + p_rest).rfind("/") + 1]
    if v == 0:
        return t_path
    rel = _rel_path(base_dir, t_path)
    return rel if v == 1 else "./" + rel


def _mk_messy(target: str, r: int) -> str:
    """Non-canonical variant of a link target (exercises C1)."""
    v = r % 5
    scheme, rest = target.split("://", 1)
    host, path = rest.split("/", 1)
    path = "/" + path
    if v == 0:
        return f"http://{host.upper()}{path}"
    if v == 1:
        return f"http://{host}:80{path}"
    if v == 2:
        parts = path.rsplit("/", 1)
        return f"http://{host}{parts[0]}/./{parts[1]}" if len(parts) == 2 else target
    if v == 3:
        return f"{target}#sec{r % 7}"
    return f"{target}?utm_source=feed"


def redirect_target(canon_url: str, cfg: WebConfig) -> str | None:
    """Redirect target of a page, or None when it serves content.

    Deterministic: a page redirects iff h64(url|redir) % redirect_every
    == 0; the target is another page of the same host at a scattered
    index (never itself — self-loops excluded by construction; longer
    cycles may arise and are harmless: the target is already in the
    URL-seen set when the cycle closes, so it dedups away)."""
    if cfg.redirect_every is None:
        return None
    if h64(f"{canon_url}|redir") % cfg.redirect_every != 0:
        return None
    i = _host_index(canon_url.split("://", 1)[-1].split("/", 1)[0])
    if i is None:
        return None
    try:
        j = int(canon_url.rsplit("/", 1)[1])
    except (IndexError, ValueError):
        return None
    pph = cfg.pages_per_host()
    if i >= len(pph) or pph[i] <= 1:
        return None
    j2 = (j * 7 + 1) % pph[i]
    if j2 == j:
        j2 = (j + 1) % pph[i]
    return page_url(i, j2)


def meta_robots(canon_url: str, cfg: WebConfig) -> tuple[bool, bool]:
    """(noindex, nofollow) robots-meta directives of a content page.

    Deterministic: a page carries directives iff h64(url|meta) %
    meta_robots_every == 0; the variant hash picks noindex, nofollow,
    or both. Redirect pages never carry directives (their body is the
    Location header)."""
    if cfg.meta_robots_every is None:
        return (False, False)
    if h64(f"{canon_url}|meta") % cfg.meta_robots_every != 0:
        return (False, False)
    v = h64(f"{canon_url}|metakind") % 3
    return (v != 1, v != 0)  # 0: noindex only, 1: nofollow only, 2: both


def span_meta_directives(spans: list[dict]) -> tuple[bool, bool]:
    """(noindex, nofollow) parsed from a span sequence — the consumer
    side of `meta_robots`, shared by the golden crawler; the Spark twin
    is operators/discover.py::has_meta_directive."""
    noindex = nofollow = False
    for s in spans:
        if s["kind"] == "meta" and s["text"]:
            noindex = noindex or "noindex" in s["text"]
            nofollow = nofollow or "nofollow" in s["text"]
    return (noindex, nofollow)


def mirror_source(canon_url: str, cfg: WebConfig) -> str | None:
    """URL of the page this one mirrors, or None for original content.

    Deterministic: with ``mirror_every`` set, a non-redirect page with
    page index j >= 3 mirrors one of its host's first three pages
    (never themselves mirrors, so no chains) iff
    h64(url|mirror) % mirror_every == 0. Shared by the golden crawler
    and the Spark fetch UDF via `synth_spans`.
    """
    if cfg.mirror_every is None:
        return None
    if redirect_target(canon_url, cfg) is not None:
        return None
    try:
        host, path = canon_url.split("//", 1)[1].split("/", 1)
        j = int(path.rsplit("/", 1)[1])
        i = _host_index(host)
    except (IndexError, ValueError):
        return None
    if i is None or j < 3:
        return None
    if h64(f"{canon_url}|mirror") % cfg.mirror_every != 0:
        return None
    src_j = h64(f"{canon_url}|mirsrc") % min(3, cfg.pages_per_host()[i])
    return page_url(i, src_j)


def content_key(spans: list[dict]) -> tuple:
    """Frozen content-seen identity of a fetched body: the ordered
    (kind, text, media_ref) tuples — offsets are derivable from content
    and excluded. Python twin of the engine's xxhash64(to_json(...))
    key in plans/crawl.py (the two sides never exchange hashes, only
    behavior, so each uses its native hash of the same identity)."""
    return tuple((s["kind"], s["text"], s["media_ref"]) for s in spans)


def synth_spans(canon_url: str, cfg: WebConfig) -> list[dict]:
    """The page body: ordered spans interleaving text/media/link.

    Pure function of the canonical URL (plus the web-graph shape), shared
    verbatim by the golden crawler and the Spark fetch UDF — this IS the
    frozen extraction semantics (span-sequence equality, BASELINE.json
    input_hint). A redirecting page's whole body is its single
    'redirect' span (the Location header as data). A mirror page's body
    is its source page's body, verbatim (`mirror_source`).
    """
    target = redirect_target(canon_url, cfg)
    if target is not None:
        return [
            {"kind": "redirect", "text": None, "media_ref": target, "offset": 0}
        ]
    src = mirror_source(canon_url, cfg)
    if src is not None:
        return synth_spans(src, cfg)
    pph = cfg.pages_per_host()
    seed = h64(canon_url)
    n_spans = 3 + seed % 10
    spans: list[dict] = []
    offset = 0
    noindex, nofollow = meta_robots(canon_url, cfg)
    if noindex or nofollow:
        directives = ",".join(
            d for d, on in (("noindex", noindex), ("nofollow", nofollow)) if on
        )
        spans.append(
            {"kind": "meta", "text": directives, "media_ref": None, "offset": 0}
        )
        offset += len(directives)
    prev_link: str | None = None
    # which host is this page on (for same-host link bias)?
    try:
        my_host_i = int(canon_url.split("//h", 1)[1].split(".", 1)[0])
    except (IndexError, ValueError):
        my_host_i = 0
    for k in range(n_spans):
        r = h64(f"{canon_url}|{k}")
        sel = r % 10
        if sel <= 4:  # text span
            text = f"paragraph {r % 100000} about topic {r % 13} on {canon_url}"
            spans.append(
                {"kind": "text", "text": text, "media_ref": None, "offset": offset}
            )
            offset += len(text)
        elif sel <= 6:  # media span
            ref = f"media://img/{r % 99991}.jpg"
            spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
            )
            offset += 40
        else:  # link span
            r2 = h64(f"{canon_url}|{k}|t")
            if prev_link is not None and r2 % 10 == 0:  # ~10% duplicate links
                target = prev_link
            else:
                pick = r2 % 100
                if pick < 70 or cfg.n_hosts == 1:
                    ti = my_host_i if my_host_i < cfg.n_hosts else 0
                elif pick < 90:
                    ti = 0  # hot host
                else:
                    ti = (r2 // 100) % cfg.n_hosts
                tj = (r2 // 10000) % pph[ti]
                target = page_url(ti, tj)
            prev_link = target
            href = target
            if h64(f"{canon_url}|{k}|m") % 20 == 0:  # ~5% messy forms
                href = _mk_messy(target, h64(f"{canon_url}|{k}|v"))
            elif h64(f"{canon_url}|{k}|r") % 4 == 0:  # ~25% relative (C12)
                href = _mk_relative(canon_url, target, h64(f"{canon_url}|{k}|w"))
            spans.append(
                {"kind": "link", "text": None, "media_ref": href, "offset": offset}
            )
            offset += 30
    return spans


def extract_links(spans: list[dict], base_url: str) -> list[tuple[str, int]]:
    """(canonical link target, span offset) pairs, in document order.

    Hrefs resolve relative→absolute against the page URL (RFC 3986 §5,
    resolve_py — same frozen rules as the Spark resolve_ref expression);
    canonicalization then drops invalid targets; offset is the in-batch
    first-discovery tie-break (SURVEY.md §5.3 freeze)."""
    out = []
    for s in spans:
        if s["kind"] in ("link", "redirect") and s["media_ref"]:
            c = canonicalize_py(resolve_py(base_url, s["media_ref"]))
            if c is not None:
                out.append((c, s["offset"]))
    return out


UNIT_WEB = WebConfig()
E2E_WEB = WebConfig(n_hosts=40, n_pages=2000, seed_hosts=(0, 1, 2, 4, 5), max_batches=30)
