"""URL canonicalization, hashing, host bucketing (SURVEY.md §2.1 C1-C3).

Canonicalization = RFC 3986 §6 normalization, frozen as the project's own
normative spec (SURVEY.md §5.3 — the reference source is absent, so these
rules are pinned by the golden fixtures, not by reference code):

  1. trim surrounding whitespace; strip fragment (``#...``)
  2. lowercase scheme and host
  3. drop default ports (http:80, https:443)
  4. collapse dot-segments in the path (RFC 3986 §5.2.4)
  5. normalize percent-encoding: decode unreserved chars, uppercase hex
  6. empty path → "/"
  7. query: drop tracking params (utm_*, fbclid, gclid, msclkid), sort the
     remaining params lexicographically, drop the "?" if nothing remains

Design: native-first (SURVEY.md §4 — stays inside whole-stage codegen);
the only Python crossing is one Arrow-batched pandas UDF for the rare
path fix-up (dot-segments / percent-encoding), fed NULL for rows that
don't need it so the Python work is O(messy rows) while the Arrow
transfer is a single column either way.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="

# chars that stay decoded per RFC 3986 §2.3 (unreserved)
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _collapse_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # re-add trailing slash when the last raw segment was . or ..
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _normalize_pct(path: str) -> str:
    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, path)


@pandas_udf(T.StringType())
def _path_fixup(paths: pd.Series) -> pd.Series:
    """Slow-path path normalization. Receives NULL for clean paths."""

    def fix(p: str | None) -> str | None:
        if p is None:
            return None
        if "%" in p:
            p = _normalize_pct(p)
        if "/." in p:
            p = _collapse_dot_segments(p)
        return p

    return paths.map(fix, na_action="ignore")


_BIG = 1 << 30  # "rest of string" length for substring()


def _url_part_exprs(url: Column) -> dict[str, Column]:
    """The C1 component expressions (single source of truth for both the
    column form and the staged DataFrame form).

    Delimiter-based (substring_index/instr/substr — cheap codegen'd string
    ops) instead of regex wherever the frozen spec allows; the only
    regexes left are the port strip/extract (must match ``:\\d*$`` digits-
    only semantics, e.g. not split IPv6 brackets). Scheme validity needs
    no regex, but DOES need the '://' presence check: without it a bare
    "http"/"https" (substring_index returns the whole string) would pass
    the allowlist and canonicalize to garbage ("http" → "http://tp/"),
    diverging from the authoritative canonicalize_py (ADVICE r1)."""
    u = F.substring_index(F.trim(url), "#", 1)  # strip fragment
    scheme = F.when(
        F.instr(u, F.lit("://")) > 0, F.lower(F.substring_index(u, "://", 1))
    ).otherwise(F.lit(""))
    rest = F.substring(u, F.instr(u, F.lit("://")) + 3, F.lit(_BIG))
    authority = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.lower(F.regexp_replace(authority, r":\d*$", ""))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    pathq = F.substring(rest, F.length(authority) + 1, F.lit(_BIG))
    raw_path = F.substring_index(pathq, "?", 1)
    path0 = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    qpos = F.instr(pathq, F.lit("?"))
    raw_query = F.when(
        qpos > 0, F.substring(pathq, qpos + 1, F.lit(_BIG))
    ).otherwise(F.lit(""))
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path0": path0,
        "raw_query": raw_query,
    }


def _native_dot_collapse(p: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments as bounded native regex passes.

    Correct whenever it fully eliminates dot segments (the gate in
    canonicalize_df re-checks and routes any survivor — deeper nesting
    than the pass budget — to the Python fallback, which is
    authoritative). Mirrors _collapse_dot_segments' frozen semantics,
    including the kept trailing slash for paths ending in '/.' or '/..'."""
    # trailing '/.' or '/..' behave like '/./', '/../' with the slash kept
    out = F.regexp_replace(p, r"(/\.\.?)$", "$1/")
    for _ in range(3):  # '/./' runs (each pass halves consecutive runs)
        out = F.regexp_replace(out, r"/\./", "/")
    for _ in range(4):  # '<seg>/../' pops; guard: seg must not be '..'
        out = F.regexp_replace(out, r"/(?!\.\./)[^/]+/\.\./", "/")
    for _ in range(2):  # leading '/../' (nothing to pop) collapses
        out = F.regexp_replace(out, r"^/\.\./", "/")
    return out


def _assemble_core(
    scheme: Column, host: Column, port: Column, path: Column, raw_query: Column
) -> Column:
    """Canonical URL from (already validated) parts."""
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    kept = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def _url_ok(scheme: Column, host: Column) -> Column:
    return scheme.isin("http", "https") & (host != "")


def _assemble_canon(
    scheme: Column, host: Column, port: Column, path: Column, raw_query: Column
) -> Column:
    """Assemble the canonical URL from parts; NULL when invalid."""
    return F.when(
        _url_ok(scheme, host), _assemble_core(scheme, host, port, path, raw_query)
    )


def _needs_fix(path0: Column) -> Column:
    return path0.rlike(r"(^|/)\.\.?(/|$)") | path0.contains("%")


def canonicalize(url: Column) -> Column:
    """C1 — canonical form of an absolute http(s) URL as ONE column
    expression. Semantically authoritative, but the embedded Python UDF
    disables whole-stage codegen/CSE on the surrounding projection, so
    repeated subtrees get re-evaluated: fine for fixtures and small
    frames; hot paths must use :func:`canonicalize_df` (same semantics,
    staged evaluation — ~15× faster, measured on 1M rows)."""
    p = _url_part_exprs(url)
    path = F.coalesce(
        _path_fixup(F.when(_needs_fix(p["path0"]), p["path0"])), p["path0"]
    )
    return _assemble_canon(p["scheme"], p["host"], p["port"], path, p["raw_query"])


def _canonical_fixpoint(url: Column) -> Column:
    """TRUE only for URLs PROVABLY equal to their own canonical form —
    the cheap one-regex guard that lets the hot discovery path skip the
    whole staged parts/assembly pipeline for the overwhelmingly common
    already-clean absolute link (round 5: resolve+canonicalize was
    ~70 µs·core per discovered link, most of it spent re-deriving
    strings that equal their input).

    SOUND, not complete: the predicate may send a clean URL down the
    slow path (harmless), but must never pass a URL the canonicalizer
    would change. It therefore requires, syntactically: lowercase
    http(s) scheme; lowercase ASCII reg-name host (no userinfo, no
    port, no IP-literal brackets, no trailing dot); a present path of
    unreserved-ish chars with NO '/.' substring (rules out '.'/'..'
    segments AND hidden-dotfile edge cases), no '//' empty segment, no
    percent-escapes; no query (the canonicalizer sorts/strips params)
    and no fragment. Differentially fuzzed in
    tests/unit/test_urls.py::test_canonical_fixpoint_guard_sound."""
    return url.rlike(
        r"^https?://[a-z0-9]([a-z0-9\-]*[a-z0-9])?"
        r"(\.[a-z0-9]([a-z0-9\-]*[a-z0-9])?)*"
        r"/([A-Za-z0-9_\-.~]+/)*[A-Za-z0-9_\-.~]*$"
    ) & ~url.contains("/.")


def canonicalize_df(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canon_url",
    fixpoint_guard: bool = False,
) -> DataFrame:
    """C1, staged for the hot path. Drops invalid/non-http rows and
    guarantees a non-NULL `out_col` (same surviving rows and values as
    `canonicalize(...).isNotNull()` — unit-tested equal).

    ``fixpoint_guard=True`` (the discovery hot path): rows passing the
    sound `_canonical_fixpoint` predicate bypass the parts/assembly
    pipeline entirely — their input becomes the output verbatim, and
    the staged expressions see NULL input (expression null-propagation
    makes the regex stages ~free for them). Identical results by the
    guard's soundness contract; OFF by default so every existing call
    keeps its exact plan shape.

    Why not one expression: (a) a Column-level canonicalize duplicates
    non-cheap regex subtrees at every reference and the embedded Python
    UDF disables codegen CSE (~15× slower, measured); (b) a downstream
    `isNotNull` filter on the assembled column gets predicate-pushed
    through the projection and forces a SECOND ArrowEvalPython
    evaluation. Staging as flat temp columns + filtering on the cheap
    validity predicate BEFORE the UDF keeps exactly one codegen'd parts
    projection, one Python crossing, and one assembly projection —
    CollapseProject refuses to re-merge them because the producers are
    non-cheap and multiply referenced."""
    if fixpoint_guard:
        # materialize the guard once as its own column (rlike is
        # non-cheap and multiply referenced — CollapseProject keeps it
        # staged, same trick as the parts below), then null the
        # pipeline's input for guarded rows
        df = df.withColumn("_c1_ok", _canonical_fixpoint(F.col(url_col)))
        src = F.when(~F.col("_c1_ok"), F.col(url_col))
    else:
        src = F.col(url_col)
    p = _url_part_exprs(src)
    step = df.withColumns(
        {
            "_c1_sch": p["scheme"],
            "_c1_hst": p["host"],
            "_c1_prt": p["port"],
            "_c1_p0": p["path0"],
            "_c1_rq": p["raw_query"],
        }
    )
    # The ONLY filter references the cheap scheme/host parts — predicate
    # pushdown will inline those below the projection, which is fine.
    # NEVER filter on the expensive derived columns (_c1_np/_c1_fp):
    # pushdown substitutes their full defining expressions into the
    # pushed predicate and the whole tree gets re-evaluated per filter
    # (measured: branch-filters on the collapse/UDF columns re-expanded
    # the plan into 256-task stages 5-10x the total work).
    ok = _url_ok(F.col("_c1_sch"), F.col("_c1_hst"))
    if fixpoint_guard:
        ok = F.col("_c1_ok") | ok
    step = step.filter(ok)
    # native dot-segment collapse (bounded passes), lazily gated per row
    # to paths with a dot segment and no percent-escapes
    p0 = F.col("_c1_p0")
    step = step.withColumn(
        "_c1_np",
        F.when(
            p0.contains("/.") & ~p0.contains("%"), _native_dot_collapse(p0)
        ).otherwise(p0),
    )
    # Python fallback ONLY for rows native normalization can't finish:
    # percent-escapes, '//'+dot interactions (empty-segment pops), or dot
    # nesting deeper than the pass budget. The UDF input is NULL for
    # every other row — on typical frontiers the Arrow crossing carries a
    # null bitmap and Python computes nothing.
    np = F.col("_c1_np")
    gate = (
        p0.contains("%")
        | (p0.contains("/.") & p0.contains("//"))
        | (np.contains("/.") & np.rlike(r"(^|/)\.\.?(/|$)"))
    )
    step = step.withColumn(
        "_c1_fp", F.coalesce(_path_fixup(F.when(gate, p0)), np)
    )
    # coalesce with '' marks the column non-nullable (it cannot actually
    # be null after the validity filter): otherwise joins on canon_url
    # infer an IsNotNull(canon_url) constraint whose pushed filter inlines
    # the WHOLE defining expression — including a second ArrowEvalPython
    # (observed in the flagship anti-join plan)
    assembled = _assemble_core(
        F.col("_c1_sch"),
        F.col("_c1_hst"),
        F.col("_c1_prt"),
        F.col("_c1_fp"),
        F.col("_c1_rq"),
    )
    if fixpoint_guard:
        assembled = F.when(F.col("_c1_ok"), F.col(url_col)).otherwise(
            assembled
        )
    out = step.withColumn(out_col, F.coalesce(assembled, F.lit("")))
    return out.drop(
        "_c1_sch", "_c1_hst", "_c1_prt", "_c1_p0", "_c1_rq", "_c1_np",
        "_c1_fp", "_c1_ok",
    )


_TRACK_PY = re.compile(TRACKING_PARAM_RE)
_SCHEME_PY = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")


def canonicalize_py(url: str) -> str | None:
    """Pure-Python twin of :func:`canonicalize` — same frozen rules.

    Used by the sequential golden generator (the stand-in for the absent
    reference crawler, SURVEY.md §5.3) and cross-checked against the Spark
    expression by tests/unit/test_urls.py.
    """
    u = url.strip().split("#", 1)[0]
    m = _SCHEME_PY.match(u)
    if not m:
        return None
    scheme = m.group(1).lower()
    if scheme not in ("http", "https"):
        return None
    rest = u[m.end() :]
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    authority, after = rest[:sep], rest[sep:]
    pm = re.search(r":(\d*)$", authority)
    host = (authority[: pm.start()] if pm else authority).lower()
    if not host:
        return None
    port = pm.group(1) if pm else ""
    if port == "" or (scheme, port) in (("http", "80"), ("https", "443")):
        port_part = ""
    else:
        port_part = ":" + port
    qpos = after.find("?")
    raw_path, raw_query = (
        (after, "") if qpos == -1 else (after[:qpos], after[qpos + 1 :])
    )
    path = raw_path or "/"
    if "%" in path:
        path = _normalize_pct(path)
    if re.search(r"(^|/)\.\.?(/|$)", path):
        path = _collapse_dot_segments(path)
    kept = sorted(
        p for p in raw_query.split("&") if p != "" and not _TRACK_PY.match(p)
    )
    query_part = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{port_part}{path}{query_part}"


def url_host_py(canon_url: str) -> str:
    """Pure-Python twin of :func:`url_host`."""
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/?]*)", canon_url)
    return m.group(1) if m else ""


# --------------------------------------------------- C12 href resolution ---

# RFC 3986 §5 reference resolution, specialized to the crawl case: the
# base is ALWAYS one of our canonical URLs (http(s)://host[:port]/path
# [?query], no fragment, path starts '/'), and dot-segment removal
# (§5.2.4) is NOT done here — the resolved string feeds C1
# (canonicalize_df), whose path normalization applies it. Rules, in
# order (first match wins):
#   1. ''            → base                      (§5.2.2 same-document)
#   2. '#f'          → base (canonical base has no fragment; C1 strips)
#   3. scheme ':'    → href as-is (§5.2.2 "ref has scheme"; non-http —
#                      mailto:, javascript:, g:h — is then DROPPED by
#                      C1's allowlist, never merged into a crawlable URL.
#                      Deviation from urllib's legacy same-scheme compat:
#                      'http:g' resolves to 'http:g' → dropped, not
#                      'http://base/g'; RFC 3986 calls the strict form
#                      correct.)
#   4. '//auth/p'    → base-scheme ':' href       (network-path ref)
#   5. '/p'          → origin + href              (absolute-path ref)
#   6. '?q'          → origin + base-path + href
#   7. 'rel/p'       → origin + base-dir + href   (§5.3 merge)

_SCHEME_REF_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def _base_parts(base: Column) -> tuple[Column, Column, Column]:
    """(origin, path, dir) of a canonical base URL."""
    origin = F.regexp_extract(base, r"^([^/?#]*://[^/?#]*)", 1)
    path = F.regexp_extract(base, r"^[^/?#]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    base_dir = F.regexp_replace(path, r"[^/]*$", "")
    return origin, path, base_dir


def resolve_ref(base: Column, href: Column) -> Column:
    """C12 — resolve an href against its page's canonical URL (native
    string expressions only; output feeds C1 which normalizes dots and
    drops non-http results)."""
    origin, path, base_dir = _base_parts(base)
    return (
        F.when(href.isNull() | (href == ""), base)
        .when(href.startswith("#"), base)
        .when(href.rlike(_SCHEME_REF_RE), href)
        .when(href.startswith("//"), F.concat(F.substring_index(base, "://", 1), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("?"), F.concat(origin, path, href))
        .otherwise(F.concat(origin, base_dir, href))
    )


_SCHEME_REF_PY = re.compile(_SCHEME_REF_RE)


def resolve_py(base: str, href: str | None) -> str:
    """Pure-Python twin of :func:`resolve_ref` (golden generator side)."""
    if not href or href.startswith("#"):
        return base
    if _SCHEME_REF_PY.match(href):
        return href
    m = re.match(r"^([^/?#]*)://([^/?#]*)([^?#]*)", base)
    scheme, auth, path = m.group(1), m.group(2), m.group(3) or "/"
    origin = f"{scheme}://{auth}"
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return origin + href
    if href.startswith("?"):
        return origin + path + href
    base_dir = re.sub(r"[^/]*$", "", path)
    return origin + base_dir + href


def url_hash(canon_url: Column) -> Column:
    """C2 — 64-bit signature: Spark-native xxhash64 (BASELINE.json north_star)."""
    return F.xxhash64(canon_url)


def url_host(canon_url: Column) -> Column:
    """C3 — authority of an already-canonical URL (no port in canon form
    unless non-default, in which case the port stays part of the host key
    for politeness purposes: one listener = one budget)."""
    return F.regexp_extract(canon_url, r"^[a-z][a-z0-9+.\-]*://([^/?]*)", 1)


def url_query(url: Column) -> Column:
    """Query string after the first '?' ('' when absent) — the single
    query-extraction used by the trap scorer and the parameter
    expansion (one definition, one place to fix)."""
    qpos = F.instr(url, F.lit("?"))
    return F.when(qpos > 0, F.substring(url, qpos + 1, F.lit(1 << 20))).otherwise(
        F.lit("")
    )


def host_bucket(host: Column, num_buckets: int) -> Column:
    """C3 — partition key: pmod(xxhash64(host), P)."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def with_url_columns(
    df: DataFrame, url_col: str = "url", num_buckets: int = 32
) -> DataFrame:
    """Attach canon_url / url_hash / host / host_bucket; drop invalid URLs.
    Uses the staged canonicalizer (hot-path form)."""
    out = (
        canonicalize_df(df, url_col, "canon_url")
        .withColumn("url_hash", url_hash(F.col("canon_url")))
        .withColumn("host", url_host(F.col("canon_url")))
        .withColumn("host_bucket", host_bucket(F.col("host"), num_buckets))
    )
    return out


# ---------------------------------------------------------------- IDN ---


@pandas_udf(T.StringType())
def _idna_encode(host: pd.Series) -> pd.Series:
    """Vectorized IDNA ToASCII via Python's built-in 'idna' codec
    (IDNA 2003 nameprep + punycode, RFC 3490/3492 — the frozen spec).
    Unencodable hosts (empty/overlong labels, prohibited codepoints)
    return None so callers drop them like any other invalid URL."""

    def enc(x):
        if x is None:
            return None
        try:
            return x.encode("idna").decode("ascii").lower()
        except (UnicodeError, UnicodeDecodeError):
            return None

    return host.map(enc)


def idn_to_ascii(host: Column) -> Column:
    """Internationalized hostname → punycode ASCII (lowercased).

    Real frontiers carry IDN hosts (münchen.example) that must be
    ASCII-normalized before hashing/bucketing or the same site splits
    across two frontier identities. Gated like the C1 canonicalizer:
    already-ASCII hosts (the overwhelming majority) stay on the native
    lower() path and never cross to Python; only rows with a non-ASCII
    byte pay the Arrow round trip.
    """
    is_ascii = host.rlike("^[\\x00-\\x7F]*$")
    return F.when(is_ascii, F.lower(host)).otherwise(_idna_encode(host))
