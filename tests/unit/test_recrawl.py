from __future__ import annotations

from who_focus_crawler_spark.operators.recrawl import recrawl_priority, select_recrawl


def _hist(spark):
    # u_hot: changes every fetch; u_cold: never changes; u_once: single
    # fetch (prior applies); u_null: NULL hash transitions count
    rows = [
        ("u_hot", "h1", 1, "a"),
        ("u_hot", "h1", 2, "b"),
        ("u_hot", "h1", 3, "c"),
        ("u_cold", "h1", 1, "x"),
        ("u_cold", "h1", 2, "x"),
        ("u_cold", "h1", 3, "x"),
        ("u_once", "h2", 4, "y"),
        ("u_null", "h2", 1, None),
        ("u_null", "h2", 2, "z"),
        ("u_null", "h2", 3, "z"),
    ]
    return spark.createDataFrame(
        rows, "canon_url string, host string, batch int, content_hash string"
    )


def test_change_rate_and_score(spark):
    out = {
        r["canon_url"]: r
        for r in recrawl_priority(_hist(spark), current_batch=10).collect()
    }
    hot, cold, once, null = (
        out["u_hot"], out["u_cold"], out["u_once"], out["u_null"]
    )
    assert (hot["n_fetches"], hot["n_changes"], hot["change_permille"]) == (3, 2, 1000)
    assert (cold["n_fetches"], cold["n_changes"], cold["change_permille"]) == (3, 0, 0)
    # single fetch → prior, staleness from its only batch
    assert (once["n_fetches"], once["change_permille"], once["staleness"]) == (
        1, 500, 6,
    )
    # NULL → 'z' is a change; 'z' → 'z' is not
    assert (null["n_changes"], null["change_permille"]) == (1, 500)
    # score: staleness × (permille + 1); equal staleness ⇒ hot ≫ cold
    assert hot["staleness"] == cold["staleness"] == 7
    assert hot["recrawl_score"] == 7 * 1001
    assert cold["recrawl_score"] == 7 * 1  # never-changing pages still accrue
    assert hot["recrawl_score"] > once["recrawl_score"] > cold["recrawl_score"]


def test_change_rate_parallelism_invariant(spark):
    a = recrawl_priority(_hist(spark).repartition(1), 10).collect()
    b = recrawl_priority(_hist(spark).repartition(7), 10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_select_recrawl_topk_per_host(spark):
    scored = recrawl_priority(_hist(spark), current_batch=10)
    picked = select_recrawl(scored, k_per_host=1).collect()
    by_host = {r["host"]: r["canon_url"] for r in picked}
    assert by_host["h1"] == "u_hot"  # beats u_cold on score
    assert by_host["h2"] == "u_null"  # 7*501 beats u_once's 6*501
    # min_score filters: nothing qualifies when no URL is stale yet
    fresh = recrawl_priority(_hist(spark), current_batch=3)
    assert select_recrawl(fresh, k_per_host=5).count() == 0


def test_conditional_fetch_plan_states(spark):
    from who_focus_crawler_spark.operators.recrawl import conditional_fetch_plan

    # (canon_url, host, batch, content_hash, etag, last_modified, content_length)
    rows = [
        # stable page with etag → expect 304, save last length
        ("u_stable", "h", 1, "A", "W/A", None, 100),
        ("u_stable", "h", 2, "A", "W/A", None, 120),
        # changing page with etag → revalidate but no 304 expected
        ("u_churn", "h", 1, "A", "W/A", None, 50),
        ("u_churn", "h", 2, "B", "W/B", None, 60),
        # stable page with only Last-Modified
        ("u_lm", "h", 1, "C", None, 1700000000, 70),
        ("u_lm", "h", 2, "C", None, 1700000100, 80),
        # stable page with no validator → full GET, nothing saved
        ("u_none", "h", 1, "D", None, None, 90),
        ("u_none", "h", 2, "D", None, None, 95),
        # single fetch with etag → revalidate, but no stability evidence
        ("u_once", "h", 1, "E", "W/E", None, 40),
    ]
    df = spark.createDataFrame(
        rows,
        "canon_url string, host string, batch long, content_hash string, "
        "etag string, last_modified long, content_length long",
    )
    got = {r.canon_url: r for r in conditional_fetch_plan(df).collect()}
    assert len(got) == 5
    s = got["u_stable"]
    assert (s.validator, s.revalidate, s.expect_304, s.saved_bytes) == (
        "etag", True, True, 120,
    )
    c = got["u_churn"]
    assert (c.validator, c.expect_304, c.saved_bytes) == ("etag", False, 0)
    lm = got["u_lm"]
    assert (lm.validator, lm.expect_304, lm.saved_bytes) == (
        "last_modified", True, 80,
    )
    n = got["u_none"]
    assert (n.validator, n.revalidate, n.expect_304, n.saved_bytes) == (
        "none", False, False, 0,
    )
    o = got["u_once"]
    assert (o.validator, o.revalidate, o.expect_304) == ("etag", True, False)
