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
