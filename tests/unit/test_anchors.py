from __future__ import annotations

from who_focus_crawler_spark.operators.anchors import anchor_signal


def _links(spark):
    rows = [
        # t1: 'spark' ×3, 'engine' ×2, 'fast' ×1, 'ml' ×1 → top3 by
        # (count desc, term asc) = spark|engine|fast ('fast' < 'ml')
        ("h1", "t1", "Fast Spark engine"),
        ("h2", "t1", "spark ML"),
        ("h2", "t1", "SPARK!! engine;"),
        # t2: anchor-less links still count as in-links
        ("h1", "t2", None),
        ("h3", "t2", ""),
        # t3: 1-char tokens dropped; punctuation-only anchor → no terms
        ("h1", "t3", "a b c --- !!"),
    ]
    return spark.createDataFrame(
        rows, "src_host string, target_url string, anchor_text string"
    )


def test_anchor_signal_counts_and_top_terms(spark):
    out = {r["target_url"]: r for r in anchor_signal(_links(spark)).collect()}
    t1, t2, t3 = out["t1"], out["t2"], out["t3"]
    assert (t1["n_inlinks"], t1["n_src_hosts"]) == (3, 2)
    assert t1["top_terms"] == "spark|engine|fast"
    assert (t2["n_inlinks"], t2["n_src_hosts"], t2["top_terms"]) == (2, 2, "")
    assert t3["top_terms"] == ""


def test_anchor_signal_topk_and_min_len_knobs(spark):
    out = {
        r["target_url"]: r
        for r in anchor_signal(_links(spark), top_k_terms=1, min_term_len=1).collect()
    }
    assert out["t1"]["top_terms"] == "spark"
    # min_term_len=1 keeps the single-char tokens: counts 1 each, term asc
    assert out["t3"]["top_terms"] == "a"


def test_anchor_signal_partition_invariant(spark):
    a = anchor_signal(_links(spark).repartition(1)).collect()
    b = anchor_signal(_links(spark).repartition(5)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
