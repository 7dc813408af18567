"""operators/mirrors.py — mirror-host detection + clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.mirrors import mirror_clusters, mirror_pairs


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, content_hash string")


def test_planted_mirrors_detected_with_containment(spark):
    # m1/m2 share 8 of 10 pages (containment 800‰); x is unrelated
    rows = [("m1", f"c{i}") for i in range(10)]
    rows += [("m2", f"c{i}") for i in range(8)] + [("m2", "u1"), ("m2", "u2")]
    rows += [("x", f"z{i}") for i in range(10)]
    out = mirror_pairs(
        _pages(spark, rows), min_shared=2, min_containment_permille=500
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("m1", "m2")
    assert r["shared"] == 8 and r["pages_a"] == 10 and r["pages_b"] == 10
    assert r["containment_permille"] == 800


def test_containment_threshold_filters(spark):
    rows = [("a", f"c{i}") for i in range(10)]
    rows += [("b", f"c{i}") for i in range(3)] + [
        ("b", f"y{i}") for i in range(7)
    ]
    ps = _pages(spark, rows)
    assert mirror_pairs(ps, min_containment_permille=500).count() == 0
    assert mirror_pairs(ps, min_containment_permille=300).count() == 1


def test_boilerplate_hash_cap_drops_common_content(spark):
    # 'boiler' is served by every host; only m1/m2 share real content
    hosts = [f"h{i}" for i in range(6)] + ["m1", "m2"]
    rows = [(h, "boiler") for h in hosts]
    rows += [("m1", f"c{i}") for i in range(4)]
    rows += [("m2", f"c{i}") for i in range(4)]
    out = mirror_pairs(
        _pages(spark, rows),
        min_shared=2,
        min_containment_permille=500,
        max_hosts_per_hash=4,
    ).collect()
    assert [(r["host_a"], r["host_b"]) for r in out] == [("m1", "m2")]
    # shared counts exclude the capped boilerplate hash
    assert out[0]["shared"] == 4


def test_duplicate_page_rows_collapse(spark):
    rows = [("a", "c1"), ("a", "c1"), ("b", "c1"), ("a", "c2"), ("b", "c2")]
    out = mirror_pairs(_pages(spark, rows), min_shared=2).collect()
    assert len(out) == 1 and out[0]["shared"] == 2 and out[0]["pages_a"] == 2


def test_mirror_clusters_transitive(spark):
    # a~b and b~c pairs → one cluster {a,b,c} kept by min host
    rows = [("a", f"c{i}") for i in range(4)]
    rows += [("b", f"c{i}") for i in range(4)]
    rows += [("b", f"d{i}") for i in range(4)]
    rows += [("c", f"d{i}") for i in range(4)]
    pairs = mirror_pairs(
        _pages(spark, rows), min_shared=2, min_containment_permille=400
    )
    cl = {r["host"]: (r["cluster_id"], r["keep"]) for r in mirror_clusters(pairs).collect()}
    assert cl == {"a": ("a", True), "b": ("a", False), "c": ("a", False)}
