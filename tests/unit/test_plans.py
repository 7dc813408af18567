"""Physical-plan assertions (SURVEY.md §4): the optimizations the engine
relies on at 100 TB must be visible in the plan, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import canonicalize_df
from who_focus_crawler_spark.harness import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_pushdown_and_pruning(spark):
    df = REGISTRY["r_scan_project"][0](spark, SF)
    plan = _formatted(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]
    # column pruning: the parquet ReadSchema must NOT include unused cols
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_shipdate" not in read_schema
    assert "l_extendedprice" in read_schema


def test_broadcast_join_chosen(spark):
    df = REGISTRY["r_join_broadcast"][0](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_anti_join_present(spark):
    df = REGISTRY["r_join_anti"][0](spark, SF)
    assert "LeftAnti" in _plan(df)


def test_canonicalize_single_python_crossing(spark):
    urls = spark.range(100).select(
        F.concat(F.lit("http://h.t/a/../p/"), F.col("id").cast("string")).alias("url")
    )
    out = canonicalize_df(urls, "url")
    plan = _plan(out)
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_sort_within_partitions_no_global_exchange(spark):
    df = REGISTRY["r_sort_within"][0](spark, SF)
    plan = _plan(df)
    assert "Sort" in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort exchange


def test_partial_agg_and_codegen(spark):
    df = REGISTRY["r_agg_q1"][0](spark, SF)
    # map-side combine: partial aggregation before the exchange
    assert "partial_sum" in _formatted(df)
    # whole-stage codegen markers appear in the AQE final plan after THIS
    # dataframe's own plan executes (count() would plan separately)
    df.collect()
    assert "*(" in _plan(df)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-located join via bucketing: two tables bucketed on the join key
    join WITHOUT a shuffle on either side — the physical plan has no
    Exchange above the scans. At 100 TB this is how url_seen joins the
    frontier without moving the big table every batch."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(10_000).select(
            F.col("id").alias("url_hash"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("canon_url"),
        )
        right = spark.range(0, 10_000, 3).select(
            F.col("id").alias("url_hash"), F.lit(1).alias("seen")
        )
        for name, df in (("b_frontier", left), ("b_seen", right)):
            # external table location: the warehouse dir is a static conf
            df.write.mode("overwrite").option(
                "path", str(tmp_path / name)
            ).bucketBy(8, "url_hash").sortBy("url_hash").saveAsTable(name)
        j = spark.table("b_frontier").join(spark.table("b_seen"), "url_hash")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert j.count() == len(range(0, 10_000, 3))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_frontier")
        spark.sql("DROP TABLE IF EXISTS b_seen")


def test_span_equality_checker(spark):
    from who_focus_crawler_spark.functions.verify import diff_documents

    rows = [
        (
            "d1",
            [("text", "a", None, 0), ("media", None, "m://1", 5)],
        ),
        ("d2", [("link", None, "http://x", 0)]),
    ]
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    a = spark.createDataFrame(rows, schema)
    assert diff_documents(a, a).count() == 0
    # offsets differ but (kind, text, media_ref) equal -> still equal
    rows_off = [
        ("d1", [("text", "a", None, 9), ("media", None, "m://1", 99)]),
        ("d2", [("link", None, "http://x", 7)]),
    ]
    b = spark.createDataFrame(rows_off, schema)
    assert diff_documents(a, b).count() == 0
    # changed media_ref -> flagged
    rows_bad = [
        ("d1", [("text", "a", None, 0), ("media", None, "m://2", 5)]),
        ("d2", [("link", None, "http://x", 0)]),
    ]
    c = spark.createDataFrame(rows_bad, schema)
    assert [r.doc_id for r in diff_documents(a, c).collect()] == ["d1"]
    # missing doc -> flagged
    assert diff_documents(a, a.filter(F.col("doc_id") != "d2")).count() == 1


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed by the join key at the same bucket count
    merge-join with ZERO shuffle exchanges — the layout contract that
    makes repeated fact-fact joins affordable at 100 TB."""
    from who_focus_crawler_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "t_bkt_l", 4, ["k"], path=str(tmp_path / "l"))
    write_bucketed(right, "t_bkt_r", 4, ["k"], path=str(tmp_path / "r"))
    j = bucketed_join(spark, "t_bkt_l", "t_bkt_r", on=["k"])
    plan = _plan(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # bucket-sorted scans: no per-task Sort needed either
    assert plan.count("Sort ") == 0, plan
    assert j.count() == len(range(0, 5000, 3))
    # and the result values are the plain-join values
    got = sorted((r.k, r.a, r.b) for r in j.collect())
    assert got == [(k, k * 2, k + 7) for k in range(0, 5000, 3)]


def test_exists_subqueries_rewrite_to_semi_anti_joins(spark):
    """Catalyst must decorrelate EXISTS/NOT EXISTS into hash semi/anti
    joins — at 100 TB a per-row subquery would be unrunnable."""
    df = REGISTRY["r_exists_subquery"][0](spark, SF)
    plan = _plan(df)
    # select-list EXISTS -> ExistenceJoin; WHERE NOT EXISTS -> LeftAnti
    assert "ExistenceJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_decontam_broadcasts_bench_grams(spark):
    """The benchmark gram set is the broadcast side; the corpus side must
    not shuffle for the contamination join."""
    from who_focus_crawler_spark.corpus.decontam import contamination
    from who_focus_crawler_spark.harness.util import t

    d = t(spark, SF, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0)
    plan = _plan(contamination(d, bench, n=4))
    assert "BroadcastHashJoin" in plan, plan


def test_runtime_bloom_filter_injected_for_big_joins(spark):
    """Shuffle joins where neither side broadcasts (the 100 TB fact x
    fact regime — simulated by disabling auto-broadcast) get a runtime
    bloom filter injected on the big probe side from the selective
    build side, cutting shuffled rows before the exchange. Catalyst
    provides this for free; this pins that our session config keeps it
    enabled and that it actually fires on the engine's join shape."""
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().sum("l_quantity")
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt[:2000]
        # and it executes correctly with the filter in place
        with_bloom = j.collect()[0][0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thr,
        )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().sum("l_quantity")
    assert with_bloom == plain.collect()[0][0]


def test_shard_assignment_is_pure_projection(spark):
    """Rendezvous sharding must not shuffle: the arg-max over per-shard
    weights is a row-local array expression."""
    from who_focus_crawler_spark.operators.sharding import assign_shards

    hosts = spark.range(1000).select(
        F.concat(F.lit("host"), F.col("id").cast("string")).alias("host")
    )
    plan = _plan(assign_shards(hosts, 8))
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_two_phase_topk_has_no_window(spark):
    """knn_join / ann_recall resolve per-query top-k via sorted-slice
    aggregation — a per-query global window would funnel each query's
    full score stream through one task."""
    from who_focus_crawler_spark.corpus.similarity import knn_join

    corpus = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97).cast("float") for i in range(4)]).alias(
            "embedding"
        ),
    )
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(knn_join(q, corpus, k=5))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan  # query side broadcasts


def test_crawl_tiers_no_single_task_global_window(spark):
    """assign_crawl_tiers ranks the whole host population — the rank must
    run on the two-phase distributed sequencer (range partition + local
    sort + offsets), never a partitionless Window over every host."""
    from who_focus_crawler_spark.operators.tiers import assign_crawl_tiers

    hs = spark.range(200).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        (F.col("id") % 37 + 1).cast("long").alias("rank_units"),
        (F.col("id") % 11).cast("long").alias("change_permille"),
    )
    plan = _plan(assign_crawl_tiers(hs, n_tiers=4))
    # the only Window allowed is the per-partition local rank (partitioned
    # by the sequencer's internal pid column), plus the tiny offsets
    # window over ~num_partitions count rows
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_seq_pid" in line, line


def test_min_window_span_partitions_by_doc(spark):
    """Proximity sweep windows are per-doc — no global exchange-to-one."""
    from who_focus_crawler_spark.corpus.index import min_window_span

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma alpha").alias("text"),
    )
    plan = _plan(min_window_span(docs, ["alpha", "beta"]))
    assert "SinglePartition" not in plan


def test_t5_windows_doc_partitioned_only(spark):
    """corpus/t5.py: every window in the span-corruption plan is
    doc_id-partitioned — a global (SinglePartition) window would make
    the gaps-and-islands merge a one-task bottleneck at corpus scale."""
    df = REGISTRY["d_t5_spans"][0](spark, SF)
    plan = _plan(df)
    assert "Window" in plan
    for frag in plan.split("Window [")[1:]:
        assert "doc_id" in frag.split("windowspecdefinition")[1][:120], frag[:200]


def test_aging_view_adds_no_exchange(spark):
    """operators/frontier.py::age_boosted_view is a pure projection —
    the aged selection must shuffle exactly as often as the unaged one
    (once, on host for the top-k window)."""
    from who_focus_crawler_spark.operators.frontier import (
        age_boosted_view,
        select_candidates,
    )

    fr = spark.createDataFrame(
        [(f"h{i%5}", f"u{i}", float(-(i % 3)), i % 3, i % 7) for i in range(100)],
        "host string, canon_url string, priority double, depth int, "
        "discovered_in_batch int",
    )
    base = _plan(select_candidates(fr, 3))
    aged = _plan(select_candidates(age_boosted_view(fr, 9, 500), 3))
    assert aged.count("Exchange") == base.count("Exchange")


def test_bandit_broadcasts_total_and_takeordered_topm(spark):
    """operators/bandit.py: the 1-row total joins by broadcast (never a
    shuffle of the stats), and top-m selection is TakeOrderedAndProject
    (per-partition top-m then merge — no global sort, no one-task
    window)."""
    from who_focus_crawler_spark.operators.bandit import select_bandit_hosts

    stats = spark.createDataFrame(
        [(f"h{i}", i % 17, (i * i) % 9999) for i in range(500)],
        "host string, pulls long, reward_milli_sum long",
    )
    plan = _plan(select_bandit_hosts(stats, 5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan


def test_dedup_lines_global_no_global_window(spark):
    """corpus/text.py::dedup_lines_global: first-occurrence election is
    a partial+final agg on the line key plus doc-keyed rebuild — no
    window at all, so nothing funnels through one task."""
    df = REGISTRY["d_dedup_lines_global"][0](spark, SF)
    plan = _plan(df)
    assert "windowspecdefinition" not in plan
    assert "partial_min" in _formatted(df) or "partial_count" in _formatted(df)
