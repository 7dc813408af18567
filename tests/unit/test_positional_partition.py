"""Iceberg v2 positional deletes + partition-spec evolution on the
snapshot catalog shim.

Positional deletes address (physical parquet file path, 0-based row
ordinal) pairs — the `_metadata.file_path` / `_metadata.row_index`
address space — and can retract ONE copy of a duplicated row, which no
equality delete can express. Per the Iceberg sequence-number rule they
apply to file-sets committed at or before them; a re-appended row lives
in a new file and is never over-deleted.

Partition-spec evolution (`set_partition_spec`) is a metadata-only
commit: old file-sets keep the layout they were written under, new
writes use the new one, a read plans one scan per distinct layout, and
`scan_table_partitions` prunes value directories from the manifest
without opening pruned file-sets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

SCH = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        (F.col("id") * 3).alias("v"),
    )


def ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


# ---------------------------------------------------------------- positional


@pytest.fixture()
def cat(spark, tmp_path):
    c = SnapshotCatalog(tmp_path / "cat")
    c.commit(0, {"documents": mk(spark, 0, 10)}, state={})
    c.commit(1, {"documents": mk(spark, 10, 20)}, state={})
    return c


def test_positional_predicate_delete_metadata_only(spark, cat):
    files_before = cat.manifest(cat.head())["tables"]["documents"]
    res = cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id") % 5 == 0
    )
    assert res["deleted"] == 4
    live = cat.read_table(spark, "documents", SCH)
    assert ids(live) == [i for i in range(20) if i % 5 != 0]
    assert cat.manifest(cat.head())["tables"]["documents"] == files_before


def test_positional_delete_one_copy_of_duplicate(spark, cat):
    """The case equality deletes cannot express: two byte-identical rows,
    exactly one retracted."""
    dup = spark.createDataFrame([(7, "h0", 70), (7, "h0", 70)], SCH)
    cat.commit(2, {"documents": dup}, state={})
    with_pos = cat.read_table(spark, "documents", SCH, keep_pos=True)
    pairs = [
        (r["_file_path"], r["_row_pos"])
        for r in with_pos.filter(F.col("v") == 70).collect()
    ]
    assert len(pairs) == 2
    one = spark.createDataFrame(
        [pairs[0]], "file_path string, pos bigint"
    )
    cat.delete_positions(spark, "documents", one)
    live = cat.read_table(spark, "documents", SCH)
    # one duplicate copy dead, the other alive; the ORIGINAL doc_id 7
    # (v=21) from snapshot 0 untouched
    assert live.filter(F.col("v") == 70).count() == 1
    assert live.filter((F.col("doc_id") == 7) & (F.col("v") == 21)).count() == 1


def test_positional_never_over_deletes_reappended_rows(spark, cat):
    cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id") == 5
    )
    assert cat.read_table(spark, "documents", SCH).filter(
        F.col("doc_id") == 5
    ).count() == 0
    cat.commit(3, {"documents": spark.createDataFrame([(5, "h5", 555)], SCH)},
               state={})
    again = cat.read_table(spark, "documents", SCH).filter(F.col("doc_id") == 5)
    assert [(r.doc_id, r.v) for r in again.collect()] == [(5, 555)]


def test_mixed_positional_and_equality_deletes(spark, cat):
    cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id") == 3
    )
    cat.delete_where(
        spark, "documents",
        spark.createDataFrame([(11,)], "doc_id bigint"),
    )
    live = cat.read_table(spark, "documents", SCH)
    assert ids(live) == [i for i in range(20) if i not in (3, 11)]


def test_positional_rejects_wrong_columns_and_replace_tables(spark, cat):
    with pytest.raises(ValueError, match="file_path"):
        cat.delete_positions(
            spark, "documents",
            spark.createDataFrame([(1,)], "doc_id bigint"),
        )
    with pytest.raises(ValueError, match="replace table"):
        cat.delete_positions(
            spark, "frontier",
            spark.createDataFrame([("f", 0)], "file_path string, pos bigint"),
        )


def test_changelog_emits_positional_delete_rows(spark, cat):
    base = cat.head()
    cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id").isin(2, 12)
    )
    cl = cat.changelog_scan(spark, "documents", SCH, from_snapshot=base)
    dels = cl.filter(F.col("_change_type") == "delete")
    assert ids(dels) == [2, 12]
    assert "_file_path" not in cl.columns  # lineage stays internal


def test_compaction_folds_positional_deletes(spark, cat):
    cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id") < 4
    )
    res = cat.compact_table(spark, "documents", SCH, num_files=1)
    assert res["compacted"] and res["deletes_applied"] == 1
    assert not cat.manifest(cat.head()).get("deletes", {}).get("documents")
    assert ids(cat.read_table(spark, "documents", SCH)) == list(range(4, 20))


def test_time_travel_before_positional_delete(spark, cat):
    cat.delete_matching_positions(
        spark, "documents", SCH, F.col("doc_id") == 0
    )
    old = cat.read_table(spark, "documents", SCH, snapshot_id=1)
    assert ids(old) == list(range(20))


# ------------------------------------------------------- partition evolution


BUCKET = [{"source": "host", "transform": "bucket[4]", "name": "host_bucket"}]
IDENT = [{"source": "host", "transform": "identity", "name": "host_id"}]


@pytest.fixture()
def pcat(spark, tmp_path):
    """Three file-sets, three layouts: unpartitioned → bucket[4](host) →
    identity(host)."""
    c = SnapshotCatalog(tmp_path / "pcat")
    c.commit(0, {"documents": mk(spark, 0, 100)}, state={})
    c.set_partition_spec("documents", BUCKET)
    c.commit(2, {"documents": mk(spark, 100, 200)}, state={})
    c.set_partition_spec("documents", IDENT)
    c.commit(4, {"documents": mk(spark, 200, 300)}, state={})
    return c


def test_all_layouts_readable_after_spec_evolution(spark, pcat):
    assert ids(pcat.read_table(spark, "documents", SCH)) == list(range(300))


def test_layouts_on_disk_match_their_write_specs(spark, pcat):
    from pathlib import Path

    m = pcat.manifest(pcat.head())
    fspec = m["partition_specs"]["documents"]["file_spec"]
    by_name = {Path(p).name: s for p, s in fspec.items()}
    assert "snap-000000" not in by_name  # unpartitioned: no layout entry
    assert by_name["snap-000002"] == BUCKET
    assert by_name["snap-000004"] == IDENT
    tdir = Path(pcat.root, "data", "documents")
    assert any(
        d.name.startswith("_d_host_bucket=")
        for d in (tdir / "snap-000002").iterdir()
    )
    assert any(
        d.name.startswith("_d_host_id=")
        for d in (tdir / "snap-000004").iterdir()
    )


def test_keep_partition_cols_nulls_for_old_layouts(spark, pcat):
    kp = pcat.read_table(spark, "documents", SCH, keep_partition_cols=True)
    assert kp.columns == ["doc_id", "host", "v", "host_id"]
    # only the identity-layout file-set (doc 200-299) carries host_id
    assert kp.filter(F.col("host_id").isNotNull()).count() == 100
    assert kp.filter(
        (F.col("doc_id") >= 200) & (F.col("host_id") != F.col("host"))
    ).count() == 0


def test_partition_pruned_scan_is_exact_and_skips_dirs(spark, pcat):
    so = {}
    got = pcat.scan_table_partitions(
        spark, "documents", SCH, "host", "h3", stats_out=so
    )
    exp = pcat.read_table(spark, "documents", SCH).filter(
        F.col("host") == "h3"
    )
    assert ids(got) == ids(exp)
    # both partitioned file-sets pruned to ONE value directory each;
    # the unpartitioned set read in full
    assert so["filesets"] == 3
    assert so["dirs_read"] == 2
    assert so["dirs_candidates"] > so["dirs_read"]


def test_pruned_scan_skips_whole_filesets(spark, pcat):
    """A value whose identity dir is absent → that file-set is pruned
    without opening a file. (The bucket layout CANNOT prune an unseen
    value — it still hashes into an existing bucket — so exactly one
    file-set is skipped; the exact predicate keeps the result right.)"""
    so = {}
    got = pcat.scan_table_partitions(
        spark, "documents", SCH, "host", "h-nonexistent", stats_out=so
    )
    assert so["pruned_filesets"] == 1
    assert got is None or got.count() == 0


def test_one_scan_per_layout(spark, pcat):
    """The plan unions exactly one parquet scan per distinct layout —
    appends within a layout never add scans."""
    pcat.commit(6, {"documents": mk(spark, 300, 400)}, state={})  # identity
    df = pcat.read_table(spark, "documents", SCH)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 3  # unpartitioned, bucket, identity


def test_compaction_rewrites_to_current_spec(spark, pcat):
    res = pcat.compact_table(spark, "documents", SCH, num_files=1)
    assert res["compacted"]
    m = pcat.manifest(pcat.head())
    files = m["tables"]["documents"]
    assert len(files) == 1
    assert m["partition_specs"]["documents"]["file_spec"] == {
        files[0]: IDENT
    }
    assert ids(pcat.read_table(spark, "documents", SCH)) == list(range(300))
    so = {}
    pcat.scan_table_partitions(
        spark, "documents", SCH, "host", "h3", stats_out=so
    )
    assert so == {
        "filesets": 1, "pruned_filesets": 0,
        "dirs_candidates": 7, "dirs_read": 1,
    }


def test_revert_to_unpartitioned(spark, pcat):
    pcat.set_partition_spec("documents", None)
    pcat.commit(6, {"documents": mk(spark, 300, 310)}, state={})
    m = pcat.manifest(pcat.head())
    new = [f for f in m["tables"]["documents"] if f.endswith("snap-000006")]
    assert new and new[0] not in m["partition_specs"]["documents"]["file_spec"]
    assert ids(pcat.read_table(spark, "documents", SCH)) == list(range(310))


def test_occ_commit_stages_under_base_spec(spark, pcat):
    from pathlib import Path

    sid = pcat.commit_optimistic({"documents": mk(spark, 300, 320)}, state={})
    m = pcat.manifest(sid)
    new = [
        f for f in m["tables"]["documents"] if f.endswith(f"snap-{sid:06d}")
    ]
    assert m["partition_specs"]["documents"]["file_spec"][new[0]] == IDENT
    assert any(
        d.name.startswith("_d_host_id=") for d in Path(new[0]).iterdir()
    )
    assert ids(pcat.read_table(spark, "documents", SCH)) == list(range(320))


def test_spec_validation_rejects_bad_fields(spark, pcat):
    with pytest.raises(ValueError, match="unknown source"):
        pcat.set_partition_spec(
            "documents",
            [{"source": "nope", "transform": "identity", "name": "x"}],
        )
    with pytest.raises(ValueError, match="unknown transform"):
        pcat.set_partition_spec(
            "documents",
            [{"source": "host", "transform": "sort", "name": "x"}],
        )
    with pytest.raises(ValueError, match="collides"):
        pcat.set_partition_spec(
            "documents",
            [{"source": "host", "transform": "identity", "name": "host"}],
        )


def test_calendar_and_truncate_transforms(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("day", T.DateType()),
            T.StructField("v", T.LongType()),
        ]
    )
    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.date_add(F.lit("2026-01-01"), (F.col("id") % 45).cast("int")).alias(
            "day"
        ),
        (F.col("id") * 100).alias("v"),
    )
    c = SnapshotCatalog(tmp_path / "cal")
    c.commit(0, {"documents": df}, state={})
    c.set_partition_spec(
        "documents",
        [
            {"source": "day", "transform": "month", "name": "month"},
            {"source": "v", "transform": "truncate[1000]", "name": "v_k"},
        ],
    )
    c.commit(2, {"documents": df.withColumn("doc_id", F.col("doc_id") + 60)},
             state={})
    got = c.read_table(spark, "documents", sch, keep_partition_cols=True)
    assert got.count() == 120
    newer = got.filter(F.col("doc_id") >= 60)
    assert newer.filter(
        F.col("month") != F.date_format("day", "yyyy-MM")
    ).count() == 0
    assert newer.filter(
        F.col("v_k") != (F.floor(F.col("v") / 1000) * 1000)
    ).count() == 0
    so = {}
    pruned = c.scan_table_partitions(
        spark, "documents", sch, "day", "2026-02-10", stats_out=so
    )
    assert so["dirs_read"] == 1  # month=2026-02 only
    assert ids(pruned) == ids(
        c.read_table(spark, "documents", sch).filter(
            F.col("day") == "2026-02-10"
        )
    )
