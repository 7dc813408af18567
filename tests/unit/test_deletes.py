"""Row-level deletes on the snapshot catalog (Iceberg v2 equality
deletes, merge-on-read): `delete_where` is a metadata commit that kills
matching rows without rewriting data files; readers apply a delete file
only to data file-sets committed BEFORE it (sequence-number rule), so a
key re-appended after its delete stays visible; compaction folds live
deletes into the rewrite and clears them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

SCH = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def rows(df):
    return {(r.doc_id, r.text) for r in df.collect()}


@pytest.fixture()
def cat(spark, tmp_path):
    c = SnapshotCatalog(tmp_path / "cat")
    c.commit(
        0,
        {"documents": spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCH)},
        state={},
    )
    c.commit(
        1,
        {"documents": spark.createDataFrame([(4, "d"), (5, "e")], SCH)},
        state={},
    )
    return c


def keys(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def test_delete_hides_rows_without_rewriting_files(spark, cat):
    files_before = cat.manifest(cat.head())["tables"]["documents"]
    res = cat.delete_where(spark, "documents", keys(spark, 2, 5))
    assert res["snapshot_id"] == 2
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(1, "a"), (3, "c"), (4, "d")}
    # metadata-only: the data file list is untouched
    assert cat.manifest(cat.head())["tables"]["documents"] == files_before


def test_time_travel_before_delete_sees_all_rows(spark, cat):
    cat.delete_where(spark, "documents", keys(spark, 2))
    old = cat.read_table(spark, "documents", SCH, snapshot_id=1)
    assert rows(old) == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_reappended_key_survives_older_delete(spark, cat):
    # sequence-number semantics: the delete at snapshot 2 must not touch
    # the file-set committed at snapshot 3, even for the same key
    cat.delete_where(spark, "documents", keys(spark, 2))
    cat.commit(
        3, {"documents": spark.createDataFrame([(2, "b2")], SCH)}, state={}
    )
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(1, "a"), (3, "c"), (4, "d"), (5, "e"), (2, "b2")}


def test_deletes_stack_across_commits(spark, cat):
    cat.delete_where(spark, "documents", keys(spark, 1))
    cat.delete_where(spark, "documents", keys(spark, 4))
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(2, "b"), (3, "c"), (5, "e")}


def test_delete_matching_predicate_and_noop(spark, cat):
    res = cat.delete_matching(
        spark, "documents", SCH, F.col("text") == "c", key_cols=["doc_id"]
    )
    assert res["deleted"] == 1
    assert rows(cat.read_table(spark, "documents", SCH)) == {
        (1, "a"),
        (2, "b"),
        (4, "d"),
        (5, "e"),
    }
    head_before = cat.head()
    res2 = cat.delete_matching(
        spark, "documents", SCH, F.col("text") == "zzz", key_cols=["doc_id"]
    )
    assert res2 == {"deleted": 0}
    assert cat.head() == head_before  # no empty-delete commit


def test_null_key_matches_null_row(spark, cat):
    cat.commit(
        2, {"documents": spark.createDataFrame([(None, "n")], SCH)}, state={}
    )
    cat.delete_where(
        spark, "documents", spark.createDataFrame([(None,)], "doc_id bigint")
    )
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_compaction_folds_deletes_and_clears_them(spark, cat):
    cat.delete_where(spark, "documents", keys(spark, 2, 5))
    mor = rows(cat.read_table(spark, "documents", SCH))
    res = cat.compact_table(spark, "documents", SCH, num_files=1)
    assert res["compacted"] and res["deletes_applied"] == 1
    head = cat.manifest(cat.head())
    assert head.get("deletes", {}).get("documents", []) == []
    assert len(head["tables"]["documents"]) == 1
    assert rows(cat.read_table(spark, "documents", SCH)) == mor
    # the pre-compaction snapshot still reads merge-on-read
    assert rows(cat.read_table(spark, "documents", SCH, snapshot_id=2)) == mor


def test_delete_after_compaction_applies_to_compacted_files(spark, cat):
    cat.delete_where(spark, "documents", keys(spark, 2))
    cat.compact_table(spark, "documents", SCH, num_files=1)
    cat.delete_where(spark, "documents", keys(spark, 4))
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(1, "a"), (3, "c"), (5, "e")}


def test_expire_keeps_delete_files_referenced_by_retained_manifests(
    spark, cat
):
    cat.delete_where(spark, "documents", keys(spark, 2))
    cat.commit(
        3, {"documents": spark.createDataFrame([(6, "f")], SCH)}, state={}
    )
    cat.expire_snapshots(keep_last=2)
    got = cat.read_table(spark, "documents", SCH)
    assert rows(got) == {(1, "a"), (3, "c"), (4, "d"), (5, "e"), (6, "f")}


def test_replace_table_delete_refused(spark, cat):
    with pytest.raises(ValueError, match="replace table"):
        cat.delete_where(spark, "frontier", keys(spark, 1))


def test_mismatched_delete_keys_refused(spark, cat):
    cat.delete_where(spark, "documents", keys(spark, 2))
    with pytest.raises(ValueError, match="keyed"):
        cat.delete_where(
            spark, "documents", spark.createDataFrame([("a",)], "text string")
        )
