"""Catalog branches + write-audit-publish (checkpoint/snapshot.py):
staged branch commits are invisible to main, branch reads go through the
ordinary ref-name path, fast-forward publishes atomically, divergence is
refused, and snapshot-id immutability still allows the crash-orphan
recovery overwrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), False)]
)


def delta(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("doc_id"))


def ids(cat, spark, snapshot=None):
    df = cat.read_table(spark, "documents", SCHEMA, snapshot_id=snapshot)
    return sorted(r.doc_id for r in df.collect()) if df is not None else []


def test_write_audit_publish(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    cat.commit(0, {"documents": delta(spark, 0, 10)}, state={"k": "base"})
    cat.create_branch("audit")
    s1 = cat.commit_to_branch(
        "audit", {"documents": delta(spark, 10, 20)}, state={"k": "stage1"}
    )
    s2 = cat.commit_to_branch(
        "audit", {"documents": delta(spark, 20, 30)}, state={"k": "stage2"}
    )
    assert s2 > s1 > 0
    # main readers see only the base; branch readers see the whole chain
    assert cat.head() == 0
    assert ids(cat, spark) == list(range(10))
    assert ids(cat, spark, "audit") == list(range(30))
    assert cat.state("audit")["k"] == "stage2"
    # parent chain: s2 -> s1 -> 0
    assert cat.manifest(s2)["parent"] == s1
    assert cat.manifest(s1)["parent"] == 0
    # publish: one atomic swap, then the branch is disposable
    tip = cat.fast_forward_main("audit", drop_branch=True)
    assert tip == s2 and cat.head() == s2
    assert ids(cat, spark) == list(range(30))
    assert cat.ref("audit") is None


def test_divergence_refused(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    cat.commit(0, {"documents": delta(spark, 0, 5)}, state={})
    cat.create_branch("audit")
    cat.commit_to_branch("audit", {"documents": delta(spark, 5, 8)}, state={})
    # main moves on independently -> branch no longer fast-forwardable
    cat.commit(
        cat._next_sid(), {"documents": delta(spark, 100, 105)}, state={}
    )
    with pytest.raises(ValueError, match="diverged"):
        cat.fast_forward_main("audit")
    # the abandoned branch disappears without touching main
    cat.drop_ref("audit")
    assert ids(cat, spark) == list(range(5)) + list(range(100, 105))


def test_branch_guards(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    cat.commit(0, {"documents": delta(spark, 0, 3)}, state={})
    cat.create_branch("b")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_branch("b")
    with pytest.raises(ValueError, match="unknown branch"):
        cat.commit_to_branch("nope", {"documents": delta(spark, 0, 1)}, state={})
    with pytest.raises(ValueError, match="unknown branch"):
        cat.fast_forward_main("nope")


def test_published_ids_immutable_but_orphans_recoverable(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    cat.commit(0, {"documents": delta(spark, 0, 3)}, state={})
    cat.commit(1, {"documents": delta(spark, 3, 6)}, state={})
    with pytest.raises(ValueError, match="immutable"):
        cat.commit(1, {"documents": delta(spark, 0, 1)}, state={})
    # crash orphan: manifest written at head+1, HEAD never swapped —
    # the recovery re-commit must overwrite it
    orphan = dict(cat.manifest(1))
    orphan["snapshot_id"] = 2
    cat._write_manifest(orphan)
    assert cat.head() == 1
    cat.commit(2, {"documents": delta(spark, 6, 9)}, state={})
    assert cat.head() == 2
    assert ids(cat, spark) == list(range(9))
