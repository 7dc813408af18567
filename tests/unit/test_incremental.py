"""Incremental append scan + orphan-file cleanup (snapshot catalog
maintenance, Iceberg semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

SCHEMA = T.StructType(
    [
        T.StructField("batch", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("fetched", T.LongType()),
    ]
)


def _mk(spark, batch, n=5):
    return spark.createDataFrame(
        [(batch, f"h{i}", batch * 10 + i) for i in range(n)], SCHEMA
    )


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "cat")
    for sid in range(4):
        cat.commit(sid, {"metrics": _mk(spark, sid)}, state={"b": sid})
    return cat


def test_incremental_scan_returns_only_the_delta(spark, catalog):
    inc = catalog.incremental_scan(spark, "metrics", SCHEMA, from_snapshot=1)
    got = sorted((r.batch, r.host, r.fetched) for r in inc.collect())
    assert got == sorted(
        (b, f"h{i}", b * 10 + i) for b in (2, 3) for i in range(5)
    )
    # bounded range
    inc12 = catalog.incremental_scan(
        spark, "metrics", SCHEMA, from_snapshot=1, to_snapshot=2
    )
    assert sorted(r.batch for r in inc12.collect()) == [2] * 5
    # empty delta -> None
    assert (
        catalog.incremental_scan(spark, "metrics", SCHEMA, from_snapshot=3)
        is None
    )
    with pytest.raises(ValueError):
        catalog.incremental_scan(
            spark, "metrics", SCHEMA, from_snapshot=3, to_snapshot=1
        )


def test_incremental_scan_refuses_rewrites_and_deletes(spark, catalog):
    catalog.compact_table(spark, "metrics", SCHEMA)
    with pytest.raises(ValueError, match="compaction"):
        catalog.incremental_scan(spark, "metrics", SCHEMA, from_snapshot=1)
    # a fresh append AFTER the rewrite is incrementally readable again
    sid = catalog._next_sid()
    catalog.commit(sid, {"metrics": _mk(spark, 9)}, state={"b": 9})
    inc = catalog.incremental_scan(
        spark, "metrics", SCHEMA, from_snapshot=sid - 1
    )
    assert sorted(r.batch for r in inc.collect()) == [9] * 5
    # row-level deletes in range refuse
    keys = spark.createDataFrame([(9,)], "batch long")
    catalog.delete_where(spark, "metrics", keys)
    with pytest.raises(ValueError, match="deletes"):
        catalog.incremental_scan(spark, "metrics", SCHEMA, from_snapshot=sid - 1)


def test_remove_orphan_files(spark, catalog, tmp_path):
    # a crash orphan: data written, manifest never published, id ≤ head
    stray = tmp_path / "cat" / "data" / "metrics" / "snap-000002-orphan"
    # _file_sid parses the suffix after the last '-': craft one inside
    # the known-id range
    stray = tmp_path / "cat" / "data" / "metrics" / "crash-000002"
    _mk(spark, 99).write.parquet(str(stray))
    # an in-flight file-set beyond every manifest id must be kept
    inflight = tmp_path / "cat" / "data" / "metrics" / "snap-000099"
    _mk(spark, 100).write.parquet(str(inflight))
    before = {
        tuple(r)
        for r in catalog.read_table(spark, "metrics", SCHEMA).collect()
    }
    res = catalog.remove_orphan_files()
    assert res["removed"] == 1 and str(stray) in res["paths"][0]
    assert res["kept_inflight"] == 1
    assert inflight.exists() and not stray.exists()
    # every reachable snapshot still reads, bit-identical
    after = {
        tuple(r)
        for r in catalog.read_table(spark, "metrics", SCHEMA).collect()
    }
    assert after == before
    at1 = catalog.read_table(spark, "metrics", SCHEMA, snapshot_id=1)
    assert sorted(r.batch for r in at1.collect()) == [0] * 5 + [1] * 5
    # idempotent
    assert catalog.remove_orphan_files()["removed"] == 0


def _cl(df):
    return sorted(
        (r._change_type, r._change_snapshot_id, r.batch, r.host, r.fetched)
        for r in df.collect()
    )


def test_changelog_scan_inserts_and_deletes(spark, catalog):
    # window (1, head]: snapshots 2 and 3 appended 5 rows each
    cl = catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=1)
    assert _cl(cl) == sorted(
        ("insert", b, b, f"h{i}", b * 10 + i) for b in (2, 3) for i in range(5)
    )
    # delete two of batch 0's rows (committed at snapshot 4)
    keys = spark.createDataFrame([(0, "h0"), (0, "h3")], "batch long, host string")
    dsid = catalog.delete_where(spark, "metrics", keys)["snapshot_id"]
    # incremental_scan refuses this window; changelog answers it
    with pytest.raises(ValueError, match="deletes"):
        catalog.incremental_scan(spark, "metrics", SCHEMA, from_snapshot=3)
    cl = catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=3)
    assert _cl(cl) == sorted(
        [("delete", dsid, 0, "h0", 0), ("delete", dsid, 0, "h3", 3)]
    )
    # full window: appends AND the retraction, each stamped with its commit
    cl = catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=0)
    assert _cl(cl) == sorted(
        [("insert", b, b, f"h{i}", b * 10 + i) for b in (1, 2, 3) for i in range(5)]
        + [("delete", dsid, 0, "h0", 0), ("delete", dsid, 0, "h3", 3)]
    )


def test_changelog_scan_second_delete_skips_dead_rows(spark, catalog):
    # first delete kills h0 of EVERY batch; second delete targets
    # (batch<=1) broadly — rows h0 already dead must NOT re-emit
    d1 = catalog.delete_where(
        spark, "metrics",
        spark.createDataFrame([(b, "h0") for b in range(4)],
                              "batch long, host string"),
    )["snapshot_id"]
    d2 = catalog.delete_where(
        spark, "metrics",
        spark.createDataFrame([(b, f"h{i}") for b in (0, 1) for i in range(5)],
                              "batch long, host string"),
    )["snapshot_id"]
    cl = catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=3)
    expect = [("delete", d1, b, "h0", b * 10) for b in range(4)] + [
        ("delete", d2, b, f"h{i}", b * 10 + i)
        for b in (0, 1)
        for i in range(1, 5)  # h0 rows died at d1, not re-emitted at d2
    ]
    assert _cl(cl) == sorted(expect)
    # a row inserted AND deleted inside one window emits both records
    sid = catalog._next_sid()
    catalog.commit(sid, {"metrics": _mk(spark, 7, n=1)}, state={"b": 7})
    d3 = catalog.delete_where(
        spark, "metrics", spark.createDataFrame([(7, "h0")],
                                                "batch long, host string")
    )["snapshot_id"]
    cl = catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=d2)
    assert _cl(cl) == sorted(
        [("insert", sid, 7, "h0", 70), ("delete", d3, 7, "h0", 70)]
    )


def test_changelog_scan_refuses_compaction_and_empty_is_none(spark, catalog):
    assert (
        catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=3)
        is None
    )
    catalog.compact_table(spark, "metrics", SCHEMA)
    with pytest.raises(ValueError, match="compaction"):
        catalog.changelog_scan(spark, "metrics", SCHEMA, from_snapshot=1)
