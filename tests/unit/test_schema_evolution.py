"""Snapshot-catalog schema evolution (Iceberg field-id scheme on the
shim): add / rename / widen / drop are metadata-only commits; historical
files are resolved through their own field-id → physical-name mapping,
so no data file is rewritten and time travel sees each snapshot's own
schema."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog


@pytest.fixture()
def evolved_catalog(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "cat")
    df0 = spark.createDataFrame([(1, "x"), (2, "y")], schema="a int, b string")
    cat.commit(0, {"documents": df0}, state={"k": 1})
    # metadata-only: add a column, rename b → b2, widen a to bigint
    res = cat.evolve_schema(
        "documents",
        add=[("c", "bigint")],
        rename={"b": "b2"},
        retype={"a": "bigint"},
    )
    assert res["snapshot_id"] == 1
    # post-evolution append at the NEW schema (documents is an append
    # table: both file generations stay live under one manifest)
    df1 = spark.createDataFrame([(3, "z", 30)], schema="a bigint, b2 string, c bigint")
    cat.commit(2, {"documents": df1}, state={"k": 2})
    return cat


def test_evolved_read_unifies_generations(spark, evolved_catalog):
    got = evolved_catalog.read_table_evolved(spark, "documents")
    assert [f.simpleString() for f in got.schema.fields] == [
        "a:bigint",
        "b2:string",
        "c:bigint",
    ]
    rows = {(r.a, r.b2, r.c) for r in got.collect()}
    # pre-evolution rows: b values surface under the renamed column
    # (field-id resolution), added column reads as NULL, a widened
    assert rows == {(1, "x", None), (2, "y", None), (3, "z", 30)}


def test_time_travel_sees_original_schema(spark, evolved_catalog):
    old = evolved_catalog.read_table_evolved(spark, "documents", snapshot_id=0)
    assert [f.simpleString() for f in old.schema.fields] == ["a:int", "b:string"]
    assert {(r.a, r.b) for r in old.collect()} == {(1, "x"), (2, "y")}


def test_drop_hides_column_without_rewrite(spark, evolved_catalog):
    files_before = evolved_catalog.manifest(evolved_catalog.head())["tables"][
        "documents"
    ]
    evolved_catalog.evolve_schema("documents", drop=["c"])
    got = evolved_catalog.read_table_evolved(spark, "documents")
    assert got.columns == ["a", "b2"]
    # metadata-only: same files, no rewrite
    files_after = evolved_catalog.manifest(evolved_catalog.head())["tables"][
        "documents"
    ]
    assert files_after == files_before


def test_compaction_normalizes_evolved_table(spark, evolved_catalog):
    res = evolved_catalog.compact_table(spark, "documents", schema=None)
    assert res["compacted"] and res["files_before"] == 2
    got = evolved_catalog.read_table_evolved(spark, "documents")
    assert {(r.a, r.b2, r.c) for r in got.collect()} == {
        (1, "x", None),
        (2, "y", None),
        (3, "z", 30),
    }
    # post-compaction the table is one physical layout → one mapping
    sch = evolved_catalog.manifest(evolved_catalog.head())["schemas"]["documents"]
    assert len(sch["file_physical"]) == 1


def test_evolution_validation_errors(spark, evolved_catalog):
    with pytest.raises(ValueError, match="unknown column"):
        evolved_catalog.evolve_schema("documents", rename={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        evolved_catalog.evolve_schema("documents", add=[("a", "int")])
    with pytest.raises(ValueError, match="no registered schema"):
        evolved_catalog.evolve_schema("never_written", drop=["a"])


def test_refs_pin_snapshots(spark, tmp_path):
    """Iceberg-style tags: a ref freezes a corpus cut — readable by
    name, immune to expire_snapshots until dropped."""
    cat = SnapshotCatalog(tmp_path / "refcat")
    for sid in range(4):
        df = spark.createDataFrame([(sid,)], "v int")
        cat.commit(sid, {"metrics": df}, state={"sid": sid})
    cat.set_ref("train-v1", 1)
    assert cat.refs() == {"train-v1": 1}
    got = cat.read_table_evolved(spark, "metrics", snapshot_id="train-v1")
    # metrics is an append table: snapshot 1 holds deltas 0 and 1
    assert {r.v for r in got.collect()} == {0, 1}
    assert cat.state("train-v1") == {"sid": 1}

    # expiry keeps the tagged snapshot (would otherwise keep only last 1)
    cat.expire_snapshots(keep_last=1)
    assert cat.manifest(1)["state"] == {"sid": 1}
    assert {r.v for r in
            cat.read_table_evolved(spark, "metrics", "train-v1").collect()
            } == {0, 1}

    # dropped ref → next expiry reclaims
    assert cat.drop_ref("train-v1") and not cat.drop_ref("train-v1")
    cat.expire_snapshots(keep_last=1)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.manifest(1)
    with _pytest.raises(ValueError, match="unknown ref"):
        cat.read_table_evolved(spark, "metrics", snapshot_id="train-v1")
    with _pytest.raises(ValueError, match="invalid ref name"):
        cat.set_ref("../escape", 3)
    with _pytest.raises(ValueError, match="no snapshot"):
        cat.set_ref("gone", 1)  # expired above
