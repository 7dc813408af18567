"""Catalog conformance suite: the `SnapshotCatalog` CONTRACT as a
backend-independent checklist.

Every check takes ``(spark, factory)`` where ``factory()`` builds a
FRESH empty catalog, and asserts one contract clause: commit
visibility, append-vs-replace, atomic linear history, time travel,
refs/branches/WAP, rollback, equality + positional delete sequence
rules, OCC merge + conflict, schema evolution, partition-spec
evolution, snapshot expiry, state round-trip.

`tests/unit/test_catalog_conformance.py` runs the suite against the
offline shim. A real-catalog adapter (an Iceberg REST backend plugged
in through `checkpoint/cas.py` plus a `SnapshotCatalog`-shaped facade)
re-runs the SAME suite with its own factory — that is the cluster
swap-in gate: green suite ⇒ the engine's crawl/corpus code runs
unchanged on the new backend.

Usage:

    from who_focus_crawler_spark.checkpoint.conformance import CHECKS
    for name, check in CHECKS.items():
        check(spark, lambda: MyCatalog(...))
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SCHEMA = "doc_id bigint, text string"

CHECKS: dict[str, Callable] = {}


def _check(fn):
    CHECKS[fn.__name__] = fn
    return fn


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "CAST(id * 7 AS STRING) AS text"
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@_check
def commit_visibility(spark: SparkSession, factory) -> None:
    """A committed table is readable at head, exactly as written."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 10)}, state={})
    assert cat.head() == 0
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(10))


@_check
def append_accumulates_replace_supersedes(spark: SparkSession, factory) -> None:
    """APPEND tables carry prior file lists forward; REPLACE tables
    point only at the latest write."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5),
                   "frontier": _docs(spark, 0, 5)}, state={})
    cat.commit(1, {"documents": _docs(spark, 5, 10),
                   "frontier": _docs(spark, 5, 10)}, state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(10))
    assert _ids(cat.read_table(spark, "frontier", SCHEMA)) == list(range(5, 10))


@_check
def history_is_linear_and_immutable(spark: SparkSession, factory) -> None:
    """Parent pointers form one chain; a published snapshot id cannot
    be rewritten."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.commit(1, {"documents": _docs(spark, 5, 10)}, state={})
    assert cat.manifest(1)["parent"] == 0
    try:
        cat.commit(0, {"documents": _docs(spark, 0, 1)}, state={})
        raise AssertionError("rewriting a published snapshot must fail")
    except ValueError:
        pass


@_check
def time_travel(spark: SparkSession, factory) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.commit(1, {"documents": _docs(spark, 5, 10)}, state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA, snapshot_id=0)) \
        == list(range(5))


@_check
def refs_pin_snapshots(spark: SparkSession, factory) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.set_ref("train-v1")
    cat.commit(1, {"documents": _docs(spark, 5, 10)}, state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA, "train-v1")) \
        == list(range(5))
    cat.expire_snapshots(keep_last=1)
    assert _ids(cat.read_table(spark, "documents", SCHEMA, "train-v1")) \
        == list(range(5))
    assert cat.drop_ref("train-v1")


@_check
def branch_write_audit_publish(spark: SparkSession, factory) -> None:
    """Branch commits are invisible on main until fast-forward."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.create_branch("audit")
    cat.commit_to_branch("audit", {"documents": _docs(spark, 5, 10)},
                         state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(5))
    assert _ids(cat.read_table(spark, "documents", SCHEMA, "audit")) \
        == list(range(10))
    cat.fast_forward_main("audit", drop_branch=True)
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(10))


@_check
def rollback_to_ancestor_only(spark: SparkSession, factory) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.commit(1, {"documents": _docs(spark, 5, 10)}, state={})
    cat.rollback_to(0)
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(5))
    try:
        cat.rollback_to(1)  # descendant, not ancestor
        raise AssertionError("rolling forward must fail")
    except ValueError:
        pass


@_check
def equality_delete_sequence_rule(spark: SparkSession, factory) -> None:
    """An eq delete kills only file-sets committed before it; a
    re-appended key is visible."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 10)}, state={})
    cat.delete_where(
        spark, "documents", spark.createDataFrame([(3,)], "doc_id bigint")
    )
    cat.commit(2, {"documents": _docs(spark, 3, 4)}, state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == sorted(
        [i for i in range(10) if i != 3] + [3]
    )


@_check
def positional_delete_addresses_rows(spark: SparkSession, factory) -> None:
    """A pos delete retracts exactly the addressed copy of a duplicate."""
    cat = factory()
    dup = spark.createDataFrame([(1, "x"), (1, "x")], SCHEMA)
    cat.commit(0, {"documents": dup}, state={})
    pos = cat.read_table(spark, "documents", SCHEMA, keep_pos=True)
    one = pos.orderBy("_row_pos").limit(1).select(
        F.col("_file_path").alias("file_path"),
        F.col("_row_pos").alias("pos"),
    )
    cat.delete_positions(spark, "documents", one)
    assert cat.read_table(spark, "documents", SCHEMA).count() == 1


@_check
def occ_appends_from_stale_base_merge(spark: SparkSession, factory) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    base = cat.head()
    a = cat.commit_optimistic({"documents": _docs(spark, 5, 10)},
                              state={"a": 1}, base_snapshot=base)
    b = cat.commit_optimistic({"documents": _docs(spark, 10, 15)},
                              state={"b": 2}, base_snapshot=base)
    assert cat.manifest(b)["parent"] == a
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(15))
    st = cat.manifest(b)["state"]
    assert st["a"] == 1 and st["b"] == 2


@_check
def occ_replace_conflict_raises(spark: SparkSession, factory) -> None:
    from who_focus_crawler_spark.checkpoint.snapshot import CommitConflict

    cat = factory()
    cat.commit(0, {"frontier": _docs(spark, 0, 5)}, state={})
    base = cat.head()
    cat.commit_optimistic({"frontier": _docs(spark, 5, 10)}, state={},
                          base_snapshot=base)
    try:
        cat.commit_optimistic({"frontier": _docs(spark, 10, 15)}, state={},
                              base_snapshot=base)
        raise AssertionError("stale replace must conflict")
    except CommitConflict:
        pass


@_check
def schema_evolution_field_ids(spark: SparkSession, factory) -> None:
    """Rename resolves old files through field ids; adds read as NULL
    from files predating them."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 5)}, state={})
    cat.evolve_schema("documents", rename={"text": "body"},
                      add=[("lang", "string")])
    got = cat.read_table_evolved(spark, "documents")
    assert got.columns == ["doc_id", "body", "lang"]
    assert got.filter(F.col("body").isNull()).count() == 0
    assert got.filter(F.col("lang").isNull()).count() == 5


@_check
def partition_spec_evolution_layouts_coexist(
    spark: SparkSession, factory
) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 50)}, state={})
    cat.set_partition_spec(
        "documents",
        [{"source": "doc_id", "transform": "bucket[4]", "name": "b"}],
    )
    cat.commit(2, {"documents": _docs(spark, 50, 100)}, state={})
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(100))
    so: dict = {}
    got = cat.scan_table_partitions(
        spark, "documents", SCHEMA, "doc_id", 77, stats_out=so
    )
    assert _ids(got) == [77]
    assert so["dirs_read"] == 1  # the bucketed file-set pruned to one dir


@_check
def positional_deletes_cross_partition_evolution(
    spark: SparkSession, factory
) -> None:
    """Round-5 interaction clause: positional deletes must address
    rows in files written under an OLDER partition spec after the
    spec evolves (file path + ordinal are spec-independent), deletes
    over BOTH layouts must coexist, compaction must fold the
    multi-spec file-sets and their delete files into one clean set
    with identical visible rows, and time travel to the pre-delete
    snapshot must still see everything."""
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 50)}, state={})
    cat.set_partition_spec(
        "documents",
        [{"source": "doc_id", "transform": "bucket[4]", "name": "b"}],
    )
    cat.commit(2, {"documents": _docs(spark, 50, 100)}, state={})
    pre_delete = cat.head()
    # one victim physically in an old-spec file, one in a bucketed one
    cat.delete_matching_positions(
        spark, "documents", SCHEMA, F.col("doc_id").isin(7, 63)
    )
    expect = [i for i in range(100) if i not in (7, 63)]
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == expect
    # the delete addressed exactly the two rows, not their whole files
    assert cat.read_table(spark, "documents", SCHEMA).count() == 98
    # time travel: the pre-delete snapshot is untouched
    assert _ids(
        cat.read_table(spark, "documents", SCHEMA, snapshot_id=pre_delete)
    ) == list(range(100))
    # compaction folds both layouts + the positional delete file
    res = cat.compact_table(spark, "documents", SCHEMA, num_files=2)
    assert res.get("compacted", False)
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == expect
    # and the fold is physical: no live delete files remain at head
    assert not cat.manifest(cat.head()).get("deletes", {}).get("documents")


@_check
def expiry_preserves_reachable_reads(spark: SparkSession, factory) -> None:
    cat = factory()
    for i in range(5):
        cat.commit(i, {"documents": _docs(spark, i * 10, i * 10 + 10)},
                   state={})
    cat.expire_snapshots(keep_last=2)
    assert _ids(cat.read_table(spark, "documents", SCHEMA)) == list(range(50))


@_check
def state_round_trip(spark: SparkSession, factory) -> None:
    cat = factory()
    cat.commit(0, {"documents": _docs(spark, 0, 3)},
               state={"batch": 7, "seed": "s0"})
    assert cat.state() == {"batch": 7, "seed": "s0"}


def run_all(spark: SparkSession, factory) -> dict[str, str]:
    """Run every check against ``factory``; returns {check: 'ok'|error}.
    For pytest, parametrize over CHECKS instead (one test per clause)."""
    out: dict[str, str] = {}
    for name, check in CHECKS.items():
        try:
            check(spark, factory)
            out[name] = "ok"
        except Exception as e:  # noqa: BLE001 — conformance report
            out[name] = f"{type(e).__name__}: {e}"
    return out
