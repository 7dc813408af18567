"""Optimistic-concurrency commits (checkpoint/snapshot.py::commit_optimistic).

Iceberg's commit model: writers do expensive work (data-file writes)
optimistically with no lock held, then publish via a metadata
compare-and-swap — append-append commits merge by retrying against the
new head (fast-append), while a replace-table changed by a concurrent
commit fails serializable validation (CommitConflict). These tests pin
that model on the shim: stale-base append merging, replace conflicts,
delete-after-base conflicts, genuinely concurrent threaded writers
producing a linear snapshot chain, and crash recovery mid-publish.
"""

from __future__ import annotations

import threading

import pytest

from who_focus_crawler_spark.checkpoint.snapshot import (
    CommitConflict,
    SnapshotCatalog,
)

SCHEMA = "k long, v string"


def _cat(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    cat.commit(
        0,
        {
            "t": spark.createDataFrame([(1, "a")], SCHEMA),
            "url_seen": spark.createDataFrame([(100, "u")], SCHEMA),
        },
        state={"n": 0},
    )
    return cat


def _rows(spark, cat, name, snap=None):
    df = cat.read_table(spark, name, SCHEMA, snapshot_id=snap)
    return sorted((r.k, r.v) for r in df.collect())


def _chain(cat):
    """Snapshot ids from HEAD back to the root via parent pointers."""
    ids, sid = [], cat.head()
    while sid is not None:
        ids.append(sid)
        sid = cat.manifest(sid).get("parent")
    return ids


def test_append_append_merges_on_stale_base(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    base = cat.head()
    # writer A publishes first
    sid_a = cat.commit_optimistic(
        {"url_seen": spark.createDataFrame([(101, "a")], SCHEMA)},
        state={"w": "a"},
        base_snapshot=base,
    )
    # writer B computed from the SAME base — appends must merge, not
    # clobber: B's manifest carries A's file list plus B's delta
    sid_b = cat.commit_optimistic(
        {"url_seen": spark.createDataFrame([(102, "b")], SCHEMA)},
        state={"w": "b"},
        base_snapshot=base,
    )
    assert cat.head() == sid_b
    assert cat.manifest(sid_b)["parent"] == sid_a
    assert _rows(spark, cat, "url_seen") == [
        (100, "u"), (101, "a"), (102, "b"),
    ]
    # untouched table carried forward through both commits
    assert _rows(spark, cat, "t") == [(1, "a")]


def test_replace_replace_same_table_conflicts(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    base = cat.head()
    cat.commit_optimistic(
        {"t": spark.createDataFrame([(2, "A")], SCHEMA)},
        state={"w": "a"},
        base_snapshot=base,
    )
    with pytest.raises(CommitConflict, match="replace-table 't'"):
        cat.commit_optimistic(
            {"t": spark.createDataFrame([(3, "B")], SCHEMA)},
            state={"w": "b"},
            base_snapshot=base,
        )
    # the losing writer published nothing
    assert _rows(spark, cat, "t") == [(2, "A")]


def test_replace_different_tables_merge(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.commit(
        1,
        {
            "t": None,
            "t2": spark.createDataFrame([(9, "z")], SCHEMA),
            "url_seen": None,
        },
        state={"n": 1},
    )
    base = cat.head()
    cat.commit_optimistic(
        {"t": spark.createDataFrame([(2, "A")], SCHEMA)},
        state={"w": "a"},
        base_snapshot=base,
    )
    # B replaces a DIFFERENT table from the same base: no conflict, and
    # head shows both writers' results
    cat.commit_optimistic(
        {"t2": spark.createDataFrame([(10, "B")], SCHEMA)},
        state={"w": "b"},
        base_snapshot=base,
    )
    assert _rows(spark, cat, "t") == [(2, "A")]
    assert _rows(spark, cat, "t2") == [(10, "B")]


def test_delete_after_base_conflicts_with_append(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    base = cat.head()
    # concurrent writer retracts rows of url_seen (equality delete)
    cat.delete_where(spark, "url_seen", spark.createDataFrame([(100,)], "k long"))
    with pytest.raises(CommitConflict, match="deletes on 'url_seen'"):
        cat.commit_optimistic(
            {"url_seen": spark.createDataFrame([(101, "a")], SCHEMA)},
            state={"w": "b"},
            base_snapshot=base,
        )


def test_threaded_writers_linear_chain(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    n, errs = 8, []

    def work(i: int) -> None:
        try:
            cat.commit_optimistic(
                {"url_seen": spark.createDataFrame([(200 + i, f"w{i}")], SCHEMA)},
                state={"w": i},
                max_retries=2 * n,
            )
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    # every append survived the race
    assert _rows(spark, cat, "url_seen") == [(100, "u")] + [
        (200 + i, f"w{i}") for i in range(n)
    ]
    # snapshot history is a single linear chain: n OCC commits + root
    chain = _chain(cat)
    assert len(chain) == n + 1 and chain[-1] == 0
    # sequence numbers (file-path sids) parse for OCC-written file-sets
    files = cat.manifest(cat.head())["tables"]["url_seen"]
    assert len(files) == n + 1
    assert all(SnapshotCatalog._file_sid(p) >= 0 for p in files)


def test_crash_between_rename_and_publish_recovers(spark, tmp_path):
    cat = _cat(spark, tmp_path)

    class _Boom(RuntimeError):
        pass

    orig = cat._publish
    cat._publish = lambda m: (_ for _ in ()).throw(_Boom())
    with pytest.raises(_Boom):
        cat.commit_optimistic(
            {"url_seen": spark.createDataFrame([(101, "a")], SCHEMA)},
            state={"w": "a"},
        )
    cat._publish = orig
    # reader: nothing torn — HEAD and table contents unchanged
    assert cat.head() == 0
    assert _rows(spark, cat, "url_seen") == [(100, "u")]
    # the re-driven writer completes; the orphaned data dir from the
    # crashed attempt is skipped, not reused
    sid = cat.commit_optimistic(
        {"url_seen": spark.createDataFrame([(101, "a")], SCHEMA)},
        state={"w": "a"},
    )
    assert cat.head() == sid
    assert _rows(spark, cat, "url_seen") == [(100, "u"), (101, "a")]
    # maintenance reclaims the orphan without touching live files
    cat.expire_snapshots(keep_last=10)
    assert _rows(spark, cat, "url_seen") == [(100, "u"), (101, "a")]


def test_occ_state_keys_merge_over_head(spark, tmp_path):
    """ADVICE r3: concurrent writers each carry only their own state
    keys; a retried commit must merge per key over the head's state, not
    replace the dict wholesale (which silently discards keys a first
    writer published after our base)."""
    cat = _cat(spark, tmp_path)
    base = cat.head()
    cat.commit_optimistic(
        {"url_seen": spark.createDataFrame([(101, "a")], SCHEMA)},
        state={"from_a": 1},
        base_snapshot=base,
    )
    cat.commit_optimistic(
        {"url_seen": spark.createDataFrame([(102, "b")], SCHEMA)},
        state={"from_b": 2},
        base_snapshot=base,  # stale: retries against A's head
    )
    st = cat.state()
    assert st["from_a"] == 1  # NOT lost to B's wholesale replace
    assert st["from_b"] == 2
    assert st["n"] == 0  # root commit's key carried through both


def test_occ_conflict_cleans_staged_dirs(spark, tmp_path):
    """ADVICE r3: a conflicted writer must not leak its occ-<token>
    staging dirs — the data is recomputed against the new head anyway."""
    cat = _cat(spark, tmp_path)
    base = cat.head()
    cat.commit_optimistic(
        {"t": spark.createDataFrame([(5, "x")], SCHEMA)},
        state={},
        base_snapshot=base,
    )
    with pytest.raises(CommitConflict):
        cat.commit_optimistic(
            {"t": spark.createDataFrame([(6, "y")], SCHEMA)},
            state={},
            base_snapshot=base,  # replace-replace: serializable conflict
        )
    leftovers = list((cat.root / "data").rglob("occ-*"))
    assert leftovers == []


def test_orphan_cleanup_spares_inflight_occ_staging(spark, tmp_path):
    """ADVICE r3 (medium): remove_orphan_files must treat unparsable
    occ-* names as potentially in-flight — delete only past the mtime
    grace window, never unconditionally (a writer between staging and
    its lock-held rename would crash on os.rename otherwise)."""
    import os

    cat = _cat(spark, tmp_path)
    staging = cat.root / "data" / "t" / "occ-deadbeef0123"
    staging.mkdir(parents=True)
    (staging / "part-0.parquet").write_bytes(b"xx")

    out = cat.remove_orphan_files()  # default 3-day grace
    assert staging.exists()
    assert out["kept_inflight"] >= 1

    # age the dir past the grace window -> now genuinely orphaned debris
    old = 1_000_000_000.0
    os.utime(staging, (old, old))
    out2 = cat.remove_orphan_files()
    assert not staging.exists()
    assert str(staging) in out2["paths"]
