"""Multi-PROCESS optimistic-concurrency race on the snapshot catalog.

Threads share the driver JVM and (on Linux) flock's open-file-
description semantics can mask real contention, so this test races
REAL subprocesses — separate Python interpreters, separate JVMs,
separate file descriptors — all committing appends against the SAME
stale base snapshot through `commit_optimistic`'s CAS loop. Exactly
one writer can win each CAS; every other writer must revalidate
against the moved head and merge (append-append never conflicts).

Asserts: every writer reports success; the final table is the base
plus ALL writers' disjoint deltas (no lost update); the manifests form
one linear parent chain; per-writer state keys are all present
(last-writer-wins per KEY, not per dict); no occ-* staging debris
leaks."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

WORKER = r"""
import sys
root, wid, backend = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
from who_focus_crawler_spark.session import get_spark
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

spark = get_spark(
    app_name=f"occ-worker-{{wid}}",
    master="local[1]",
    shuffle_partitions=2,
    extra_conf={{"spark.driver.memory": "1g"}},
)
cat = SnapshotCatalog(root, cas=backend)
df = spark.range(100 + wid * 10, 110 + wid * 10).selectExpr(
    "id AS doc_id", "CAST(id * 2 AS STRING) AS text"
)
# every writer claims base snapshot 0 — all but the first CAS winner
# land on a moved head and must take the revalidate+retry path
sid = cat.commit_optimistic(
    {{"documents": df}}, state={{f"w{{wid}}": wid}}, base_snapshot=0
)
print(f"WORKER_OK {{wid}} {{sid}}", flush=True)
spark.stop()
"""


import pytest


@pytest.mark.parametrize("backend", ["flock", "sqlite"])
def test_multiprocess_occ_writers_all_merge(spark, tmp_path, backend):
    repo = str(Path(__file__).resolve().parents[2])
    root = tmp_path / "cat"
    cat_root = str(root)

    from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

    cat = SnapshotCatalog(cat_root, cas=backend)
    base = spark.range(0, 50).selectExpr(
        "id AS doc_id", "CAST(id * 2 AS STRING) AS text"
    )
    cat.commit(0, {"documents": base}, state={"base": True})

    script = WORKER.format(repo=repo)
    n_workers = 3
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, cat_root, str(w), backend],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_workers)
    ]
    results = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "WORKER_OK" in out

    head = cat.head()
    # base + one commit per worker
    assert head is not None and head >= n_workers

    # no lost update: all 50 base rows + 10 per worker survive
    got = cat.read_table(spark, "documents", "doc_id bigint, text string")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    expect = list(range(50)) + [
        100 + w * 10 + i for w in range(n_workers) for i in range(10)
    ]
    assert ids == sorted(expect)

    # linear history: exactly one chain from head back to snapshot 0
    chain = []
    cur = head
    while cur is not None:
        chain.append(cur)
        cur = cat.manifest(cur).get("parent")
    assert chain[-1] == 0 and len(chain) == n_workers + 1
    assert len(set(chain)) == len(chain)

    # per-key state merge: every writer's key present at head
    state = cat.manifest(head)["state"]
    for w in range(n_workers):
        assert state.get(f"w{w}") == w
    assert state.get("base") is True

    # winners renamed their staging away; losers cleaned up after
    # CommitConflict — nothing named occ-* survives a successful run
    debris = list((root / "data" / "documents").glob("occ-*"))
    assert debris == []

    # every file-set in the head manifest exists on disk
    for f in cat.manifest(head)["tables"]["documents"]:
        assert Path(f).exists()


@pytest.mark.parametrize("backend", ["flock", "sqlite", "lockfile"])
def test_cas_serializes_concurrent_processes(tmp_path, backend):
    """The CAS primitive itself, raced without Spark and across ALL
    THREE working backends: N processes all try to publish against the
    same expected head; exactly one try_publish can win per head
    value, so sequential head values emerge with no skips and no
    double-publish — the same invariant whether mutual exclusion is
    flock, a SQLite write transaction, or an O_EXCL sentinel."""
    root = tmp_path / "bare"
    root.mkdir()
    script = f"""
import os, sys
sys.path.insert(0, {str(Path(__file__).resolve().parents[2])!r})
from pathlib import Path
from who_focus_crawler_spark.checkpoint.cas import make_cas

root = Path({str(root)!r})
head_path = root / "HEAD"

def head():
    try:
        return int(head_path.read_text())
    except FileNotFoundError:
        return None

def publish(v):  # same atomic-replace discipline as the catalog
    tmp = head_path.with_suffix(f".tmp{{os.getpid()}}")
    tmp.write_text(str(v))
    os.replace(tmp, head_path)

cas = make_cas({backend!r}, root, head)
wins = 0
for _ in range(200):
    h = head()
    nxt = 0 if h is None else h + 1
    def attempt():
        # re-check INSIDE the lock: isolation must hold
        cur = head()
        assert cur == h, f"lost isolation: {{cur}} != {{h}}"
        publish(nxt)
    if cas.try_publish(h, attempt):
        wins += 1
print("CASWINS", wins, flush=True)
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(4)
    ]
    outs = [p.communicate(timeout=120) for p in procs]
    total = 0
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        total += int(out.split("CASWINS")[1].strip())
    # no double-publish: the head counted exactly the total wins
    assert int((root / "HEAD").read_text()) == total - 1
