"""C14/C15 — atomic snapshot commits + resume (Iceberg-semantics shim).

No Iceberg runtime jars can be fetched in this sandbox (SURVEY.md probe
P5), so this module implements the Iceberg *semantics* the contract needs
— immutable data files, a manifest listing exactly the files of each table
at each snapshot, snapshot-id-addressed reads, and an atomically-swapped
HEAD pointer — over plain Parquet. The interface is catalog-shaped: on a
networked cluster, `SnapshotCatalog` is replaced by a real Iceberg catalog
(`writeTo(...).append()` / MERGE / `VERSION AS OF`) without touching
engine code.

Commit protocol (SURVEY.md §7 hard-part #3): write data files → fsync a
JSON manifest for snapshot s → atomically `os.replace` the HEAD pointer.
A crash before the HEAD swap leaves the previous snapshot intact;
`resume()` reads HEAD and continues — determinism of the scheduler (C9)
guarantees the continuation equals an uninterrupted run.

Tables are either REPLACE (manifest points only at this snapshot's files:
frontier, robots_cache, host_state, seen_filters) or APPEND (manifest
carries the previous file list plus this snapshot's delta: crawl_order,
documents, metrics, url_seen) — appends never rewrite history, which is
what makes per-batch commits O(delta) instead of O(corpus).

Schema evolution is Iceberg's field-id scheme on the shim: every commit
records each table's current schema (stable integer field ids) and the
field-id → physical-column-name mapping of the files it wrote;
`evolve_schema` (add / drop / rename / widen) is a metadata-only commit
and `read_table_evolved` resolves every historical file through its own
mapping — no data file is ever rewritten for a schema change.

Row-level deletes are Iceberg v2 merge-on-read EQUALITY deletes:
`delete_where` writes a small parquet file of key tuples and publishes a
metadata commit — no data file is rewritten. Each delete file carries the
snapshot id it was committed at, and `read_table` anti-joins a data
file-set only against deletes COMMITTED AFTER that file-set was written
(Iceberg's sequence-number rule), so a key re-appended after its delete
is visible while the pre-delete row stays dead. `compact_table` folds
live deletes into the rewrite and clears them; `expire_snapshots` keeps
delete files any retained manifest references. Position deletes are not
modeled (the shim has no stable row ordinal); equality deletes are the
shape a crawl/corpus pipeline needs (retract by doc_id / canon_url).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stat_json(v):
    """Manifest-storable stat value: numbers/strings/bools pass through,
    date/datetime become ISO strings (lexicographic == chronological for
    the fixed format), anything else becomes None = "cannot skip"."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return None

APPEND_TABLES = {
    "crawl_order",
    "documents",
    "metrics",
    "url_seen",
    # streaming ingestion (streaming/pipeline.py::stream_frontier_to_catalog):
    # one appended delta per micro-batch epoch
    "frontier_ingest",
    # streaming near-dup maintenance (stream_neardup_to_catalog): the
    # signature index grows by one delta per epoch; pairs are a log
    "minhash_index",
    "neardup_pairs",
    # Mercator content-seen test (plans/crawl.py, WebConfig.content_dedup):
    # one delta of newly-seen content hashes per batch
    "content_seen",
}


class CommitConflict(Exception):
    """Raised when optimistic-concurrency validation fails: a concurrent
    commit changed state this writer's data was computed FROM (replaced
    the same replace-table, or committed equality deletes on an append
    table after the writer's base snapshot). The writer must recompute
    from the new head — retrying the same metadata would publish a
    result derived from stale reads (Iceberg serializable isolation)."""


class SnapshotCatalog:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ pointers
    @property
    def _head_path(self) -> Path:
        return self.root / "HEAD"

    def head(self) -> int | None:
        try:
            return int(self._head_path.read_text().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, snapshot_id: int) -> Path:
        return self.root / f"manifest-{snapshot_id:06d}.json"

    def manifest(self, snapshot_id: int) -> dict:
        return json.loads(self._manifest_path(snapshot_id).read_text())

    # -------------------------------------------------------------- commit
    def commit(
        self,
        snapshot_id: int,
        tables: dict[str, DataFrame],
        state: dict,
        num_files: int = 1,
        stats_cols: dict[str, list[str]] | None = None,
        branch: str | None = None,
    ) -> None:
        """Write each table's delta/replacement, then atomically publish.

        Carry-forward reads the CURRENT HEAD manifest, not
        ``snapshot_id - 1``: in the plain crawl loop they are the same,
        but after between-run maintenance (compact_table publishes at
        head+1; expire_snapshots may then delete older manifests) HEAD
        is the only manifest guaranteed to exist — and it already points
        at the compacted file lists, so a resumed crawl builds on the
        rewrite instead of the superseded per-batch files.

        ``branch``: commit on a named branch instead of main — the base
        is the branch tip, the branch ref advances, and HEAD does NOT
        move (main readers see nothing until `fast_forward_main`).
        Prefer :meth:`commit_to_branch`, which also allocates a
        collision-free snapshot id.
        """
        if self._manifest_path(snapshot_id).exists():
            # a manifest may exist here ONLY as the orphan of a crash
            # between manifest write and HEAD swap — rewriting that is
            # exactly the recovery path. A reachable snapshot (HEAD or
            # any ref/branch) is immutable.
            h = self.head()
            published = (h is not None and snapshot_id <= h) or (
                snapshot_id in set(self.refs().values())
            )
            if published:
                raise ValueError(
                    f"commit: snapshot {snapshot_id} is published — ids are "
                    "immutable; allocate with _next_sid()/commit_to_branch()"
                )
        if branch is not None:
            head = self.ref(branch)
            if head is None:
                raise ValueError(
                    f"commit: unknown branch {branch!r} — create_branch first"
                )
        else:
            head = self.head()
        if head is not None:
            prev = self.manifest(head)
        else:
            prev = self.manifest(snapshot_id - 1) if snapshot_id > 0 else None
        def write(name: str, df: DataFrame) -> tuple[str, str]:
            path = self.root / "data" / name / f"snap-{snapshot_id:06d}"
            df.coalesce(num_files).write.mode("overwrite").parquet(str(path))
            return name, str(path)

        # write table files concurrently — Spark supports multi-threaded
        # job submission from the driver; per-batch tables are small, so
        # wall time is max(job) not sum(job) (batch overhead dominates the
        # crawl loop at fixture scale)
        from concurrent.futures import ThreadPoolExecutor

        to_write = {n: df for n, df in tables.items() if df is not None}
        with ThreadPoolExecutor(max_workers=max(len(to_write), 1)) as ex:
            written = dict(
                ex.map(lambda kv: write(*kv), to_write.items())
            )
        new_stats = self._file_stats(tables, written, stats_cols or {})
        manifest = self._assemble_manifest(
            snapshot_id, head, prev, tables, written, state, new_stats
        )
        if branch is not None:
            # manifest becomes durable first, then the branch ref swings —
            # same crash discipline as the HEAD publish, main untouched
            self._write_manifest(manifest)
            self.set_ref(branch, snapshot_id)
        else:
            self._publish(manifest)

    def _file_stats(
        self,
        tables: dict[str, DataFrame],
        written: dict[str, str],
        stats_cols: dict[str, list[str]],
    ) -> dict:
        """Manifest column stats (Iceberg file-skipping): min/max per NEW
        file-set for the requested columns, computed with one tiny agg
        over the just-written parquet. Pure function of the written files
        — commit_optimistic computes it once outside its retry loop."""
        out: dict = {}
        for name, cols in stats_cols.items():
            if name not in written:
                continue
            row = list(tables[name].sparkSession.read.parquet(
                written[name]
            ).agg(
                *[f(c).alias(f"{tag}_{c}")
                  for c in cols
                  for tag, f in (("min", F.min), ("max", F.max))]
            ).collect())[0]
            out[name] = {
                written[name]: {
                    c: [
                        _stat_json(row[f"min_{c}"]),
                        _stat_json(row[f"max_{c}"]),
                    ]
                    for c in cols
                }
            }
        return out

    def _assemble_manifest(
        self,
        snapshot_id: int,
        head: int | None,
        prev: dict | None,
        tables: dict[str, DataFrame | None],
        written: dict[str, str],
        state: dict,
        new_stats: dict,
    ) -> dict:
        """Build the manifest dict for ``snapshot_id`` on base ``prev``.
        Metadata-only (the one Spark action — stats — happens in
        `_file_stats` beforehand), so commit_optimistic can re-run it
        against a moved head inside its CAS critical section."""
        entry: dict[str, list[str]] = {}
        schemas: dict = (
            json.loads(json.dumps(prev.get("schemas", {}))) if prev else {}
        )
        for name, df in tables.items():
            if df is None:  # unchanged append-table: carry file list forward
                entry[name] = list(prev["tables"][name]) if prev else []
                continue
            files = [written[name]]
            if name in APPEND_TABLES and prev and name in prev["tables"]:
                files = list(prev["tables"][name]) + files
            entry[name] = files
            # track the table's schema (field ids + per-file physical
            # names) so later evolution commits can rename/add/drop
            # without rewriting these files
            sch = schemas.get(name)
            if sch is None:
                sch = {"current": self._fields_of(df), "file_physical": {}}
                schemas[name] = sch
            else:
                known = {f["name"]: f for f in sch["current"]}
                next_id = 1 + max((f["id"] for f in sch["current"]), default=0)
                for f in df.schema.fields:  # auto-register brand-new columns
                    if f.name not in known:
                        sch["current"].append(
                            {
                                "id": next_id,
                                "name": f.name,
                                "type": f.dataType.simpleString(),
                            }
                        )
                        next_id += 1
            by_name = {f["name"]: f["id"] for f in sch["current"]}
            sch["file_physical"][written[name]] = {
                str(by_name[f.name]): f.name
                for f in df.schema.fields
                if f.name in by_name
            }
            # replace-tables drop superseded files — prune their mappings
            live = set(entry[name])
            sch["file_physical"] = {
                p: m for p, m in sch["file_physical"].items() if p in live
            }
        # tables the committer does not mention at all carry forward
        # untouched (an Iceberg catalog never drops a table because one
        # writer's commit didn't touch it) — essential for OCC merging,
        # where concurrent writers each know only their own tables
        for name, files in ((prev or {}).get("tables") or {}).items():
            if name not in tables:
                entry[name] = list(files)
        # merge the precomputed new-file stats over the carried-forward
        # ones; prior file-sets keep their stats
        stats: dict = (
            json.loads(json.dumps(prev.get("stats", {}))) if prev else {}
        )
        for name, fstats in new_stats.items():
            stats.setdefault(name, {}).update(fstats)
        # drop stats for file-sets no longer live (replace tables)
        for name in list(stats):
            live = set(entry.get(name, []))
            stats[name] = {
                p: s for p, s in stats[name].items() if p in live
            }
        return {
            "snapshot_id": snapshot_id,
            "committed_at": time.time(),
            "tables": entry,
            "state": state,
            "schemas": schemas,
            "deletes": dict(prev.get("deletes", {})) if prev else {},
            "stats": stats,
            "parent": head,
        }

    def _write_manifest(self, manifest: dict) -> None:
        mp = self._manifest_path(manifest["snapshot_id"])
        tmp = mp.with_suffix(".tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mp)

    def _swap_head(self, snapshot_id: int) -> None:
        htmp = self._head_path.with_suffix(".tmp")
        with open(htmp, "w") as f:
            f.write(str(snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(htmp, self._head_path)

    def _publish(self, manifest: dict) -> None:
        """Durably write a manifest, then atomically swap HEAD to it —
        the shared publish point for commit() and compact_table()."""
        self._write_manifest(manifest)
        # atomic HEAD swap — the publish point
        self._swap_head(manifest["snapshot_id"])

    # ------------------------------------------- optimistic concurrency
    def commit_optimistic(
        self,
        tables: dict[str, DataFrame],
        state: dict,
        base_snapshot: int | None = None,
        num_files: int = 1,
        stats_cols: dict[str, list[str]] | None = None,
        max_retries: int = 10,
    ) -> int:
        """Iceberg-style optimistic-concurrency commit against main.

        Multiple writers may call this concurrently (threads or
        processes sharing the catalog root). Data files are written
        ONCE to a commit-unique staging path; publication is then a
        metadata compare-and-swap loop: assemble the manifest against
        the current head and, under the catalog commit lock, publish
        only if head has not moved — otherwise revalidate against the
        new head and reassemble (metadata-only; no data is rewritten)
        and try again. This is exactly Iceberg's commit model: expensive
        work happens optimistically outside the lock, the critical
        section is a cheap pointer swap.

        Validation (the shape of Iceberg's serializable-isolation
        checks) against commits that landed after ``base_snapshot`` —
        the head this writer READ when computing ``tables`` (defaults
        to the head at call time, correct when the caller computes and
        commits back-to-back):

        - APPEND tables always merge: our delta appends to whatever
          file list the latest head carries (Iceberg fast-append).
        - REPLACE tables conflict if a concurrent commit changed the
          same table's file list — our replacement was computed from a
          state that no longer holds → :class:`CommitConflict`.
        - New equality deletes on a table we append to also conflict
          (our rows were derived without seeing those retractions).

        Returns the published snapshot id. The staged data directory is
        renamed to its final ``snap-{sid:06d}`` name inside the lock so
        the `_file_sid` sequence-number invariant (delete scoping,
        time-ordered maintenance) holds for OCC commits too.

        Mixing concurrent `commit()` (caller-chosen ids, no lock) with
        `commit_optimistic` writers is unsupported — like Iceberg, every
        concurrent writer must go through the CAS path. Maintenance
        (`expire_snapshots`) must not run while writers are in flight
        (same caveat as Iceberg's orphan-file cleanup).
        """
        import fcntl
        import uuid

        if base_snapshot is None:
            base_snapshot = self.head()
        token = uuid.uuid4().hex[:12]
        from concurrent.futures import ThreadPoolExecutor

        to_write = {n: df for n, df in tables.items() if df is not None}

        def write(name: str, df: DataFrame) -> tuple[str, str]:
            path = self.root / "data" / name / f"occ-{token}"
            df.coalesce(num_files).write.mode("overwrite").parquet(str(path))
            return name, str(path)

        with ThreadPoolExecutor(max_workers=max(len(to_write), 1)) as ex:
            staged = dict(ex.map(lambda kv: write(*kv), to_write.items()))
        new_stats = self._file_stats(tables, staged, stats_cols or {})
        replace_names = {n for n in to_write if n not in APPEND_TABLES}
        append_names = {n for n in to_write if n in APPEND_TABLES}

        lock_path = self.root / "commit.lock"
        base_m = (
            self.manifest(base_snapshot) if base_snapshot is not None else None
        )
        try:
            for _ in range(max_retries + 1):
                head = self.head()
                prev = self.manifest(head) if head is not None else None
                if head != base_snapshot:
                    # someone published since we read — serializable checks
                    for name in replace_names:
                        b = ((base_m or {}).get("tables") or {}).get(name)
                        c = ((prev or {}).get("tables") or {}).get(name)
                        if b != c:
                            raise CommitConflict(
                                f"replace-table {name!r} changed by a "
                                f"concurrent commit (base {base_snapshot} → "
                                f"head {head})"
                            )
                    bdel = (base_m or {}).get("deletes") or {}
                    cdel = (prev or {}).get("deletes") or {}
                    for name in append_names:
                        if cdel.get(name, []) != bdel.get(name, []):
                            raise CommitConflict(
                                f"equality deletes on {name!r} committed "
                                f"after base {base_snapshot} conflict with "
                                f"this append"
                            )
                with open(lock_path, "w") as lf:
                    fcntl.flock(lf, fcntl.LOCK_EX)
                    try:
                        if self.head() != head:
                            continue  # lost the race while assembling; retry
                        sid = self._next_sid()
                        # final data-dir names: skip ids whose dir already
                        # exists (a plain-commit writer may have staged one)
                        while any(
                            (
                                self.root / "data" / n / f"snap-{sid:06d}"
                            ).exists()
                            for n in staged
                        ):
                            sid += 1
                        written: dict[str, str] = {}
                        for n, p in staged.items():
                            final = self.root / "data" / n / f"snap-{sid:06d}"
                            os.rename(p, final)
                            written[n] = str(final)
                        stats = {
                            n: {written[n]: next(iter(fs.values()))}
                            for n, fs in new_stats.items()
                        }
                        # merge this writer's state keys over the head's:
                        # concurrent writers each carry only their own keys,
                        # and a retried commit must not wipe state another
                        # writer published after our base (last-writer-wins
                        # PER KEY, not per dict)
                        merged_state = dict((prev or {}).get("state") or {})
                        merged_state.update(state)
                        manifest = self._assemble_manifest(
                            sid, head, prev, tables, written, merged_state,
                            stats,
                        )
                        self._publish(manifest)
                        staged = {}  # renamed away — nothing to clean up
                        return sid
                    finally:
                        fcntl.flock(lf, fcntl.LOCK_UN)
            raise CommitConflict(
                f"commit_optimistic: head kept moving; gave up after "
                f"{max_retries} retries"
            )
        finally:
            # conflicted/aborted writers must not leak staged data: the
            # occ-<token> dirs are useless after a CommitConflict (the
            # data would be recomputed against the new head anyway)
            if staged:
                import shutil

                for p in staged.values():
                    shutil.rmtree(p, ignore_errors=True)

    # ---------------------------------------------------------------- read
    def read_table(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        snapshot_id: int | str | None = None,
    ) -> DataFrame | None:
        sid = self._resolve(snapshot_id)
        if sid is None:
            return None
        manifest = self.manifest(sid)
        files = manifest["tables"].get(name, [])
        if not files:
            return None
        deletes = manifest.get("deletes", {}).get(name, [])
        if not deletes:
            return spark.read.schema(schema).parquet(*files)
        return self._read_with_deletes(spark, schema, files, deletes)

    # ------------------------------------------------------ row-level deletes
    @staticmethod
    def _file_sid(path: str) -> int:
        """Snapshot id a data file-set was committed at, from its path
        (…/snap-000012 or …/compact-000012) — the shim's sequence number."""
        return int(str(path).rsplit("-", 1)[1])

    def _read_with_deletes(
        self,
        spark: SparkSession,
        schema: T.StructType,
        files: list[str],
        deletes: list[dict],
    ) -> DataFrame:
        """Merge-on-read: group data file-sets by WHICH delete files apply
        (only deletes committed after the file-set — Iceberg sequence
        numbers), anti-join each group against its applicable keys, union.

        In practice there are few groups (often just "all deletes apply"
        for old files and "none" for newer ones), so this stays at one or
        two scans. Delete sets are tiny next to data, so the key side
        broadcasts; NULL key values match NULL (eqNullSafe), per the
        Iceberg equality-delete spec.
        """
        from functools import reduce

        from pyspark.sql import functions as F

        groups: dict[tuple, list[str]] = {}
        for p in files:
            dsid = self._file_sid(p)
            appl = tuple(
                sorted(d["path"] for d in deletes if d["sid"] > dsid)
            )
            groups.setdefault(appl, []).append(p)
        key_cols = deletes[0]["keys"]
        parts = []
        for appl, paths in sorted(groups.items()):
            df = spark.read.schema(schema).parquet(*paths)
            if appl:
                kdf = spark.read.parquet(*appl).select(*key_cols).distinct()
                cond = reduce(
                    lambda a, b: a & b,
                    [df[k].eqNullSafe(kdf[k]) for k in key_cols],
                )
                df = df.join(F.broadcast(kdf), cond, "left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def delete_where(
        self,
        spark: SparkSession,
        name: str,
        keys_df: DataFrame,
    ) -> dict:
        """Equality delete (Iceberg v2, merge-on-read): publish a snapshot
        in which rows of append table ``name`` whose key columns match a
        row of ``keys_df`` are dead — WITHOUT rewriting any data file.

        ``keys_df``'s columns ARE the equality key. The keys are written
        as one small parquet file-set; readers apply it per
        `_read_with_deletes`. All delete files of one table must share
        the same key columns (enforced). Replace-tables are refused —
        they are rewritten wholesale every commit, so a delete there is
        just a filter on the next write.
        """
        if name not in APPEND_TABLES:
            raise ValueError(
                f"delete_where: {name!r} is a replace table — filter its "
                "next commit instead of issuing a delete"
            )
        head = self.head()
        if head is None:
            raise ValueError("delete_where: no snapshot to delete from")
        manifest = self.manifest(head)
        key_cols = list(keys_df.columns)
        existing = manifest.get("deletes", {}).get(name, [])
        if existing and existing[0]["keys"] != key_cols:
            raise ValueError(
                f"delete_where: table {name!r} already has deletes keyed "
                f"by {existing[0]['keys']} — got {key_cols}"
            )
        new_sid = head + 1
        path = self.root / "data" / name / f"delete-{new_sid:06d}"
        keys_df.distinct().coalesce(1).write.mode("overwrite").parquet(
            str(path)
        )
        deletes = {
            t: list(ds) for t, ds in manifest.get("deletes", {}).items()
        }
        deletes.setdefault(name, []).append(
            {"path": str(path), "sid": new_sid, "keys": key_cols}
        )
        self._publish(
            {
                "snapshot_id": new_sid,
                "committed_at": time.time(),
                "tables": {
                    n: list(fs) for n, fs in manifest["tables"].items()
                },
                "state": manifest["state"],
                "schemas": manifest.get("schemas", {}),
                "deletes": deletes,
                # deletes only remove rows: recorded min/max remain valid
                # conservative bounds, so stats carry forward unchanged
                "stats": manifest.get("stats", {}),
                "parent": head,
            }
        )
        return {"snapshot_id": new_sid, "delete_file": str(path)}

    def delete_matching(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        condition,
        key_cols: list[str],
    ) -> dict:
        """Predicate delete: one scan of the table's CURRENT live rows
        finds the keys matching ``condition``; they become an equality
        delete. No-op (no commit) when nothing matches."""
        live = self.read_table(spark, name, schema)
        if live is None:
            return {"deleted": 0}
        keys = live.filter(condition).select(*key_cols).distinct()
        n = keys.count()
        if n == 0:
            return {"deleted": 0}
        res = self.delete_where(spark, name, keys)
        res["deleted"] = n
        return res

    # ------------------------------------------------- stats file skipping
    def scan_table(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | str | None = None,
        stats_out: dict | None = None,
    ) -> DataFrame | None:
        """Range scan with MANIFEST-level file skipping (Iceberg file
        skipping): file-sets whose recorded [min, max] for ``col``
        (``commit(stats_cols=…)``) cannot intersect [lo, hi] are never
        opened — the planner sees only surviving paths, so at corpus
        scale a time/key-ranged read touches O(matching deltas) files
        instead of every delta ever appended. The exact predicate is
        re-applied to the surviving rows (stats only prune, rows decide).

        Bounds are inclusive; None = unbounded on that side. File-sets
        with no recorded stats (pre-stats commits, compactions, NULL-only
        columns) are conservatively read. Live equality deletes still
        apply — stats bounds stay valid because deletes only remove rows.
        Pass ``stats_out={}`` to get {"candidates", "skipped"} back.
        Returns None when the table is empty/absent (read_table's
        contract)."""
        sid = self._resolve(snapshot_id)
        if sid is None:
            return None
        manifest = self.manifest(sid)
        files = manifest["tables"].get(name, [])
        tstats = manifest.get("stats", {}).get(name, {})

        def may_match(path: str) -> bool:
            rng = tstats.get(path, {}).get(col)
            if not rng or rng[0] is None or rng[1] is None:
                return True  # unknown stats: cannot skip
            fmin, fmax = rng
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
            return True

        kept = [p for p in files if may_match(p)]
        if stats_out is not None:
            stats_out["candidates"] = len(files)
            stats_out["skipped"] = len(files) - len(kept)
        if not kept:
            return None
        deletes = manifest.get("deletes", {}).get(name, [])
        if deletes:
            df = self._read_with_deletes(spark, schema, kept, deletes)
        else:
            df = spark.read.schema(schema).parquet(*kept)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def state(self, snapshot_id: int | str | None = None) -> dict | None:
        sid = self._resolve(snapshot_id)
        if sid is None:
            return None
        return self.manifest(sid)["state"]

    # ----------------------------------------------------------------- refs
    # Iceberg-style named refs (tags): a ref is an atomically-written
    # file pointing at one snapshot id. Readers pass the ref name where
    # they'd pass a snapshot id; expire_snapshots never reclaims a
    # snapshot a ref pins, so `cat.set_ref("train-v1")` freezes a corpus
    # cut for as long as the tag lives — the audit/repro primitive every
    # training-data pipeline needs.

    def _ref_path(self, name: str) -> Path:
        if not name or not all(c.isalnum() or c in "._-" for c in name):
            raise ValueError(f"invalid ref name {name!r}")
        return self.root / "refs" / name

    def set_ref(self, name: str, snapshot_id: int | None = None) -> int:
        """Tag a snapshot (default: HEAD). Atomic; overwrites."""
        rp = self._ref_path(name)  # validates the name first
        sid = self.head() if snapshot_id is None else snapshot_id
        if sid is None or not self._manifest_path(sid).exists():
            raise ValueError(f"set_ref: no snapshot {sid!r}")
        rp.parent.mkdir(parents=True, exist_ok=True)
        tmp = rp.with_suffix(rp.suffix + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, rp)
        return sid

    def ref(self, name: str) -> int | None:
        try:
            return int(self._ref_path(name).read_text().strip())
        except FileNotFoundError:
            return None

    def refs(self) -> dict[str, int]:
        d = self.root / "refs"
        if not d.exists():
            return {}
        return {
            p.name: int(p.read_text().strip())
            for p in sorted(d.iterdir())
            if not p.name.endswith(".tmp")
        }

    def drop_ref(self, name: str) -> bool:
        try:
            self._ref_path(name).unlink()
            return True
        except FileNotFoundError:
            return False

    # ------------------------------------------------------------- branches
    # Iceberg-style branches = refs that ADVANCE on commit. The flagship
    # workflow is write-audit-publish (WAP): stage crawl/corpus deltas on
    # a branch (main readers see nothing), validate the branch snapshot
    # through the ordinary read path (read_table/scan_table take the
    # branch name anywhere they take a snapshot id), then atomically
    # fast-forward main — one HEAD swap publishes the whole audited
    # chain, or drop_ref abandons it without a trace on main.

    def next_snapshot_id(self) -> int:
        """Public allocator for the next commit's snapshot id (alias of
        `_next_sid`): the crawl loop and any external writer must use
        this instead of assuming batch == snapshot id, because
        maintenance operations (compaction, branch publishes) allocate
        ids of their own and published ids are immutable."""
        return self._next_sid()

    def _next_sid(self) -> int:
        """Allocate a snapshot id no existing manifest/ref/HEAD uses."""
        ids = [
            int(p.stem.split("-")[1])
            for p in self.root.glob("manifest-*.json")
        ]
        h = self.head()
        if h is not None:
            ids.append(h)
        ids.extend(self.refs().values())
        return 1 + max(ids, default=-1)

    def create_branch(self, name: str, from_snapshot: int | None = None) -> int:
        """Branch off HEAD (or an explicit snapshot). Refuses to clobber
        an existing ref — branches move only via their own commits."""
        if self.ref(name) is not None:
            raise ValueError(f"create_branch: ref {name!r} already exists")
        return self.set_ref(name, from_snapshot)

    def commit_to_branch(
        self,
        branch: str,
        tables: dict[str, DataFrame],
        state: dict,
        num_files: int = 1,
        stats_cols: dict[str, list[str]] | None = None,
    ) -> int:
        """Stage a commit on ``branch``: base = branch tip, snapshot id
        auto-allocated, branch ref advances, HEAD untouched."""
        sid = self._next_sid()
        self.commit(
            sid, tables, state,
            num_files=num_files, stats_cols=stats_cols, branch=branch,
        )
        return sid

    def rollback_to(self, snapshot_id: int | str) -> int:
        """Iceberg-style `rollback_to_snapshot`: move HEAD back to an
        ancestor snapshot atomically (one HEAD swap — readers never see
        an intermediate state).

        The abandoned descendants stay on disk and remain
        time-travel-readable by explicit snapshot id until
        `expire_snapshots` ages them out; pin one with `set_ref` to keep
        it. Their ids are never reused by well-behaved writers
        (`next_snapshot_id` scans every manifest on disk, reachable or
        not), so a resumed crawl continues from the rolled-back state
        under fresh ids — and, by C9 determinism, re-produces the exact
        schedule the abandoned snapshots held.

        Refuses a target that is not an ancestor of the current HEAD
        (rolling "forward" or onto a diverged branch tip is not a
        rollback — use `fast_forward_main` for publishes).
        """
        sid = self._resolve(snapshot_id)
        if sid is None or not self._manifest_path(sid).exists():
            raise ValueError(f"rollback_to: no snapshot {snapshot_id!r}")
        h = self.head()
        if h is None:
            raise ValueError("rollback_to: catalog has no HEAD")
        if sid == h:
            return sid
        if not self._is_ancestor(sid, h):
            raise ValueError(
                f"rollback_to: snapshot {sid} is not an ancestor of HEAD ({h})"
            )
        self._swap_head(sid)
        return sid

    def _is_ancestor(self, ancestor: int, tip: int) -> bool:
        cur: int | None = tip
        while cur is not None:
            if cur == ancestor:
                return True
            m = self.manifest(cur) if self._manifest_path(cur).exists() else {}
            cur = m.get("parent")
        return False

    def fast_forward_main(self, branch: str, drop_branch: bool = False) -> int:
        """Publish an audited branch: if HEAD is an ancestor of the
        branch tip (pure fast-forward — no divergence), swap HEAD to the
        tip atomically. Diverged branches are refused (rebase by
        re-staging on a fresh branch; the shim does not merge)."""
        tip = self.ref(branch)
        if tip is None:
            raise ValueError(f"fast_forward_main: unknown branch {branch!r}")
        h = self.head()
        if h is not None and not self._is_ancestor(h, tip):
            raise ValueError(
                f"fast_forward_main: main ({h}) is not an ancestor of "
                f"{branch!r} tip ({tip}) — the branch has diverged"
            )
        self._swap_head(tip)
        if drop_branch:
            self.drop_ref(branch)
        return tip

    def _resolve(self, snapshot_id: int | str | None) -> int | None:
        """Snapshot id, ref name, or None (= HEAD) → snapshot id."""
        if snapshot_id is None:
            return self.head()
        if isinstance(snapshot_id, str):
            sid = self.ref(snapshot_id)
            if sid is None:
                raise ValueError(f"unknown ref {snapshot_id!r}")
            return sid
        return snapshot_id

    # ------------------------------------------------------ schema evolution
    # Iceberg-style, field-id based: the manifest's optional "schemas"
    # entry records, per table, the CURRENT schema as a list of
    # {id, name, type} fields plus, per committed file-set, the mapping
    # field-id → physical column name at write time. Evolution edits
    # only the current schema (a metadata commit — no data file is ever
    # rewritten): add-column reads as NULL from files that predate it,
    # rename is resolved through the field id (old files keep the old
    # physical name), drop hides the field, and type widening (e.g.
    # int → bigint) casts at read. This is exactly the trick Iceberg's
    # field ids buy over path-based Hive tables, reproduced on the shim.

    @staticmethod
    def _fields_of(df: DataFrame) -> list[dict]:
        return [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(df.schema.fields)
        ]

    def evolve_schema(
        self,
        name: str,
        add: list[tuple[str, str]] | None = None,
        drop: list[str] | None = None,
        rename: dict[str, str] | None = None,
        retype: dict[str, str] | None = None,
    ) -> dict:
        """Metadata-only schema commit for one table: publish a new
        snapshot whose "schemas" entry reflects the evolution; every
        file list and the crawl state carry forward untouched.

        add: [(col, type)] appended with fresh field ids; drop: hide
        fields (their data stays in old files, unreadable — Iceberg
        semantics); rename: {old: new} (field id keeps the physical
        mapping to old files); retype: {col: wider_type} (cast at read;
        caller is responsible for picking a lossless widening such as
        int → bigint — the cast is applied to old AND new files).
        """
        head = self.head()
        if head is None:
            raise ValueError("evolve_schema: no snapshot to evolve")
        manifest = self.manifest(head)
        schemas = dict(manifest.get("schemas", {}))
        if name not in schemas:
            raise ValueError(
                f"evolve_schema: table {name!r} has no registered schema "
                "(written before schema tracking, or never written)"
            )
        entry = json.loads(json.dumps(schemas[name]))  # deep copy
        fields = entry["current"]
        by_name = {f["name"]: f for f in fields}
        for old, new in (rename or {}).items():
            if old not in by_name:
                raise ValueError(f"rename: unknown column {old!r}")
            if new in by_name:
                raise ValueError(f"rename: target {new!r} already exists")
            by_name[old]["name"] = new
        by_name = {f["name"]: f for f in fields}
        for col, typ in (retype or {}).items():
            if col not in by_name:
                raise ValueError(f"retype: unknown column {col!r}")
            by_name[col]["type"] = typ
        for col in drop or []:
            if col not in by_name:
                raise ValueError(f"drop: unknown column {col!r}")
            entry["current"] = [f for f in entry["current"] if f["name"] != col]
            by_name.pop(col)
        next_id = 1 + max((f["id"] for f in entry["current"]), default=0)
        for col, typ in add or []:
            if col in by_name:
                raise ValueError(f"add: column {col!r} already exists")
            entry["current"].append({"id": next_id, "name": col, "type": typ})
            next_id += 1
        schemas[name] = entry
        new_sid = head + 1
        self._publish(
            {
                "snapshot_id": new_sid,
                "committed_at": time.time(),
                "tables": {
                    n: list(fs) for n, fs in manifest["tables"].items()
                },
                "state": manifest["state"],
                "schemas": schemas,
                "deletes": manifest.get("deletes", {}),
                # renames/drops may invalidate recorded column stats —
                # drop the table's stats (conservative: no skipping)
                "stats": {
                    t: st
                    for t, st in manifest.get("stats", {}).items()
                    if t != name
                },
                "parent": head,
            }
        )
        return {"snapshot_id": new_sid, "schema": entry["current"]}

    def read_table_evolved(
        self,
        spark: SparkSession,
        name: str,
        snapshot_id: int | str | None = None,
    ) -> DataFrame | None:
        """Read a table at its (snapshot-current) evolved schema.

        Each committed file-set is read with the physical names it was
        written with (resolved through field ids), renamed/cast to the
        current schema, missing fields filled with typed NULLs, then
        unioned by position — one scan per distinct physical layout, so
        an unevolved table costs exactly one spark.read like read_table.
        """
        from pyspark.sql import functions as F

        sid = self._resolve(snapshot_id)
        if sid is None:
            return None
        manifest = self.manifest(sid)
        files = manifest["tables"].get(name, [])
        schema_entry = manifest.get("schemas", {}).get(name)
        if not files or schema_entry is None:
            return None
        current = schema_entry["current"]
        phys = schema_entry["file_physical"]
        # group file-sets by identical physical layout → one read each
        groups: dict[str, list[str]] = {}
        for path in files:
            key = json.dumps(phys.get(path, {}), sort_keys=True)
            groups.setdefault(key, []).append(path)
        parts = []
        for key, paths in sorted(groups.items()):
            mapping = json.loads(key)  # field-id (str) → physical name
            df = spark.read.parquet(*paths)
            have = set(df.columns)
            cols = []
            for f in current:
                pname = mapping.get(str(f["id"]))
                if pname is not None and pname in have:
                    cols.append(F.col(pname).cast(f["type"]).alias(f["name"]))
                else:  # field added after these files were written
                    cols.append(
                        F.lit(None).cast(f["type"]).alias(f["name"])
                    )
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ----------------------------------------------------------- maintain
    def expire_snapshots(self, keep_last: int) -> dict:
        """Iceberg-style maintenance: drop manifests older than the last
        ``keep_last`` snapshots and delete data files no retained
        manifest references.

        Append-table files referenced by a retained manifest survive even
        if they were WRITTEN by an expired snapshot (the retained
        manifest carries the full file list), so time travel keeps
        working across the retained window while storage stops growing
        without bound. HEAD is never expired. Returns counts:
        {"manifests_removed", "files_removed"}."""
        head = self.head()
        if head is None:
            return {"manifests_removed": 0, "files_removed": 0}
        all_ids = sorted(
            int(p.stem.split("-")[1]) for p in self.root.glob("manifest-*.json")
        )
        # ref'd snapshots are pinned: a tag freezes its corpus cut
        keep_ids = (
            set(all_ids[-max(keep_last, 1):]) | {head} | set(self.refs().values())
        )
        referenced: set[str] = set()
        for sid in keep_ids:
            m = self.manifest(sid)
            for files in m["tables"].values():
                referenced.update(files)
            for dels in m.get("deletes", {}).values():
                referenced.update(d["path"] for d in dels)
        removed_files = 0
        data_root = self.root / "data"
        if data_root.exists():
            import shutil

            for table_dir in data_root.iterdir():
                for snap_dir in table_dir.iterdir():
                    if str(snap_dir) not in referenced:
                        removed_files += sum(
                            1 for p in snap_dir.rglob("*") if p.is_file()
                        )
                        shutil.rmtree(snap_dir)
        removed_manifests = 0
        for sid in all_ids:
            if sid not in keep_ids:
                self._manifest_path(sid).unlink()
                removed_manifests += 1
        return {
            "manifests_removed": removed_manifests,
            "files_removed": removed_files,
        }

    def compact_table(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        num_files: int = 1,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 16,
    ) -> dict:
        """Iceberg-style data-file compaction for one (append) table.

        A long crawl leaves an append table (crawl_order, documents,
        metrics) spread over one small file-set per batch — the classic
        small-files problem: every read plans hundreds of tiny splits.
        Compaction rewrites the table's CURRENT file list into
        ``num_files`` files and publishes a NEW snapshot whose manifest
        points this table at the compacted set (all other tables and the
        crawl state carry forward unchanged). Readers at older snapshots
        still see the original files — time travel is unaffected — and
        the superseded files are reclaimed later by expire_snapshots
        once no retained manifest references them.

        Run this as between-run maintenance: crawl snapshot ids are
        batch-sequential, so a crawl RESUMED after compaction writes its
        next batch at the same id, superseding the compaction manifest —
        but commit() carries file lists forward from HEAD, so the
        resumed batch appends ON TOP of the compacted file set and the
        rewrite survives (e2e: resume after compact+expire replays the
        golden crawl exactly).
        """
        head = self.head()
        if head is None:
            return {"compacted": False, "reason": "no snapshots"}
        manifest = self.manifest(head)
        files = manifest["tables"].get(name, [])
        live_deletes = manifest.get("deletes", {}).get(name, [])
        if len(files) <= num_files and not live_deletes:
            return {"compacted": False, "reason": "already compact",
                    "files_before": len(files)}
        if sort_by and zorder_by:
            raise ValueError("compact_table: sort_by and zorder_by are exclusive")
        new_sid = head + 1
        path = self.root / "data" / name / f"compact-{new_sid:06d}"
        sch = manifest.get("schemas", {}).get(name)
        # a table is EVOLVED (not merely schema-tracked — commit() records
        # a schemas entry for every table) iff some live file was written
        # under a field-id mapping that differs from the current schema
        evolved = False
        if sch is not None:
            current_map = {str(f["id"]): f["name"] for f in sch["current"]}
            evolved = any(
                sch["file_physical"].get(p, current_map) != current_map
                for p in files
            )
        if evolved:
            if live_deletes:
                # per-file-set delete applicability and per-layout field-id
                # resolution would have to be intersected; keep the shim
                # simple — fold deletes before or after evolving, not both
                # in one rewrite
                raise ValueError(
                    f"compact_table: {name!r} has both schema evolution and "
                    "live deletes — compact before evolving (or apply "
                    "deletes first with a plain-schema compaction)"
                )
            # evolved tables must be read through the field-id mapping
            # (old files may carry pre-rename physical names); the
            # rewrite then normalizes every file to the current schema
            df = self.read_table_evolved(spark, name, head)
        elif live_deletes:
            # Iceberg rewrite-with-deletes: the compacted file-set is the
            # merge-on-read view, and the delete files are cleared below
            df = self._read_with_deletes(spark, schema, files, live_deletes)
        else:
            df = spark.read.schema(schema).parquet(*files)
        if zorder_by:
            # Iceberg rewrite-with-zorder: cluster files on the Morton
            # code of the (numeric) dimensions so min/max pruning works
            # for predicates on ANY of them, not just a lead sort key.
            # Quantization ranges come from the table's own min/max
            # (one agg over the files being rewritten — maintenance-
            # time cost, not query-time).
            from pyspark.sql import functions as F

            from who_focus_crawler_spark.operators.zorder import (
                with_zorder_key,
            )

            aggs = []
            for c in zorder_by:
                aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
            stats = df.agg(*aggs).collect()[0]
            ranges = {
                c: (int(stats[f"_lo_{c}"]), int(stats[f"_hi_{c}"]))
                for c in zorder_by
                if stats[f"_lo_{c}"] is not None
                and int(stats[f"_hi_{c}"]) > int(stats[f"_lo_{c}"])
            }
            keyed = with_zorder_key(df, zorder_by, zorder_bits, ranges)
            if num_files > 1:
                keyed = keyed.repartitionByRange(num_files, "z_key")
            else:
                keyed = keyed.coalesce(1)
            df = keyed.sortWithinPartitions("z_key").drop("z_key")
        elif sort_by:
            # Iceberg rewrite-with-sort-order: RANGE-partition on the
            # sort key so each output file owns a disjoint key range
            # (coalesce would concatenate arbitrary splits and every
            # file would span the whole range), then sort inside — now
            # ranged reads hit few files and parquet min/max stats
            # prune across files, not just row groups.
            if num_files > 1:
                df = df.repartitionByRange(num_files, *sort_by)
            else:
                df = df.coalesce(1)
            df = df.sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(num_files)
        df.write.mode("overwrite").parquet(str(path))
        entry = {n: list(fs) for n, fs in manifest["tables"].items()}
        entry[name] = [str(path)]
        schemas = json.loads(json.dumps(manifest.get("schemas", {})))
        if sch is not None:
            # the compacted file-set is written at the current schema
            schemas[name]["file_physical"] = {
                str(path): {
                    str(f["id"]): f["name"] for f in sch["current"]
                }
            }
        deletes = {
            t: list(ds)
            for t, ds in manifest.get("deletes", {}).items()
            if t != name  # folded into the rewrite
        }
        self._publish(
            {
                "snapshot_id": new_sid,
                "committed_at": time.time(),
                "tables": entry,
                "state": manifest["state"],
                "schemas": schemas,
                "deletes": deletes,
                # the rewrite replaces every file-set the stats describe;
                # re-register stats on the next stats_cols commit
                "stats": {
                    t: st
                    for t, st in manifest.get("stats", {}).items()
                    if t != name
                },
                "parent": head,
            }
        )
        return {
            "compacted": True,
            "snapshot_id": new_sid,
            "files_before": len(files),
            "files_after": num_files,
            "deletes_applied": len(live_deletes),
        }

    # --------------------------------------------------- incremental scan
    def incremental_scan(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        from_snapshot: int,
        to_snapshot: int | str | None = None,
    ) -> DataFrame | None:
        """Iceberg incremental APPEND scan: only the rows appended to
        ``name`` strictly after ``from_snapshot`` and at or before
        ``to_snapshot`` (default HEAD) — the feed-the-downstream-job-
        only-the-new-crawl-output primitive.

        File-sets carry the snapshot id they were committed at in their
        path (the shim's sequence number), so the delta is a pure
        manifest filter: no data of the base snapshot is opened, read,
        or shuffled. Matches Iceberg's own restriction: the range must
        be append-only — a compaction rewrite in range re-publishes old
        rows under a new sequence number, and row-level deletes change
        visibility retroactively, so both REFUSE rather than silently
        over- or under-report.
        """
        to_sid = self._resolve(to_snapshot)
        if to_sid is None:
            return None
        if from_snapshot > to_sid:
            raise ValueError(
                f"incremental_scan: from_snapshot {from_snapshot} is after "
                f"to_snapshot {to_sid}"
            )
        manifest = self.manifest(to_sid)
        files = manifest["tables"].get(name, [])
        new = [
            f
            for f in files
            if from_snapshot < self._file_sid(f) <= to_sid
        ]
        for f in new:
            if Path(f).name.startswith("compact-"):
                raise ValueError(
                    "incremental_scan: range crosses a compaction rewrite "
                    f"({Path(f).name}) — re-baseline from that snapshot"
                )
        if any(
            from_snapshot < d["sid"] <= to_sid
            for d in manifest.get("deletes", {}).get(name, [])
        ):
            raise ValueError(
                "incremental_scan: range contains row-level deletes — "
                "the delta is not append-only"
            )
        if not new:
            return None
        return spark.read.schema(schema).parquet(*new)

    def changelog_scan(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        from_snapshot: int,
        to_snapshot: int | str | None = None,
    ) -> DataFrame | None:
        """Iceberg CDC (`create_changelog_view`): every row-level change
        to append table ``name`` strictly after ``from_snapshot`` up to
        ``to_snapshot`` (default HEAD), as the data rows plus
        ``_change_type`` ('insert' | 'delete') and
        ``_change_snapshot_id`` (the commit that caused it).

        This is what `incremental_scan` refuses to answer when the
        window contains row-level deletes: a downstream consumer that
        materializes a derived corpus (tokenized shards, an ANN index,
        a dedup signature store) applies inserts AND retractions —
        GDPR/takedown deletes, quality recalls — without re-reading the
        table. Matches Iceberg's non-net changelog: a row inserted and
        deleted inside the window emits BOTH records, in commit order.

        - inserts: rows of data file-sets committed in the window —
          read O(new deltas), never the historical corpus.
        - deletes: for each equality-delete committed at d in the
          window, the rows it actually killed — rows visible just
          before d (files with sequence number < d, minus earlier
          deletes) matching d's keys. Delete key sets are tiny and
          broadcast; the data side is pruned to the file-sets the
          delete can touch.
        - refuses a window crossing a compaction rewrite, exactly like
          `incremental_scan` (old rows republish under a new sequence
          number — provenance is gone; re-baseline from the rewrite).

        Returns None when nothing changed in the window.
        """
        from functools import reduce

        to_sid = self._resolve(to_snapshot)
        if to_sid is None:
            return None
        if from_snapshot > to_sid:
            raise ValueError(
                f"changelog_scan: from_snapshot {from_snapshot} is after "
                f"to_snapshot {to_sid}"
            )
        manifest = self.manifest(to_sid)
        files = manifest["tables"].get(name, [])
        in_window = [
            f for f in files if from_snapshot < self._file_sid(f) <= to_sid
        ]
        for f in in_window:
            if Path(f).name.startswith("compact-"):
                raise ValueError(
                    "changelog_scan: range crosses a compaction rewrite "
                    f"({Path(f).name}) — re-baseline from that snapshot"
                )
        all_dels = manifest.get("deletes", {}).get(name, [])
        win_dels = [d for d in all_dels if from_snapshot < d["sid"] <= to_sid]

        def tag(df: DataFrame, kind: str, sid: int) -> DataFrame:
            return df.withColumn("_change_type", F.lit(kind)).withColumn(
                "_change_snapshot_id", F.lit(sid).cast("long")
            )

        parts = [
            tag(
                spark.read.schema(schema).parquet(f),
                "insert",
                self._file_sid(f),
            )
            for f in in_window
        ]
        for d in win_dels:
            # rows visible just before this delete: file-sets older than
            # it, minus what EARLIER deletes already killed
            base = [f for f in files if self._file_sid(f) < d["sid"]]
            if not base:
                continue
            earlier = [e for e in all_dels if e["sid"] < d["sid"]]
            if earlier:
                visible = self._read_with_deletes(spark, schema, base, earlier)
            else:
                visible = spark.read.schema(schema).parquet(*base)
            keys = (
                spark.read.parquet(d["path"]).select(*d["keys"]).distinct()
            )
            cond = reduce(
                lambda a, b: a & b,
                [visible[k].eqNullSafe(keys[k]) for k in d["keys"]],
            )
            removed = visible.join(F.broadcast(keys), cond, "left_semi")
            parts.append(tag(removed, "delete", d["sid"]))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---------------------------------------------------- orphan cleanup
    def remove_orphan_files(self, grace_seconds: float = 3 * 86400.0) -> dict:
        """Delete data file-sets referenced by NO existing manifest —
        the debris of a crash between data write and manifest publish
        (Iceberg's remove_orphan_files maintenance action).

        Referenced = every table file-set and delete file listed by any
        manifest still on disk (expire_snapshots already bounds that
        set). Safe by construction for this single-driver shim: a
        concurrent commit writes data BEFORE its manifest, so anything
        unreferenced at scan time with a snapshot id ≤ an EXISTING
        manifest's id can never become referenced later; file-sets with
        ids beyond every known manifest are left alone (they may belong
        to an in-flight commit).

        File-sets whose names carry no snapshot id — ``occ-<token>``
        staging dirs from :meth:`commit_optimistic` — may belong to a
        writer between staging and its lock-held rename, so they are
        only removed when older than ``grace_seconds`` (Iceberg's
        remove_orphan_files has the same mtime-based ``older_than``
        guard, default 3 days). Successful OCC commits rename their
        staging dir away and conflicted ones clean up after themselves,
        so anything still named ``occ-*`` after the grace window is a
        crashed writer's debris.
        """
        import shutil

        referenced: set[str] = set()
        max_known = -1
        for mp in sorted(self.root.glob("manifest-*.json")):
            man = json.loads(mp.read_text())
            max_known = max(max_known, int(man["snapshot_id"]))
            for files in man.get("tables", {}).values():
                referenced.update(str(Path(f)) for f in files)
            for ds in man.get("deletes", {}).values():
                referenced.update(str(Path(d["path"])) for d in ds)
        removed: list[str] = []
        kept_inflight = 0
        now = time.time()
        data_root = self.root / "data"
        if data_root.exists():
            for table_dir in sorted(data_root.iterdir()):
                if not table_dir.is_dir():
                    continue
                for file_set in sorted(table_dir.iterdir()):
                    p = str(file_set)
                    if p in referenced:
                        continue
                    try:
                        sid = self._file_sid(p)
                    except (ValueError, IndexError):
                        sid = None
                    if sid is not None and sid > max_known:
                        kept_inflight += 1  # possibly an in-flight commit
                        continue
                    if sid is None:
                        # unparsable name (occ-* staging): in-flight
                        # unless demonstrably stale
                        try:
                            age = now - file_set.stat().st_mtime
                        except OSError:
                            age = 0.0
                        if age < grace_seconds:
                            kept_inflight += 1
                            continue
                    shutil.rmtree(file_set)
                    removed.append(p)
        return {
            "removed": len(removed),
            "kept_inflight": kept_inflight,
            "paths": removed,
        }
