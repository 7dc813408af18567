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
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

APPEND_TABLES = {
    "crawl_order",
    "documents",
    "metrics",
    "url_seen",
    # streaming ingestion (streaming/pipeline.py::stream_frontier_to_catalog):
    # one appended delta per micro-batch epoch
    "frontier_ingest",
}


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
    ) -> None:
        """Write each table's delta/replacement, then atomically publish.

        Carry-forward reads the CURRENT HEAD manifest, not
        ``snapshot_id - 1``: in the plain crawl loop they are the same,
        but after between-run maintenance (compact_table publishes at
        head+1; expire_snapshots may then delete older manifests) HEAD
        is the only manifest guaranteed to exist — and it already points
        at the compacted file lists, so a resumed crawl builds on the
        rewrite instead of the superseded per-batch files.
        """
        head = self.head()
        if head is not None:
            prev = self.manifest(head)
        else:
            prev = self.manifest(snapshot_id - 1) if snapshot_id > 0 else None
        entry: dict[str, list[str]] = {}

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
        for name, df in tables.items():
            if df is None:  # unchanged append-table: carry file list forward
                entry[name] = list(prev["tables"][name]) if prev else []
                continue
            files = [written[name]]
            if name in APPEND_TABLES and prev and name in prev["tables"]:
                files = list(prev["tables"][name]) + files
            entry[name] = files
        self._publish(
            {
                "snapshot_id": snapshot_id,
                "committed_at": time.time(),
                "tables": entry,
                "state": state,
            }
        )

    def _publish(self, manifest: dict) -> None:
        """Durably write a manifest, then atomically swap HEAD to it —
        the shared publish point for commit() and compact_table()."""
        snapshot_id = manifest["snapshot_id"]
        mp = self._manifest_path(snapshot_id)
        tmp = mp.with_suffix(".tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mp)
        # atomic HEAD swap — the publish point
        htmp = self._head_path.with_suffix(".tmp")
        with open(htmp, "w") as f:
            f.write(str(snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(htmp, self._head_path)

    # ---------------------------------------------------------------- read
    def read_table(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        snapshot_id: int | None = None,
    ) -> DataFrame | None:
        sid = self.head() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        files = self.manifest(sid)["tables"].get(name, [])
        if not files:
            return None
        return spark.read.schema(schema).parquet(*files)

    def state(self, snapshot_id: int | None = None) -> dict | None:
        sid = self.head() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        return self.manifest(sid)["state"]

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
        keep_ids = set(all_ids[-max(keep_last, 1):]) | {head}
        referenced: set[str] = set()
        for sid in keep_ids:
            for files in self.manifest(sid)["tables"].values():
                referenced.update(files)
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
        if len(files) <= num_files:
            return {"compacted": False, "reason": "already compact",
                    "files_before": len(files)}
        if sort_by and zorder_by:
            raise ValueError("compact_table: sort_by and zorder_by are exclusive")
        new_sid = head + 1
        path = self.root / "data" / name / f"compact-{new_sid:06d}"
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
        self._publish(
            {
                "snapshot_id": new_sid,
                "committed_at": time.time(),
                "tables": entry,
                "state": manifest["state"],
            }
        )
        return {
            "compacted": True,
            "snapshot_id": new_sid,
            "files_before": len(files),
            "files_after": num_files,
        }
