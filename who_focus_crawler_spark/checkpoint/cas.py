"""Pluggable compare-and-swap seam for the snapshot catalog's
optimistic-concurrency commits.

Iceberg's commit model needs exactly ONE primitive from the catalog
backend: an atomic conditional update of the head pointer ("publish
snapshot s iff the head is still h"). Everything else — staging data
files, serializable validation, manifest assembly, retry — is
backend-independent and lives in `SnapshotCatalog.commit_optimistic`.
This module isolates that primitive behind `CompareAndSwap.try_publish`
so swapping the offline shim for a real catalog (Iceberg REST, Glue,
Nessie, a DynamoDB/JDBC lock table) touches no engine code: implement
one class, pass it to `SnapshotCatalog(root, cas=...)`.

Implementations:

- `FlockCAS` (default): an exclusive `flock` on ``<root>/commit.lock``
  serializes head-check + publish. Correct for any number of PROCESSES
  sharing one local POSIX filesystem (flock is kernel-level advisory
  locking on the open file description — `tests/prop/
  test_occ_multiprocess.py` races real subprocess writers through it);
  NOT a cross-machine primitive (NFS flock semantics vary, object
  stores have no flock at all). This is the single-cluster-filesystem
  regime the sandbox can actually exercise.
- `RestCatalogCAS` (skeleton): documents the exact adapter a networked
  deployment implements — Iceberg REST `POST /v1/{prefix}/namespaces/
  {ns}/tables/{table}` commits carry the base metadata location and the
  server enforces the conditional update; the adapter maps "requirement
  failed" to ``False`` so the engine's retry loop revalidates and
  reassembles, exactly like Spark's Iceberg writer.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path


class CompareAndSwap:
    """Backend contract: one atomic conditional publish."""

    def try_publish(
        self, expected_head: int | None, attempt: Callable[[], None]
    ) -> bool:
        """Atomically: if the catalog head is still ``expected_head``,
        run ``attempt`` (which must durably publish the new snapshot —
        rename staged files, write manifest, swing head) and return
        True. If the head moved, return False WITHOUT running
        ``attempt`` — the caller revalidates against the new head and
        retries with freshly assembled metadata. ``attempt`` raising
        propagates (the backend must then leave the head untouched)."""
        raise NotImplementedError


class FlockCAS(CompareAndSwap):
    """Conditional update via an exclusive lock file on the catalog's
    filesystem — the offline shim's backend. ``head_fn`` re-reads the
    head pointer INSIDE the critical section; the lock spans check +
    publish, so two process-concurrent writers serialize and exactly
    one sees its expected head."""

    def __init__(self, lock_path: str | Path, head_fn: Callable[[], int | None]):
        self.lock_path = Path(lock_path)
        self.head_fn = head_fn

    def try_publish(
        self, expected_head: int | None, attempt: Callable[[], None]
    ) -> bool:
        import fcntl

        with open(self.lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                if self.head_fn() != expected_head:
                    return False
                attempt()
                return True
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)


class RestCatalogCAS(CompareAndSwap):
    """Adapter SKELETON for a real Iceberg REST catalog (or any backend
    with a server-side conditional update). Not runnable in this
    sandbox — no network — but the mapping is mechanical:

    - ``attempt`` side effects that are LOCAL (renaming staged data to
      final paths, writing the manifest file) happen first, exactly as
      in the shim;
    - the head swing becomes the server call: send the new metadata
      with an ``assert-ref-snapshot-id == expected_head`` requirement
      (REST spec `TableRequirement`); HTTP 409 ⇒ return False;
    - the server is the source of truth for ``expected_head`` — no
      local lock file exists or is needed.
    """

    def __init__(self, endpoint: str, table: str):
        self.endpoint = endpoint
        self.table = table

    def try_publish(
        self, expected_head: int | None, attempt: Callable[[], None]
    ) -> bool:
        raise NotImplementedError(
            "network-backed catalog CAS: implement the REST conditional "
            "commit here (requirement assert-ref-snapshot-id == "
            f"{expected_head}); this sandbox has no network"
        )
