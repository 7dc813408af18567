"""The catalog conformance suite, bound to the offline shim.

One pytest test per contract clause (checkpoint/conformance.py). A
real-catalog adapter re-runs the SAME suite by swapping the factory —
green suite = the engine's crawl/corpus code runs unchanged on the new
backend (the cluster swap-in gate)."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark.checkpoint.conformance import CHECKS
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog


@pytest.mark.parametrize("backend", ["flock", "sqlite", "lockfile"])
@pytest.mark.parametrize("name", sorted(CHECKS))
def test_shim_conformance(spark, tmp_path, name, backend):
    """Every contract clause × every working CAS backend: the seam is
    proven pluggable by running the identical suite against all three
    mutual-exclusion mechanisms (flock / SQLite write transaction /
    O_EXCL sentinel), not by documentation."""
    counter = [0]

    def factory():
        counter[0] += 1
        return SnapshotCatalog(tmp_path / f"cat{counter[0]}", cas=backend)

    CHECKS[name](spark, factory)
