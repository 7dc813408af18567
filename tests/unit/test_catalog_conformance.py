"""The catalog conformance suite, bound to the offline shim.

One pytest test per contract clause (checkpoint/conformance.py). A
real-catalog adapter re-runs the SAME suite by swapping the factory —
green suite = the engine's crawl/corpus code runs unchanged on the new
backend (the cluster swap-in gate)."""

from __future__ import annotations

import pytest

from who_focus_crawler_spark.checkpoint.conformance import CHECKS
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_shim_conformance(spark, tmp_path, name):
    counter = [0]

    def factory():
        counter[0] += 1
        return SnapshotCatalog(tmp_path / f"cat{counter[0]}")

    CHECKS[name](spark, factory)
