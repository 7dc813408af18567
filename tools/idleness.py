"""Machine-readable idleness guard for timing runs (VERDICT r3
"What's wrong" #2): scaling/stress legs on a shared VM are only
comparable when the box is quiet, so every leg records the load
average and hypervisor steal% measured immediately BEFORE it starts,
and a contaminated draw (busy box) is retried after a settle wait
instead of silently polluting the efficiency ratio. Every sample —
including discarded ones — lands in the output JSON, so a re-run can
audit what was rejected and why rather than trusting a cherry-pick.
"""

from __future__ import annotations

import os
import time


def _steal_pct(interval: float = 0.5) -> float:
    """Hypervisor steal as % of total CPU time over a short window
    (fields of /proc/stat line 'cpu': user nice system idle iowait irq
    softirq steal ...)."""

    def read() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]

    a = read()
    time.sleep(interval)
    b = read()
    d = [y - x for x, y in zip(a, b)]
    total = sum(d)
    return round(100.0 * d[7] / total, 2) if total else 0.0


def sys_snapshot() -> dict:
    load1, load5, load15 = os.getloadavg()
    return {
        "load1": round(load1, 2),
        "load5": round(load5, 2),
        "load15": round(load15, 2),
        "steal_pct": _steal_pct(),
        "ts": round(time.time(), 1),
    }


def wait_until_idle(
    max_load1: float = 4.0,
    max_steal_pct: float = 5.0,
    tries: int = 6,
    settle_sec: float = 30.0,
) -> dict:
    """Sample until the box is idle enough for a timing leg (or tries
    run out). Returns {"pre": accepted_sample, "discarded": [...],
    "contaminated": bool} — contaminated=True means the leg ran anyway
    on the last sample and its timing should be treated as a noisy
    draw, exactly like the 0.777 outlier documented in BASELINE.md."""
    discarded: list[dict] = []
    for i in range(tries):
        s = sys_snapshot()
        if s["load1"] <= max_load1 and s["steal_pct"] <= max_steal_pct:
            return {"pre": s, "discarded": discarded, "contaminated": False}
        discarded.append(s)
        if i < tries - 1:
            time.sleep(settle_sec)
    return {"pre": discarded[-1], "discarded": discarded[:-1],
            "contaminated": True}
