"""N vs 4N scaling evidence (BASELINE.json north_rule).

The two-cluster-size criterion cannot use a real cluster in this sandbox
(SURVEY.md §6): the same job is run on the same input at two parallelism
levels — local[N] and local[4N] on the 32-core box — in separate JVMs,
with identical partition counts, and throughput scaling efficiency
(thr_4N / thr_N) / 4 is reported.

    python tools/scaling_bench.py [N] [sf_dir] [expand]

Writes/updates SCALING.json in the repo root and prints the summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))  # idleness guard


def run_once(cpus: int, sf_dir: str, expand: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        WFC_BENCH_EXPAND=str(expand),
        WFC_BENCH_QUERIES="0",
        WFC_BENCH_PARTITIONS="128",
        WFC_BENCH_REPEAT=os.environ.get("WFC_BENCH_REPEAT", "3"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    # Default N=2 ⇒ 4N=8: on the shared 32-vCPU box, task threads +
    # Python UDF workers stay well under the physical cores at BOTH sizes
    # (memory-bandwidth contention measurably inflates per-task CPU above
    # ~16 concurrent threads — see BASELINE.md; that measures the box,
    # not the job).
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    expand = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    from idleness import wait_until_idle

    # idleness guard (machine-readable): each leg records loadavg +
    # hypervisor steal sampled immediately before it; contaminated
    # draws are waited out and every discarded sample is kept in the
    # JSON, so a noisy run (like the recorded 0.777 outlier) is
    # auditable instead of a silent pollutant
    g_n = wait_until_idle()
    r_n = run_once(n, sf_dir, expand)
    g_4n = wait_until_idle()
    r_4n = run_once(4 * n, sf_dir, expand)
    eff = (r_4n["value"] / r_n["value"]) / 4.0
    result = {
        "input": {"sf_dir": sf_dir, "expand": expand,
                  "frontier_urls": r_n["frontier_urls"]},
        "N_cores": n,
        "throughput_N": r_n["value"],
        "wall_N_sec": r_n["frontier_wall_sec"],
        "throughput_4N": r_4n["value"],
        "wall_4N_sec": r_4n["frontier_wall_sec"],
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
        "idleness_N": g_n,
        "idleness_4N": g_4n,
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
