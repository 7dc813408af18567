"""Frontier stress run at ≥10^8 URLs with forced shuffle spill
(VERDICT r2 item 1: the 10^10 north-metric claim rested on an
extrapolation from 6×10^7; this measures a disk-backed 10^8-row run).

Unlike bench.py (in-memory persisted frontier, best-of-k), the stress
frontier is MATERIALIZED TO PARQUET first — the honest stand-in for the
at-rest frontier table — and the pipeline JVM gets a capped heap
(WFC_DRIVER_MEM, default 16g) so the C4/C6/C9 shuffles of ~10 GB of URL
strings MUST spill; spill bytes are read from the Spark REST API and
recorded alongside throughput. The same run is repeated at local[N] and
local[4N] for the north rule's two-cluster-size scaling criterion.

    python tools/stress_bench.py [--urls 1e8] [--n 2] \
        [--sf /root/testdata/sf0.1] [--data /tmp/wfc_stress] [--keep]

Writes STRESS.json in the repo root. The generated parquet (~2-4 GB) is
deleted afterwards unless --keep.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))  # idleness guard


def _gen(n_urls: int, sf_dir: str, data: str) -> dict:
    """Disk-streamed frontier generation: the frontier is written in
    bounded DISJOINT slices (≤ WFC_GEN_SLICE_ROWS each, uid-offset so
    slices never collide) appended to one parquet dataset — memory
    stays O(slice) regardless of total size, which is what lets a
    single box materialize a 10^9-row at-rest frontier table."""
    from bench import synth_frontier
    from pyspark.sql import functions as F
    from who_focus_crawler_spark.session import get_spark

    spark = get_spark(
        app_name="wfc-stress-gen", master="local[32]", shuffle_partitions=128
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_orders = orders.count()
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    total_expand = math.ceil(n_urls / n_orders)
    slice_rows = int(os.environ.get("WFC_GEN_SLICE_ROWS", str(250_000_000)))
    slice_expand = max(1, min(total_expand, math.ceil(slice_rows / n_orders)))
    n_slices = math.ceil(total_expand / slice_expand)
    # at-rest codec knob: zstd shrinks the frontier parquet ~35% vs the
    # snappy default — at 10^9 rows that headroom is what lets the same
    # box hold BOTH the input table and a timing leg's shuffle files
    codec = os.environ.get("WFC_GEN_PARQUET_CODEC", "snappy")
    shutil.rmtree(data, ignore_errors=True)
    done = 0
    for i in range(n_slices):
        e = min(slice_expand, total_expand - done)
        off = i * (max_key + 1) * slice_expand
        synth_frontier(spark, sf_dir, e, uid_offset=off).write.mode(
            "append"
        ).option("compression", codec).parquet(data)
        done += e
    n = spark.read.parquet(data).count()
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(data)
        for f in fs
    )
    return {
        "frontier_urls": n,
        "expand": total_expand,
        "gen_slices": n_slices,
        "parquet_bytes": size,
    }


def _run(cpus: int, data: str, partitions: int = 128) -> dict:
    import urllib.request

    from bench import run_frontier_pipeline
    from who_focus_crawler_spark.session import get_spark

    extra = {"spark.ui.enabled": "true"}
    codec = os.environ.get("WFC_SHUFFLE_CODEC")
    if codec:
        # zstd shrinks shuffle files ~30% vs lz4 (more at higher levels)
        # — at 10^9 rows that is the difference between fitting this
        # box's disk and not; a production cluster sets the same knobs
        extra["spark.io.compression.codec"] = codec
        level = os.environ.get("WFC_ZSTD_LEVEL")
        if codec == "zstd" and level:
            extra["spark.io.compression.zstd.level"] = level
    spark = get_spark(
        app_name=f"wfc-stress-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=partitions,
        extra_conf=extra,
    )
    frontier = spark.read.parquet(data)
    # warm the Python UDF workers on ONE part file: a limit() over the
    # full multi-hundred-file scan schedules hundreds of tasks through
    # ArrowEvalPython just to throw them away (and proved fragile under
    # disk pressure); one file is a single task and the same warm-up
    import glob as _glob

    one = sorted(_glob.glob(os.path.join(data, "*.parquet")))[0]
    run_frontier_pipeline(spark, spark.read.parquet(one).limit(2000))
    t0 = time.time()
    n_admitted = run_frontier_pipeline(spark, frontier)
    wall = time.time() - t0
    n_urls = frontier.count()
    spill_mem = spill_disk = shuffle_write = 0
    try:
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app}/stages"
        ) as r:
            for st in json.loads(r.read()):
                spill_mem += st.get("memoryBytesSpilled", 0)
                spill_disk += st.get("diskBytesSpilled", 0)
                shuffle_write += st.get("shuffleWriteBytes", 0)
    except Exception as e:  # UI port may differ; metrics are best-effort
        spill_mem = spill_disk = shuffle_write = -1
        print(f"spill metrics unavailable: {e}", file=sys.stderr)
    return {
        "cpus": cpus,
        "frontier_urls": n_urls,
        "admitted": n_admitted,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_urls / wall, 1),
        "memory_bytes_spilled": spill_mem,
        "disk_bytes_spilled": spill_disk,
        "shuffle_write_bytes": shuffle_write,
        "shuffle_partitions": partitions,
        "driver_mem": os.environ.get("WFC_DRIVER_MEM", "16g"),
        "shuffle_codec": os.environ.get("WFC_SHUFFLE_CODEC", "lz4"),
    }


def _sub(mode: str, *args: str, env: dict | None = None) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), mode, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=dict(os.environ, **(env or {})),
    )
    if out.returncode != 0:
        print(out.stdout[-4000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"{mode} failed rc={out.returncode}")
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("_gen", "_run"):
        if sys.argv[1] == "_gen":
            res = _gen(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        else:
            res = _run(
                int(sys.argv[2]),
                sys.argv[3],
                int(sys.argv[4]) if len(sys.argv) > 4 else 128,
            )
        print(json.dumps(res))
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=float, default=1e8)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--data", default="/tmp/wfc_stress_frontier")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--spill-mem", default="4g")
    ap.add_argument("--partitions", type=int, default=128,
                    help="shuffle partitions for the N/4N legs — size so "
                         "one partition's sort fits executor memory at "
                         "the target row count")
    ap.add_argument("--spill-partitions", type=int, default=16)
    ap.add_argument("--codec", default=None,
                    help="shuffle codec override (e.g. zstd for 1e9 runs)")
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--max-steal", type=float, default=5.0)
    ap.add_argument("--mem-n", default=None,
                    help="driver heap for the local[N] leg. On a real "
                         "cluster each executor brings its own memory, "
                         "so the faithful N-vs-4N substitute gives the "
                         "small leg N/4N of the big leg's heap (equal "
                         "per-core memory); a fixed shared heap is only "
                         "fair while neither leg spills")
    ap.add_argument("--mem-4n", default=None,
                    help="driver heap for the local[4N] leg")
    ap.add_argument("--reuse-data", action="store_true",
                    help="skip generation; --data already holds the "
                         "frontier parquet (counts read from footers)")
    ap.add_argument("--codec-level", default=None,
                    help="zstd compression level for shuffle files")
    a = ap.parse_args()

    from idleness import wait_until_idle

    env_codec = {"WFC_SHUFFLE_CODEC": a.codec} if a.codec else {}
    if a.codec_level:
        env_codec["WFC_ZSTD_LEVEL"] = a.codec_level
    if a.reuse_data and os.path.isdir(a.data):
        import pyarrow.parquet as pq

        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(a.data)
            for f in fs
            if f.endswith(".parquet")
        ]
        gen = {
            "frontier_urls": sum(
                pq.ParquetFile(f).metadata.num_rows for f in files
            ),
            "expand": None,
            "gen_slices": None,
            "parquet_bytes": sum(os.path.getsize(f) for f in files),
            "reused": True,
        }
    else:
        gen = _sub("_gen", str(int(a.urls)), a.sf, a.data)
    print("generated:", json.dumps(gen))

    def leg(tag: str, *args: str, env: dict | None = None) -> dict:
        # the idleness guard runs immediately before each timing leg:
        # contaminated draws (busy box / hypervisor steal) are waited
        # out, and every discarded sample is recorded in the output
        guard = wait_until_idle(a.max_load, a.max_steal)
        r = _sub("_run", *args, env=dict(env_codec, **(env or {})))
        r["idleness"] = guard
        print(f"{tag}:", json.dumps(r))
        return r

    try:
        env4 = {"WFC_DRIVER_MEM": a.mem_4n} if a.mem_4n else {}
        envn = {"WFC_DRIVER_MEM": a.mem_n} if a.mem_n else {}
        r4n = leg(f"local[{4 * a.n}]", str(4 * a.n), a.data,
                  str(a.partitions), env=env4)
        rn = leg(f"local[{a.n}]", str(a.n), a.data, str(a.partitions),
                 env=envn)
        # forced-spill leg: capped heap + wide per-task slices so the
        # C4 anti-join / C6 window sorters MUST spill — proves the
        # pipeline degrades to disk instead of OOMing. Spill writes
        # ~150 B/url of disk; auto-skip (recorded, not silent) when the
        # box cannot hold it.
        free = shutil.disk_usage("/tmp").free
        need = int(a.urls * 150)
        if free >= need:
            rsp = leg(
                f"spill local[{4 * a.n}] {a.spill_mem}",
                str(4 * a.n), a.data, str(a.spill_partitions),
                env={"WFC_DRIVER_MEM": a.spill_mem},
            )
        else:
            rsp = {
                "skipped": "disk headroom",
                "free_bytes": free,
                "estimated_spill_bytes": need,
                "note": "run the spill leg at a scale whose spill fits "
                        "this box (see prior runs in STRESS.json)",
            }
            print("spill leg skipped:", json.dumps(rsp))
    finally:
        if not a.keep:
            shutil.rmtree(a.data, ignore_errors=True)
    eff = (r4n["urls_per_sec"] / rn["urls_per_sec"]) / 4.0
    run = {
        "input": gen | {"sf_dir": a.sf, "source": "disk parquet"},
        "N_cores": a.n,
        "throughput_N": rn["urls_per_sec"],
        "wall_N_sec": rn["wall_sec"],
        "spill_N": {
            "memory_bytes_spilled": rn["memory_bytes_spilled"],
            "disk_bytes_spilled": rn["disk_bytes_spilled"],
        },
        "idleness_N": rn["idleness"],
        "throughput_4N": r4n["urls_per_sec"],
        "wall_4N_sec": r4n["wall_sec"],
        "spill_4N": {
            "memory_bytes_spilled": r4n["memory_bytes_spilled"],
            "disk_bytes_spilled": r4n["disk_bytes_spilled"],
        },
        "idleness_4N": r4n["idleness"],
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
        "driver_mem": rn["driver_mem"],
        "shuffle_codec": rn.get("shuffle_codec", "lz4"),
        "forced_spill_leg": rsp,
    }
    # STRESS.json accumulates runs (multi-scale evidence); a legacy
    # single-run file becomes runs[0]. Other sections (streaming_runs,
    # membw_probe, ...) are preserved, not clobbered.
    out_path = os.path.join(REPO, "STRESS.json")
    result: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        result = prior if "runs" in prior or "protocol" in prior else {}
        if "input" in prior and "runs" not in prior:
            result = {"runs": [prior]}
    result["protocol"] = (
        "frontier at-rest parquet -> full C1-C9 pipeline; "
        "idleness-guarded legs at local[N] and local[4N]; "
        "forced-spill leg unless disk-bound (recorded)"
    )
    result.setdefault("runs", []).append(run)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(run, indent=2))


if __name__ == "__main__":
    main()
