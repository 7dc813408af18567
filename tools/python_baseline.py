"""Single-node reference baseline for the north metric.

The reference [RECONSTRUCTED, SURVEY.md §0.4] is a sequential Python
crawler; its frontier cost per URL is canonicalize + seen-set probe +
per-host priority queue + politeness + sequencing. This script runs
exactly that loop (pure Python, same frozen canonicalization via
`canonicalize_py`, set-based URL-seen, heapq per host) over the SAME
synthetic frontier bench.py uses, and prints its throughput — the
"single-node reference throughput" the Spark engine must match or beat
(task brief). No Spark involved.

    python tools/python_baseline.py [n_urls]
"""

from __future__ import annotations

import heapq
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from who_focus_crawler_spark.functions.urls import canonicalize_py, url_host_py


def messy_url(uid: int) -> tuple[str, float]:
    host = f"h{uid % 997}.example.org"
    path = f"/p/{uid}"
    v = uid % 5
    if v == 0:
        url = f"HTTP://{host.upper()}{path}"
    elif v == 1:
        url = f"http://{host}:80{path}"
    elif v == 2:
        url = f"http://{host}/x/../p/{uid}"
    elif v == 3:
        url = f"http://{host}{path}#s1"
    else:
        url = f"http://{host}{path}?utm_source=x&b=2&a=1"
    return url, float(uid % 100000)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    urls = [messy_url(i) for i in range(n)]
    t0 = time.time()
    seen: set[str] = set()
    per_host: dict[str, list] = {}
    # seed the seen set with every third URL (same as bench.py)
    for i in range(0, n, 3):
        c = canonicalize_py(urls[i][0])
        if c:
            seen.add(c)
    scheduled = 0
    for i, (u, prio) in enumerate(urls):
        c = canonicalize_py(u)
        if c is None or (i % 3 != 0 and c in seen):
            continue
        if i % 3 != 0:
            seen.add(c)
            host = url_host_py(c)
            heapq.heappush(per_host.setdefault(host, []), (-prio, c))
    order = []
    seq = 0
    for host in sorted(per_host):
        q = per_host[host]
        for _ in range(min(8, len(q))):
            seq += 1
            order.append((seq, heapq.heappop(q)[1]))
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "baseline": "sequential python frontier scheduler "
                "(reference-architecture stand-in)",
                "n_urls": n,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(n / wall, 1),
                "admitted": len(order),
            }
        )
    )


if __name__ == "__main__":
    main()
