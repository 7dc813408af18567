"""Local stand-in for the driver's DuckDB oracle harness.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (exact for ints/strings, exact-repr
for rounded doubles). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from who_focus_crawler_spark.session import get_spark

    spark = get_spark(app_name="verify-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    record: dict = {}  # per-query outcome for the WFC_ORACLE_JSON artifact
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"status": "fail", "err": str(e)[:300]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            record[name] = {"status": "rows_only", "rows": len(s_rows)}
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"status": "fail", "err": str(e)[:300]}
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(s_rows) != len(d_rows):
            ok, msgs = False, [f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}"]
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if ok:
            _, sn = norm_rows(s_cols, s_rows)
            _, dn = norm_rows(d_cols, d_rows)
            if sn != dn:
                ok = False
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            record[name] = {"status": "pass", "rows": len(s_rows)}
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            record[name] = {"status": "fail", "err": "; ".join(msgs)[:300]}
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    artifact = os.environ.get("WFC_ORACLE_JSON")
    if artifact:
        import json

        with open(artifact, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "fail": n_fail,
                    "rows_only": n_rows_only,
                    "queries": record,
                },
                f,
                indent=1,
            )
        print(f"wrote {artifact}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
