"""operators/zorder.py — Morton keys, exact quantization, layout payoff."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.zorder import (
    quantize,
    with_zorder_key,
    write_zordered,
    zorder_key,
)

SF = "/root/testdata/sf0.001"


def _morton_py(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 1023) for b in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_py([r["a"], r["b"]], 10), (r["a"], r["b"])


def test_zorder_key_three_dims_and_bounds(spark):
    df = spark.createDataFrame([(3, 5, 6)], "a long, b long, c long")
    z = df.select(
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]["z"]
    assert z == _morton_py([3, 5, 6], 4)
    with pytest.raises(ValueError, match="fit in a long"):
        zorder_key([F.col("a")] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=4)


def test_quantize_is_exact_integer_division(spark):
    # include magnitudes where double division alone would misround
    lo, hi, bits = 0, (1 << 45), 16
    top, span = (1 << bits) - 1, hi - lo
    vals = [0, 1, 12345, (1 << 44) + 7, hi - 1, hi, hi + 99, -5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = [
        r["q"]
        for r in df.select(
            quantize(F.col("x"), lo, hi, bits).alias("q")
        ).collect()
    ]
    expect = [min(max(v, lo), hi) * top // span for v in vals]
    assert got == expect
    with pytest.raises(ValueError, match="hi must exceed lo"):
        quantize(F.col("x"), 5, 5, 8)


def test_quantize_full_range_hash_column(spark):
    # xxhash64 columns span ±2^63: span and x*top overflow a long, so
    # quantize pre-shifts the domain; verify against the same shifted
    # arithmetic in Python and that outputs stay in [0, 2^bits)
    lo, hi, bits = -(1 << 63), (1 << 63) - 1, 16
    vals = [lo, -12345678901234567, -1, 0, 1, 98765432109876543, hi]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = [
        r["q"]
        for r in df.select(quantize(F.col("x"), lo, hi, bits).alias("q")).collect()
    ]
    span = hi - lo
    shift = max(0, span.bit_length() - (62 - bits))
    top = (1 << bits) - 1
    lo_s, hi_s = lo >> shift, hi >> shift
    expect = [
        (min(max(v >> shift, lo_s), hi_s) - lo_s) * top // (hi_s - lo_s)
        for v in vals
    ]
    assert got == expect
    assert all(0 <= q <= top for q in got)
    assert got == sorted(got)  # monotone in the input


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    # ranges must reflect the real domain ([0,1500)/[0,200) at this sf):
    # a domain much smaller than its declared range quantizes into the
    # low bits only, and the z-code stops splitting that dimension
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], bits=10,
                   ranges={"l_orderkey": (0, 1500), "l_partkey": (0, 200)},
                   num_files=8)
    # one-column layout: range-sorted by orderkey only
    (li.repartitionByRange(8, "l_orderkey").sortWithinPartitions("l_orderkey")
       .write.mode("overwrite").parquet(spath))

    # data survives the re-layout untouched
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    assert a == b

    # a partkey range predicate: count files whose [min,max] intersect
    plo, phi = 50, 60
    z_hit = sum(1 for lo, hi in _file_ranges(zpath, "l_partkey")
                if not (hi < plo or lo > phi))
    s_hit = sum(1 for lo, hi in _file_ranges(spath, "l_partkey")
                if not (hi < plo or lo > phi))
    z_all = len(_file_ranges(zpath, "l_partkey"))
    s_all = len(_file_ranges(spath, "l_partkey"))
    # orderkey-sorted files each span ~the whole partkey domain → no
    # pruning; z-ordered files cover disjoint z-ranges → some files
    # fall wholly outside the partkey band
    assert s_hit == s_all
    assert z_hit < z_all, (z_hit, z_all)

    # and the orderkey dimension still prunes under z-order too
    olo, ohi = 100, 400
    zo_hit = sum(1 for lo, hi in _file_ranges(zpath, "l_orderkey")
                 if not (hi < olo or lo > ohi))
    assert zo_hit < z_all
