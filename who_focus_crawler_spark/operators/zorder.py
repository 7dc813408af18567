"""Z-order (Morton) data layout for multi-dimensional scan pruning.

Parquet/Iceberg prune row groups by per-column min/max statistics. A
file sorted on ONE column gives tight stats on that column only; a
frontier table queried by host_bucket AND depth AND priority (or a
lineitem-shaped fact queried by two keys) needs locality in several
dimensions at once. The standard answer (Iceberg's ``zorder`` rewrite,
Databricks OPTIMIZE ZORDER) is sorting by the bit-interleaved Morton
code of the quantized dimensions: points close in z-value are close in
every dimension, so each file's min/max box is small in all of them.

This module is the engine-native version: pure bit arithmetic (shift/
mask/or), zero UDFs, engine-portable (``c_zorder_key`` replays the
identical arithmetic in DuckDB), and a writer that range-partitions by
z-key then sorts within partitions — the distributed sort that gives
disjoint z-ranges per output file:

    write_zordered(df, path, ["host_bucket", "depth"], bits=10)

Quantization is integer-exact: ``quantize`` maps a long column into
[0, 2^bits) by integer arithmetic only — no float rounding to diverge
between engines. ``tests/unit/test_zorder.py`` measures the payoff on
real parquet footers: row groups prunable for range predicates on BOTH
dimensions, where a one-column sort only helps its own column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map a long column from [lo, hi] into [0, 2^bits) — integer-only:
    ⌊(x−lo)·(2^bits−1)/(hi−lo)⌋, clamped. lo/hi come from table stats
    (or are known domain bounds like bucket counts)."""
    if hi <= lo:
        raise ValueError("quantize: hi must exceed lo")
    top = (1 << bits) - 1
    # keep every intermediate inside a signed long: arithmetic-shift
    # the domain down until (span·top) < 2^62. Full-range 64-bit hash
    # columns (xxhash64 url_hash spans ±2^63) land here; the shift is
    # the same floor division in Python, Java, and DuckDB, so
    # determinism survives. Precision loss is irrelevant — only the
    # top `bits` bits of the domain matter for the key anyway.
    span = hi - lo
    shift = max(0, span.bit_length() - (62 - bits))
    lo_s, hi_s = lo >> shift, hi >> shift
    span_s = hi_s - lo_s
    xs = F.shiftright(col.cast("long"), shift) if shift else col.cast("long")
    x = F.greatest(F.least(xs, F.lit(hi_s)), F.lit(lo_s)) - F.lit(lo_s)
    a = x * F.lit(top)
    # guarded integer division a div span: the double estimate is
    # within ±1 of the true quotient; the correction terms compare in
    # long arithmetic only, so the result is bit-exact at any magnitude
    q0 = F.floor(a / F.lit(span_s)).cast("long")
    q0 = F.when(q0 * span_s > a, q0 - 1).otherwise(q0)
    return F.when((q0 + 1) * span_s <= a, q0 + 1).otherwise(q0)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton code of ``cols`` (each already a long in [0, 2^bits)):
    bit i of column j lands at interleaved position i·n_cols + j. With
    disjoint destination bits, OR-accumulation is exact; n_cols·bits
    must fit in 63 bits."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if n * bits > 63:
        raise ValueError("zorder_key: n_cols*bits must fit in a long")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[int, int]] | None = None,
    out_col: str = "z_key",
) -> DataFrame:
    """Attach the z-key column; ``ranges`` maps column → (lo, hi) for
    quantization (columns absent from it must already be in range)."""
    parts = []
    for c in cols:
        col = F.col(c)
        if ranges and c in ranges:
            lo, hi = ranges[c]
            col = quantize(col, lo, hi, bits)
        parts.append(col)
    return df.withColumn(out_col, zorder_key(parts, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[int, int]] | None = None,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by z-order: range-partition on
    the z-key (disjoint z-range per file ⇒ small min/max boxes in every
    interleaved dimension) and sort within each partition. The z-key
    column itself is not persisted — layout is metadata, not data."""
    keyed = with_zorder_key(df, cols, bits, ranges)
    (
        keyed.repartitionByRange(num_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )
