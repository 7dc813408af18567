"""Width probe for the pre-signature spread (corpus/dedup.py::_spread).

ADVICE r3: equating inputFiles() COUNT with partition count mispredicts
in both directions — Spark bin-packs small files (many tiny files, few
scan partitions) and splits large ones (few big files, many partitions).
The probe must replay Spark's FilePartition sizing from file BYTES:
padded = Σ(size + openCostInBytes), maxSplit = min(maxPartitionBytes,
max(openCost, padded / cores)), est = ceil(padded / maxSplit).

These tests pin the decision (passthrough vs repartition), not the
downstream signature math — `_spread(df) is df` is the zero-shuffle
contract at warehouse scale.
"""

from __future__ import annotations

import contextlib

from who_focus_crawler_spark.corpus.dedup import _spread


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _write(spark, tmp_path, rows, files, name):
    path = str(tmp_path / name)
    df = spark.range(rows).selectExpr(
        "cast(id as string) as doc_id", "repeat('x', 64) as text"
    )
    df.coalesce(files).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_few_big_files_pass_through(spark, tmp_path):
    """Few LARGE files already split to >= cores scan partitions — the
    old file-count probe forced a full-corpus shuffle here. Simulated by
    shrinking maxPartitionBytes/openCost so each file carries many
    splits."""
    df = _write(spark, tmp_path, 50_000, 2, "big")
    with _conf(
        spark,
        spark__sql__files__maxPartitionBytes="4096b",
        spark__sql__files__openCostInBytes="0b",
    ):
        assert _spread(df) is df  # est = bytes/4KB >> cores: no shuffle


def test_many_tiny_files_pack_to_cores_and_pass_through(spark, tmp_path):
    """>= cores tiny files: Spark's maxSplit floor adapts to
    max(openCost, padded/cores), so the scan packs to ~cores partitions
    — every core busy, passthrough correct. The probe must reproduce
    that (est == cores), not double-shuffle a scan that is already
    wide."""
    n = spark.sparkContext.defaultParallelism
    df = _write(spark, tmp_path, 2 * n, 2 * n, "tiny")  # 1-2 rows/file
    assert len(df.inputFiles()) >= n
    assert _spread(df) is df


def test_fewer_tiny_files_than_cores_get_the_spread(spark, tmp_path):
    """A narrow scan (fewer files than cores, tiny bytes) serializes the
    CPU-heavy signature map — must spread. Both the old and new probe
    agree here; pinned so the bytes-based rewrite can't regress it."""
    n = spark.sparkContext.defaultParallelism
    files = max(2, n // 8)
    df = _write(spark, tmp_path, 4 * files, files, "narrow")
    out = _spread(df)
    assert out is not df
    assert out.count() == 4 * files  # spread preserves the rows


def test_in_memory_frame_always_spreads(spark):
    df = spark.createDataFrame(
        [("a", "t")], "doc_id string, text string"
    )
    assert _spread(df) is not df
