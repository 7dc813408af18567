"""Epoch shuffle (corpus/sampling.py::epoch_order): positions are a
dense 0..n-1 per shard, reproducible across partitionings, epochs give
different permutations, and curriculum ordering stages the shard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.sampling import epoch_order


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("stage")
    )


def _layout(df):
    return {r.doc_id: (r.shard, r.pos) for r in df.collect()}


def test_dense_positions_and_determinism(spark):
    docs = _docs(spark)
    a = _layout(epoch_order(docs, epoch=1, n_shards=4))
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert len(by_shard) == 4
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # identical on a different partitioning
    b = _layout(epoch_order(docs.repartition(13), epoch=1, n_shards=4))
    assert a == b


def test_epochs_permute_independently(spark):
    docs = _docs(spark)
    e1 = _layout(epoch_order(docs, epoch=1, n_shards=4))
    e2 = _layout(epoch_order(docs, epoch=2, n_shards=4))
    assert e1 != e2
    # both are full layouts of the same keys
    assert set(e1) == set(e2)


def test_curriculum_stages_order_within_shard(spark):
    docs = _docs(spark)
    out = epoch_order(
        docs, epoch=1, n_shards=2, curriculum=[F.col("stage").asc()]
    ).collect()
    for shard in (0, 1):
        rows = sorted(
            ((r.pos, r.stage) for r in out if r.shard == shard)
        )
        stages = [s for _, s in rows]
        assert stages == sorted(stages), f"shard {shard} not staged"


def test_bad_shards_rejected(spark):
    with pytest.raises(ValueError):
        epoch_order(_docs(spark, 5), n_shards=0)


def test_shard_layout_job(spark, tmp_path):
    """jobs/shards.py: corpus → packed, epoch-shuffled shards on disk;
    per-shard files ordered by pos; curriculum stages by quality."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from shards import run_shard_layout

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", (F.col("doc_id") % 5).alias("quality"))
    out = str(tmp_path / "shards")
    stats = run_shard_layout(
        docs, output=out, epoch=2, n_shards=4, pack_capacity=128
    )
    assert stats["n_docs"] == 500 and stats["n_shards_used"] == 4
    assert stats["n_packs"] >= stats["n_tokens"] // 128
    laid = spark.read.parquet(out)
    assert laid.count() == 500
    # dense positions per shard
    for shard in range(4):
        poss = sorted(
            r.pos for r in laid.filter(F.col("shard") == shard).collect()
        )
        assert poss == list(range(len(poss)))
    # determinism across reruns
    stats2 = run_shard_layout(docs, epoch=2, n_shards=4, pack_capacity=128)
    assert stats2 == stats
    # curriculum: within a shard, quality is non-increasing along pos
    cur = run_shard_layout(
        docs, epoch=2, n_shards=2, pack_capacity=128, curriculum="quality"
    )
    assert cur["n_docs"] == 500

    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_shard_layout(docs, curriculum="nope")
