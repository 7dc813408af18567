"""Manifest column stats + file skipping (checkpoint/snapshot.py::
scan_table): ranged scans open only file-sets whose recorded [min,max]
intersects the predicate, results always equal the full-read filter,
and maintenance ops (deletes carry, compaction/evolution drop) keep the
stats conservative."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tag", T.StringType(), True),
    ]
)


def delta(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("tag"),
    )


def fresh_cat(spark, tmp_path, n=3):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    for i in range(n):
        cat.commit(
            i,
            {"documents": delta(spark, i * 100, (i + 1) * 100)},
            state={},
            stats_cols={"documents": ["doc_id", "tag"]},
        )
    return cat


def scan_ids(cat, spark, lo, hi, out):
    df = cat.scan_table(spark, "documents", SCHEMA, "doc_id", lo, hi,
                        stats_out=out)
    return sorted(r.doc_id for r in df.collect()) if df is not None else []


def test_skips_non_overlapping_filesets(spark, tmp_path):
    cat = fresh_cat(spark, tmp_path)
    out = {}
    assert scan_ids(cat, spark, 120, 180, out) == list(range(120, 181))
    assert out == {"candidates": 3, "skipped": 2}
    out = {}
    assert scan_ids(cat, spark, 90, 110, out) == list(range(90, 111))
    assert out == {"candidates": 3, "skipped": 1}
    out = {}
    assert scan_ids(cat, spark, None, 50, out) == list(range(0, 51))
    assert out["skipped"] == 2
    out = {}
    assert scan_ids(cat, spark, 1000, None, out) == []
    assert out["skipped"] == 3


def test_string_column_stats(spark, tmp_path):
    cat = fresh_cat(spark, tmp_path, n=1)
    out = {}
    df = cat.scan_table(
        spark, "documents", SCHEMA, "tag", "t1", "t2", stats_out=out
    )
    got = {r.tag for r in df.collect()}
    assert got == {"t1", "t2"}
    assert out == {"candidates": 1, "skipped": 0}


def test_pre_stats_commits_never_skipped(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat2"))
    cat.commit(0, {"documents": delta(spark, 0, 100)}, state={})  # no stats
    cat.commit(
        1,
        {"documents": delta(spark, 100, 200)},
        state={},
        stats_cols={"documents": ["doc_id"]},
    )
    out = {}
    assert scan_ids(cat, spark, 150, 160, out) == list(range(150, 161))
    # the stats-less delta can't be ruled out; the stats-bearing one can
    assert out == {"candidates": 2, "skipped": 0}
    out = {}
    assert scan_ids(cat, spark, 10, 20, out) == list(range(10, 21))
    assert out == {"candidates": 2, "skipped": 1}


def test_deletes_carry_stats_and_apply(spark, tmp_path):
    cat = fresh_cat(spark, tmp_path)
    cat.delete_where(
        spark,
        "documents",
        spark.range(120, 130).select(F.col("id").alias("doc_id")),
    )
    out = {}
    got = scan_ids(cat, spark, 110, 140, out)
    assert got == list(range(110, 120)) + list(range(130, 141))
    assert out["skipped"] == 2  # stats survived the delete commit


def test_compaction_drops_stats_conservatively(spark, tmp_path):
    cat = fresh_cat(spark, tmp_path)
    cat.compact_table(spark, "documents", SCHEMA)
    out = {}
    assert scan_ids(cat, spark, 120, 180, out) == list(range(120, 181))
    assert out["skipped"] == 0  # no stale stats pretend to cover the rewrite


def test_evolution_drops_stats(spark, tmp_path):
    cat = fresh_cat(spark, tmp_path)
    cat.evolve_schema("documents", rename={"tag": "label"})
    m = cat.manifest(cat.head())
    assert "documents" not in m.get("stats", {})
