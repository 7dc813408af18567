from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog
from who_focus_crawler_spark.operators.tablediff import snapshot_diff, table_diff


def _versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),  # deleted in new
            (3, "c", 30),  # updated in new
            (4, None, 40),  # NULL value, unchanged
            (None, "nk", 50),  # NULL key, updated in new
        ],
        "k int, v string, w int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),  # unchanged → absent from diff
            (3, "c2", 30),  # update (v changed)
            (4, None, 40),  # unchanged incl. NULL value
            (5, "e", 55),  # insert
            (None, "nk2", 50),  # NULL key matched null-safely, updated
        ],
        "k int, v string, w int",
    )
    return old, new


def test_table_diff_classifies_and_drops_unchanged(spark):
    old, new = _versions(spark)
    out = table_diff(old, new, ["k"]).collect()
    by_key = {r["k"]: r for r in out}
    assert len(out) == 4
    assert by_key[2]["change"] == "delete" and by_key[2]["new_v"] is None
    assert by_key[3]["change"] == "update"
    assert (by_key[3]["old_v"], by_key[3]["new_v"]) == ("c", "c2")
    assert by_key[5]["change"] == "insert" and by_key[5]["old_v"] is None
    # NULL key matches null-safely: one update row, not insert+delete
    assert by_key[None]["change"] == "update"
    assert (by_key[None]["old_v"], by_key[None]["new_v"]) == ("nk", "nk2")


def test_table_diff_compare_cols_subset(spark):
    old, new = _versions(spark)
    # comparing only w: the v-only changes (keys 3 and NULL) disappear
    out = table_diff(old, new, ["k"], compare_cols=["w"]).collect()
    changes = {r["k"]: r["change"] for r in out}
    assert changes == {2: "delete", 5: "insert"}


def test_table_diff_strict_raises_on_dup_keys(spark):
    old, _ = _versions(spark)
    dup = old.union(old.limit(1))
    with pytest.raises(ValueError, match="duplicate keys"):
        table_diff(dup, old, ["k"]).collect()
    # non-strict proceeds
    assert table_diff(dup, old, ["k"], strict=False).count() >= 0


def test_table_diff_rejects_missing_columns(spark):
    old, new = _versions(spark)
    with pytest.raises(ValueError, match="absent"):
        table_diff(old.drop("w"), new, ["k"], compare_cols=["w"])


def test_snapshot_diff_between_committed_versions(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("canon_url", T.StringType()),
            T.StructField("depth", T.IntegerType()),
        ]
    )
    cat = SnapshotCatalog(tmp_path / "cp")
    v0 = spark.createDataFrame([("u1", 0), ("u2", 0)], schema)
    v1 = spark.createDataFrame([("u1", 0), ("u2", 1), ("u3", 2)], schema)
    cat.commit(0, {"frontier": v0}, state={"batch": 0})
    cat.commit(1, {"frontier": v1}, state={"batch": 1})
    out = snapshot_diff(
        spark, cat, "frontier", schema, ["canon_url"], old_id=0, new_id=1
    ).collect()
    got = {(r["canon_url"], r["change"]) for r in out}
    assert got == {("u2", "update"), ("u3", "insert")}
    # diff against a pre-history version: everything is an insert
    out0 = snapshot_diff(
        spark, cat, "frontier", schema, ["canon_url"], old_id=-1, new_id=0
    )
    assert {r["change"] for r in out0.collect()} == {"insert"}
