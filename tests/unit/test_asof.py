"""R14 as-of join operator: inclusive match, equal-ts tie-break, no-match drop."""

from __future__ import annotations

from datetime import datetime

from who_focus_crawler_spark.operators.asof import asof_join


def _dt(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", _dt(10), "probe-early"),   # before any event → dropped
            ("u1", _dt(12), "probe-exact"),   # event at exactly 12:00 matches
            ("u1", _dt(13), "probe-late"),    # latest event ≤ 13:00 is 12:30
            ("u2", _dt(12), "probe-tie"),     # two events at 11:00 → max id
            ("u3", _dt(12), "probe-nouser"),  # user with no events → dropped
        ],
        ["user_id", "ts", "label"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _dt(12), 1, 10.0),
            ("u1", _dt(12, 30), 2, 20.0),
            ("u1", _dt(14), 3, 30.0),   # after every probe → never matches
            ("u2", _dt(11), 4, 40.0),
            ("u2", _dt(11), 5, 50.0),   # equal ts: greater event_id wins
        ],
        ["user_id", "ts", "event_id", "value"],
    )
    out = {
        r.label: (r.event_id, r.value)
        for r in asof_join(
            left, right, on="ts", by="user_id",
            value_cols=["event_id", "value"], tie_col="event_id",
        ).collect()
    }
    assert out == {
        "probe-exact": (1, 10.0),
        "probe-late": (2, 20.0),
        "probe-tie": (5, 50.0),
    }


def test_asof_join_row_atomic_with_null_values(spark):
    """A NULL in a carried value column must NOT stitch fields from two
    different right rows: the as-of match is the whole anchor row."""
    left = spark.createDataFrame([("u1", _dt(13), "p")], ["user_id", "ts", "label"])
    right = spark.createDataFrame(
        [("u1", _dt(11), 1, 7.0), ("u1", _dt(12), 2, None)],
        ["user_id", "ts", "event_id", "value"],
    )
    rows = asof_join(
        left, right, on="ts", by="user_id",
        value_cols=["event_id", "value"], tie_col="event_id",
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # anchor row is (event_id=2, value=NULL) — value must stay NULL, not
    # be back-filled with 7.0 from the earlier row
    assert (r.event_id, r.value) == (2, None)


def test_asof_join_rejects_column_collision(spark):
    import pytest

    left = spark.createDataFrame([("u1", 5, 1)], ["user_id", "ts", "event_id"])
    right = spark.createDataFrame(
        [("u1", 3, 7)], ["user_id", "ts", "event_id"]
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="ts", by="user_id")


def test_asof_join_default_value_cols(spark):
    left = spark.createDataFrame([("u1", 5, "x")], ["user_id", "ts", "k"])
    right = spark.createDataFrame(
        [("u1", 3, 7, "p"), ("u1", 4, 8, "q")],
        ["user_id", "ts", "event_id", "payload"],
    )
    rows = asof_join(left, right, on="ts", by="user_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.k, r.event_id, r.payload) == ("x", 8, "q")
    assert set(rows[0].asDict()) == {"user_id", "ts", "k", "event_id", "payload"}
