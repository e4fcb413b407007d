"""As-of / range join operator semantics (operators.asof)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.asof import (
    asof_join_dense,
    range_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 102),  # before any order
        ],
        "user_id long, ts timestamp, event_id long",
    )
    orders = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 7),
            (1, _ts("2024-01-01T11:00:00"), 8),
            (2, _ts("2024-01-01T09:30:00"), 9),
        ],
        "user_id long, o_ts timestamp, order_id long",
    )
    out = asof_join_dense(
        events, orders, key="user_id", left_ts="ts", right_ts="o_ts",
        right_val="order_id", out_col="asof_order_id",
    )
    got = {r["event_id"]: r["asof_order_id"] for r in out.collect()}
    assert got == {100: 7, 101: 8, 102: None}


def test_asof_tie_at_equal_ts_includes_order(spark):
    """An order exactly at the event timestamp counts (<= semantics);
    ties on the timestamp break toward the larger value."""
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100)],
        "user_id long, ts timestamp, event_id long",
    )
    orders = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 7), (1, _ts("2024-01-01T10:00:00"), 8)],
        "user_id long, o_ts timestamp, order_id long",
    )
    out = asof_join_dense(
        events, orders, key="user_id", left_ts="ts", right_ts="o_ts",
        right_val="order_id", out_col="asof_order_id",
    )
    assert out.collect()[0]["asof_order_id"] == 8


def test_asof_duplicate_left_timestamps(spark):
    """Duplicate (key, ts) left rows must each appear EXACTLY once in the
    output with the same as-of value — the hazard that killed the old
    join-back variant (its payload re-join on [key, ts] fanned out
    duplicates quadratically)."""
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T10:00:00"), 101),  # same user, same ts
            (1, _ts("2024-01-01T10:00:00"), 102),  # thrice
            (1, _ts("2024-01-01T12:00:00"), 103),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    orders = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 7), (1, _ts("2024-01-01T11:00:00"), 8)],
        "user_id long, o_ts timestamp, order_id long",
    )
    out = asof_join_dense(
        events, orders, key="user_id", left_ts="ts", right_ts="o_ts",
        right_val="order_id", out_col="asof_order_id",
    ).collect()
    assert len(out) == 4  # no fan-out: one output row per input row
    got = {r["event_id"]: r["asof_order_id"] for r in out}
    assert got == {100: 7, 101: 7, 102: 7, 103: 8}


def test_asof_sparse_alias_is_duplicate_safe(spark):
    """asof_join (the historical sparse name) is the same duplicate-safe
    implementation — property-check with generated duplicate-heavy data."""
    from ecs_ecommerce_data_pipeline_spark.operators.asof import asof_join

    rows = []
    eid = 0
    for user in range(3):
        for hour in (9, 10, 10, 11, 11, 11):  # heavy (key, ts) duplication
            rows.append((user, _ts(f"2024-01-01T{hour:02d}:00:00"), eid))
            eid += 1
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    orders = spark.createDataFrame(
        [(u, _ts("2024-01-01T10:00:00"), 100 + u) for u in range(3)],
        "user_id long, o_ts timestamp, order_id long",
    )
    out = asof_join(
        events, orders, key="user_id", left_ts="ts", right_ts="o_ts",
        right_val="order_id", out_col="asof_order_id",
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        expect = 100 + r["user_id"] if r["ts"].hour >= 10 else None
        assert r["asof_order_id"] == expect, r


def test_range_join_assigns_interval(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 999.0)], "id long, v double"
    )
    tiers = spark.createDataFrame(
        [("low", 0.0, 10.0), ("high", 10.0, 100.0)], "tier string, lo double, hi double"
    )
    out = range_join(points, tiers, "v", "lo", "hi")
    got = {r["id"]: r["tier"] for r in out.collect()}
    assert got == {1: "low", 2: "high", 3: None}  # 999 outside all tiers
