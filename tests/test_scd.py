"""SCD2 dimension-maintenance semantics (operators.scd)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.scd import scd2_apply

_DIM_SCHEMA = (
    "id long, price double, category string, valid_from string, "
    "valid_to string, is_current boolean"
)
_UPD_SCHEMA = "id long, price double, category string, eff_date string"


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a", "2023-01-01", None, True),
            (2, 20.0, "b", "2023-01-01", None, True),
            (2, 15.0, "b", "2022-01-01", "2023-01-01", False),  # history
            (3, 30.0, "c", "2023-01-01", None, True),
        ],
        _DIM_SCHEMA,
    )


def test_scd2_change_noop_insert_history(spark):
    updates = spark.createDataFrame(
        [
            (1, 11.0, "a", "2024-06-01"),   # price change → close + open
            (2, 20.0, "b", "2024-06-01"),   # identical attrs → no-op
            (9, 99.0, "z", "2024-06-01"),   # new key → insert
        ],
        _UPD_SCHEMA,
    )
    out = scd2_apply(_dim(spark), updates, key="id", attrs=["price", "category"])
    rows = {(r["id"], r["valid_from"]): r for r in out.collect()}
    assert len(rows) == 6  # 4 originals + 1 new version + 1 insert

    closed = rows[(1, "2023-01-01")]
    assert (closed["valid_to"], closed["is_current"]) == ("2024-06-01", False)
    opened = rows[(1, "2024-06-01")]
    assert (opened["price"], opened["valid_to"], opened["is_current"]) == (
        11.0, None, True,
    )
    # no-op update: row untouched
    noop = rows[(2, "2023-01-01")]
    assert (noop["valid_to"], noop["is_current"]) == (None, True)
    # history passthrough
    hist = rows[(2, "2022-01-01")]
    assert (hist["valid_to"], hist["is_current"]) == ("2023-01-01", False)
    # untouched key
    assert rows[(3, "2023-01-01")]["is_current"] is True
    # insert
    ins = rows[(9, "2024-06-01")]
    assert (ins["price"], ins["category"], ins["is_current"]) == (99.0, "z", True)


def test_scd2_reapply_is_noop(spark):
    """Applying the same batch to the merged result changes nothing —
    the idempotence that makes ledger-gated reruns safe."""
    updates = spark.createDataFrame(
        [(1, 11.0, "a", "2024-06-01"), (9, 99.0, "z", "2024-06-01")],
        _UPD_SCHEMA,
    )
    once = scd2_apply(_dim(spark), updates, key="id", attrs=["price", "category"])
    twice = scd2_apply(once, updates, key="id", attrs=["price", "category"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_current_rows_unique_per_key(spark):
    updates = spark.createDataFrame(
        [(1, 11.0, "a", "2024-06-01")], _UPD_SCHEMA
    )
    out = scd2_apply(_dim(spark), updates, key="id", attrs=["price", "category"])
    dup = (
        out.filter(F.col("is_current"))
        .groupBy("id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
