"""Negative-path validation tests mirroring the reference's manual
simulation runbook (README.md:446-453, FIXTURES.md §A negative fixtures):
missing required column, nulls in critical fields, orphan FKs."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import validation
from ecs_ecommerce_data_pipeline_spark.schemas import REQUIRED_COLUMNS


@pytest.fixture(scope="module")
def frames(spark):
    ts = dt.datetime(2024, 1, 1)
    products = spark.createDataFrame(
        [(1, "sku1", 1.0, "toys", 2.0), (2, "sku2", 2.0, "games", 4.0)],
        "id long, sku string, cost double, category string, retail_price double",
    )
    orders = spark.createDataFrame(
        [(10, 100, ts, None), (11, 101, ts, ts)],
        "order_id long, user_id long, created_at timestamp, returned_at timestamp",
    )
    items = spark.createDataFrame(
        [(10, 1, 5.0, ts, None), (11, 2, 7.0, ts, None)],
        "order_id long, product_id long, sale_price double, created_at timestamp,"
        " returned_at timestamp",
    )
    return products, orders, items


def test_clean_batch_passes(frames):
    products, orders, items = frames
    res = validation.validate_batch(orders, items, products, REQUIRED_COLUMNS)
    assert res.ok, res.reasons
    assert all(v == 0 for v in res.null_counts.values())


def test_missing_required_column_rejected(frames):
    products, orders, items = frames
    res = validation.validate_batch(
        orders.drop("order_id"), items, products, REQUIRED_COLUMNS
    )
    assert not res.ok
    assert any("missing required columns" in r and "order_id" in r for r in res.reasons)


def test_nulls_in_critical_field_rejected(spark, frames):
    products, orders, items = frames
    bad_orders = orders.withColumn(
        "created_at",
        F.when(F.col("order_id") == 10, F.lit(None).cast("timestamp")).otherwise(
            F.col("created_at")
        ),
    )
    res = validation.validate_batch(bad_orders, items, products, REQUIRED_COLUMNS)
    assert not res.ok
    assert res.null_counts["orders.created_at"] == 1
    assert any("null values in critical field" in r for r in res.reasons)


def test_orphan_order_ids_rejected(spark, frames):
    products, orders, items = frames
    orphan = spark.createDataFrame(
        [(99, 1, 5.0, dt.datetime(2024, 1, 1), None)], items.schema
    )
    res = validation.validate_batch(
        orders, items.unionByName(orphan), products, REQUIRED_COLUMNS
    )
    assert not res.ok
    assert res.orphans["order_items->orders"] == [99]


def test_orphan_product_ids_rejected(spark, frames):
    products, orders, items = frames
    orphan = spark.createDataFrame(
        [(10, 77, 5.0, dt.datetime(2024, 1, 1), None)], items.schema
    )
    res = validation.validate_batch(
        orders, items.unionByName(orphan), products, REQUIRED_COLUMNS
    )
    assert not res.ok
    assert res.orphans["order_items->products"] == [77]


def test_optional_column_synthesis(spark, frames):
    """Reference P8: absent returned_at synthesized as typed null
    (transform_task.py:177-186)."""
    from ecs_ecommerce_data_pipeline_spark.operators.kpis import with_optional_column

    products, orders, items = frames
    no_ret = orders.drop("returned_at")
    fixed = with_optional_column(no_ret, "returned_at", "timestamp")
    assert "returned_at" in fixed.columns
    assert fixed.schema["returned_at"].dataType.typeName() == "timestamp"
    assert fixed.filter(F.col("returned_at").isNotNull()).count() == 0
