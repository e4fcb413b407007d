"""Bucketed co-located joins: the join must produce NO shuffle Exchange,
and its results must equal the plain (shuffled) join.

Broadcast is disabled inside these tests: at sf0.001 every table fits
under the broadcast threshold and the planner would (correctly) prefer a
broadcast join, bypassing the bucketed path these tests exist to verify.
At the 100 TB design point both sides are far beyond broadcast size and
the bucketed plan is the one that runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.sources.bucketed import (
    bucketed_join,
    has_shuffle,
    write_bucketed,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's warehouse dir
    # (./spark-warehouse for local runs, gitignored); DROP TABLE removes
    # the files again — warehouse.dir is a static conf and cannot be
    # pointed at a pytest tmpdir at runtime.
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    write_bucketed(orders, "b_orders", "orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "orderkey", buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_shuffle(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, on="orderkey")
    assert not has_shuffle(joined), (
        "bucketed join should be shuffle-free:\n"
        + joined._jdf.queryExecution().executedPlan().toString()
    )


def test_plain_join_does_shuffle(spark, no_broadcast):
    """Control: the same join over non-bucketed parquet shuffles both
    sides — this is the Exchange that bucketing amortizes away."""
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    assert has_shuffle(orders.join(lineitem, "orderkey"))


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key reuses the storage partitioning too."""
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert not has_shuffle(agg)


def test_bucketed_join_matches_plain(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    bucketed = (
        bucketed_join(spark, left, right, on="orderkey")
        .groupBy("orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s"))
    )
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    plain = (
        orders.join(lineitem, "orderkey")
        .groupBy("orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
