"""Mergeable aggregate-state invariants: batch-split independence,
merge-order independence, and redelivery idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import incremental_agg, kpis
from ecs_ecommerce_data_pipeline_spark.sources.testdata import ecommerce_views

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_recompute_any_split(spark):
    t = ecommerce_views(spark, SF)
    prepared = kpis.prepare_items(
        t["order_items"], t["orders"], t["products"]
    ).cache()
    full = _rows(
        incremental_agg.finalize_category_kpis(
            incremental_agg.category_kpi_state(prepared)
        )
    )
    for k in (2, 5):
        states = [
            incremental_agg.category_kpi_state(
                prepared.filter(F.col("order_id") % k == b)
            )
            for b in range(k)
        ]
        merged = incremental_agg.finalize_category_kpis(
            incremental_agg.merge_kpi_states(states)
        )
        assert _rows(merged) == full, f"split k={k} diverged from recompute"
    prepared.unpersist()


def test_merge_order_independent(spark):
    t = ecommerce_views(spark, SF)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    states = [
        incremental_agg.category_kpi_state(prepared.filter(F.col("order_id") % 3 == b))
        for b in range(3)
    ]
    fwd = incremental_agg.finalize_category_kpis(
        incremental_agg.merge_kpi_states(states)
    )
    rev = incremental_agg.finalize_category_kpis(
        incremental_agg.merge_kpi_states(states[::-1])
    )
    assert _rows(fwd) == _rows(rev)


def test_distinct_state_redelivery_idempotent(spark):
    t = ecommerce_views(spark, SF)
    orders = t["orders"].withColumn("date_key", F.to_date("created_at"))
    batches = [
        incremental_agg.distinct_member_state(
            orders.filter(F.col("order_id") % 2 == b), "date_key", "user_id"
        )
        for b in range(2)
    ]
    once = incremental_agg.finalize_distinct_count(
        incremental_agg.merge_distinct_states(batches), "date_key", "unique_customers"
    )
    # batch 0 delivered twice — the merge must absorb it
    redelivered = incremental_agg.finalize_distinct_count(
        incremental_agg.merge_distinct_states(batches + [batches[0]]),
        "date_key",
        "unique_customers",
    )
    assert _rows(once) == _rows(redelivered)


def test_retraction_drops_empty_groups(spark):
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.incremental_agg import (
        drop_empty_groups,
        merge_states,
        negate_state,
    )

    def state(rows):
        df = spark.createDataFrame(rows, "g string, price double")
        return df.groupBy("g").agg(
            F.sum(F.col("price").cast("decimal(18,2)")).alias("rev_sum"),
            F.count(F.lit(1)).alias("row_cnt"),
        )

    base = state([("A", 10.0), ("A", 20.0), ("B", 5.0)])
    removed = state([("B", 5.0), ("A", 10.0)])  # B fully retracted
    added = state([("C", 7.0)])
    out = drop_empty_groups(
        merge_states([base, negate_state(removed, ["g"]), added], ["g"])
    )
    got = {r["g"]: (float(r["rev_sum"]), r["row_cnt"]) for r in out.collect()}
    assert got == {"A": (20.0, 1), "C": (7.0, 1)}
