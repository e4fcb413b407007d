"""MV router: view selection rules, fall-back behavior, and the
access-path proof — a routed rollup over a PERSISTED state table must
read only the state parquet (never the fact table) and still equal the
full recompute exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import incremental_agg, kpis
from ecs_ecommerce_data_pipeline_spark.plans.mv import (
    MaterializedView,
    choose_view,
    route_rollup,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import ecommerce_views

PARTIALS = ["rev_sum", "price_cnt", "row_cnt", "returned_cnt"]


def _mk_view(name, df, dims):
    return MaterializedView(name=name, state=df, dims=dims, partials=tuple(PARTIALS))


def test_choose_view_prefers_coarsest_usable(spark):
    dummy = spark.range(1)
    fine = _mk_view("fine", dummy, ("category", "order_date"))
    coarse = _mk_view("coarse", dummy, ("category",))
    other = _mk_view("other", dummy, ("order_date",))
    got = choose_view([fine, coarse, other], ["category"], PARTIALS)
    assert got is coarse
    # request needing both dims can only use the fine view
    got = choose_view([fine, coarse, other], ["category", "order_date"], PARTIALS)
    assert got is fine


def test_route_returns_none_when_no_view_matches(spark):
    dummy = spark.range(1)
    v = _mk_view("v", dummy, ("category",))
    assert route_rollup([v], ["order_date"], PARTIALS) is None
    assert route_rollup([v], ["category"], PARTIALS + ["missing_partial"]) is None


def test_routed_rollup_reads_only_state_and_matches_recompute(spark, sf_dir, tmp_path):
    t = ecommerce_views(spark, sf_dir)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    state_path = str(tmp_path / "kpi_state")
    incremental_agg.category_kpi_state(prepared).write.parquet(state_path)

    view = _mk_view(
        "category_date_kpis", spark.read.parquet(state_path), ("category", "order_date")
    )
    _, rolled = route_rollup([view], ["category"], PARTIALS)

    # access-path proof: the routed plan scans the state parquet only
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    # the only scan is the state table (its partial columns in ReadSchema);
    # no fact/dim parquet appears anywhere in the plan
    assert "rev_sum:decimal" in plan
    assert "order_items" not in plan and "sale_price" not in plan

    got = {
        r["category"]: (r["rev_sum"], r["price_cnt"], r["row_cnt"], r["returned_cnt"])
        for r in rolled.collect()
    }
    want = {
        r["category"]: (r["rev_sum"], r["price_cnt"], r["row_cnt"], r["returned_cnt"])
        for r in prepared.groupBy("category")
        .agg(
            F.sum(F.col("sale_price").cast("decimal(18,2)")).alias("rev_sum"),
            F.count("sale_price").alias("price_cnt"),
            F.count(F.lit(1)).alias("row_cnt"),
            F.sum("returned_item_flag").cast("bigint").alias("returned_cnt"),
        )
        .collect()
    }
    assert got == want
