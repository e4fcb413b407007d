"""Physical-plan quality gates: the 100 TB posture, asserted.

Correctness tests prove WHAT is computed; these prove HOW. Each
assertion encodes a plan property that must survive refactors because at
scale it is the difference between a scan and a full-table shuffle:

* selective predicates reach the parquet reader (PushedFilters);
* small dimensions broadcast instead of shuffling the fact table;
* the KPI pipeline stays inside whole-stage codegen (no Python row
  boundary in the hot path);
* salted-join output carries no salt column (physical rewrite only).
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark import catalog

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filters_pushed_to_scan(spark):
    """All four Q6 predicates are scan-column comparisons and must appear
    as PushedFilters on the parquet scan node."""
    df = catalog.queries()["tpch_q6_revenue_forecast"](spark, SF_SMOKE)
    plan = _formatted(df)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q5_broadcasts_nation_dim(spark):
    """region->nation is explicitly broadcast; the fact side must join it
    via BroadcastHashJoin, never an Exchange of lineitem for nation."""
    df = catalog.queries()["tpch_q5_local_supplier_volume"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in _plan(df)


def test_q10_broadcasts_nation_dim(spark):
    df = catalog.queries()["tpch_q10_returned_items"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in _plan(df)


def test_daily_kpis_no_python_udf_in_plan(spark):
    """The reference-parity KPI core must stay JVM-side: no BatchEvalPython
    / ArrowEvalPython nodes (SURVEY §2.7 — the reference is UDF-free and
    so are we, keeping whole-stage codegen unbroken)."""
    for name in ("daily_kpis", "category_kpis", "prepared_items"):
        plan = _plan(catalog.queries()[name](spark, SF_SMOKE))
        assert "EvalPython" not in plan, name


def test_kpi_core_uses_wholestage_codegen(spark):
    df = catalog.queries()["daily_kpis"](spark, SF_SMOKE)
    # collect() (not count(), which builds a separate Dataset) finalizes
    # THIS DataFrame's adaptive plan so codegen stages become visible
    df.collect()
    assert "codegen id" in _formatted(df)


def test_salted_join_output_hides_salt(spark):
    df = catalog.queries()["join_salted_orders_customer"](spark, SF_SMOKE)
    assert "__salt" not in df.columns
