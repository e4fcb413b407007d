"""Materialized-view-routed rollup queries.

The routed path must hash-match the plain full-recompute oracle — the
router is an access-path optimization, never a semantics change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import incremental_agg, kpis
from ..plans.mv import MaterializedView, route_rollup
from ..sources.testdata import ecommerce_views
from .core_kpis import _ECOM_CTES

# Oracle = recompute from raw items×products (the orders join the state
# carries is a LEFT join, so dropping order_date preserves row counts).
_MV_ROLLUP_SQL = f"""
WITH {_ECOM_CTES}
SELECT p.category,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(i.sale_price) AS avg_order_value,
       CAST(SUM(CASE WHEN i.returned_at IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS avg_return_rate,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM items_e i
LEFT JOIN products_e p ON i.product_id = p.id
GROUP BY 1
"""

_PARTIALS = ["rev_sum", "price_cnt", "row_cnt", "returned_cnt"]


@register("mv_rollup_category", _MV_ROLLUP_SQL)
def q_mv_rollup_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-level KPI rollup answered THROUGH the MV router from the
    (category, order_date) state table — request dims ⊂ state dims, so
    the fact table is never re-aggregated; the coarsening re-sums exact
    partials and finalizes with the recompute formulas."""
    t = ecommerce_views(spark, sf_dir)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    state = incremental_agg.category_kpi_state(prepared)
    view = MaterializedView(
        name="category_date_kpis",
        state=state,
        dims=("category", "order_date"),
        partials=tuple(_PARTIALS),
    )
    routed = route_rollup([view], ["category"], _PARTIALS)
    assert routed is not None
    _, rolled = routed
    return rolled.select(
        "category",
        F.col("rev_sum").cast("double").alias("total_revenue"),
        (F.col("rev_sum").cast("double") / F.col("price_cnt")).alias(
            "avg_order_value"
        ),
        (F.col("returned_cnt").cast("double") / F.col("row_cnt")).alias(
            "avg_return_rate"
        ),
        F.col("row_cnt").cast("bigint").alias("n_items"),
    )
