"""Core KPI queries — the reference's analytics surface
(``ecs/transformation/transform_task.py:213-274``) over the testdata
mapping (FIXTURES.md §B).

Oracle SQL inlines the same testdata→e-commerce column mapping used by
``sources.testdata.ecommerce_views`` so both sides compute from identical
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..functions.output import iso_temporal
from ..operators import kpis
from ..sources.testdata import ecommerce_views

# Shared oracle CTE fragments: the testdata -> e-commerce mapping.
_ECOM_CTES = """
orders_e AS (
    SELECT o_orderkey AS order_id,
           o_custkey AS user_id,
           o_orderdate AS created_at,
           CASE WHEN o_orderstatus = 'F' THEN o_orderdate END AS returned_at
    FROM orders
),
items_e AS (
    SELECT l_orderkey AS order_id,
           l_partkey AS product_id,
           l_extendedprice AS sale_price,
           l_shipdate AS created_at,
           CASE WHEN l_returnflag = 'R' THEN l_shipdate END AS returned_at
    FROM lineitem
),
products_e AS (
    SELECT p_partkey AS id, p_name AS sku, p_retailprice * 0.6 AS cost,
           p_type AS category, p_retailprice AS retail_price
    FROM part
)
"""

_DAILY_KPIS_SQL = f"""
WITH {_ECOM_CTES},
order_rev AS (
    SELECT order_id,
           CAST(SUM(CAST(sale_price AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue
    FROM items_e GROUP BY order_id
),
daily AS (
    SELECT strftime(CAST(o.created_at AS DATE), '%Y-%m-%d') AS date_key,
           COUNT(DISTINCT o.order_id) AS total_orders,
           CAST(SUM(CAST(COALESCE(r.order_revenue, 0) AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
           CAST(SUM(CASE WHEN o.returned_at IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS return_rate,
           COUNT(DISTINCT o.user_id) AS unique_customers
    FROM orders_e o LEFT JOIN order_rev r USING (order_id)
    GROUP BY 1
),
items_per_day AS (
    SELECT strftime(CAST(created_at AS DATE), '%Y-%m-%d') AS date_key, COUNT(order_id) AS total_items_sold
    FROM items_e GROUP BY 1
)
SELECT d.date_key, d.total_orders, d.total_revenue,
       COALESCE(i.total_items_sold, 0) AS total_items_sold,
       d.return_rate, d.unique_customers
FROM daily d LEFT JOIN items_per_day i USING (date_key)
"""


@register("daily_kpis", _DAILY_KPIS_SQL)
def q_daily_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DailyKPIs table (reference transform_task.py:231-274, Q3 fixed)."""
    t = ecommerce_views(spark, sf_dir)
    return iso_temporal(kpis.daily_kpis(t["orders"], t["order_items"]))


_CATEGORY_KPIS_SQL = f"""
WITH {_ECOM_CTES}
SELECT p.category,
       strftime(CAST(o.created_at AS DATE), '%Y-%m-%d') AS order_date,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(i.sale_price)
           AS avg_order_value,
       CAST(SUM(CASE WHEN i.returned_at IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS avg_return_rate
FROM items_e i
LEFT JOIN products_e p ON i.product_id = p.id
LEFT JOIN orders_e o ON i.order_id = o.order_id
GROUP BY 1, 2
"""


@register("category_kpis", _CATEGORY_KPIS_SQL)
def q_category_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CategoryKPIs table (reference transform_task.py:213-229; Q5 kept:
    avg_order_value = mean item price)."""
    t = ecommerce_views(spark, sf_dir)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    return iso_temporal(kpis.category_kpis(prepared))


_ORDER_REVENUE_SQL = f"""
WITH {_ECOM_CTES}
SELECT order_id,
       CAST(SUM(CAST(sale_price AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue
FROM items_e GROUP BY order_id
"""


@register("order_revenue", _ORDER_REVENUE_SQL)
def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order revenue aggregation (reference A2, transform_task.py:244)."""
    t = ecommerce_views(spark, sf_dir)
    return iso_temporal(kpis.order_revenue(t["order_items"]))


_CATEGORY_KPIS_CORRECTED_SQL = f"""
WITH {_ECOM_CTES},
per_order AS (
    SELECT p.category, strftime(CAST(o.created_at AS DATE), '%Y-%m-%d') AS order_date, i.order_id,
           CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) AS order_total
    FROM items_e i
    LEFT JOIN products_e p ON i.product_id = p.id
    LEFT JOIN orders_e o ON i.order_id = o.order_id
    GROUP BY 1, 2, 3
)
SELECT category, order_date,
       CAST(SUM(CAST(order_total AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
       CAST(SUM(CAST(order_total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(order_total)
           AS avg_order_value
FROM per_order GROUP BY 1, 2
"""


@register("category_kpis_corrected", _CATEGORY_KPIS_CORRECTED_SQL)
def q_category_kpis_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_order_value as mean per-category ORDER total (SURVEY §2.8 Q5
    corrected variant)."""
    t = ecommerce_views(spark, sf_dir)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    return iso_temporal(kpis.category_kpis_corrected(prepared))


_PREPARED_ITEMS_SQL = f"""
WITH {_ECOM_CTES}
SELECT i.order_id, i.product_id, i.sale_price,
       strftime(i.created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
       strftime(i.returned_at, '%Y-%m-%d %H:%M:%S') AS returned_at_item,
       p.category,
       strftime(CAST(o.created_at AS DATE), '%Y-%m-%d') AS order_date,
       o.user_id,
       strftime(o.returned_at, '%Y-%m-%d %H:%M:%S') AS returned_at_order,
       CASE WHEN i.returned_at IS NOT NULL THEN 1 ELSE 0 END AS returned_item_flag,
       CASE WHEN o.returned_at IS NOT NULL THEN 1 ELSE 0 END AS returned_order_flag
FROM items_e i
LEFT JOIN products_e p ON i.product_id = p.id
LEFT JOIN orders_e o ON i.order_id = o.order_id
"""


@register("prepared_items", _PREPARED_ITEMS_SQL)
def q_prepared_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enrichment join pipeline itself (reference
    transform_task.py:159-211 — J1 broadcast dim join + J2 fact join +
    flag derivation), exposed row-level."""
    t = ecommerce_views(spark, sf_dir)
    out = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    return iso_temporal(out.select(
        "order_id",
        "product_id",
        "sale_price",
        "created_at",
        "returned_at_item",
        "category",
        "order_date",
        "user_id",
        "returned_at_order",
        "returned_item_flag",
        "returned_order_flag",
    ))
