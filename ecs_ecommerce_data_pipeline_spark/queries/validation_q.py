"""Validation queries — the reference's data-quality surface
(``ecs/validation/validate_task.py``) as oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import validation
from ..schemas import REQUIRED_COLUMNS
from ..sources.testdata import ecommerce_views

# Null-count report over critical columns (validate_task.py:161-177, one
# aggregate pass per table). DuckDB SUM(int) is HUGEINT → cast to BIGINT.
_NULL_COUNTS_SQL = """
SELECT 'orders' AS table_name, 'order_id' AS column_name,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count
FROM orders
UNION ALL
SELECT 'orders', 'user_id',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders', 'created_at',
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'order_items', 'order_id',
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'order_items', 'product_id',
       CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'order_items', 'sale_price',
       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'order_items', 'created_at',
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'products', 'id',
       CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM part
UNION ALL
SELECT 'products', 'sku',
       CAST(SUM(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM part
UNION ALL
SELECT 'products', 'cost',
       CAST(SUM(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM part
UNION ALL
SELECT 'products', 'category',
       CAST(SUM(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM part
UNION ALL
SELECT 'products', 'retail_price',
       CAST(SUM(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM part
"""


@register("validation_null_counts", _NULL_COUNTS_SQL)
def q_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass null-count aggregate per table over critical columns
    (reference P10/A6)."""
    t = ecommerce_views(spark, sf_dir)
    frames = {
        "orders": t["orders"],
        "order_items": t["order_items"],
        "products": t["products"],
    }
    # cost maps from p_retailprice (derivation is null iff retail_price is)
    return validation.null_count_report(frames, REQUIRED_COLUMNS)


_RI_SQL = """
WITH orphan_orders AS (
    SELECT DISTINCT l.l_orderkey
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
),
orphan_products AS (
    SELECT DISTINCT l.l_partkey
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_partkey IS NULL
)
SELECT 'order_items->orders' AS check_name,
       (SELECT COUNT(*) FROM orphan_orders) AS orphan_count
UNION ALL
SELECT 'order_items->products',
       (SELECT COUNT(*) FROM orphan_products)
"""


@register("validation_referential_integrity", _RI_SQL)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK counts via left_anti joins (reference J5/J6,
    validate_task.py:179-217). The products side broadcasts the dimension
    keys, so the fact table is never shuffled for that check."""
    t = ecommerce_views(spark, sf_dir)
    orders_check = validation.orphan_keys(
        t["order_items"], t["orders"], "order_id", "order_id"
    ).agg(F.count(F.lit(1)).alias("orphan_count")).select(
        F.lit("order_items->orders").alias("check_name"), "orphan_count"
    )
    products_check = validation.orphan_keys(
        t["order_items"], t["products"], "product_id", "id", broadcast_parent=True
    ).agg(F.count(F.lit(1)).alias("orphan_count")).select(
        F.lit("order_items->products").alias("check_name"), "orphan_count"
    )
    return orders_check.unionByName(products_check)


# --- right-to-erasure (GDPR Art. 17) cascade audit -------------------------

_ERASE_MOD = 50
_ERASE_PRED = (
    "('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_ERASE_MOD} = 0"
)

_ERASURE_SQL = f"""
WITH erased AS (
    SELECT c_custkey AS k FROM customer WHERE {_ERASE_PRED}
),
o AS (
    SELECT o_orderkey, o_custkey FROM orders JOIN erased ON o_custkey = k
)
SELECT 'customer' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
FROM erased
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
FROM o
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
FROM lineitem JOIN o ON l_orderkey = o_orderkey
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT)
FROM events JOIN erased ON user_id = k
"""


@register("privacy_erasure_audit", _ERASURE_SQL)
def q_privacy_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit: for a deterministic deletion set
    of customers (md5-bucket parity — stands in for an uploaded erasure
    list), the rows each table would lose: customer rows themselves,
    their orders, the lineitems cascading through those orders, and the
    user's events.

    Scale shape: the erasure list is always tiny relative to the corpus,
    so every probe is a BROADCAST semi/inner join — the fact tables are
    scanned once each, map-side, with no corpus shuffle; the lineitem
    cascade joins the (also small) affected-orders set. This is the
    audit half of a delete pipeline; the write half is these same joins
    as anti-joins into a partition overwrite."""
    from ..operators.sampling import hash_bucket
    from ..sources.testdata import load_table

    cust = load_table(spark, sf_dir, "customer")
    erased = cust.filter(hash_bucket("c_custkey", _ERASE_MOD) == 0).select(
        F.col("c_custkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders")
    o_hit = orders.join(
        F.broadcast(erased), orders["o_custkey"] == F.col("k")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def one(name: str, df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col(key)).cast("bigint").alias("n_keys"),
        )

    return (
        one("customer", erased, "k")
        .unionByName(one("orders", o_hit, "o_custkey"))
        .unionByName(
            one(
                "lineitem",
                li.join(
                    F.broadcast(o_hit.select("o_orderkey")),
                    li["l_orderkey"] == F.col("o_orderkey"),
                ),
                "l_orderkey",
            )
        )
        .unionByName(
            one(
                "events",
                ev.join(F.broadcast(erased), ev["user_id"] == F.col("k")),
                "user_id",
            )
        )
    )
