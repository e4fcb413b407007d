"""Change-data-capture queries over snapshot pairs.

Simulates two snapshot versions of the orders table with deterministic
row-local predicates (so the DuckDB oracle reproduces both sides
exactly): the "old" snapshot is missing keys divisible by 7, the "new"
one is missing keys divisible by 11 and rewrites the status of keys
divisible by 5 — yielding all three change classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.cdc import snapshot_diff
from ..sources.testdata import load_table

_CDC_ORDERS_SQL = """
WITH old_snap AS (
    SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
),
new_snap AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS status,
           o_totalprice AS totalprice
    FROM orders WHERE o_orderkey % 11 <> 0
),
j AS (
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN NOT (o.status IS NOT DISTINCT FROM n.status
                          AND o.totalprice IS NOT DISTINCT FROM n.totalprice)
                     THEN 'update'
                ELSE 'unchanged' END AS change_type,
           o.status AS old_status, o.totalprice AS old_totalprice,
           n.status AS new_status, n.totalprice AS new_totalprice
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
SELECT * FROM j WHERE change_type <> 'unchanged'
"""


@register("cdc_orders_diff", _CDC_ORDERS_SQL)
def q_cdc_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert/update/delete changelog between two orders snapshots via
    one full-outer join with null-safe attribute comparison."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    new = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["status", "totalprice"])
