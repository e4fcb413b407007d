"""Skew-mitigation queries: oracle-checked proofs that the salted
operators (``operators/skew.py``) are *transparent* — same answer, better
physical distribution.

``lineitem.l_returnflag`` has 3 distinct values over the whole table: the
most extreme group-by skew the testdata offers (every row lands in one of
three shuffle partitions under naive hash partitioning). The salted
variants spread each key over N buckets; the DuckDB oracle is the plain
single-phase query, so hash-parity demonstrates the rewrite is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import MONEY
from ..operators.skew import salted_agg, salted_join
from ..sources.testdata import load_table

_SALTED_AGG_SQL = """
SELECT l_returnflag AS returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_salted_skew", _SALTED_AGG_SQL)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 3-key returnflag column.
    Phase 1 groups by (key, salt) — 3×16 partial groups spread across
    reducers; phase 2 merges by key. Decimal sums are associative, so the
    result is bit-identical to the single-phase oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li.select("l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey"),
        keys=["l_returnflag"],
        aggs={
            "sum_qty_dec": F.sum(F.col("l_quantity").cast(MONEY)),
            "sum_price_dec": F.sum(F.col("l_extendedprice").cast(MONEY)),
            "n_rows": F.count(F.lit(1)),
            "min_price": F.min("l_extendedprice"),
            "max_price": F.max("l_extendedprice"),
        },
        buckets=16,
    )
    return out.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        F.col("sum_price_dec").cast("double").alias("sum_price"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


_SALTED_JOIN_SQL = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register("join_salted_orders_customer", _SALTED_JOIN_SQL)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join orders×customer: customer is replicated once per
    salt bucket, orders' key is salted deterministically, the join runs
    on (key, salt). Aggregated output hash-matches the plain-join oracle
    — the salt never leaks into the result."""
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    joined = salted_join(orders, customer, on="custkey", buckets=8)
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("revenue"),
    )
