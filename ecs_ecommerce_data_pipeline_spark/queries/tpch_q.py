"""Multi-join analytical pipelines (TPC-H-shaped) over the testdata star
schema.

The reference's join graph tops out at four left joins feeding two
aggregations (reference ``ecs/transformation/transform_task.py:189-274``);
these queries exercise the deeper join pipelines a real analytics engine
must plan well: fact-to-fact joins, selective date predicates that must
reach the parquet scan, and small dimensions that must broadcast rather
than shuffle.

Scale posture (the part that matters at 100 TB):

* ``region``/``nation`` are O(10²) rows forever → explicit
  ``F.broadcast`` so the plan never shuffles the fact table for them.
* ``customer``/``supplier`` grow with SF → left to AQE, which
  auto-broadcasts below threshold and falls back to shuffled hash join
  above it; no hint that would pin a bad strategy at scale.
* Date/segment predicates are expressed on the scan columns directly so
  Catalyst pushes them into the parquet reader (verified in
  ``tests/test_tpch_plans.py`` via ``PushedFilters``).
* Revenue math routes through DECIMAL(18,2) (``functions.numeric``
  contract) so distributed sums are order-independent and hash-stable
  against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.testdata import load_table


def _revenue(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Σ price·(1−discount), quantized to integer cents row-locally.

    The product has >2 decimal digits, and double→DECIMAL rounding at
    exact half-cent boundaries differs between engines (Spark HALF_UP vs
    DuckDB), so the DECIMAL cast used for already-2-decimal money columns
    is not hash-stable here. ``floor(x·100 + 0.5)`` is pure IEEE
    multiply/add/floor — bit-identical everywhere — and the bigint cent
    sum is exact and associative under any partitioning."""
    cents = F.floor(F.col(price) * (F.lit(1.0) - F.col(disc)) * 100 + 0.5).cast(
        "bigint"
    )
    return F.sum(cents).cast("double") / 100


_REV_SQL = (
    "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS DOUBLE) / 100"
)


# ---------------------------------------------------------------------------
# Q3 — shipping priority: top unshipped orders for one market segment
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT CAST(l.l_orderkey AS BIGINT) AS order_key,
       {_REV_SQL} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_orderpriority AS order_priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, order_date, order_key
LIMIT 10
"""


@register("tpch_q3_shipping_priority", _Q3_SQL)
def q_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority: 3-way join with selective predicates on all
    three inputs. The segment/date filters sit on scan columns →
    predicate pushdown; customer is the smallest input after filtering →
    AQE broadcast. Top-k uses a total order (revenue, date, key) so the
    LIMIT is deterministic."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .select(
            F.col("l_orderkey").cast("bigint").alias("order_key"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .orderBy(F.desc("revenue"), "order_date", "order_key")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join narrowed by region + year
# ---------------------------------------------------------------------------

_Q5_SQL = f"""
SELECT n.n_name AS nation, {_REV_SQL} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register("tpch_q5_local_supplier_volume", _Q5_SQL)
def q_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: the deepest join pipeline in the catalog
    (lineitem × orders × customer × supplier × nation × region) with a
    compound join condition (supplier and customer in the same nation).

    region→nation is pre-reduced driver-free: region filters nation via a
    broadcast inner join, and the resulting ≤O(10²)-row nation dim is
    itself broadcast into the fact pipeline — the fact table is never
    shuffled for either."""
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            load_table(spark, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# Q6 — revenue forecast: pure scan + selective predicates + agg (no join)
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
            AS DOUBLE) / 100 AS forecast_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_revenue_forecast", _Q6_SQL)
def q_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue: the canonical pushdown probe. All four
    predicates are scan-column comparisons → every one reaches the
    parquet reader as a pushed filter + row-group min/max skip; the agg
    is a single partial+final pass with no shuffle of raw rows."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5
                    ).cast("bigint")
                ).cast("double")
                / 100
            ).alias("forecast_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: who returned the most revenue
# ---------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
       c.c_name AS name,
       n.n_name AS nation,
       {_REV_SQL} AS lost_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_SQL)
def q_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report: fact-fact join narrowed by a quarter + a
    returnflag dictionary filter, then top-20 by lost revenue with a
    unique tie-break (custkey)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().alias("lost_revenue"))
        .select(
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            "lost_revenue",
        )
        .orderBy(F.desc("lost_revenue"), "custkey")
        .limit(20)
    )
