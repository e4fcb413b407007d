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
from ..functions.numeric import MONEY
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


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS (correlated semi-join) + agg
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority AS order_priority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY order_priority
ORDER BY order_priority
"""


@register("tpch_q4_order_priority", _Q4_SQL)
def q_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape; 'late' adapted to
    ship-lag > 60 days since the testdata carries no commit/receipt
    dates). The correlated EXISTS compiles to a ``left_semi`` join whose
    condition spans both inputs — Spark evaluates it as a semi hash join
    keyed on order_id with the date comparison as a residual, so each
    order is emitted at most once regardless of how many late items it
    has. The quarter predicate pushes to the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("order_priority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-aliased dimension join)
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       {_REV_SQL} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_SQL)
def q_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume (TPC-H Q7 shape): the same dimension
    (nation) joins the pipeline twice under different roles, and the
    disjunctive pair predicate can only be applied after both are
    attached. Both nation joins broadcast; restricting each side to the
    two candidate nations *before* the pair filter keeps the fact rows
    that survive the join to the minimum."""
    two = ["NATION_1", "NATION_2"]
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(
            load_table(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional share of exact cent sums)
# ---------------------------------------------------------------------------

_CENTS = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"

_Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_CENTS} ELSE 0 END) AS DOUBLE)
           / CAST(SUM({_CENTS}) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""


@register("tpch_q8_market_share", _Q8_SQL)
def q_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): numerator and denominator
    are computed in ONE aggregation pass as conditional sums of exact
    integer cents, then divided — never two scans. Customer-side nation
    is pre-filtered through region (broadcast chain); supplier-side
    nation is attached only to name the share nation."""
    nation = load_table(spark, sf_dir, "nation")
    n_cust = nation.join(
        F.broadcast(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    n_supp = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            load_table(spark, sf_dir, "orders").filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(n_cust), F.col("cust_nkey") == F.col("c_nationkey"))
        .join(F.broadcast(n_supp), F.col("supp_nkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(cents).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (LIKE filter + derived cost, nation×year)
# ---------------------------------------------------------------------------

_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
                            - 0.6 * p.p_retailprice * l.l_quantity) * 100 + 0.5)
                AS BIGINT)) AS DOUBLE) / 100 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("tpch_q9_product_profit", _Q9_SQL)
def q_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape; supply cost modeled as
    0.6·retail per the FIXTURES.md cost derivation since the testdata has
    no partsupp table). The substring LIKE on p_name prunes parts before
    the fact join; profit is per-row floored to integer cents so the
    distributed sum is exact under any partitioning, including negative
    margins."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
        + 0.5
    ).cast("bigint")
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_cents).cast("double") / 100).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13_customer_distribution", _Q13_SQL)
def q_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram (TPC-H Q13 shape): a LEFT OUTER
    join with an extra non-key condition (the condition filters the right
    side but must preserve order-less customers), then two aggregation
    levels. COUNT(o_orderkey) counts only matched rows — nulls from the
    outer join fall out, giving c_count=0 customers their own histogram
    bucket. The second agg is over ~#customers rows keyed by a tiny int
    domain — map-side partial aggregation collapses it before the
    shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional revenue share, single pass)
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_CENTS} ELSE 0 END) AS DOUBLE) * 100
           / CAST(SUM({_CENTS}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
"""


@register("tpch_q14_promo_effect", _Q14_SQL)
def q_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): promo share of one month's
    revenue. One aggregation pass computes both the conditional numerator
    and the full denominator over exact integer cents; the month
    predicate reaches the lineitem scan (row-group min/max skip on
    l_shipdate), and part is join-pruned to the month's partkeys by AQE
    broadcast."""
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    return (
        li.join(
            load_table(spark, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .agg(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
                ).cast("double")
                * 100
                / F.sum(cents).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar-subquery max against an aggregated view)
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s.s_suppkey AS BIGINT) AS suppkey,
       s.s_name AS name,
       CAST(r.total_cents AS DOUBLE) / 100 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY suppkey
"""


@register("tpch_q15_top_supplier", _Q15_SQL)
def q_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): an aggregated 'view' consumed
    twice — once for the per-supplier revenue, once for its global max.
    The scalar subquery becomes a 1-row aggregate cross-joined
    (broadcast) into the per-supplier frame: no second scan of lineitem,
    no window over a single partition, no driver collect. Ties all
    surface (= comparison on exact cents)."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                ).cast("bigint")
            ).alias("total_cents")
        )
    )
    max_rev = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_cents") == F.col("max_cents"))
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select(
            F.col("s_suppkey").cast("bigint").alias("suppkey"),
            F.col("s_name").alias("name"),
            (F.col("total_cents").cast("double") / 100).alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100 / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@register("tpch_q17_small_quantity", _Q17_SQL)
def q_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue (TPC-H Q17 shape): the correlated per-part
    AVG decorrelates into groupBy(partkey).avg + an equi-join back to the
    fact — the standard Catalyst rewrite, expressed directly. Quantities
    are integer-valued doubles, so sum/count per part is exact and the
    0.2·avg threshold is bit-identical across engines. At scale both
    sides shuffle on l_partkey once; the brand-filtered probe side is the
    small one and AQE broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        ((F.sum("l_quantity") / F.count("l_quantity")) * 0.2).alias("qty_threshold")
    )
    brand = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("avg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
                .cast("double")
                / 100
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING semi-join then enrich)
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT c.c_name AS name,
       CAST(c.c_custkey AS BIGINT) AS custkey,
       CAST(o.o_orderkey AS BIGINT) AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY name, custkey, orderkey, order_date, total_price
ORDER BY total_price DESC, orderkey
LIMIT 100
"""


@register("tpch_q18_large_volume", _Q18_SQL)
def q_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): IN (GROUP BY … HAVING)
    becomes an aggregate → filter → left_semi join, so the qualifying
    order keys (few) prune the fact join early; AQE broadcasts the tiny
    qualifying set. The final regroup re-sums quantities exactly via
    DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("qual_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders").join(
        qualifying, F.col("qual_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    return (
        orders.join(
            load_table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.col("o_orderkey").cast("bigint").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").cast(MONEY).cast("double").alias("total_price"),
        )
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).cast("double").alias("sum_qty"))
        .orderBy(F.desc("total_price"), "orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {_REV_SQL} AS revenue, CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_discounted_revenue", _Q19_SQL)
def q_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): a 3-branch disjunction mixing
    part attributes with lineitem attributes. Catalyst extracts the
    per-table approximations (brand∈{...} onto the part scan,
    quantity∈[1,30] onto the lineitem scan) so both inputs shrink before
    the join; the exact disjunction is the post-join residual."""
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(cond)
        .agg(
            _revenue().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s.s_name AS supplier, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY supplier
ORDER BY numwait DESC, supplier
LIMIT 20
"""


@register("tpch_q21_waiting_supplier", _Q21_SQL)
def q_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late-supplier report (TPC-H Q21 shape; 'late' adapted to
    ship-lag > 90 days). The EXISTS/NOT-EXISTS pair is rewritten as a
    pure aggregation cascade with a SINGLE scan of each table — no
    self-join, no join-back (which would plan the lineitem⋈orders
    subtree twice):

    1. per (order, supplier): count of late rows;
    2. per order: #suppliers, #late suppliers, and — when exactly one
       supplier is late — that supplier's key and late-row count
       (recoverable inside the same aggregate via conditional max);
    3. orders with >1 supplier (EXISTS another) and exactly 1 late
       supplier (NOT EXISTS another late) contribute their late-row
       count to that supplier's numwait.

    Shuffle keys: (orderkey, suppkey) → orderkey (map-side-combined) →
    suppkey. Row-count semantics match the correlated form: each late
    l1 row counts once."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_os = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).cast("long")
            ).alias("n_late_rows")
        )
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late_rows") > 0).cast("long")).alias("n_late_supp"),
        F.max(
            F.when(F.col("n_late_rows") > 0, F.col("l_suppkey"))
        ).alias("late_suppkey"),
        F.max(
            F.when(F.col("n_late_rows") > 0, F.col("n_late_rows"))
        ).alias("late_rows"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy(F.col("late_suppkey"))
        .agg(F.sum("late_rows").alias("numwait"))
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("late_suppkey"),
        )
        .select(F.col("s_name").alias("supplier"), "numwait")
        .orderBy(F.desc("numwait"), "supplier")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (anti-join + scalar subquery)
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0)
SELECT right(c.c_name, 1) AS cgroup,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cgroup
ORDER BY cgroup
"""


@register("tpch_q22_dormant_customers", _Q22_SQL)
def q_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers (TPC-H Q22 shape; country code
    adapted to the last digit of c_name, 'no orders' adapted to 'no
    orders since 2000' because every testdata customer has history). The
    scalar AVG subquery is a 1-row broadcast cross join (no collect); the
    NOT EXISTS is a left_anti join against date-pruned orders. Balances
    aggregate exactly via DECIMAL."""
    customer = load_table(spark, sf_dir, "customer")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(MONEY)).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("cgroup"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double").alias("totacctbal"),
        )
        .orderBy("cgroup")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery, decorrelated)
# ---------------------------------------------------------------------------

_SUPPLY_SQL = """
supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
             AS ps_supplycost
  FROM lineitem GROUP BY 1, 2)
"""

_Q2_SQL = f"""
WITH {_SUPPLY_SQL},
eu_supply AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM supply JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal AS acctbal, s_name AS supp_name, n_name AS nation,
       CAST(p_partkey AS BIGINT) AS partkey, p_type AS part_type,
       CAST(ps_supplycost AS DOUBLE) / 100 AS supplycost
FROM part JOIN eu_supply ON ps_partkey = p_partkey
WHERE p_type = 'LARGE' AND p_size <= 25
  AND ps_supplycost = (SELECT MIN(e2.ps_supplycost) FROM eu_supply e2
                       WHERE e2.ps_partkey = p_partkey)
ORDER BY acctbal DESC, nation, supp_name, partkey
LIMIT 100
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The part–supplier supply relation (TPC-H ``partsupp`` analog)
    derived from lineitem: per (part, supplier), the minimum observed
    unit price in integer cents. ``floor(x·100 + 0.5)`` is pure IEEE
    multiply/add/floor, so the bigint cents are engine-independent and
    MIN over them is exact under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5
    ).cast("bigint")
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(cost).alias("ps_supplycost"))
    )


@register("tpch_q2_min_cost_supplier", _Q2_SQL)
def q_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape; the ``partsupp`` relation
    is derived from lineitem since the testdata carries none — supply
    cost = min observed unit price per (part, supplier)).

    The correlated scalar MIN subquery is decorrelated the way Catalyst
    itself would: a per-part MIN aggregate joined back on the part key
    with an exact integer-cents equality — no per-row subquery
    execution. Scale posture: supply is a single shuffle keyed on
    (part, supplier); the per-part MIN reuses the same rows; nation and
    region broadcast; the part filter (type + size) pushes to the
    parquet scan, pruning before the join."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu_supply = (
        _supply(spark, sf_dir)
        .join(supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eu_supply.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu_supply.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").cast("bigint").alias("partkey"),
            F.col("p_type").alias("part_type"),
            (F.col("ps_supplycost").cast("double") / 100).alias("supplycost"),
        )
        .orderBy(F.desc("acctbal"), "nation", "supp_name", "partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important part values (HAVING against a global scalar subquery)
# ---------------------------------------------------------------------------

_Q11_SQL = """
WITH val AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
             AS BIGINT)) AS cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE' GROUP BY 1)
SELECT CAST(partkey AS BIGINT) AS partkey,
       CAST(cents AS DOUBLE) / 100 AS value
FROM val
WHERE CAST(cents AS DOUBLE) > 1.5 * (SELECT AVG(CAST(cents AS DOUBLE)) FROM val)
ORDER BY value DESC, partkey
"""


@register("tpch_q11_important_values", _Q11_SQL)
def q_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important part values (TPC-H Q11 shape; ``partsupp`` value is
    derived from EUROPE-supplier lineitems; the fixed fraction becomes
    1.5× the mean per-part value so the predicate stays selective-but-
    non-empty at every scale factor).

    The HAVING-against-scalar-subquery compiles to: one grouped
    aggregate (exact integer cents), then a 1-row global AVG broadcast
    cross-joined back — the grouped aggregate is computed once and
    reused for both sides, not re-scanned. region/nation broadcast;
    supplier joins before the groupBy so the shuffle carries only
    surviving rows."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    val = (
        li.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("cents"))
    )
    threshold = val.agg(
        (F.lit(1.5) * F.avg(F.col("cents").cast("double"))).alias("threshold")
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("cents").cast("double") > F.col("threshold"))
        .select(
            F.col("partkey").cast("bigint").alias("partkey"),
            (F.col("cents").cast("double") / 100).alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping tiers vs order priority (join + CASE-conditional agg)
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '1-FAST'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '2-NORMAL'
            ELSE '3-SLOW' END AS ship_tier,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_tier ORDER BY ship_tier
"""


@register("tpch_q12_shipping_tiers", _Q12_SQL)
def q_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-tier / priority matrix (TPC-H Q12 shape; ``l_shipmode``
    and commit/receipt dates don't exist in the testdata, so 'mode'
    becomes a ship-lag tier — days between order and ship date — and
    'late' semantics live in the tier itself).

    Pure join + CASE-conditional aggregation: the year predicate pushes
    to the lineitem scan, the fact–fact join shuffles once on the order
    key, and both CASE sums fold into a single hash aggregate over three
    groups — whole-stage codegen end to end, output is 3 rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_shipdate")
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(lag <= 30, "1-FAST")
            .when(lag <= 90, "2-NORMAL")
            .otherwise("3-SLOW")
            .alias("ship_tier")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_tier")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes (NOT IN exclusion + countDistinct)
# ---------------------------------------------------------------------------

_Q16_SQL = """
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand AS brand, p_type AS part_type,
       CAST(p_size AS INTEGER) AS size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM supply JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY brand, part_type, size
ORDER BY supplier_cnt DESC, brand, part_type, size
"""


@register("tpch_q16_supplier_counts", _Q16_SQL)
def q_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier counts per part attribute (TPC-H Q16 shape; the
    'complaints' comment filter becomes an account-balance filter since
    the testdata has no comment columns; supply pairs derive from
    lineitem).

    The NOT IN subquery is a ``left_anti`` join against the (tiny,
    broadcast) excluded-supplier set — NULL-safe here because keys are
    never null by schema. The brand/type/size predicates push to the
    part scan; countDistinct expands then two-phase aggregates, the
    standard exact plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1500
    )
    return (
        li.distinct()
        .join(
            F.broadcast(excluded.select("s_suppkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").cast("int").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "part_type", "size")
    )


# ---------------------------------------------------------------------------
# Q20 — dominant promo suppliers (nested IN subqueries → semi-join chain)
# ---------------------------------------------------------------------------

_Q20_SQL = """
WITH sq AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
pt AS (SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sq GROUP BY 1)
SELECT DISTINCT s_name AS supp_name, n_name AS nation
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM sq JOIN pt USING (l_partkey)
                    WHERE CAST(supp_qty AS DOUBLE) > 0.5 * CAST(part_qty AS DOUBLE))
ORDER BY supp_name
"""


@register("tpch_q20_dominant_suppliers", _Q20_SQL)
def q_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant promo-part suppliers (TPC-H Q20 shape; 'availqty > half
    of shipped quantity' adapted to 'supplier shipped more than half of
    a promo part's 1997 volume', since there is no ``partsupp.
    ps_availqty`` — the nested-IN-subqueries shape is preserved).

    Decorrelation: per-(part, supplier) quantity aggregate, per-part
    total via a second aggregate over the first (no rescan), ratio
    filter, then a ``left_semi`` into supplier — each IN level becomes
    one semi-join, never a per-row subquery. Quantities are integral
    doubles → exact bigint sums. The part-type and year predicates both
    push to their scans before the fact join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    sq = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty"))
    )
    pt = sq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        sq.join(pt, F.col("l_partkey") == F.col("pt_partkey"))
        .filter(
            F.col("supp_qty").cast("double")
            > 0.5 * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.col("s_name").alias("supp_name"), F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("supp_name")
    )
