"""Relational breadth queries (SURVEY §7.2 M6).

The reference only exercises left joins, hash aggregation and IN-list
filters; Spark's DataFrame/SQL surface provides the full relational
algebra. Each operator family is registered here with a DuckDB oracle so
coverage is *verified*, not claimed.

Determinism notes:

* Window orderings always include a unique tie-break key so frames are
  total orders — running aggregates are then well-defined and identical
  across engines and partitionings.
* Money window/group sums route through DECIMAL(18,2)
  (``functions.numeric`` contract).
* No transcendental functions (exp/ln/sin) in oracle-checked outputs —
  libm results can differ between the JVM and DuckDB; sqrt IS exact IEEE
  and allowed.
* Integer outputs are cast to BIGINT on both sides (DuckDB EXTRACT/SUM
  widen differently from Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import MONEY, money_sum
from ..functions.output import iso_temporal
from ..sources.testdata import load_table

# ---------------------------------------------------------------------------
# Join family (reference has left only — J1-J6; the rest of the family)
# ---------------------------------------------------------------------------

_JOIN_INNER_SQL = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1
"""


@register("join_inner_agg", _JOIN_INNER_SQL)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("segment_revenue"),
        )
    )


_JOIN_FULL_SQL = """
SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
            WHEN o.o_orderkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS side,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1
"""


@register("join_full_outer", _JOIN_FULL_SQL)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("both")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(side.alias("side"))
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_JOIN_SEMI_SQL = """
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers_with_orders
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


@register("join_left_semi", _JOIN_SEMI_SQL)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


_JOIN_ANTI_SQL = """
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers_without_big_orders
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
GROUP BY 1
"""


@register("join_left_anti", _JOIN_ANTI_SQL)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers_without_big_orders"))
    )


_JOIN_CROSS_SQL = """
SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM region r CROSS JOIN nation n
GROUP BY 1
"""


@register("join_cross", _JOIN_CROSS_SQL)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Window functions (absent in the reference — SURVEY §2.7)
# ---------------------------------------------------------------------------

_TOPK_SQL = """
WITH part_rev AS (
    SELECT p.p_type AS category, l.l_partkey AS part_id,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
)
SELECT category, part_id, part_revenue, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY category ORDER BY part_revenue DESC, part_id) AS rnk
    FROM part_rev
) WHERE rnk <= 3
"""


@register("window_topk_per_category", _TOPK_SQL)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per category — the canonical top-k-per-group
    pattern (window + row_number, no driver-side sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("category"), F.col("l_partkey").alias("part_id"))
        .agg(money_sum("l_extendedprice").alias("part_revenue"))
    )
    w = W.partitionBy("category").orderBy(F.desc("part_revenue"), F.asc("part_id"))
    return (
        part_rev.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_revenue
FROM lineitem
"""


@register("window_running_revenue", _RUNNING_SQL)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier — decimal-routed window sum over a
    total order (unique tie-break), so the prefix sums are exact and
    engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast(MONEY)).over(w).cast("double")
        .alias("running_revenue"),
    )


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(date_diff('day',
            LAG(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_lag_lead", _LAG_SQL)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("bigint").alias("days_since_prev"),
    )


_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(RANK() OVER w AS BIGINT) AS price_rank,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
       CAST(NTILE(4) OVER w AS BIGINT) AS price_quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("window_rank_ntile", _RANK_SQL)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
    )


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: rollup / cube / grouping sets
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT COALESCE(p_brand, 'ALL') AS brand,
       COALESCE(CAST(yr AS VARCHAR), 'ALL') AS year_key,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM (
    SELECT p.p_brand, EXTRACT(YEAR FROM l.l_shipdate) AS yr, l.l_extendedprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
GROUP BY ROLLUP (p_brand, yr)
"""


@register("rollup_revenue", _ROLLUP_SQL)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand", F.year("l_shipdate").alias("yr"), "l_extendedprice"
    )
    return (
        base.rollup("p_brand", "yr")
        .agg(
            money_sum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("year_key"),
            "revenue",
            "n_items",
        )
    )


_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_revenue", _CUBE_SQL)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


_GSETS_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


@register("grouping_sets", _GSETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Set operations (absent in the reference — SURVEY §2.5)
# ---------------------------------------------------------------------------

_SETOPS_SQL = """
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'intersect' AS op,
       CAST((SELECT COUNT(*) FROM (SELECT * FROM rich INTERSECT SELECT * FROM building)) AS BIGINT) AS n
UNION ALL
SELECT 'except',
       CAST((SELECT COUNT(*) FROM (SELECT * FROM rich EXCEPT SELECT * FROM building)) AS BIGINT)
UNION ALL
SELECT 'union',
       CAST((SELECT COUNT(*) FROM (SELECT * FROM rich UNION SELECT * FROM building)) AS BIGINT)
"""


@register("setops_segments", _SETOPS_SQL)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect", rich.intersect(building))
        .unionByName(one("except", rich.exceptAll(building).distinct()))
        .unionByName(one("union", rich.union(building).distinct()))
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-N (reference: none — SURVEY §2.7)
# ---------------------------------------------------------------------------

_TOPN_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("sort_topn_orders", _TOPN_SQL)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N via orderBy+limit — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge), no full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


_DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("distinct_flag_status", _DISTINCT_SQL)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


# ---------------------------------------------------------------------------
# Scalar function batteries (reference F1-F10 + engine breadth)
# ---------------------------------------------------------------------------

_STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substr(p_name, 1, 5) AS name_prefix,
       concat(p_brand, '#', p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_snake,
       lpad(p_brand, 10, '*') AS brand_padded,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
       CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos
FROM part
"""


@register("scalar_string_funcs", _STRING_FUNCS_SQL)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.lpad("p_brand", 10, "*").alias("brand_padded"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.instr(F.col("p_name"), "widget").cast("bigint").alias("widget_pos"),
    )


_DATE_MATH_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days_since_epoch_95,
       strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
       round(o_totalprice, 1) AS price_round1,
       CAST(floor(o_totalprice) AS DOUBLE) AS price_floor,
       CAST(ceil(o_totalprice) AS DOUBLE) AS price_ceil,
       abs(o_totalprice - 100000.0) AS price_dev,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
       sqrt(o_totalprice) AS price_sqrt
FROM orders
"""


@register("scalar_date_math_funcs", _DATE_MATH_SQL)
def q_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint")
        .alias("days_since_epoch_95"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.round("o_totalprice", 1).alias("price_round1"),
        F.floor("o_totalprice").cast("double").alias("price_floor"),
        F.ceil("o_totalprice").cast("double").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dev"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
    )


_COND_FUNCS_SQL = """
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_resolved,
       greatest(o_totalprice, 100000.0) AS price_floor100k,
       least(o_totalprice, 100000.0) AS price_cap100k,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
"""


@register("scalar_conditional_funcs", _COND_FUNCS_SQL)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
        .alias("status_resolved"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_cap100k"),
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS F
FROM lineitem
GROUP BY l_returnflag
"""


@register("pivot_linestatus_revenue", _PIVOT_SQL)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(money_sum("l_extendedprice"))
    )


_UNPIVOT_SQL = """
WITH w AS (
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_order_value
    FROM orders
    GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'revenue' AS metric, revenue AS value FROM w
UNION ALL
SELECT o_orderpriority, 'n_orders', n_orders FROM w
UNION ALL
SELECT o_orderpriority, 'avg_order_value', avg_order_value FROM w
"""


@register("unpivot_priority_metrics", _UNPIVOT_SQL)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``DataFrame.unpivot``, the inverse of pivot):
    per-priority KPI columns melt to (metric, value) rows. The melt is a
    row-local ``expand`` — no shuffle beyond the feeding aggregation —
    so a wide metrics table reshapes for a generic metrics sink at scan
    cost."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        money_sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        (money_sum("o_totalprice") / F.count(F.lit(1))).alias("avg_order_value"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["revenue", "n_orders", "avg_order_value"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style aggregate battery
# ---------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6)))
           AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice)
           AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_SQL)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg with 8 aggregates. The filter pushes
    to the parquet scan; partial aggregation is map-side (two-phase hash
    agg), so shuffle volume is #groups, not #rows."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(20,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(22,6)")).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(MONEY)).cast("double") / F.count("l_quantity"))
            .alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(MONEY)).cast("double")
             / F.count("l_extendedprice")).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(MONEY)).cast("double") / F.count("l_discount"))
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate aggregates with ERROR-BOUND oracles. Sketch internals
# (HLL++ registers, t-digest centroids) are engine-specific by design, so
# the raw approx values can't be oracle-compared — instead both sides emit
# the EXACT value plus a boolean "the sketch landed inside its published
# error bound". Spark computes the boolean for real; the oracle asserts
# TRUE — so a sketch regression outside its bound hash-mismatches.
# ---------------------------------------------------------------------------

_APPROX_RSD = 0.05  # approx_count_distinct default relative std deviation

_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS parts_within_bounds,
       TRUE AS orders_within_bounds
FROM lineitem
GROUP BY l_returnflag
"""


@register("approx_distinct_parts", _APPROX_DISTINCT_SQL)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB alternative to exact
    countDistinct (A4): one pass, no expand, fixed memory.

    Gated: |approx − exact| ≤ 3·rsd·exact (3σ of the sketch's published
    relative standard deviation). The exact count rides along only to
    anchor the oracle; a production query would emit the approx value
    alone.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bound = 3.0 * _APPROX_RSD
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", _APPROX_RSD).alias("_ap"),
        F.approx_count_distinct("l_orderkey", _APPROX_RSD).alias("_ao"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("_ap") - F.col("exact_parts"))
            <= F.lit(bound) * F.col("exact_parts")
        ).alias("parts_within_bounds"),
        (
            F.abs(F.col("_ao") - F.col("exact_orders"))
            <= F.lit(bound) * F.col("exact_orders")
        ).alias("orders_within_bounds"),
    )


# percentile_approx(accuracy=10000) guarantees rank error ≤ 1/accuracy;
# we gate with a generous ±0.01 rank slack: each sketched quantile must
# lie between the exact quantiles at p−0.01 and p+0.01.
_APPROX_Q_PS = [0.25, 0.5, 0.75, 0.95]
_APPROX_Q_SLACK = 0.01

_APPROX_QUANTILES_SQL = " ".join(
    ["SELECT"]
    + [
        ", ".join(
            f"TRUE AS q{int(p * 100)}_within_bounds" for p in _APPROX_Q_PS
        )
    ]
    + ["FROM orders LIMIT 1"]
)


@register("approx_quantiles_price", _APPROX_QUANTILES_SQL)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest ``percentile_approx`` sketch for the price distribution —
    map-side combinable, bounded memory (the scale path; exact
    percentile materializes each group, see ``stats_quantiles_exact``).

    Gated by rank bounds: sketch(p) must lie in
    [exact(p−slack), exact(p+slack)]. Exact values stay out of the
    output (engine interpolation differs in last ulps at p=0.95); the
    booleans are the contract.
    """
    o = load_table(spark, sf_dir, "orders")
    lo_ps = [max(p - _APPROX_Q_SLACK, 0.0) for p in _APPROX_Q_PS]
    hi_ps = [min(p + _APPROX_Q_SLACK, 1.0) for p in _APPROX_Q_PS]

    def arr(ps: list[float]) -> str:
        return "array(" + ", ".join(f"{p}D" for p in ps) + ")"

    agg = o.agg(
        F.percentile_approx(
            "o_totalprice", _APPROX_Q_PS, 10000
        ).alias("_sketch"),
        F.expr(f"percentile(o_totalprice, {arr(lo_ps)})").alias("_lo"),
        F.expr(f"percentile(o_totalprice, {arr(hi_ps)})").alias("_hi"),
    )
    return agg.select(
        *[
            (
                (F.col("_sketch")[i] >= F.col("_lo")[i])
                & (F.col("_sketch")[i] <= F.col("_hi")[i])
            ).alias(f"q{int(p * 100)}_within_bounds")
            for i, p in enumerate(_APPROX_Q_PS)
        ]
    )


_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderpriority,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
"""


@register("window_distribution_funcs", _DISTRIBUTION_SQL)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist): both are
    rank-count ratios, so ties collapse identically in every engine —
    unlike ntile, whose tie assignment is order-dependent (covered with a
    unique-key ordering in window_rank_ntile)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
