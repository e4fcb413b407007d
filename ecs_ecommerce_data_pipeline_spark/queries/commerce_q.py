"""E-commerce customer analytics: RFM segmentation and cohort retention —
the two classic marketing queries the reference's KPI tables feed in
practice, expressed engine-native with full oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.testdata import load_table

# --------------------------------------------------------------------------
# RFM segmentation: score each customer 1-5 on Recency/Frequency/Monetary
# --------------------------------------------------------------------------

_RFM_SQL = """
WITH per_cust AS (
    SELECT o_custkey AS customer_id,
           MAX(o_orderdate) AS last_order,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT *,
           PERCENT_RANK() OVER (ORDER BY last_order, customer_id) AS r_pct,
           PERCENT_RANK() OVER (ORDER BY n_orders, customer_id) AS f_pct,
           PERCENT_RANK() OVER (ORDER BY monetary, customer_id) AS m_pct
    FROM per_cust
)
SELECT customer_id, n_orders, monetary,
       CAST(1 + FLOOR(r_pct * 4.99) AS BIGINT) AS r_score,
       CAST(1 + FLOOR(f_pct * 4.99) AS BIGINT) AS f_score,
       CAST(1 + FLOOR(m_pct * 4.99) AS BIGINT) AS m_score,
       CAST((1 + FLOOR(r_pct * 4.99)) * 100
            + (1 + FLOOR(f_pct * 4.99)) * 10
            + (1 + FLOOR(m_pct * 4.99)) AS BIGINT) AS rfm
FROM ranked
"""


@register("rfm_segmentation", _RFM_SQL)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary 1-5 scores per customer: one combinable
    per-customer agg, three rank windows over it (the windowed relation
    is customers, not orders — already reduced), deterministic tie-break
    by customer id. ``FLOOR(pct * 4.99)`` buckets ranks into quintiles
    with the top rank (pct=1.0) landing in 5, not a phantom 6th bucket;
    both factors are IEEE double ops, identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("monetary"),
    )

    def score(col: str) -> F.Column:
        pct = F.percent_rank().over(W.orderBy(F.col(col), F.col("customer_id")))
        return (F.lit(1) + F.floor(pct * F.lit(4.99))).cast("bigint")

    scored = per_cust.select(
        "customer_id",
        "n_orders",
        "monetary",
        score("last_order").alias("r_score"),
        score("n_orders").alias("f_score"),
        score("monetary").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("bigint"),
    )


# --------------------------------------------------------------------------
# Cohort retention: customers acquired in month M still ordering k months on
# --------------------------------------------------------------------------

_COHORT_SQL = """
WITH first_order AS (
    SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort_month
    FROM orders GROUP BY 1
),
activity AS (
    SELECT DISTINCT o.o_custkey, f.cohort_month,
           (EXTRACT(YEAR FROM o.o_orderdate) - EXTRACT(YEAR FROM f.cohort_month)) * 12
             + (EXTRACT(MONTH FROM o.o_orderdate) - EXTRACT(MONTH FROM f.cohort_month))
               AS months_since
    FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
)
SELECT strftime(cohort_month, '%Y-%m') AS cohort,
       CAST(months_since AS BIGINT) AS months_since,
       CAST(COUNT(*) AS BIGINT) AS active_customers
FROM activity
GROUP BY 1, 2
"""


@register("cohort_retention", _COHORT_SQL)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: acquisition month × months-since →
    distinct active customers. Two combinable aggs + one join on the
    customer key (the first-order side is one row per customer —
    broadcastable for dimension-sized customer bases, shuffled equi-join
    beyond); month arithmetic is exact integers."""
    o = load_table(spark, sf_dir, "orders")
    first_order = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("bigint")
    activity = (
        o.join(first_order, "o_custkey")
        .select("o_custkey", "cohort_month", months_since.alias("months_since"))
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        "months_since",
    ).agg(F.count(F.lit(1)).alias("active_customers"))


_FORECAST_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders
    GROUP BY 1
)
SELECT CAST(isodow(d) AS BIGINT) AS dow_iso,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) / COUNT(*) AS forecast_daily_revenue
FROM daily
GROUP BY 1
"""


@register("forecast_naive_seasonal", _FORECAST_SQL)
def q_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive daily-revenue forecast: project each weekday as the
    exact-decimal mean of that weekday's history — the baseline every
    forecasting system must beat, and the shape (calendar-key partial
    aggregates) that a real model's feature pipeline starts from. Two
    hash aggregations, map-side combinable, one division per weekday."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    return daily.groupBy(
        (F.weekday("d") + 1).cast("bigint").alias("dow_iso")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias(
            "forecast_daily_revenue"
        ),
    )
