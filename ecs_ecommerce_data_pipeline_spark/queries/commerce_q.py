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


_BASKET_SQL = """
WITH pairs AS (
    SELECT DISTINCT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pair_cnt AS (
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_both
    FROM pairs GROUP BY part_a, part_b
),
item_cnt AS (
    SELECT l_partkey, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY l_partkey
)
SELECT p.part_a, p.part_b, p.n_both,
       CAST(p.n_both AS DOUBLE) / CAST(a.n_orders AS DOUBLE) AS conf_a_to_b,
       CAST(p.n_both AS DOUBLE) / CAST(b.n_orders AS DOUBLE) AS conf_b_to_a
FROM pair_cnt p
JOIN item_cnt a ON p.part_a = a.l_partkey
JOIN item_cnt b ON p.part_b = b.l_partkey
WHERE p.n_both >= 3
"""


@register("basket_pair_affinity", _BASKET_SQL)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (A-priori level 2): co-purchase support
    and both directional confidences for part pairs appearing in ≥ 3
    orders (DISTINCT items per basket — a part twice in one order is one
    basket membership).

    Spark path avoids the quadratic self-join: per-order sorted item
    arrays expand to their C(k,2) pairs INLINE (map-only — baskets are
    small, pairs/order is bounded by basket size, not corpus), then one
    count aggregation; the item-support join is a second small agg. The
    oracle states the same semantics as the classic self-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    ).filter(F.size("items") >= 2)  # single-item baskets yield no pairs
    # outer index stops at size-2 (sequence() runs DESCENDING when
    # start > stop — the i = size-1 inner sequence would wrap)
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(items) - 2), i ->"
                " transform(sequence(i + 1, size(items) - 1), j ->"
                " named_struct('part_a', items[i], 'part_b', items[j]))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    pair_cnt = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both")
    ).filter(F.col("n_both") >= 3)
    item_cnt = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    a = item_cnt.select(F.col("l_partkey").alias("_ka"), F.col("n_orders").alias("_na"))
    b = item_cnt.select(F.col("l_partkey").alias("_kb"), F.col("n_orders").alias("_nb"))
    return (
        pair_cnt.join(a, F.col("part_a") == F.col("_ka"))
        .join(b, F.col("part_b") == F.col("_kb"))
        .select(
            "part_a",
            "part_b",
            "n_both",
            (F.col("n_both").cast("double") / F.col("_na").cast("double")).alias(
                "conf_a_to_b"
            ),
            (F.col("n_both").cast("double") / F.col("_nb").cast("double")).alias(
                "conf_b_to_a"
            ),
        )
    )


_TRANSITION_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS DOUBLE)
           AS p_transition
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@register("events_transition_matrix", _TRANSITION_SQL)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + probabilities between
    event types per user journey (lag/lead window, deterministic
    (ts, event_id) ordering; row-normalized by a window over the count
    aggregate — no second pass over events)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    w_row = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_row).cast("double")
        ).alias("p_transition"),
    )
