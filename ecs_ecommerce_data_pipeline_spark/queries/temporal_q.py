"""Temporal-join and rollup queries: as-of join, range join, hierarchical
time-bucket rollups (the hypertable "continuous aggregate" pattern).

The as-of oracle uses a correlated subquery (DuckDB decorrelates it); the
Spark side is the union + forward-fill plan in ``operators.asof`` — same
semantics, including the (timestamp DESC, value DESC) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import money_sum
from ..operators.asof import asof_join_dense, range_join
from ..sources.testdata import load_table

_ASOF_SQL = """
SELECT e.event_id,
       e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       (SELECT o.o_orderkey
        FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        LIMIT 1) AS asof_order_id
FROM events e
"""


@register("asof_join_events_orders", _ASOF_SQL)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent order
    at or before the event time. One shuffle on user_id (union +
    forward-fill window) — no per-row subquery, no cartesian."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    out = asof_join_dense(
        events, orders,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_val="o_orderkey", out_col="asof_order_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "asof_order_id",
    )


# Inline interval dimension: engagement tiers over the event value.
_TIERS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)]

_tier_values = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _TIERS)

_RANGE_JOIN_SQL = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_tier_values})
SELECT t.tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY 1
"""


@register("range_join_value_tiers", _RANGE_JOIN_SQL)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join against a broadcast tier dimension —
    BroadcastNestedLoopJoin, shuffle-free until the final tier rollup."""
    events = load_table(spark, sf_dir, "events")
    tiers = load_table(spark, sf_dir, "events").sparkSession.createDataFrame(
        _TIERS, "tier string, lo double, hi double"
    )
    joined = range_join(events, tiers, "value", "lo", "hi").filter(
        F.col("tier").isNotNull()
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    )


_HOURLY_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_hourly_rollup", _HOURLY_SQL)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket rollup (hypertable continuous-aggregate shape):
    epoch-aligned buckets via ``F.window``, decimal-exact sums."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


_DAILY_FROM_HOURLY_SQL = """
WITH hourly AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS h,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(18,2))) AS total_value_dec
    FROM events
    GROUP BY 1, 2
)
SELECT strftime(time_bucket(INTERVAL '1 day', h), '%Y-%m-%d') AS date_key,
       event_type,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(total_value_dec) AS DOUBLE) AS total_value
FROM hourly
GROUP BY 1, 2
"""


@register("events_daily_from_hourly", _DAILY_FROM_HOURLY_SQL)
def q_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: the daily aggregate is computed FROM the
    hourly one (not from raw events) — the continuous-aggregate refresh
    pattern. Decimal partials re-aggregate exactly; only the final cast
    goes to double, so daily-from-hourly equals daily-from-raw
    bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value_dec"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.window(F.col("w.start"), "1 day").start, "yyyy-MM-dd").alias(
                "date_key"
            ),
            "event_type",
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("total_value_dec").cast("double").alias("total_value"),
        )
    )


_GAPFILL_SQL = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
),
b AS (SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events),
hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       COALESCE(total_value, 0.0) AS total_value,
       n_events IS NULL AS is_gap
FROM hours LEFT JOIN hourly USING (hour)
"""


@register("events_gapfill_hourly", _GAPFILL_SQL)
def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: a dense hourly spine generated
    from the observed bounds (1-row agg → sequence → explode; no driver
    collect) left-joined onto the hourly rollup, missing hours
    zero-filled and flagged. The hourly ROLLUP side is broadcast — it is
    at most one row per hour, the same cardinality class as the spine,
    and a left-outer join can only build/broadcast its right side (a
    hint on the preserved left spine would be silently ignored)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    return (
        hours.join(F.broadcast(hourly), "hour", "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


_ASOF_TOL_SQL = """
SELECT e.event_id,
       e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       (SELECT o.o_orderkey
        FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate <= e.ts
          AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts - INTERVAL 30 DAY
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        LIMIT 1) AS asof_order_id
FROM events e
"""


@register("asof_join_tolerance", _ASOF_TOL_SQL)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment with a 30-day staleness bound: events match
    their user's latest order only if it is at most 30 days older —
    stale matches are NULL, same single-shuffle union-carry plan."""
    from ..functions.output import iso_temporal
    from ..operators.asof import asof_join_tolerance

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    out = asof_join_tolerance(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_val="o_orderkey",
        tolerance_s=30 * 86400,
        out_col="asof_order_id",
    )
    return iso_temporal(out.select("event_id", "user_id", "ts", "asof_order_id"))
