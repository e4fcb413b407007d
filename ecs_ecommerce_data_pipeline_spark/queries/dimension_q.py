"""Dimension-maintenance + remaining scalar/join/window breadth queries:
SCD2 history merge, map-column functions, time-range window frames, and
null-safe joins (SURVEY §2 M6 fill-ins the earlier rounds didn't cover).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.scd import scd2_apply
from ..sources.testdata import load_table

# --------------------------------------------------------------------------
# SCD2: apply a deterministic update batch to the products dimension
# --------------------------------------------------------------------------

_SCD2_SQL = """
WITH cur AS (
    SELECT p_partkey, p_retailprice AS price, p_type AS category,
           '2023-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
           TRUE AS is_current
    FROM part
),
upd AS (
    SELECT p_partkey, p_retailprice * 1.1 AS price, p_type AS category,
           '2024-06-01' AS eff
    FROM part WHERE p_partkey % 7 = 0
    UNION ALL
    SELECT p_partkey + 1000000, 9.99, 'NEW', '2024-06-01'
    FROM part WHERE p_partkey % 101 = 0
),
changed AS (
    SELECT c.p_partkey
    FROM cur c JOIN upd u USING (p_partkey)
    WHERE c.price IS DISTINCT FROM u.price
       OR c.category IS DISTINCT FROM u.category
)
SELECT c.p_partkey, c.price, c.category, c.valid_from,
       CASE WHEN ch.p_partkey IS NOT NULL THEN '2024-06-01'
            ELSE c.valid_to END AS valid_to,
       ch.p_partkey IS NULL AS is_current
FROM cur c LEFT JOIN changed ch USING (p_partkey)
UNION ALL
SELECT u.p_partkey, u.price, u.category, u.eff AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
FROM upd u JOIN changed ch USING (p_partkey)
UNION ALL
SELECT u.p_partkey, u.price, u.category, u.eff AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
FROM upd u WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.p_partkey = u.p_partkey)
"""


@register("scd2_product_prices", _SCD2_SQL)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension merge: a deterministic price-change batch (keys
    % 7, +10%) plus brand-new keys (% 101) applied to the products
    dimension — changed rows close and re-open, new keys insert, no-ops
    pass through. One broadcast join, no windows (operators.scd)."""
    part = load_table(spark, sf_dir, "part")
    dim = part.select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_type").alias("category"),
        F.lit("2023-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        part.filter(F.col("p_partkey") % 7 == 0)
        .select(
            "p_partkey",
            (F.col("p_retailprice") * F.lit(1.1)).alias("price"),
            F.col("p_type").alias("category"),
            F.lit("2024-06-01").alias("eff_date"),
        )
        .unionByName(
            part.filter(F.col("p_partkey") % 101 == 0).select(
                (F.col("p_partkey") + F.lit(1000000)).alias("p_partkey"),
                F.lit(9.99).alias("price"),
                F.lit("NEW").alias("category"),
                F.lit("2024-06-01").alias("eff_date"),
            )
        )
    )
    return scd2_apply(dim, updates, key="p_partkey", attrs=["price", "category"])


# --------------------------------------------------------------------------
# Map-column scalar functions (M6: string/date/math/array/MAP scalars)
# --------------------------------------------------------------------------

_MAP_SQL = """
WITH e AS (
    SELECT event_id, event_type,
           json_extract_string(props, '$.k')::BIGINT AS k
    FROM events
)
SELECT event_id,
       event_type AS m_type,
       k AS m_k,
       CAST(3 AS INT) AS m_size,
       'k,src,type' AS keys_csv,
       TRUE AS has_src,
       CAST(3 - CASE WHEN k IS NULL THEN 1 ELSE 0 END
              - CASE WHEN event_type IS NULL THEN 1 ELSE 0 END
            AS INT) AS n_nonnull
FROM e
"""


@register("scalar_map_funcs", _MAP_SQL)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: create_map / map_concat / element_at /
    map_keys / map_contains_key / map_filter, all JVM-side expressions.
    The oracle pins the EXTRACTED scalars (map layouts are engine
    internals; their observable behavior is the contract)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), k.cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("src"), F.lit("events")))
    return e.select(
        "event_id",
        F.element_at(m2, "type").alias("m_type"),
        F.element_at(m2, "k").cast("bigint").alias("m_k"),
        F.size(m2).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_csv"),
        F.map_contains_key(m2, "src").alias("has_src"),
        F.size(F.map_filter(m2, lambda _, v: v.isNotNull())).alias("n_nonnull"),
    )


# --------------------------------------------------------------------------
# Time-range window frame (RANGE over event time, not ROWS)
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000

_RANGE_FRAME_SQL = f"""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
"""


@register("window_time_range_frame", _RANGE_FRAME_SQL)
def q_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user metrics via a RANGE frame keyed on
    epoch-MICROSECONDS (both engines see identical integers; epoch
    seconds would truncate differently from DuckDB's fractional epoch).
    One shuffle on user_id; the frame is evaluated in a running pass."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_HOUR_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
        .alias("value_1h"),
    )


# --------------------------------------------------------------------------
# Null-safe join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_NULL_SAFE_SQL = """
WITH o AS (
    SELECT CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END
               AS status_key
    FROM orders
),
d AS (SELECT DISTINCT status_key FROM o)
SELECT COALESCE(d.status_key, 'none') AS label,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM o JOIN d ON o.status_key IS NOT DISTINCT FROM d.status_key
GROUP BY 1
"""


@register("join_null_safe", _NULL_SAFE_SQL)
def q_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``eqNullSafe`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping — the semantics a plain
    equi-join silently loses. Broadcast dim side."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "O", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_key")
    )
    d = o.distinct().select(F.col("status_key").alias("d_key"))
    return (
        o.join(F.broadcast(d), F.col("status_key").eqNullSafe(F.col("d_key")))
        .groupBy(F.coalesce(F.col("d_key"), F.lit("none")).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Column profiling (data-quality / discovery surface)
# --------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderpriority",
]

_PROFILE_SQL = " UNION ALL ".join(
    f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders
"""
    for c in _PROFILE_COLS
)


@register("profile_orders", _PROFILE_SQL)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form column profile (nulls / exact distinct / min / max per
    column) in ONE aggregation pass — the discovery scan a pipeline runs
    before onboarding a table.

    Scale note: multiple exact countDistinct in one agg expands the scan
    (one replica per distinct column). Fine for profiling runs; a 100 TB
    continuous profiler would swap in approx_count_distinct and keep the
    rest of the shape (see ``approx_distinct_parts``).
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in _PROFILE_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stacked}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


# --------------------------------------------------------------------------
# spark.sql() entry point over registered views (API-surface parity: the
# engine is usable from pure SQL, not only the DataFrame API)
# --------------------------------------------------------------------------

_SQL_IFACE_SQL = """
SELECT n.n_name AS nation,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register("sql_interface_revenue", _SQL_IFACE_SQL)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through ``spark.sql``: testdata tables registered
    as temp views, the query text IS the oracle text (modulo nothing —
    it is ANSI on both sides). Catalyst plans it identically to the
    DataFrame construction: broadcast dims, single hash agg."""
    from ..sources.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_IFACE_SQL)


# --------------------------------------------------------------------------
# Schema-evolution union (old files lack columns newer files carry)
# --------------------------------------------------------------------------

_EVOLVE_SQL = """
WITH v1 AS (
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
),
v2 AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
),
unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT COALESCE(o_orderpriority, 'unknown') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM unioned
GROUP BY 1
"""


@register("union_schema_evolution", _EVOLVE_SQL)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the union: an old 'file version' missing a
    column unions with the new version via ``unionByName(
    allowMissingColumns=True)`` — absent columns become nulls instead of
    analysis errors, the batch-consolidation reality (U1/U2) once a feed
    adds fields."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )  # old schema: no priority column
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("unknown")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# SCD2 time travel: the dimension as of a past date
# --------------------------------------------------------------------------

_AS_OF = "2023-12-31"  # BEFORE the 2024-06-01 update batch

_SCD2_SNAPSHOT_SQL = f"""
WITH cur AS (
    SELECT p_partkey, p_retailprice AS price, p_type AS category,
           '2023-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
           TRUE AS is_current
    FROM part
),
upd AS (
    SELECT p_partkey, p_retailprice * 1.1 AS price, p_type AS category,
           '2024-06-01' AS eff
    FROM part WHERE p_partkey % 7 = 0
    UNION ALL
    SELECT p_partkey + 1000000, 9.99, 'NEW', '2024-06-01'
    FROM part WHERE p_partkey % 101 = 0
),
changed AS (
    SELECT c.p_partkey
    FROM cur c JOIN upd u USING (p_partkey)
    WHERE c.price IS DISTINCT FROM u.price
       OR c.category IS DISTINCT FROM u.category
),
merged AS (
    SELECT c.p_partkey, c.price, c.category, c.valid_from,
           CASE WHEN ch.p_partkey IS NOT NULL THEN '2024-06-01'
                ELSE c.valid_to END AS valid_to
    FROM cur c LEFT JOIN changed ch USING (p_partkey)
    UNION ALL
    SELECT u.p_partkey, u.price, u.category, u.eff, CAST(NULL AS VARCHAR)
    FROM upd u JOIN changed ch USING (p_partkey)
    UNION ALL
    SELECT u.p_partkey, u.price, u.category, u.eff, CAST(NULL AS VARCHAR)
    FROM upd u
    WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.p_partkey = u.p_partkey)
)
SELECT p_partkey, price, category, '{_AS_OF}' AS as_of_date
FROM merged
WHERE valid_from <= '{_AS_OF}'
  AND (valid_to IS NULL OR valid_to > '{_AS_OF}')
"""


@register("scd2_as_of_snapshot", _SCD2_SNAPSHOT_SQL)
def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: the version row whose
    [valid_from, valid_to) interval covers the as-of date — here a date
    BEFORE the update batch, so changed keys resolve to their original
    versions and post-update inserts vanish. ISO date strings compare
    lexicographically identically in both engines."""
    merged = q_scd2(spark, sf_dir)
    as_of = F.lit(_AS_OF)
    return merged.filter(
        (F.col("valid_from") <= as_of)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > as_of))
    ).select(
        "p_partkey", "price", "category", as_of.alias("as_of_date")
    )


# --------------------------------------------------------------------------
# Event-time dimension enrichment: fact rows joined to the SCD2 version
# valid AT EACH ROW'S OWN timestamp (the per-row as-of, vs the fixed-ts
# scd2_as_of_snapshot)
# --------------------------------------------------------------------------

_ASOF_ENRICH_SQL = """
WITH pm AS (
    SELECT p_partkey,
           CAST(ROUND(p_retailprice * 1000) AS BIGINT) AS price_milli
    FROM part
),
dim AS (
    SELECT p_partkey, price_milli,
           DATE '1992-01-01' AS valid_from,
           CASE WHEN p_partkey % 7 = 0 THEN DATE '1998-01-01' END AS valid_to
    FROM pm
    UNION ALL
    SELECT p_partkey, price_milli * 11 // 10,
           DATE '1998-01-01', CAST(NULL AS DATE)
    FROM pm WHERE p_partkey % 7 = 0
),
j AS (
    SELECT d.valid_from, CAST(l.l_quantity AS BIGINT) AS qty, d.price_milli
    FROM lineitem l JOIN dim d
      ON l.l_partkey = d.p_partkey
     AND CAST(l.l_shipdate AS DATE) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(l.l_shipdate AS DATE) < d.valid_to)
)
SELECT strftime(valid_from, '%Y-%m-%d') AS valid_from,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(qty * price_milli) AS BIGINT) AS DOUBLE) / 1000.0
           AS revenue_restated
FROM j
GROUP BY 1
"""


@register("lineitem_price_asof_enrich", _ASOF_ENRICH_SQL)
def q_price_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row event-time enrichment: every lineitem joins the product
    price VERSION valid on its own ship date (SCD2 interval containment
    — the bitemporal fact-enrichment every warehouse needs), revenue
    restated at the in-effect price, summarized per version.

    Scale shape: an equi-join on p_partkey with a residual interval
    predicate; the versioned dimension is dims-sized and broadcast, so
    the fact table is scanned once map-side with no shuffle before the
    final tiny aggregation. Money rides as exact integer milli-units
    (ROUND(price·1000) — the ·1.1 reprice is integer `div`-exact), so
    the restated sum is order-independent."""
    part = load_table(spark, sf_dir, "part")
    pm = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 1000).cast("bigint").alias("price_milli"),
    )
    v1 = pm.select(
        "p_partkey",
        "price_milli",
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.when(
            F.col("p_partkey") % 7 == 0, F.lit("1998-01-01").cast("date")
        ).alias("valid_to"),
    )
    v2 = pm.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.expr("price_milli * 11 div 10").alias("price_milli"),
        F.lit("1998-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("ship_d"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    j = li.join(
        F.broadcast(dim),
        (li["l_partkey"] == dim["p_partkey"])
        & (F.col("ship_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_d") < F.col("valid_to"))),
    )
    return j.groupBy(
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        (
            F.sum(F.col("qty") * F.col("price_milli")).cast("bigint").cast("double")
            / 1000.0
        ).alias("revenue_restated"),
    )
