"""Incremental aggregate-maintenance queries.

Each query simulates multi-batch ingestion by splitting the fact table
into deterministic batches (``order_id % k`` — batches deliberately
*overlap on the group keys*, the case where merging actually has to
combine partials), builds per-batch state with
``operators.incremental_agg``, merges, and finalizes.

The oracle is the plain **full-history recompute** SQL: a hash match
proves merge-then-finalize ≡ recompute, i.e. the state table can replace
the reference's re-read-everything loop
(``ecs/transformation/transform_task.py:409-413``) with an O(batch)
update at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.output import iso_temporal
from ..operators import incremental_agg, kpis
from ..sources.testdata import ecommerce_views, load_table
from .core_kpis import _ECOM_CTES

# Oracle = full recompute (identical to the category_kpis oracle): the
# whole point is that the 3-way batch-state merge must hash-match it.
_INCR_KPI_SQL = f"""
WITH {_ECOM_CTES}
SELECT p.category,
       strftime(CAST(o.created_at AS DATE), '%Y-%m-%d') AS order_date,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
       CAST(SUM(CAST(i.sale_price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(i.sale_price)
           AS avg_order_value,
       CAST(SUM(CASE WHEN i.returned_at IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS avg_return_rate
FROM items_e i
LEFT JOIN products_e p ON i.product_id = p.id
LEFT JOIN orders_e o ON i.order_id = o.order_id
GROUP BY 1, 2
"""


@register("incremental_kpi_merge", _INCR_KPI_SQL)
def q_incremental_kpi_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CategoryKPIs via 3-batch partial-state merge ≡ full recompute.

    Batches split on ``order_id % 3`` so every (category, order_date)
    group receives partials from all three batches — the merge is doing
    real work, not concatenating disjoint keys.
    """
    t = ecommerce_views(spark, sf_dir)
    prepared = kpis.prepare_items(t["order_items"], t["orders"], t["products"])
    states = [
        incremental_agg.category_kpi_state(
            prepared.filter(F.col("order_id") % 3 == b)
        )
        for b in range(3)
    ]
    merged = incremental_agg.merge_kpi_states(states)
    return iso_temporal(incremental_agg.finalize_category_kpis(merged))


_INCR_DISTINCT_SQL = f"""
WITH {_ECOM_CTES}
SELECT strftime(CAST(created_at AS DATE), '%Y-%m-%d') AS date_key,
       COUNT(DISTINCT user_id) AS unique_customers
FROM orders_e
GROUP BY 1
"""


@register("incremental_distinct_merge", _INCR_DISTINCT_SQL)
def q_incremental_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day ``unique_customers`` maintained as two-level keyed
    state: per-batch distinct (date, user) membership, union-distinct
    merge (idempotent under batch redelivery), count-per-day finalize.
    """
    t = ecommerce_views(spark, sf_dir)
    orders = t["orders"].withColumn("date_key", F.to_date("created_at"))
    states = [
        incremental_agg.distinct_member_state(
            orders.filter(F.col("order_id") % 2 == b), "date_key", "user_id"
        )
        for b in range(2)
    ]
    merged = incremental_agg.merge_distinct_states(states)
    return iso_temporal(
        incremental_agg.finalize_distinct_count(merged, "date_key", "unique_customers")
    )


# Retractable IVM: the engine maintains a revenue state over lineitem;
# a new snapshot arrives (some rows gone, some new, some re-priced). The
# state is updated FROM THE CDC CHANGELOG ALONE — deletes and old images
# of updates merge as negated partials — and must hash-match a direct
# recompute over the new snapshot (the oracle).
_IVM_SQL = """
WITH lines AS (
    SELECT l_orderkey, l_linenumber, MIN(l_returnflag) AS l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
    FROM lineitem WHERE l_orderkey % 17 <> 0 GROUP BY 1, 2
),
new_snap AS (
    SELECT l_returnflag,
           CASE WHEN l_linenumber % 4 = 0 THEN price + 100.0 ELSE price END AS price
    FROM lines
)
SELECT l_returnflag,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS row_cnt
FROM new_snap GROUP BY 1
"""


@register("ivm_retract_merge", _IVM_SQL)
def q_ivm_retract_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with retraction.

    old snapshot = lineitem minus keys %13; new snapshot = lineitem
    minus keys %17 with every 4th line re-priced (+100.00). The state
    built on the OLD snapshot is updated by merging the signed partials
    of the ``snapshot_diff`` changelog — O(changelog) work — and
    finalizes identically to recomputing over the NEW snapshot.
    """
    from ..operators.cdc import snapshot_diff
    from ..operators.incremental_agg import (
        drop_empty_groups,
        merge_states,
        negate_state,
    )

    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber"]

    # CDC needs a UNIQUE key; the synthetic lineitem has duplicate
    # (orderkey, linenumber) pairs, so the snapshot grain is the
    # per-line aggregate (exact decimal price sum — deterministic in
    # both engines), exactly as a real order-line view would be keyed.
    def line_view(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.min("l_returnflag").alias("l_returnflag"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price"),
        )

    old = line_view(li.filter(F.col("l_orderkey") % 13 != 0))
    new = line_view(li.filter(F.col("l_orderkey") % 17 != 0)).withColumn(
        "price",
        F.when(
            F.col("l_linenumber") % 4 == 0, F.col("price") + F.lit(100.0)
        ).otherwise(F.col("price")),
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.sum(F.col("price").cast("decimal(18,2)")).alias("rev_sum"),
            F.count(F.lit(1)).alias("row_cnt"),
        )

    base = state(old)
    chg = snapshot_diff(old, new, keys, ["l_returnflag", "price"])
    removed = chg.filter(F.col("change_type").isin("delete", "update")).select(
        F.col("old_l_returnflag").alias("l_returnflag"),
        F.col("old_price").alias("price"),
    )
    added = chg.filter(F.col("change_type").isin("insert", "update")).select(
        F.col("new_l_returnflag").alias("l_returnflag"),
        F.col("new_price").alias("price"),
    )
    merged = merge_states(
        [base, negate_state(state(removed), ["l_returnflag"]), state(added)],
        ["l_returnflag"],
    )
    return drop_empty_groups(merged).select(
        "l_returnflag",
        F.col("rev_sum").cast("double").alias("revenue"),
        F.col("row_cnt").cast("bigint").alias("row_cnt"),
    )


# Join-view delta maintenance: the view is an ENRICHED aggregate
# (orders ⋈ customer ⋈ nation → per-nation revenue); a new order batch
# must be propagated through the join — Δ(A ⋈ D) = ΔA ⋈ D for a static
# dimension — then merged into the old state as partials. Work is
# O(|Δ| + |state|), never a fact rescan; the oracle is the full
# recompute over ALL orders.
_IVM_JOIN_SQL = """
WITH dim AS (
    SELECT c_custkey, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT d.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
GROUP BY d.n_name
"""


@register("ivm_join_delta_nation", _IVM_JOIN_SQL)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view delta maintenance: per-nation revenue over
    orders ⋈ customer ⋈ nation, maintained under an insert batch
    (o_orderkey % 7 = 0 plays the newly-arrived orders).

    Engine path: the OLD state's decimal partials (built from the rest)
    and the DELTA's partials — the batch broadcast-joined through the
    customer→nation dimension, O(|Δ| × broadcast) — merge by one hash
    agg; decimal partial sums are associative, so merge-then-finalize
    must hash-match the oracle's full recompute.  Complements
    ``ivm_retract_merge`` (signed-partial retraction) with the JOIN
    propagation rule Δ(A ⋈ D) = ΔA ⋈ D."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = customer.join(
        nation, customer["c_nationkey"] == nation["n_nationkey"]
    ).select("c_custkey", "n_name")

    def partials(fact: DataFrame) -> DataFrame:
        return (
            fact.join(F.broadcast(dim), fact["o_custkey"] == dim["c_custkey"])
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("_cnt"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"),
            )
        )

    old_state = partials(orders.filter(F.col("o_orderkey") % 7 != 0))
    delta_state = partials(orders.filter(F.col("o_orderkey") % 7 == 0))
    return (
        old_state.unionByName(delta_state)
        .groupBy("n_name")
        .agg(
            F.sum("_cnt").cast("bigint").alias("n_orders"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
    )
