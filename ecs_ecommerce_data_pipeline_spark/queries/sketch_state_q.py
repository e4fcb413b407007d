"""Mergeable HLL sketch state — the approximate counterpart of
``incremental_agg.distinct_member_state``.

Exact countDistinct state grows with the membership; a DataSketches HLL
sketch is FIXED-SIZE per group and still mergeable (``hll_union_agg``),
so at 100 TB the per-day unique-customer state is KBs instead of the
distinct user set. Batches build sketches independently; merging is an
associative union — same O(state + batch) maintenance as the exact
path, with the published ±rsd error.

Gate: like the ``approx_*`` sketch queries, the engine emits the exact
count (to anchor the oracle) plus a boolean asserting the merged
estimate lies within 3σ of it — DuckDB's oracle reproduces the exact
count and expects TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.output import iso_temporal
from ..sources.testdata import load_table

# lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.63%; 3σ bound below.
_LG_K = 12
_BOUND = 3.0 * 1.04 / 64.0

_HLL_MERGE_SQL = """
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date_key,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_bounds
FROM orders
GROUP BY 1
"""


@register("hll_distinct_merge", _HLL_MERGE_SQL)
def q_hll_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day unique customers via 3-batch HLL sketch states merged
    with ``hll_union_agg`` — estimate must stay within 3σ of exact."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "date_key", F.to_date("o_orderdate")
    )
    states = [
        orders.filter(F.col("o_orderkey") % 3 == b)
        .groupBy("date_key")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(_LG_K)).alias("sk"))
        for b in range(3)
    ]
    merged = (
        states[0]
        .unionByName(states[1])
        .unionByName(states[2])
        .groupBy("date_key")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = orders.groupBy("date_key").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    out = exact.join(merged, "date_key").select(
        "date_key",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= F.greatest(
                F.lit(_BOUND) * F.col("exact_customers"), F.lit(1.0)
            )
        ).alias("within_bounds"),
    )
    return iso_temporal(out)
